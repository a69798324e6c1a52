package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Finer q116 cost split than ProfileBm25: candidate stream with and
  * without the score math, the (query, doc) aggregate with its sum
  * CONSUMED (no column pruning), and the top-k window on top.
  */
object ProfileBm25b {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2fs  $label")
      r
    }
    time("warmup scan")(graft.core.Tables.documents(spark, d).count())
    val cands = graft.operators.Retrieval.bm25Candidates(spark, d, None)
    time("candidates count (sq pruned)")(cands.count())
    time("candidates sum(sq) (score math, no pair agg)")(
      cands.agg(sum($"sq")).head())
    val agg = cands.groupBy($"query_id", $"doc_id").agg(sum($"sq").as("s"))
    time("pair agg, sum consumed")(agg.agg(sum($"s")).head())
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"s".desc, $"doc_id")
    time("pair agg + top-20 window")(
      agg.withColumn("r", row_number().over(win)).filter($"r" <= 20).count())
    spark.stop()
  }
}
