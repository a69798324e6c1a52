package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cold-session build-cost split of q116: the tf memo (tokenize pass),
  * the weighted-posting cache, then the consumer. */
object ProfileBm25c {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2fs  $label")
      r
    }
    time("warmup scan")(graft.core.Tables.documents(spark, d).count())
    time("tokenize+tf memo build")(
      graft.operators.Retrieval.bm25Candidates(spark, d, None)
        .select(lit(1)).limit(1).count())
    time("q116 on warm memos")(graft.operators.Retrieval.bm25TopK(spark, d).count())
    time("q116 again (ranked memo warm)")(
      graft.operators.Retrieval.bm25TopK(spark, d).count())
    spark.stop()
  }
}
