package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-session stage split of the shared dedup pair-generation build
  * (the cost the bench attributes to whichever dedup query runs first).
  */
object ProfileDedup {
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
    time("docShingles cache fill")(
      graft.operators.Dedup.docShingles(spark, d).count())
    time("minhashCandidates (sigs + band join)")(
      graft.operators.Dedup.minhashCandidates(spark, d).count())
    time("minhashLsh pairs (exact re-check, memo fill)")(
      graft.operators.Dedup.minhashLsh(spark, d).count())
    time("star CC labels")(
      graft.operators.Dedup.dedupLabelsStar(spark, d).count())
    time("q132 on warm memos")(
      graft.operators.Sampling.clusterSafeSplit(spark, d).count())
    spark.stop()
  }
}
