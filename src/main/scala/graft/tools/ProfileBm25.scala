package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-by-stage wall-clock of the q116 BM25 pipeline at a given SF —
  * the evidence behind PERF.md's candidate-volume accounting. Run:
  * `sbt "runMain graft.tools.ProfileBm25 /root/testdata/sf0.1"`.
  *
  * Caution baked into the ordering: a bare `.count()` over the scored
  * aggregate COLUMN-PRUNES the integer score sum (Catalyst drops the
  * unused column), so counting stages read far cheaper than any real
  * consumer — the end-to-end numbers below are the honest ones, taken
  * FIRST in a fresh session.
  */
object ProfileBm25 {
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
    time("q116 end-to-end (fresh: postings + 22M-candidate agg + memo fill)")(
      graft.operators.Retrieval.bm25TopK(spark, d).count())
    time("q116 again (score-table memo warm)")(
      graft.operators.Retrieval.bm25TopK(spark, d).count())
    time("q125 riding the shared score table")(
      graft.operators.Retrieval.rrfFusion(spark, d).count())
    val cands = graft.operators.Retrieval.bm25Candidates(spark, d, None)
    val n = time("candidate stream count (COLUMN-PRUNED lower bound)")(
      cands.count())
    println(s"           candidates: $n")
    spark.stop()
  }
}
