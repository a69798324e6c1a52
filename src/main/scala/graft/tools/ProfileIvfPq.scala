package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-session stage split of q91 (Similarity.annIvfPq) — the round-13
  * verdict's top unadjudicated heavy. Construction is eager (the PQ
  * codebook trains via driver-bounded collects while the DataFrame is
  * being BUILT), so the split is:
  *
  *   1. corpusWithNorm memo fill (shared with the whole similarity family)
  *   2. coarse Lloyd (8 lists, 2 updates) — the `centroids_8x2` build leg
  *   3. annIvfPq CONSTRUCTION — ivfPqAssigned memo fill + PQ seed collect
  *      + one codebook Lloyd round (assignCodes shuffle + m·ks·subDim
  *      collect)
  *   4. count() — encode (assignCodes under the trained books), the
  *      integer lookup tables, candidate probe, ADC scoring, top-k
  *
  * A second construct+count pair on the warm memos isolates how much of
  * stage 3/4 is memo fill vs inherent per-run work.
  */
object ProfileIvfPq {
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
    time("1 corpusWithNorm fill")(
      graft.operators.Similarity.corpusWithNorm(spark, d).count())
    time("2 coarse lloyd (8,2) [build leg]")(
      graft.operators.Similarity.lloydCentroids(spark, d, 8, 2).length)
    val df = time("3 annIvfPq construct (assigned memo + PQ train)")(
      graft.operators.Similarity.annIvfPq(spark, d))
    time("4 count: encode + ADC scoring + top-k")(df.count())
    val df2 = time("5 re-construct on warm memos (PQ train only)")(
      graft.operators.Similarity.annIvfPq(spark, d))
    time("6 re-count on warm memos")(df2.count())
    spark.stop()
  }
}
