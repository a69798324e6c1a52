package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage split of q109 (prefix-filtered exact Jaccard join): shingle
  * cache fill, candidate generation, and the exact-verify stage, so
  * regressions attribute to a stage instead of the query total.
  */
object ProfilePrefix {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    // optional 2nd arg: replication factor — profiles on the shared
    // key-shifted fixture (ScaleSweep's construction, kept in /tmp)
    val factor = if (args.length > 1) args(1).toInt else 1
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // reuse the shared kept fixture (the ScaleSweep/MemSweep path) so
    // repeat A/B profiling never re-pays the multi-minute build and the
    // legs read identical bytes; the marker check rebuilds on a src or
    // factor mismatch (and on a partial build) instead of silently
    // profiling stale data
    val d = if (factor <= 1) src else {
      val out = s"/tmp/graft_scale$factor"
      ScaleSweep.ensureFixture(spark, src, out, factor)
      out
    }
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2fs  $label")
      r
    }
    time("warmup scan")(graft.core.Tables.documents(spark, d).count())
    time("docShingleArrays cache fill")(
      graft.operators.Dedup.docShingleArrays(spark, d).count())
    time("docShingles cache fill")(
      graft.operators.Dedup.docShingles(spark, d).count())
    time("docShingleHashArrays cache fill")(
      graft.operators.Dedup.docShingleHashArrays(spark, d).count())
    val nc = time("prefixCandidates")(
      graft.operators.Dedup.prefixCandidates(spark, d).count())
    println(s"          candidates: $nc")
    time("jaccardPrefixJoin (warm candidates)")(
      graft.operators.Dedup.jaccardPrefixJoin(spark, d).count())
    time("jaccardPrefixJoin again")(
      graft.operators.Dedup.jaccardPrefixJoin(spark, d).count())
    // the single-reference verify shape (one scan of the shingle-array
    // cache, one small array shuffle) vs the two-join default — the
    // round-14 watch item's A/B; both ride the same warm candidates
    time("jaccardPrefixJoinSingleScan (warm candidates)")(
      graft.operators.Dedup.jaccardPrefixJoinSingleScan(spark, d).count())
    time("jaccardPrefixJoinSingleScan again")(
      graft.operators.Dedup.jaccardPrefixJoinSingleScan(spark, d).count())
    time("jaccardPrefixJoin (two-join) final")(
      graft.operators.Dedup.jaccardPrefixJoin(spark, d).count())
    // the shared fixture is deliberately KEPT (ScaleSweep --keep /
    // MemSweep convention) for the next profiling or sweep leg
    spark.stop()
  }
}
