package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-11 verdict item 6: rehearse AQE's skew-join split on the two
  * biggest remaining shuffle-join shapes — q116's postings term join
  * and q132's LSH band join — with a synthetic hot key and test-scaled
  * skew thresholds, pinning the PLAN evidence (`skewed` markers in the
  * final adaptive plan).
  *
  * The thresholds scale the production defaults (256 MB / factor 5)
  * down to fixture size; nothing else is special-cased — the same
  * OptimizeSkewedJoin rule fires on the real plans when a partition
  * crosses the production thresholds. One real limit of the rule is
  * ALSO load-bearing for the 100 TB plans: it only matches a join
  * whose sides sit DIRECTLY on shuffle stages (sort → stage) — an
  * aggregate between join and shuffle hides the map stats, which is
  * one more reason the weights build pre-aggregates and MATERIALIZES
  * before its joins. The self-join case (both sides skewed at the
  * same partition) splits too in Spark 4 — into map-chunk PAIRS —
  * but only the work, not the intra-bucket quadratic output; that
  * bound stays structural (see the third test).
  */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withSkewConfs[A](body: => A): A = {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // force the shuffle join the production shape degrades to when
      // the dimension side outgrows the broadcast threshold
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    // drive THIS queryExecution (df.count() would plan a new one and
    // leave this plan isFinalPlan=false); AQE finalizes on execution
    df.queryExecution.toRdd.count()
    df.queryExecution.executedPlan.toString
  }

  test("q116 shape: a saturated term's postings partition is AQE-split") {
    import spark.implicits._
    withSkewConfs {
      // postings with one term in 60% of a 120k-posting table — the
      // hot-vocabulary shape — joined to a term dim table. Both join
      // inputs are plain shuffles (the dim is materialized, not an
      // inline aggregate), so OptimizeSkewedJoin sees the map stats.
      val tf = spark.range(120000L).select(
        when($"id" % 5 < 3, "common")
          .otherwise(concat(lit("t"), pmod($"id", lit(997L)))).as("t"),
        $"id".as("doc_id"))
      val dim = spark.range(998L).select(
        when($"id" === 997L, "common")
          .otherwise(concat(lit("t"), $"id".cast("string"))).as("t"),
        ($"id" * 7L).as("df"))
      val p = finalPlan(tf.join(dim, "t"))
      assert(p.contains("skewed"),
        s"AQE did not split the hot term partition:\n$p")
      assert(p.contains("isSkew=true") || p.contains("skewed"),
        s"expected the skew-marked join:\n$p")
    }
  }

  test("q132 prune shape: a hot band bucket joining its stats table is AQE-split") {
    import spark.implicits._
    withSkewConfs {
      // band rows with one hot (band, key) bucket joined to per-bucket
      // stats — the candidate-audit shape; one side skewed, one small
      val bands = spark.range(120000L).select(
        when($"id" % 3 < 2, lit(7L)).otherwise(pmod($"id", lit(32L))).as("band"),
        when($"id" % 3 < 2, lit(7L)).otherwise(pmod($"id", lit(4093L))).as("key"),
        $"id".as("doc_id"))
      val stats = spark.range(4093L).select(
        pmod($"id", lit(32L)).as("band"), $"id".as("key"),
        ($"id" % 13L).as("bucket_n"))
      val p = finalPlan(bands.join(stats, Seq("band", "key")))
      assert(p.contains("skewed"),
        s"AQE did not split the hot band bucket partition:\n$p")
    }
  }

  test("q132 self-join: both-sides skew splits into sub-chunk pairs; the quadratic stays structural") {
    import spark.implicits._
    withSkewConfs {
      // the pair-generation self-join: the hot bucket is oversized on
      // BOTH sides of the same shuffle partition. Spark 4's skew rule
      // handles even this — it splits both sides into map-chunk groups
      // and enumerates the chunk PAIRS (plan shows `skewed` readers on
      // both sides and `SortMergeJoin(skew=true)`), so the hot bucket's
      // WORK spreads across tasks. What AQE cannot shrink is the
      // intra-bucket quadratic OUTPUT — that bound stays structural
      // (bucket size ∝ near-dup cluster size by the banding design;
      // pre-salting is rejected outright since a salted bucket drops
      // cross-salt pairs).
      val bands = spark.range(60000L).select(
        when($"id" % 3 < 2, lit(7L)).otherwise(pmod($"id", lit(32L))).as("band"),
        when($"id" % 3 < 2, lit(7L)).otherwise(pmod($"id", lit(4093L))).as("key"),
        $"id".as("doc_id"))
      val pairs = bands.as("a").join(bands.as("b"),
          $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("x"), $"b.doc_id".as("y"))
      val p = finalPlan(pairs)
      assert(p.contains("SortMergeJoin(skew=true)"),
        s"both-sides skew was not split:\n$p")
      // both sides carry skew readers — the chunk-pair enumeration
      assert("AQEShuffleRead skewed".r.findAllIn(p).size >= 2,
        s"expected skewed readers on both self-join sides:\n$p")
    }
  }
}
