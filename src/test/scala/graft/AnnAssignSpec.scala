package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Retrieval, Similarity}

/** The centroid-assignment dial law (`Similarity.centRanked`): the
  * broadcast-table + k-bounded-TopK arm must be ROW-IDENTICAL to the
  * plan-literal argsort arm at every call site — same exact integer
  * dist², same ascending (dist², cid) order, so identical probe sets
  * and identical downstream output. The dial exists because the
  * literal arm's plan grows ∝ nLists·dims (the round-15 verdict's one
  * remaining driver-side bound); this law is what makes flipping it a
  * deployment decision instead of a semantics change.
  */
class AnnAssignSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def withBroadcastArm[T](body: => T): T = {
    spark.conf.set("spark.graft.ann.assign.broadcastMinLists", "1")
    try body
    finally spark.conf.unset("spark.graft.ann.assign.broadcastMinLists")
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Vector[String] =
    graft.tools.InvarianceSweep.canon(df)

  test("dial actually switches arms (plan shape, anti-vacuity)") {
    val litPlan = Similarity
      .embeddingNearDupIvf(spark, sf).queryExecution.executedPlan.toString
    val bcPlan = withBroadcastArm {
      Similarity.embeddingNearDupIvf(spark, sf)
        .queryExecution.executedPlan.toString
    }
    assert(!litPlan.contains("topk_rows"),
      "literal arm must stay the scan-stage argsort (no TopK aggregate)")
    assert(bcPlan.contains("topk_rows") && bcPlan.contains("BroadcastExchange"),
      "broadcast arm must rank via the k-bounded TopK aggregate over a " +
        "broadcast centroid table")
  }

  test("embeddingNearDupIvf: broadcast arm row-identical to literal arm") {
    val lit = canon(Similarity.embeddingNearDupIvf(spark, sf))
    val bc = withBroadcastArm(canon(Similarity.embeddingNearDupIvf(spark, sf)))
    assert(lit.nonEmpty, "fixture should contain planted near-dups")
    assert(bc == lit)
  }

  test("hardNegatives: broadcast arm row-identical to literal arm") {
    val lit = canon(Similarity.hardNegatives(spark, sf))
    val bc = withBroadcastArm(canon(Similarity.hardNegatives(spark, sf)))
    assert(lit.nonEmpty)
    assert(bc == lit)
  }

  test("denseIvf ranking: broadcast arm row-identical to literal arm") {
    val lit = canon(Retrieval.DenseIvfGen(spark, sf, 5))
    val bc = withBroadcastArm(canon(Retrieval.DenseIvfGen(spark, sf, 5)))
    assert(lit.nonEmpty)
    assert(bc == lit)
  }

  test("arms agree on the mixed degenerate fixture (null embeddings present)") {
    // null-payload rows rank every centroid at NULL dist² — both arms
    // must break those ties identically (nulls-first, then cid), or a
    // null-bearing 100 TB shard would give the two deployments
    // different answers; the mixed fixture is DegenSweep's class for
    // exactly this shape
    val dir = "/tmp/annassign_mixed"
    graft.tools.DegenSweep.writeMixedFixture(spark, sf, dir, 3)
    val lit = canon(Similarity.embeddingNearDupIvf(spark, dir))
    val bc = withBroadcastArm(canon(Similarity.embeddingNearDupIvf(spark, dir)))
    assert(bc == lit)
  }
}
