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

  test("arms agree on the mixed degenerate fixture (few-vector trainer)") {
    // the mixed fixture's null-embedding rows are dropped upstream by
    // corpusWithNorm's isNotNull filter, so what THIS leg pins is the
    // few-real-vector end of the pipeline (trainer seeded from 3 rows,
    // tiny cells) behaving identically across arms; the null-dist²
    // ordering law gets its own direct test below
    val dir = "/tmp/annassign_mixed"
    graft.tools.DegenSweep.writeMixedFixture(spark, sf, dir, 3)
    val lit = canon(Similarity.embeddingNearDupIvf(spark, dir))
    val bc = withBroadcastArm(canon(Similarity.embeddingNearDupIvf(spark, dir)))
    assert(bc == lit)
  }

  test("arms break NULL-dist² ties identically (direct centRanked law)") {
    // a null qemb makes every centroid option's dist² NULL, so the
    // ranking degenerates to the tie rule — the literal arm's
    // array_sort struct comparator and the broadcast arm's
    // TopKRowsAgg InterpretedOrdering must agree on it (nulls first,
    // then cid) or a null-bearing shard gives the two deployments
    // different probe sets. Exercised directly because every catalog
    // call site filters null embeddings upstream.
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(3L, 4L)), Some(25L)),
      (2L, None: Option[Seq[Long]], None: Option[Long]),
      (3L, Some(Seq(-5L, 12L)), Some(169L)))
      .toDF("vec_id", "qemb", "n2")
    val cents = Array(
      (0L, Seq(0L, 0L)), (1L, Seq(10L, 0L)), (2L, Seq(0L, 10L)))
    def run() = canon(
      Similarity.centRanked(df, cents, 2)
        .selectExpr("vec_id", "ds[0].cid AS c0", "ds[0].dist2 AS d0",
          "ds[1].cid AS c1", "ds[1].dist2 AS d1"))
    spark.conf.set("spark.graft.ann.assign.broadcastMinLists",
      Int.MaxValue.toString)
    val lit = try run()
      finally spark.conf.unset("spark.graft.ann.assign.broadcastMinLists")
    val bc = withBroadcastArm(run())
    assert(lit.size == 3, s"literal arm lost rows: $lit")
    assert(bc == lit, s"null-dist2 tie order diverged:\n lit=$lit\n bc=$bc")
  }
}
