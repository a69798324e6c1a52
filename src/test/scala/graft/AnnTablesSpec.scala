package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, Similarity}

/** Laws for the multi-table IVF recall amplification (round 17): the
  * `tables` parameter unions candidate streams from independently-
  * seeded coarse quantizers so above-knee recall compounds as
  * 1-(1-r)^R instead of decaying with nLists (the QualitySweep
  * finding). The spec pins the algebra on the sf0.001 corpus with
  * deliberately ABOVE-KNEE parameters (32 lists / nProbe 2 over 500
  * vectors — per-table recall < 1, so amplification has room to act);
  * the 10×/100× recall numbers themselves live in QualitySweep.
  */
class AnnTablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def pairs(tables: Int): Map[(Long, Long), Double] = {
    import spark.implicits._
    Similarity.embeddingNearDupIvf(spark, sf, 0.4, nLists = 32, nProbe = 2,
        updates = 2, tables = tables)
      .select($"x", $"y", $"cos").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
  }

  test("multi-table pair union: superset of table 0, dedup-sound, precision 1") {
    import spark.implicits._
    val exact = Similarity.embeddingNearDup(spark, sf)
      .select($"x", $"y", $"cos").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val p1 = pairs(1)
    val p3raw = Similarity.embeddingNearDupIvf(spark, sf, 0.4, nLists = 32,
        nProbe = 2, updates = 2, tables = 3)
      .select($"x", $"y", $"cos").as[(Long, Long, Double)].collect()
    val p3 = p3raw.map(t => (t._1, t._2) -> t._3).toMap
    // dedup-sound: the union emits each (x, y) once
    assert(p3raw.length == p3.size, "duplicate pairs survived the union dedup")
    // monotone recall: each extra quantizer can only ADD pairs
    assert(p1.keySet.subsetOf(p3.keySet),
      s"table union lost pairs: ${p1.keySet -- p3.keySet}")
    // precision 1 with exact scores — the post-union exact filter is
    // still the decision stage, tables only widen the candidate set
    p3.foreach { case (k, c) =>
      assert(exact.get(k).contains(c), s"pair $k not exact or score drift")
    }
    // the amplification must genuinely act on this fixture: 32 fine
    // lists at nProbe 2 leave single-table recall below 1, and three
    // seed-diverse tables recover strictly more of the exact set
    // (deterministic: fixed corpus, deterministic trainers)
    assert(p1.size < exact.size,
      "fixture regression: single fine-grained table unexpectedly at full " +
        "recall — the amplification law below is vacuous")
    assert(p3.size > p1.size,
      s"3-table union found no extra pairs (${p3.size} vs ${p1.size})")
  }

  test("seeded trainers are diverse: table 1 centroids differ from table 0") {
    val c0 = Similarity.lloydCentroids(spark, sf, 32, 2, table = 0)
    val c1 = Similarity.lloydCentroids(spark, sf, 32, 2, table = 1)
    assert(c0.nonEmpty && c1.nonEmpty)
    assert(c0.map(_._2).toSet != c1.map(_._2).toSet,
      "salted seeding produced identical centroid sets — tables are not " +
        "independent and the amplification math is void")
  }

  test("annTables dial: 1 at the knee, grows per decade, override wins, " +
      "malformed conf loudly rejected") {
    assert(Similarity.annTables(spark, 8) == 1)
    assert(Similarity.annTables(spark, 78) == 4)
    assert(Similarity.annTables(spark, 781) == 9)
    assert(Similarity.annTables(spark, 1000000) == 16, "cap at 16")
    spark.conf.set("spark.graft.ann.tables", "2")
    try assert(Similarity.annTables(spark, 781) == 2)
    finally spark.conf.unset("spark.graft.ann.tables")
    spark.conf.set("spark.graft.ann.tables", "lots")
    try {
      val e = intercept[RuntimeException](Similarity.annTables(spark, 781))
      assert(e.getMessage.contains("spark.graft.ann.tables"),
        "error must name the conf key")
    } finally spark.conf.unset("spark.graft.ann.tables")
  }

  test("dense arm: multi-table recall vs brute is monotone in tables") {
    import spark.implicits._
    def recallAt(tables: Int): Double = {
      spark.conf.set("spark.graft.ann.tables", tables.toString)
      try {
        val ivf = Retrieval.DenseIvfScaledGen(spark, sf, 20)
          .select($"query_id", $"doc_id").as[(Long, Long)].collect().toSet
        val brute = Retrieval.DenseBruteGen(spark, sf, 20)
          .select($"query_id", $"doc_id").as[(Long, Long)].collect().toSet
        (ivf & brute).size.toDouble / brute.size
      } finally spark.conf.unset("spark.graft.ann.tables")
    }
    val r1 = recallAt(1)
    val r3 = recallAt(3)
    assert(r3 >= r1, s"3-table dense recall $r3 below single-table $r1")
  }

  test("hard negatives: multi-table union is dedup-sound and per-anchor " +
      "top-k only improves (k-th cosine non-decreasing)") {
    import spark.implicits._
    def topk(tables: Int) = Similarity.hardNegatives(spark, sf, k = 5,
        nLists = 32, nProbe = 2, updates = 2, tables = tables)
      .select($"anchor_id", $"neg_id", $"cos")
      .as[(Long, Long, Double)].collect()
    val t1 = topk(1)
    val t2 = topk(2)
    assert(t2.map(r => (r._1, r._2)).distinct.length == t2.length,
      "duplicate (anchor, neg) rows survived the union dedup")
    // widening the candidate set can only raise each anchor's k-th-best
    // cosine (top-k over a superset dominates element-wise)
    val k1 = t1.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val k2 = t2.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    k1.foreach { case (a, c1) =>
      assert(k2.getOrElse(a, Double.MinValue) >= c1,
        s"anchor $a k-th cosine regressed under 2 tables")
    }
  }
}
