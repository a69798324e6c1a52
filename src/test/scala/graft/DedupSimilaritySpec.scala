package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, Text}

/** Property checks for the operators without a SQL oracle (rows-only in
  * the driver gate): MinHash/SimHash/ANN against their exact
  * counterparts on the sf0.001 tables.
  */
class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("MinHash+LSH finds the exact-Jaccard pairs (recall) and no extras (precision)") {
    import spark.implicits._
    val exact = Dedup.jaccardPairs(spark, sf).select($"x", $"y")
      .as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(spark, sf).select($"x", $"y")
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    // post-filter guarantees precision; banding (32x2) makes recall ~1 at j>=0.5
    assert(lsh.subsetOf(exact))
    assert(lsh.size >= (exact.size * 9) / 10, s"recall too low: ${lsh.size}/${exact.size}")
  }

  test("SimHash: planted near-dup pairs have small Hamming distance") {
    import spark.implicits._
    val exact = Dedup.jaccardPairs(spark, sf, threshold = 0.8).select($"x", $"y")
      .as[(Long, Long)].collect().toSet
    val sim = Dedup.simhashPairs(spark, sf).select($"x", $"y")
      .as[(Long, Long)].collect().toSet
    // very-high-overlap docs should collide in the Hamming<=3 sketch space
    assert(exact.nonEmpty)
    assert((exact intersect sim).size >= exact.size / 2,
      s"simhash found ${(exact intersect sim).size} of ${exact.size} j>=0.8 pairs")
  }

  test("exact dedup groups every doc exactly once") {
    import spark.implicits._
    val total = Dedup.exact(spark, sf).agg(org.apache.spark.sql.functions.sum($"n_docs"))
      .as[Long].collect()(0)
    assert(total == spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("ANN-LSH candidates score identically to brute force and keep rank order") {
    import spark.implicits._
    val brute = Similarity.knnBruteForce(spark, sf, k = 500)
      .select($"q_id", $"n_id", $"cos").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val ann = Similarity.annLsh(spark, sf)
      .select($"q_id", $"n_id", $"cos").as[(Long, Long, Double)].collect()
    assert(ann.nonEmpty, "multi-table LSH should produce candidates")
    ann.foreach { case (q, n, c) =>
      assert(brute((q, n)) == c, s"cosine mismatch for ($q,$n)")
    }
    // per query at most k rows
    val perQuery = ann.groupBy(_._1).view.mapValues(_.length)
    assert(perQuery.values.forall(_ <= 5))
  }

  test("IVF-ANN candidates score identically to brute force, recall > 0") {
    import spark.implicits._
    val brute = Similarity.knnBruteForce(spark, sf, k = 500)
      .select($"q_id", $"n_id", $"cos").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val bruteTop5 = Similarity.knnBruteForce(spark, sf, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvf(spark, sf)
      .select($"q_id", $"n_id", $"cos").as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (q, n, c) =>
      assert(brute((q, n)) == c, s"cosine mismatch for ($q,$n)")
    }
    val hits = ivf.map(t => (t._1, t._2)).toSet intersect bruteTop5
    assert(hits.nonEmpty, "IVF should recover at least some true top-5 neighbors")
  }

  test("rolling fingerprint is deterministic and order-sensitive") {
    import spark.implicits._
    val fps = Text.rollingFp(spark, sf).as[(Long, Long)].collect().toMap
    val fps2 = Text.rollingFp(spark, sf).as[(Long, Long)].collect().toMap
    assert(fps == fps2)
    // 500 distinct docs → no mass collisions
    assert(fps.values.toSet.size > 450)
  }
}
