package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.01"

  test("approximate sketches land within error bounds of exact answers") {
    import spark.implicits._
    val exact = Relational.distinctStats(spark, sf)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._2).toMap
    val exactP50 = Relational.percentiles(spark, sf)
      .select($"event_type", $"p50").as[(String, Double)].collect().toMap
    val approx = Relational.approxStats(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (t, users, p50) =>
      // HLL++ default rsd 5%
      assert(math.abs(users - exact(t)).toDouble / exact(t) < 0.1, s"$t users")
      // KLL with accuracy 1000 on ~2000 rows/group: within a few percent
      assert(math.abs(p50 - exactP50(t)) / math.max(1.0, exactP50(t)) < 0.05, s"$t p50")
    }
  }
}
