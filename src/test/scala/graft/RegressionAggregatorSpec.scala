package graft

import org.apache.commons.math3.stat.regression.SimpleRegression
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RegressionAggregator

class RegressionAggregatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("slope_origin SQL aggregate == commons-math SimpleRegression(false)") {
    import spark.implicits._
    RegressionAggregator.register(spark)
    val pts = Seq(("a", 1.0, 2.0), ("a", 2.0, 4.1), ("a", 3.0, 5.9),
      ("b", 1.0, 10.0), ("c", 0.0, 0.0)) // c: degenerate Σxx → -1 sentinel
    pts.toDF("k", "x", "y").createOrReplaceTempView("reg_pts")
    val got = spark.sql(
      "SELECT k, slope_origin(x, y) AS slope FROM reg_pts GROUP BY k")
      .as[(String, Double)].collect().toMap

    val oracleA = new SimpleRegression(false)
    pts.filter(_._1 == "a").foreach(p => oracleA.addData(p._2, p._3))
    assert(math.abs(got("a") - oracleA.getSlope) < 1e-12)
    assert(got("b") == 10.0)
    assert(got("c") == -1.0)
  }

  test("aggregator matches the relational decimal form on real data (q12)") {
    import spark.implicits._
    RegressionAggregator.register(spark)
    val d = "/root/testdata/sf0.001"
    spark.read.parquet(s"$d/lineitem.parquet")
      .createOrReplaceTempView("li_reg")
    val viaAgg = spark.sql(
      """SELECT l_suppkey, slope_origin(l_quantity, l_extendedprice) AS slope
        |FROM li_reg GROUP BY l_suppkey""".stripMargin)
      .as[(Long, Double)].collect().toMap
    val viaRelational = graft.operators.Regression.slopePerKey(spark, d)
      .select("l_suppkey", "slope").as[(Long, Double)].collect().toMap
    assert(viaAgg.keySet == viaRelational.keySet)
    viaAgg.foreach { case (k, s) =>
      // double-sum vs decimal-sum paths agree to FP tolerance
      assert(math.abs(s - viaRelational(k)) < 1e-9, s"supplier $k")
    }
  }
}
