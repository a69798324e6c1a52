package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    val d = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_test")
      spark.sql("USE graft_test")
      Bucketing.writeBucketed(
        spark.read.parquet(s"$d/lineitem.parquet"), "li_bucketed", "l_orderkey", 8)
      Bucketing.writeBucketed(
        spark.read.parquet(s"$d/orders.parquet"), "ord_bucketed", "o_orderkey", 8)
      val joined = Bucketing.bucketedJoin(spark,
        "li_bucketed", "ord_bucketed", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan) // co-located: no shuffle at all
      assert(joined.count() == spark.read.parquet(s"$d/lineitem.parquet").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_test.li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_test.ord_bucketed")
      spark.sql("USE default")
    }
  }
}
