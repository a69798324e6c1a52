package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registerViews exposes the whole star schema to spark.sql") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    assert(spark.sql("SELECT count(*) FROM lineitem").collect()(0).getLong(0) == 6000)
    // the relational exercises are expressible as plain SQL (SURVEY §3.3)
    val otm = spark.sql(
      """SELECT month, user_id FROM (
        |  SELECT month, user_id,
        |         rank() OVER (PARTITION BY month ORDER BY cnt DESC) AS rnk
        |  FROM (SELECT date_format(ts, 'yyyy-MM') AS month, user_id,
        |               count(*) AS cnt
        |        FROM events GROUP BY 1, 2))
        |WHERE rnk = 1""".stripMargin).collect()
    assert(otm.nonEmpty)
    // events view carries the converted timestamp (nanos handled)
    assert(spark.sql("SELECT min(ts) FROM events").collect()(0)
      .getTimestamp(0).toString.startsWith("2024-01-01"))
  }
}
