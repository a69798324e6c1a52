package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.Geo
import graft.plans.GridCell

class GridCellExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val pts = Seq((-73.98f, 40.75f), (-74.0f, 40.756f), (-73.8123f, 40.6789f),
    (-74.049f, 40.999f), (-73.71f, 40.51f))

  test("native expression == column math == plain scala") {
    import spark.implicits._
    val rows = pts.toDF("lon", "lat")
      .select(
        GridCell.gridCellNative($"lon", $"lat").as("native"),
        Geo.mapToGridCell($"lon", $"lat").as("columns"))
      .collect()
    pts.zip(rows).foreach { case ((lon, lat), r) =>
      assert(r.getInt(0) == r.getInt(1), s"native vs column at ($lon,$lat)")
      assert(r.getInt(0) == Geo.mapToGridCell(lon, lat), s"native vs scala at ($lon,$lat)")
    }
  }

  test("SQL registration: grid_cell usable from spark.sql") {
    import spark.implicits._
    GridCell.register(spark)
    pts.toDF("lon", "lat").createOrReplaceTempView("pts")
    val viaSql = spark.sql(
      "SELECT grid_cell(CAST(lon AS DOUBLE), CAST(lat AS DOUBLE)) FROM pts")
      .as[Int].collect().toSeq
    assert(viaSql == pts.map { case (lon, lat) => Geo.mapToGridCell(lon, lat) })
  }

  test("whole-stage codegen keeps the expression inline (no fallback)") {
    import spark.implicits._
    // needs a real scan: a local relation folds to LocalTableScan
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(GridCell.gridCellNative(
        lit(-74.05) + ($"l_discount" % 0.35), lit(40.5) + ($"l_tax" % 0.5)))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [grid_cell"), plan)
    assert(df.count() > 0)
  }
}
