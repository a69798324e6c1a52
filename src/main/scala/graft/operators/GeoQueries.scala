package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.functions.Geo._

/** Oracle-checked exercise of the GeoUtils scalar surface (SURVEY §2.8)
  * over synthesized coordinates: the testdata tables carry no lon/lat, so
  * deterministic points are derived from `event_id` by integer math
  * (exactly mirrored in the DuckDB oracle), then pushed through the full
  * function library: NYC filter (P1), grid-cell mapping (P2), cell
  * centers (P4), degree-cos distance, direction angle.
  *
  * Everything is codegen'd column math in the scan stage — the NYC
  * filter is a plain predicate Catalyst can push down.
  */
object GeoQueries {

  /** Synthesized ride-shaped points from event ids. */
  private def points(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    events(spark, d).select(
      $"event_id",
      (lit(-74.06) + ($"event_id" % 40).cast("double") * 0.01).as("lon1"),
      (lit(40.49) + (expr("event_id div 7") % 53).cast("double") * 0.01).as("lat1"),
      (lit(-74.05) + (expr("event_id div 11") % 35).cast("double") * 0.01).as("lon2"),
      (lit(40.5) + (expr("event_id div 13") % 50).cast("double") * 0.01).as("lat2"))
  }

  /** RideCleansing-shaped filter + the whole scalar surface. */
  def gridCells(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    points(spark, d)
      .filter(isInNYC($"lon1", $"lat1") && isInNYC($"lon2", $"lat2"))
      .withColumn("cell", mapToGridCell($"lon1", $"lat1"))
      .select($"event_id", $"cell",
        cellCenterLon($"cell").as("center_lon"),
        cellCenterLat($"cell").as("center_lat"),
        round(euclideanDistance($"lon1", $"lat1", $"lon2", $"lat2"), 7).as("dist"),
        directionAngle($"lon1", $"lat1", $"lon2", $"lat2").as("dir"))
      // drop degenerate start==dest points: their direction angle is
      // atan2 of two rounding-noise terms — not engine-stable (and not a
      // meaningful direction either)
      .filter($"dist" > 0.001)
  }

  /** Segment rasterization (mapToGridCellsOnWay, GeoUtils.java:95-161) as
    * a table function: explode the per-ride cell array. Rows-only checked
    * (our rasterization is a linear-interpolation re-expression of the
    * reference's slope-walk, exercised + bounds-tested in GeoSpec).
    */
  def cellsOnWayQuery(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    points(spark, d)
      .filter(isInNYC($"lon1", $"lat1") && isInNYC($"lon2", $"lat2"))
      .select($"event_id",
        explode(cellsOnWay($"lon1", $"lat1", $"lon2", $"lat2")).as("cell"))
  }
}
