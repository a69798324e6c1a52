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

  /** Shared (event_id, x1, y1, x2, y2) cell-coordinate endpoints of the
    * NYC-filtered synthesized segments.
    */
  private def segments(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    points(spark, d)
      .filter(isInNYC($"lon1", $"lat1") && isInNYC($"lon2", $"lat2"))
      .select($"event_id",
        floor((lit(74.05) - abs($"lon1")) / 0.0014).cast("int").as("x1"),
        floor((lit(41.0) - $"lat1") / 0.00125).cast("int").as("y1"),
        floor((lit(74.05) - abs($"lon2")) / 0.0014).cast("int").as("x2"),
        floor((lit(41.0) - $"lat2") / 0.00125).cast("int").as("y2"))
  }

  /** Segment rasterization with the reference's EXACT slope-walk
    * semantics (GeoUtils.java:95-161, quirks included) — a native
    * codegen'd table function (plans.SlopeWalkExpr), oracle-checked
    * against a DuckDB recursive-CTE re-derivation of the same walk
    * (SparkEntry q49) and property-tested against a direct transcription
    * of the Java source in GeoSpec.
    */
  def cellsOnWayExactQuery(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    segments(spark, d)
      .select($"event_id",
        explode(graft.plans.SlopeWalkCells.cellsOnWayExact(
          $"x1", $"y1", $"x2", $"y2")).as("cell"))
  }

  /** Segment rasterization (mapToGridCellsOnWay, GeoUtils.java:95-161) as
    * a table function — the cheap LINEAR-INTERPOLATION approximation
    * (differs from the reference walk on steep segments; q49 is the
    * faithful port). Oracle-checked via the DuckDB unnest(range) mirror.
    *
    * Shape: endpoints → explode(sequence(0, steps)) → column math. The
    * generator materializes the per-row endpoint values as attributes, so
    * the per-step interpolation is cheap codegen'd arithmetic — the
    * array-building HOF form (Geo.cellsOnWay) re-evaluates the endpoint
    * expressions per step in interpreted mode (~60× slower here).
    */
  def cellsOnWayQuery(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    segments(spark, d)
      .withColumn("dx", $"x2" - $"x1")
      .withColumn("dy", $"y2" - $"y1")
      .withColumn("steps", greatest(abs($"dx"), abs($"dy")))
      .select($"event_id", $"x1", $"y1", $"dx", $"dy", $"steps",
        explode(sequence(lit(0), $"steps")).as("i"))
      .withColumn("fx",
        when($"steps" === 0, lit(0.0)).otherwise($"i".cast("double") / $"steps".cast("double")))
      .select($"event_id",
        (($"x1" + round($"fx" * $"dx").cast("int")) +
          lit(250) * ($"y1" + round($"fx" * $"dy").cast("int"))).as("cell"))
  }
}
