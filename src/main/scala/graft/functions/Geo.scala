package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's GeoUtils scalar library
  * (datastream_java/utils/GeoUtils.java) as pure column expressions — no
  * UDFs, everything inlines into WholeStageCodegen and can be pushed into
  * scans by Catalyst (SURVEY §2.8: "column predicate (no UDF needed)").
  *
  * Faithful quirks preserved deliberately (SURVEY §7.4.4):
  *  - `euclideanDistance`/`directionAngle` take cos of DEGREES
  *    (GeoUtils.java:224, 245) — do not "fix".
  *  - boundary handling of `isInNYC` is the negated-strict form
  *    (GeoUtils.java:58-62), and cell ids at the exact east boundary can
  *    reach xIndex = 250 (the reference's own boundary behavior).
  *  - cell centers are computed in double and cast to float once
  *    (GeoUtils.java:170-191).
  */
object Geo {
  val LonEast: Double  = -73.7   // GeoUtils.java:29-32
  val LonWest: Double  = -74.05
  val LatNorth: Double = 41.0
  val LatSouth: Double = 40.5
  val DeltaLon: Double = 0.0014  // GeoUtils.java:39-45
  val DeltaLat: Double = 0.00125
  val GridX: Int = 250
  val DegLen: Double = 110.25    // GeoUtils.java:47 (110.25f, dyadic-exact)

  /** NYC bounding-box check (GeoUtils.java:58-62), boundary-inclusive. */
  def isInNYC(lon: Column, lat: Column): Column =
    !(lon > LonEast || lon < LonWest) && !(lat > LatNorth || lat < LatSouth)

  /** Location → ~100 m grid cell id (GeoUtils.java:75-80). */
  def mapToGridCell(lon: Column, lat: Column): Column =
    floor((lit(math.abs(LonWest)) - abs(lon)) / DeltaLon).cast("int") +
      lit(GridX) * floor((lit(LatNorth) - lat) / DeltaLat).cast("int")

  /** Cell id → center longitude, float like the reference
    * (GeoUtils.java:170-177: `(float)(...) * -1.0f`).
    */
  def cellCenterLon(cell: Column): Column =
    -((lit(math.abs(LonWest)) - ((cell % GridX) * DeltaLon) - lit(DeltaLon / 2))
      .cast("float"))

  /** Cell id → center latitude (GeoUtils.java:184-191). */
  def cellCenterLat(cell: Column): Column =
    (lit(LatNorth) - (((cell - (cell % GridX)) / lit(GridX)) * DeltaLat)
      - lit(DeltaLat / 2)).cast("float")

  /** "Euclidean" distance with cos of degrees (GeoUtils.java:222-226). */
  def euclideanDistance(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val x = lat1 - lat2
    val y = (lon1 - lon2) * cos(lat2)
    lit(DegLen) * sqrt(x * x + y * y)
  }

  /** Direction angle in [0, 359], cos of degrees + int truncation
    * (GeoUtils.java:241-249).
    */
  def directionAngle(startLon: Column, startLat: Column,
      destLon: Column, destLat: Column): Column = {
    val x = destLat - startLat
    val y = (destLon - startLon) * cos(startLat)
    degrees(atan2(x, y)).cast("int") + 179
  }

  /** Direction bucket 0..7 of 45° each (TravelTimePredictionModel.java:35-36,
    * 70-72: `angle / 45` integer division on the [0,359] angle).
    */
  def directionBucket(angle: Column): Column = (angle / 45).cast("int")

  /** Test-data generators (GeoUtils.java:199-211) — uniform samples in
    * the NYC bbox; data-gen helpers, not engine functions (SURVEY §2.8).
    */
  def randomNYCLon(rand: scala.util.Random): Float =
    (LonEast - ((math.abs(LonWest) - math.abs(LonEast)) * rand.nextFloat())).toFloat
  def randomNYCLat(rand: scala.util.Random): Float =
    (LatSouth + ((LatNorth - LatSouth) * rand.nextFloat())).toFloat

  // ---- plain-Scala forms (for typed Dataset ops / stateful streaming;
  // same semantics as the column forms above) ----

  def isInNYC(lon: Float, lat: Float): Boolean =
    !(lon > LonEast || lon < LonWest) && !(lat > LatNorth || lat < LatSouth)

  def mapToGridCell(lon: Float, lat: Float): Int = {
    val xIndex = math.floor((math.abs(LonWest) - math.abs(lon)) / DeltaLon).toInt
    val yIndex = math.floor((LatNorth - lat) / DeltaLat).toInt
    xIndex + (yIndex * GridX)
  }

  def cellCenterLon(cell: Int): Float =
    (math.abs(LonWest) - ((cell % GridX) * DeltaLon) - (DeltaLon / 2)).toFloat * -1.0f

  def cellCenterLat(cell: Int): Float = {
    val xIndex = cell % GridX
    val yIndex = (cell - xIndex) / GridX
    (LatNorth - (yIndex * DeltaLat) - (DeltaLat / 2)).toFloat
  }

  def euclideanDistance(lon1: Float, lat1: Float, lon2: Float, lat2: Float): Double = {
    val x = lat1.toDouble - lat2.toDouble
    val y = (lon1.toDouble - lon2.toDouble) * math.cos(lat2.toDouble)
    DegLen * math.sqrt(x * x + y * y)
  }

  def directionAngle(startLon: Float, startLat: Float,
      destLon: Float, destLat: Float): Int = {
    val x = destLat.toDouble - startLat.toDouble
    val y = (destLon.toDouble - startLon.toDouble) * math.cos(startLat.toDouble)
    math.toDegrees(math.atan2(x, y)).toInt + 179
  }

  /** Segment rasterization onto the grid (GeoUtils.java:95-161): the
    * slope-walk from cell(p1) to cell(p2), emitted as an array of cell
    * ids (a table function via explode). Expressed with a sequence over
    * the dominant axis — same cells as the reference's while-loops.
    */
  def cellsOnWay(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val x1 = floor((lit(math.abs(LonWest)) - abs(lon1)) / DeltaLon).cast("int")
    val y1 = floor((lit(LatNorth) - lat1) / DeltaLat).cast("int")
    val x2 = floor((lit(math.abs(LonWest)) - abs(lon2)) / DeltaLon).cast("int")
    val y2 = floor((lit(LatNorth) - lat2) / DeltaLat).cast("int")
    val dx = x2 - x1
    val dy = y2 - y1
    val steps = greatest(abs(dx), abs(dy))
    transform(sequence(lit(0), steps), i => {
      val fx = when(steps === 0, lit(0.0)).otherwise(i.cast("double") / steps.cast("double"))
      val cx = x1 + round(fx * dx).cast("int")
      val cy = y1 + round(fx * dy).cast("int")
      cx + lit(GridX) * cy
    })
  }
}
