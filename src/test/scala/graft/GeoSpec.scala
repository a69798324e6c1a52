package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Geo

class GeoSpec extends AnyFunSuite {

  test("isInNYC matches the reference's float-vs-double boundary behavior") {
    // The reference compares FLOAT coords against DOUBLE bounds
    // (GeoUtils.java:29-32, 58-62): -74.05f widens to -74.050003 which is
    // strictly west of -74.05, so the float west/east boundary values are
    // actually excluded — a faithful quirk, preserved:
    assert(!Geo.isInNYC(-74.05f, 40.5f))
    assert(!Geo.isInNYC(-73.7f, 40.75f))
    // exactly-representable boundary values are included (negated-strict)
    assert(Geo.isInNYC(-73.75f, 40.5f)) // -73.75 and 40.5 are dyadic
    assert(Geo.isInNYC(-73.9f, 41.0f))
    assert(Geo.isInNYC(-73.9f, 40.75f))
    assert(!Geo.isInNYC(-74.0501f, 40.75f))
    assert(!Geo.isInNYC(-73.9f, 41.01f))
    assert(!Geo.isInNYC(0.0f, 0.0f))
  }

  test("mapToGridCell hand-computed values (stable interior points)") {
    // near the north-west corner → cell 0
    assert(Geo.mapToGridCell(-74.049f, 40.999f) == 0)
    // ~1.7 DELTA_LON east of the west edge → x=1
    assert(Geo.mapToGridCell(-74.0476f, 40.999f) == 1)
    // ~1.9 DELTA_LAT south of the north edge → y=1 → +250
    assert(Geo.mapToGridCell(-74.049f, 40.9976f) == 250)
  }

  test("cell center inverts mapToGridCell for interior cells") {
    // sample a spread of cells across the 250x400 grid
    for (cell <- Seq(0, 1, 137, 5000, 42_123, 99_875, 99_999)) {
      val lon = Geo.cellCenterLon(cell)
      val lat = Geo.cellCenterLat(cell)
      assert(Geo.mapToGridCell(lon, lat) == cell, s"cell $cell center ($lon,$lat)")
    }
  }

  test("euclideanDistance keeps the cos-of-degrees quirk (GeoUtils.java:222-226)") {
    assert(Geo.euclideanDistance(-73.98f, 40.75f, -73.98f, 40.75f) == 0.0)
    // pure-latitude move with exactly-representable lats: 0.25 deg →
    // 110.25 * 0.25 exactly, independent of cos
    val d = Geo.euclideanDistance(-73.98f, 41.0f, -73.98f, 40.75f)
    assert(math.abs(d - 110.25 * 0.25) < 1e-12)
    // pure-longitude move IS scaled by cos(lat2 in DEGREES-as-radians):
    // cos(40.75 rad) ≈ 0.9637 — the faithful quirk, NOT cos(0.711 rad)
    val d2 = Geo.euclideanDistance(-73.99f, 40.75f, -73.98f, 40.75f)
    assert(math.abs(d2 - 110.25 * 0.01 * math.abs(math.cos(40.75))) < 1e-3)
  }

  test("directionAngle lands in [0,359]") {
    val angles = for {
      dLon <- Seq(-0.01f, 0.0f, 0.01f)
      dLat <- Seq(-0.01f, 0.0f, 0.01f)
      if dLon != 0.0f || dLat != 0.0f
    } yield Geo.directionAngle(-73.98f, 40.75f, -73.98f + dLon, 40.75f + dLat)
    assert(angles.forall(a => a >= 0 && a <= 359), angles)
  }

  test("column forms agree with scala forms") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pts = Seq((-73.98f, 40.75f), (-74.04f, 40.51f), (-73.71f, 40.99f))
    val df = pts.toDF("lon", "lat")
      .select(
        Geo.mapToGridCell($"lon", $"lat").as("cell"),
        Geo.isInNYC($"lon", $"lat").as("in"))
      .collect()
    pts.zip(df).foreach { case ((lon, lat), row) =>
      assert(row.getInt(0) == Geo.mapToGridCell(lon, lat))
      assert(row.getBoolean(1) == Geo.isInNYC(lon, lat))
    }
  }

  test("cellsOnWay covers endpoints and is contiguous in steps") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((-73.98f, 40.75f, -73.96f, 40.76f)).toDF("lon1", "lat1", "lon2", "lat2")
      .select(Geo.cellsOnWay($"lon1", $"lat1", $"lon2", $"lat2").as("cells"))
      .collect()(0).getSeq[Int](0)
    assert(df.head == Geo.mapToGridCell(-73.98f, 40.75f))
    assert(df.last == Geo.mapToGridCell(-73.96f, 40.76f))
    assert(df.nonEmpty)
  }

  /** Direct transcription of GeoUtils.java:107-160 (the reference
    * slope-walk, quirks included) — the SPEC the native SlopeWalkExpr is
    * property-tested against. Kept deliberately line-for-line with the
    * Java source, independent of the engine implementation.
    */
  private def referenceWalk(x1: Int, y1: Int, x2: Int, y2: Int): Seq[Int] = {
    var startX = 0; var startY = 0; var endX = 0; var endY = 0
    if (x1 <= x2) { startX = x1; startY = y1; endX = x2; endY = y2 }
    else { startX = x2; startY = y2; endX = x1; endY = y1 }
    val slope = (endY - startY) / ((endX - startX) + 0.00000001)
    var curX = startX
    var curY = startY
    val cellIds = scala.collection.mutable.ArrayBuffer[Int](curX + (curY * 250))
    while (curX < endX || curY != endY) {
      if (slope > 0) {
        val y = (curX - startX + 0.5) * slope + startY - 0.5
        if (y > curY - 0.05 && y < curY + 0.05) { curX += 1; curY += 1 }
        else if (y < curY) { curX += 1 }
        else { curY += 1 }
      } else {
        val y = (curX - startX + 0.5) * slope + startY + 0.5
        if (y > curY - 0.05 && y < curY + 0.05) { curX += 1; curY -= 1 }
        if (y > curY) { curX += 1 }
        else { curY -= 1 }
      }
      cellIds += curX + (curY * 250)
    }
    cellIds.toSeq
  }

  test("property: SlopeWalkExpr == reference walk on random NYC segments") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // cell coordinate domain of the NYC bbox: x in [0, 250], y in [0, 400]
    val segs = Seq.tabulate(500) { i =>
      (i, rnd.nextInt(251), rnd.nextInt(401), rnd.nextInt(251), rnd.nextInt(401))
    }
    val got = segs.toDF("id", "x1", "y1", "x2", "y2")
      .select($"id", graft.plans.SlopeWalkCells.cellsOnWayExact(
        $"x1", $"y1", $"x2", $"y2").as("cells"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    segs.foreach { case (id, x1, y1, x2, y2) =>
      val expect = referenceWalk(x1, y1, x2, y2)
      assert(got(id) == expect, s"seg ($x1,$y1)->($x2,$y2)")
      // the defensive cap in SlopeWalk must never bind on NYC segments
      assert(expect.length <= 4 * (math.abs(x2 - x1) + math.abs(y2 - y1)) + 64)
    }
  }

  test("slope walk differs from linear interpolation on steep segments") {
    // documents WHY q49 exists next to q30: the reference walker is not
    // linear interpolation
    def interp(x1: Int, y1: Int, x2: Int, y2: Int): Seq[Int] = {
      val steps = math.max(math.abs(x2 - x1), math.abs(y2 - y1))
      (0 to steps).map { i =>
        val fx = if (steps == 0) 0.0 else i.toDouble / steps
        (x1 + math.round(fx * (x2 - x1)).toInt) +
          250 * (y1 + math.round(fx * (y2 - y1)).toInt)
      }
    }
    val steep = Seq((0, 0, 2, 20), (0, 20, 2, 0), (5, 3, 7, 40), (0, 0, 3, 17))
    val diffs = steep.count { case (a, b, c, d) =>
      referenceWalk(a, b, c, d).toSet != interp(a, b, c, d).toSet
    }
    assert(diffs > 0, "expected the walker to diverge from interpolation somewhere")
  }
}
