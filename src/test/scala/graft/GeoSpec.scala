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
}
