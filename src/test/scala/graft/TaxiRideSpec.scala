package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.TaxiRide
import graft.sources.TaxiSource

class TaxiRideSpec extends AnyFunSuite {

  val startLine = "1,START,2013-01-01 00:00:00,1970-01-01 00:00:00,-73.99,40.75,-73.98,40.74,1"
  val endLine   = "1,END,2013-01-01 00:05:00,2013-01-01 00:00:00,-73.99,40.75,-73.98,40.74,1"

  test("fromString applies the START/END time swap (TaxiRide.java:104-117)") {
    val s = TaxiRide.fromString(startLine)
    assert(s.isStart)
    assert(TaxiRide.fmt(s.startTime) == "2013-01-01 00:00:00")
    assert(TaxiRide.fmt(s.endTime) == "1970-01-01 00:00:00")

    val e = TaxiRide.fromString(endLine)
    assert(!e.isStart)
    assert(TaxiRide.fmt(e.startTime) == "2013-01-01 00:00:00") // swapped back
    assert(TaxiRide.fmt(e.endTime) == "2013-01-01 00:05:00")
    assert(e.eventTime == e.endTime)
    assert(s.eventTime == s.startTime)
  }

  test("serde round-trips both event types") {
    assert(TaxiRide.fromString(startLine).toCsvString == startLine)
    assert(TaxiRide.fromString(endLine).toCsvString == endLine)
  }

  test("blank coordinates parse to 0.0f, not null (TaxiRide.java:119-122)") {
    val r = TaxiRide.fromString("5,START,2013-01-01 00:04:00,1970-01-01 00:00:00,,,-73.98,40.74,1")
    assert(r.startLon == 0.0f && r.startLat == 0.0f)
    assert(r.endLon == -73.98f)
  }

  test("kafka-shaped payloads deserialize back to identical rides (K2 both halves)") {
    val spark = TestSpark.spark
    val path = getClass.getResource("/taxi_rides.csv").getPath
    val rides = TaxiSource.readRides(spark, path)
    val back = TaxiSource.fromKafkaShaped(graft.sources.Sinks.kafkaShaped(rides))
      .collect().sortBy(r => (r.rideId, !r.isStart))
    assert(back.toSeq == rides.collect().sortBy(r => (r.rideId, !r.isStart)).toSeq)
  }

  test("dropDuplicateRides dedups by (rideId, isStart) identity") {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = TaxiRide.fromString(startLine)
    val dup = r.copy(passengerCnt = 9) // differs in payload, same identity
    val out = TaxiSource.dropDuplicateRides(Seq(r, dup, r).toDS()).collect()
    assert(out.length == 1 && out(0).rideId == 1)
  }

  test("random NYC points land inside the bbox (GeoUtils.java:199-211)") {
    val rand = new scala.util.Random(42)
    (1 to 100).foreach { _ =>
      val lon = graft.functions.Geo.randomNYCLon(rand)
      val lat = graft.functions.Geo.randomNYCLat(rand)
      assert(lon >= -74.05f && lon <= -73.7f, lon)
      assert(lat >= 40.5f && lat <= 41.0f, lat)
    }
  }

  test("file scan parses the fixture, column parser == scala parser") {
    val spark = TestSpark.spark
    val path = getClass.getResource("/taxi_rides.csv").getPath
    val rides = TaxiSource.readRides(spark, path).collect().sortBy(r => (r.rideId, !r.isStart))
    assert(rides.length == 12)

    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    val expected = lines.map(TaxiRide.fromString).sortBy(r => (r.rideId, !r.isStart))
    assert(rides.toSeq == expected)
    // blank-coordinate ride
    assert(rides.filter(_.rideId == 5).forall(_.startLon == 0.0f))
  }
}
