package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Mail
import graft.sources.{MailSource, Sinks}

class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("writeDelimited(K4) round-trips through readMailRecords(S3)") {
    import spark.implicits._
    val mails = MailSource.readMailRecords(spark,
      getClass.getResource("/mails.txt").getPath).collect().sortBy(_.messageId)
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_").toString + "/out"
    Sinks.writeDelimited(mails.toSeq.toDF(), dir, Mail.FieldDelim, Mail.RecordDelim)
    val back = MailSource.readMailRecords(spark, dir).collect().sortBy(_.messageId)
    assert(back.toSeq == mails.toSeq)
  }

  test("kafkaShaped payloads round-trip through TaxiRide.fromString (K2 serde)") {
    import spark.implicits._
    val rides = graft.sources.TaxiSource.readRides(spark,
      getClass.getResource("/taxi_rides.csv").getPath)
    val payloads = Sinks.kafkaShaped(rides).as[(String, String)].collect()
    assert(payloads.length == 12)
    payloads.foreach { case (key, value) =>
      val r = graft.core.TaxiRide.fromString(value)
      assert(r.rideId.toString == key)
    }
  }

  test("esShaped documents have the reference JSON shape (K3)") {
    import spark.implicits._
    val windowCounts = Seq((java.sql.Timestamp.valueOf("2013-01-01 00:15:00"),
      40.75f, -73.98f, true, 25L))
      .toDF("windowEnd", "lat", "lon", "isStart", "cnt")
    val doc = Sinks.esShaped(windowCounts).as[String].collect()(0)
    assert(doc.contains("\"location\":\"40.75,-73.98\"")) // lat,lon order
    assert(doc.contains("\"cnt\":25"))
    assert(doc.contains("\"isStart\":true"))
  }

  test("sketches handle empty and sub-n-gram documents") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq("", "one", "two words", "now three words here").toDF("text")
      .select(graft.functions.Hashing.shingles(
        graft.functions.TextFunctions.tokens($"text"), 3).as("sh"),
        graft.functions.Hashing.simhash(
          graft.functions.TextFunctions.tokens($"text")).as("sk"))
    val rows = docs.collect()
    assert(rows(0).getSeq[String](0).isEmpty) // no shingles under 3 tokens
    assert(rows(1).getSeq[String](0).isEmpty)
    assert(rows(2).getSeq[String](0).isEmpty)
    assert(rows(3).getSeq[String](0).length == 2)
    assert(rows.forall(r => { r.getLong(1); true })) // simhash total, no NPE
  }
}
