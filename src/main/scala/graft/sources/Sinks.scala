package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

import graft.core.TaxiRide

/** Sink surface (reference K1-K4), re-expressed for an offline
  * environment: the Kafka- and Elasticsearch-shaped sinks produce exactly
  * the bytes/documents the reference produces, behind small traits so a
  * real connector can be plugged in where the jars exist (SURVEY §2.2).
  */
object Sinks {

  /** K1: console sink — batch `show`, streaming `format("console")`. */
  def console(df: DataFrame, rows: Int = 20): Unit = df.show(rows, truncate = false)

  /** K4: delimited file sink with arbitrary record/field delimiters
    * (writeAsCsv with the exotic ##//## / #|# layout,
    * MBoxParser.java:83). Standard delimiters should use df.write.csv;
    * this covers the multi-char case via concat + text(lineSep).
    */
  def writeDelimited(df: DataFrame, path: String,
      fieldDelim: String, recordDelim: String): Unit = {
    // coalesce each cell: concat is null if ANY argument is null, and
    // the text writer then emits an empty record — a silently vanished
    // row; null cells serialize as empty fields instead
    val joined = df.columns.map(c => coalesce(col(c).cast("string"), lit("")))
      .reduceLeft((a, b) => concat(a, lit(fieldDelim), b))
    df.select(joined.as("value"))
      .write.option("lineSep", recordDelim).mode("overwrite").text(path)
  }

  /** K2 serde: rides → Kafka-shaped (key, value) byte payload using the
    * reference CSV layout incl. the START/END time swap
    * (TaxiRideSchema.java:31-38). Feed `.writeStream.format("kafka")`
    * where a Kafka jar exists; write to files/console offline.
    */
  def kafkaShaped(rides: Dataset[TaxiRide]): DataFrame = {
    import rides.sparkSession.implicits._
    rides.map(r => (r.rideId.toString, r.toCsvString)).toDF("key", "value")
  }

  /** K3: Elasticsearch-shaped JSON documents for window results
    * `{time, location: "lat,lon", isStart, cnt}`
    * (PopularPlacesToES.java:136-140); `location` is "lat,lon" order.
    */
  def esShaped(windowCounts: DataFrame): DataFrame =
    windowCounts.select(to_json(struct(
      col("windowEnd").as("time"),
      concat(col("lat"), lit(","), col("lon")).as("location"),
      col("isStart"),
      col("cnt"))).as("doc"))

  /** Pluggable ride sink trait — file/console offline, Kafka/ES where
    * available (S4/K2/K3 connector shells, SURVEY §7.2.6).
    */
  trait RideSink {
    def write(rides: Dataset[TaxiRide]): Unit
  }

  class FileRideSink(path: String) extends RideSink {
    def write(rides: Dataset[TaxiRide]): Unit = {
      import rides.sparkSession.implicits._
      rides.map(_.toCsvString).write.mode("overwrite").text(path)
    }
  }

  class ConsoleRideSink extends RideSink {
    def write(rides: Dataset[TaxiRide]): Unit = console(rides.toDF())
  }
}
