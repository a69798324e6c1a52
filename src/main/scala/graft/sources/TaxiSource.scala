package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TaxiRide

/** Taxi-ride source (reference S1/S2: TaxiRideSource and
  * CheckpointedTaxiRideSource under datastream_java/sources/).
  *
  * The reference's replay sources mix three concerns that Spark separates
  * (SURVEY §2.1):
  *  - parsing the gzipped CSV → here, as a *column-expression* parser
  *    that stays inside WholeStageCodegen (scale path) plus the typed
  *    `TaxiRide.fromString` for tests;
  *  - serving-speed / artificial out-of-orderness → a test-harness
  *    generator (graft.streaming.Replay), not an engine operator;
  *  - watermarking → `withWatermark` on the event-time column (Spark owns
  *    the watermark clock); checkpoint/restore (S2) is engine-level via
  *    `writeStream.option("checkpointLocation", ...)` — a replayable file
  *    source gives exactly-once resume with no per-source offset code.
  */
object TaxiSource {

  /** Column-level parser: lines → typed ride columns + eventTime.
    * Handles the START/END time-field swap and blank-coordinate → 0.0f
    * (TaxiRide.java:97-130) entirely in codegen'd expressions.
    */
  def parseLines(lines: DataFrame): DataFrame = {
    val t = split(col("value"), ",")
    def coord(i: Int) =
      when(length(element_at(t, i)) === 0, lit(0.0f))
        .otherwise(element_at(t, i).cast("float"))
    val isStart = element_at(t, 2) === "START"
    val time1 = to_timestamp(element_at(t, 3), TaxiRide.TimePattern)
    val time2 = to_timestamp(element_at(t, 4), TaxiRide.TimePattern)
    lines.select(
      element_at(t, 1).cast("long").as("rideId"),
      isStart.as("isStart"),
      when(isStart, time1).otherwise(time2).as("startTime"),
      when(isStart, time2).otherwise(time1).as("endTime"),
      coord(5).as("startLon"), coord(6).as("startLat"),
      coord(7).as("endLon"), coord(8).as("endLat"),
      element_at(t, 9).cast("short").as("passengerCnt"))
      .withColumn("eventTime", when(col("isStart"), col("startTime")).otherwise(col("endTime")))
  }

  /** Batch scan of a (optionally gzipped) taxi CSV file → typed rides.
    * `spark.read.text` decompresses .gz transparently; at scale the
    * parse is a single codegen'd projection over the scan.
    */
  def readRides(spark: SparkSession, path: String): Dataset[TaxiRide] = {
    import spark.implicits._
    parseLines(spark.read.text(path)).drop("eventTime").as[TaxiRide]
  }

  /** Deduplicate to one START and one END row per rideId — the key is
    * (rideId, isStart), NOT rideId alone: a ride's lifecycle is two
    * events and collapsing them to one would drop every ride's END. The
    * reference's TaxiRide.equals (TaxiRide.java:132-141) hashes by
    * rideId only because its streams carry START and END as the same
    * POJO distinguished by the isStart field; the relational shape
    * makes that distinction part of the dedup key explicitly.
    */
  def dropDuplicateRides(rides: Dataset[TaxiRide]): Dataset[TaxiRide] =
    rides.dropDuplicates("rideId", "isStart")

  /** Inverse of Sinks.kafkaShaped (the TaxiRideSchema deserializer half,
    * datastream_java/utils/TaxiRideSchema.java:31-38): (key, value)
    * payloads → typed rides via the same codegen column parser.
    */
  def fromKafkaShaped(payloads: DataFrame): Dataset[TaxiRide] = {
    import payloads.sparkSession.implicits._
    // a real Kafka source delivers value as BINARY; split() needs a
    // string and ANSI coercion won't cast binary implicitly — cast here
    // (a no-op for the already-string file/memory shapes)
    parseLines(payloads.select(col("value").cast("string").as("value")))
      .drop("eventTime").as[TaxiRide]
  }

  /** convertTrips.sh (P12, src/main/scripts/convertTrips.sh:19): one raw
    * trip → two event rows — START with placeholder end time
    * 1970-01-01 00:00:00, END with real times — globally ordered by event
    * time. The shell sort -S 4G becomes a distributed orderBy (range
    * partition + sort, SURVEY §2.7).
    */
  def tripsToEvents(trips: DataFrame): DataFrame = {
    val placeholder = lit("1970-01-01 00:00:00").cast("timestamp")
    val start = struct(
      lit(true).as("isStart"), col("startTime").as("eventTime"),
      col("startTime"), placeholder.as("endTime"))
    val end = struct(
      lit(false).as("isStart"), col("endTime").as("eventTime"),
      col("startTime"), col("endTime"))
    trips
      .select(col("rideId"), explode(array(start, end)).as("ev"),
        col("startLon"), col("startLat"), col("endLon"), col("endLat"),
        col("passengerCnt"))
      .select(col("rideId"), col("ev.isStart").as("isStart"),
        col("ev.startTime").as("startTime"), col("ev.endTime").as("endTime"),
        col("startLon"), col("startLat"), col("endLon"), col("endLat"),
        col("passengerCnt"), col("ev.eventTime").as("eventTime"))
      .orderBy(col("eventTime"))
  }

  /** Streaming scan of a directory of taxi CSV files (file-drip source):
    * the Structured-Streaming replacement for the reference's
    * SourceFunction replay — files appearing in `dir` become micro-batches
    * with exactly-once tracking.
    */
  def streamRides(spark: SparkSession, dir: String): DataFrame =
    parseLines(spark.readStream.text(dir))
}
