package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Tables._
import graft.functions.Geo
import graft.streaming.TaxiStreams

/** Batch-mode projections of the streaming family onto the driver's
  * oracle scoreboard (VERDICT r1 item 6): the SAME transforms that run
  * under Structured Streaming (TaxiStreams), driven by deterministic
  * ride-shaped rows synthesized from `events` — so the W1/W4 semantics
  * get CORRECTNESS rows, not just ScalaTest coverage.
  *
  * Rides are synthesized exactly like GeoQueries' points (integer math
  * from event_id, mirrored in the DuckDB oracles), with `ts` as event
  * time and `event_id % 2 = 0` as the START flag.
  */
object StreamProjections {

  /** Ride-shaped rows for TaxiStreams: start/end coordinates from the
    * q24 synthesis, eventTime = ts, alternating START/END. Takes any
    * events-shaped DataFrame — batch for the q47/q48 oracles, a
    * streaming source for StreamBench's popular-places throughput leg
    * (the projection is stateless, so it streams unchanged).
    */
  private[graft] def ridesProjection(ev: DataFrame): DataFrame =
    ev.select(
      col("event_id"),
      col("ts").as("eventTime"),
      (col("event_id") % 2 === 0).as("isStart"),
      col("value"),
      (lit(-74.06) + (col("event_id") % 40).cast("double") * 0.01).as("startLon"),
      (lit(40.49) + (expr("event_id div 7") % 53).cast("double") * 0.01).as("startLat"),
      (lit(-74.05) + (expr("event_id div 11") % 35).cast("double") * 0.01).as("endLon"),
      (lit(40.5) + (expr("event_id div 13") % 50).cast("double") * 0.01).as("endLat"))

  private def syntheticRides(spark: SparkSession, d: String): DataFrame =
    ridesProjection(events(spark, d))

  /** PopularPlaces (W1+P2+P4+P5 composition,
    * datastream_java/windows/PopularPlaces.java:52-97) in batch mode:
    * cleanse → branching grid cell → sliding window count → threshold →
    * cell centers. Window geometry matches q10's proven alignment
    * (1 day / 6 hours); the threshold is scaled to the synthetic ride
    * density. Output columns lowercased for the oracle compare.
    */
  def popularPlacesBatch(spark: SparkSession, d: String,
      threshold: Long = 3): DataFrame = {
    import spark.implicits._
    TaxiStreams.popularPlaces(syntheticRides(spark, d), threshold,
        size = "1 day", slide = "6 hours")
      .select($"lon", $"lat", $"windowEnd".as("window_end"),
        $"isStart".as("is_start"), $"cnt")
  }

  /** TravelTimePrediction's FINAL per-key model state (W4/W5,
    * datastream_java/state/TravelTimePrediction.java:120-164) in batch
    * mode, exercising the real keyed-state operator: rides grouped by
    * (start cell, direction bucket) through flatMapGroupsWithState, each
    * group folding its observations into the no-intercept regression
    * sums and emitting the trained slope at group end.
    *
    * Sums are accumulated as 1e9-quantized longs so the fold is
    * order-independent (batch iterators carry no ordering guarantee, and
    * a 100 TB shuffle certainly doesn't) and exactly reproducible by the
    * DuckDB oracle's integer SUM. Direction is computed dest → start —
    * the reference's quirk (TravelTimePrediction.java:133).
    */
  def predictionSlopesBatch(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val obs = syntheticRides(spark, d)
      .filter(Geo.isInNYC($"startLon", $"startLat") && Geo.isInNYC($"endLon", $"endLat"))
      .select(
        Geo.mapToGridCell($"startLon", $"startLat").as("cell"),
        Geo.directionBucket(Geo.directionAngle(
          $"endLon", $"endLat", $"startLon", $"startLat")).as("bucket"),
        Geo.euclideanDistance($"startLon", $"startLat", $"endLon", $"endLat").as("dist"),
        $"value")
      // zero-length rides: direction is atan2 of ±0 noise terms, whose
      // sign conventions differ across engines — and a 0-distance
      // observation trains nothing (xx = xy = 0). Same cut as q24.
      .filter($"dist" > 0.001)
      .select($"cell", $"bucket",
        round($"dist" * $"dist" * 1e9).cast("long").as("xx"),
        round($"dist" * $"value" * 1e9).cast("long").as("xy"))
      .as[(Int, Int, Long, Long)]
    obs.groupByKey { case (cell, bucket, _, _) => (cell, bucket) }
      .flatMapGroupsWithState[(Long, Long, Long), (Int, Int, Double, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((cell, bucket), rows, state: GroupState[(Long, Long, Long)]) =>
          var (sxx, sxy, n) = state.getOption.getOrElse((0L, 0L, 0L))
          rows.foreach { case (_, _, xx, xy) => sxx += xx; sxy += xy; n += 1 }
          state.update((sxx, sxy, n))
          val slope = if (sxx > 0) sxy.toDouble / sxx.toDouble else -1.0
          Iterator((cell, bucket, slope, n))
      }
      .toDF("cell", "bucket", "slope", "n")
  }

  /** The event-time-ordered budget-admission FOLD of
    * streaming/CurationStream.BudgetProcessor, expressed relationally:
    * per source, docs fold in (ts, doc_id) order and a doc is admitted
    * while the budget still has room BEFORE it (used < budget ⇒ admit,
    * used += n) — which is exactly `running_sum − n < budget` with
    * `budget_used = running_sum`. One window per source; CurationStream-
    * Spec asserts this fold row-matches the live transformWithState
    * operator on its 500-doc reverse-arrival fixture.
    */
  def orderedAdmissionFold(docs: DataFrame, budget: Long): DataFrame = {
    import docs.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"ts_s", $"doc_id")
    docs.withColumn("budget_used", sum($"n_tokens").over(w))
      .filter($"budget_used" - $"n_tokens" < budget)
      .select($"doc_id", $"source", $"n_tokens", $"budget_used")
  }

  /** Batch projection of the STREAM-STREAM attribution join
    * (streaming/EventStreams.attributionJoin) onto the oracle
    * scoreboard: the IDENTICAL function runs over the batch events table
    * (`withWatermark` is a no-op on bounded data — the §7.2.2
    * batch≡stream discipline, literally one code path), pairing each
    * purchase with the same user's clicks from the preceding hour.
    * Timestamps surface as epoch micros for the compare.
    *
    * Scale: in batch this is one hash join on user_id with a range
    * residual; in streaming the same predicate is what lets Spark bound
    * both sides' buffered state to the watermark horizon.
    */
  def attributionJoinBatch(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val e = events(spark, d)
    graft.streaming.EventStreams.attributionJoin(
        e.filter($"event_type" === "click"),
        e.filter($"event_type" === "purchase"))
      .select($"user_id", $"purchase_id",
        unix_micros($"p_ts").as("p_ts_us"), unix_micros($"c_ts").as("c_ts_us"),
        $"click_value", $"purchase_value")
  }

  /** Batch projection of `budgetAdmissionOrdered` onto the oracle
    * scoreboard (the q47/q48 pattern): documents get a deterministic
    * pseudo-arrival event time (md5 of the doc id — deliberately NOT
    * doc_id order, so the ordered fold is exercised against an
    * adversarial arrival permutation), then the admission fold runs per
    * source against `budget`.
    *
    * Scale: one hash in the scan stage, one running-sum window per
    * source — the same single-shuffle shape the streaming form's state
    * store replaces; nothing driver-side.
    */
  def budgetAdmissionBatch(spark: SparkSession, d: String,
      budget: Long = 700): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    orderedAdmissionFold(
      documents(spark, d).select($"doc_id", $"source",
        size(tokens($"text")).cast("long").as("n_tokens"),
        pmod(graft.functions.Hashing.md5Bits32(
          concat(lit("curts:"), $"doc_id".cast("string")), 1),
          lit(86400L)).as("ts_s")),
      budget)
  }
}
