package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.StableNum._

/** The windowed/stateful operator family of the `events` table in
  * streaming form — the same expressions `graft.operators.Windowed` runs
  * in batch (SURVEY §7.2.2: identical window semantics, only the
  * source/watermark differ). Batch-mode results of these transforms are
  * what the driver's q10/q11 oracles check; the streaming tests assert
  * watermark-driven firing on the same logic.
  */
object EventStreams {

  /** Typed event row for MemoryStream-driven tests. */
  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Sliding window count+sum per event type with watermark — q10's
    * aggregation under streaming (append mode fires when the watermark
    * passes a window end).
    */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes",
      size: String = "1 hour", slide: String = "15 minutes",
      threshold: Long = 1): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), stableSum(col("value")).as("sum_value"))
      .filter(col("cnt") >= threshold)
      .select(unix_timestamp(col("w.start")).as("w_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Streaming exact dedup: first occurrence per event_id wins;
    * watermarked so the dedup state is garbage-collected once an id can
    * no longer arrive (the unbounded-state answer for 100 TB streams —
    * state size is bounded by ids per watermark horizon, not by history).
    */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user running totals — keyed mutable state in Update mode (the
    * W4 ValueState shape on the events stream): every batch emits the
    * updated (user, n, total) after folding that batch's events.
    */
  case class UserTotals(user_id: Long, n: Long, total: Double)

  def runningUserTotals(events: Dataset[Event]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Event], state: GroupState[UserTotals]) =>
          val prior = state.getOption.getOrElse(UserTotals(user, 0L, 0.0))
          val updated = evs.foldLeft(prior) { (acc, e) =>
            UserTotals(user, acc.n + 1, acc.total + e.value)
          }
          state.update(updated)
          updated
      }
  }
}
