package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions._

/** The corpus-curation pipeline in STREAMING form — the continuous-ingest
  * counterpart of `operators.Pipeline.curateCorpus`: a crawl feed is
  * quality-gated in the scan stage, content-deduplicated with
  * watermark-bounded state, and admitted against a per-source token
  * budget held in keyed state. Same column expressions as the batch
  * pipeline (SURVEY §7.2.2's batch≡stream discipline); only the
  * source/watermark/state plumbing differs.
  */
object CurationStream {

  /** A crawl-feed document row for MemoryStream-driven tests. */
  case class StreamDoc(doc_id: Long, ts: Timestamp, text: String, source: String)

  /** An admission decision: the doc, its token cost, and the source
    * budget consumed through (and including) it.
    */
  case class Admitted(doc_id: Long, source: String, n_tokens: Long, budget_used: Long)

  /** Scan-stage quality gate — the streaming twin of the batch
    * pipeline's filter: minimum token count and a top-token-fraction
    * repetition cap, all stateless column math (no watermark needed).
    */
  def qualityGate(docs: DataFrame, minTokens: Int = 5,
      maxTopFrac: Double = 0.8): DataFrame = {
    val ws = tokens(col("text"))
    val top = aggregate(
      transform(ws, t => size(filter(ws, x => x === t))),
      lit(0), (acc, c) => greatest(acc, c))
    docs
      .withColumn("n_tokens", size(ws).cast("long"))
      .filter(col("n_tokens") >= minTokens &&
        top.cast("double") / col("n_tokens") <= maxTopFrac)
  }

  /** Watermarked exact content dedup: first occurrence of a fingerprint
    * wins; state is GC'd past the watermark horizon (bounded, like
    * EventStreams.dedupStream but keyed on CONTENT, not id — re-crawled
    * pages dedup even under new ids).
    */
  def contentDedup(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", md5Fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Per-source token-budget admission: keyed running state holds the
    * tokens consumed per source; a doc is admitted while the budget has
    * room (the "stop ingesting this source" back-pressure of a
    * continuous pipeline). Batch arrivals are folded in doc_id order so
    * admission is deterministic regardless of partition arrival order.
    * State is one long per source — bounded by |sources|.
    */
  def budgetAdmission(docs: Dataset[StreamDoc], budget: Long): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, batch: Iterator[StreamDoc], state: GroupState[Long]) =>
          var used = state.getOption.getOrElse(0L)
          val out = batch.toSeq.sortBy(_.doc_id).flatMap { d0 =>
            val n = d0.text.toLowerCase.split("\\s+").length.toLong
            if (used < budget) {
              used += n
              Some(Admitted(d0.doc_id, source, n, used))
            } else None
          }
          state.update(used)
          out.iterator
      }
  }

  /** The composed continuous pipeline: gate → content-dedup → budget. */
  def curate(docs: DataFrame, budget: Long = 1000L,
      watermark: String = "10 minutes"): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    val deduped = contentDedup(qualityGate(docs), watermark)
      .select(col("doc_id"), col("ts"), col("text"), col("source"))
      .as[StreamDoc]
    budgetAdmission(deduped, budget)
  }
}
