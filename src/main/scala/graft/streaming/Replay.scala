package graft.streaming

import scala.util.Random

import graft.core.TaxiRide

/** Test-harness replay generator — the engine-external half of the
  * reference's TaxiRideSource (S1): serving-speed and artificial
  * out-of-orderness are properties of how data ARRIVES, not operators, so
  * in Spark they live in the harness that feeds MemoryStream
  * (SURVEY §2.1 S1). Deterministic (seeded) so streaming tests are
  * repeatable.
  */
object Replay {

  /** Bounded random delay per event (TaxiRideSource.getNormalDelayMsecs,
    * TaxiRideSource.java:231-238: |gaussian| capped at maxDelay), then
    * re-sorted by delayed arrival time — yields an event stream that is
    * out of order by at most `maxDelaySecs`, like the reference source.
    */
  def withBoundedDelay(rides: Seq[TaxiRide], maxDelaySecs: Int, seed: Long): Seq[TaxiRide] = {
    val rnd = new Random(seed)
    val maxMs = maxDelaySecs * 1000L
    rides
      .map { r =>
        val delay = math.min((math.abs(rnd.nextGaussian()) * maxMs / 2).toLong, maxMs)
        (r.eventTime.getTime + delay, r)
      }
      .sortBy(_._1)
      .map(_._2)
  }

  /** Micro-batch slices of a replay in arrival order — feed each slice to
    * a MemoryStream and `processAllAvailable()` between slices to watch
    * watermarks advance (CheckpointedTaxiRideSource's in-order replay is
    * the maxDelaySecs = 0 case).
    */
  def batches(rides: Seq[TaxiRide], batchSize: Int): Seq[Seq[TaxiRide]] =
    rides.grouped(batchSize).map(_.toSeq).toSeq
}
