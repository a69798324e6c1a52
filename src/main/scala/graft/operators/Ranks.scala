package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase distributed global rank — rankedVocab's machinery
  * (Text.scala) extracted so every operator that needs a total-order
  * rank (RFM quartiles, session percentile picks, curriculum order)
  * rides the same shape instead of a single-partition `Window.orderBy`:
  *
  *  1. `repartitionByRange` on the order columns (a sampled range
  *     shuffle — each partition owns a contiguous slice of the order),
  *  2. per-partition `row_number` (parallel local sorts),
  *  3. driver-collected partition row counts → prefix offsets
  *     (|partitions| scalars, the A3 closed-over-scalar shape),
  *  4. global rank = local rank + partition offset.
  *
  * The `localCheckpoint` pins the sampled range boundaries so the two
  * consumers (the count pass and the rank pass) see the SAME
  * partitioning — without it the range sampler may re-draw and offsets
  * would not match.
  *
  * The order MUST be total (include a tiebreak key), or ranks at
  * partition boundaries become sampling-dependent.
  */
object Ranks {

  /** Append `rankCol` = SQL `rank()` within each group (ties share a
    * rank) WITHOUT a group-partitioned window: one `globalRank` under
    * the total order (groups, values, tiebreaks) — each group is a
    * contiguous range of that order, spread across many range
    * partitions — then per-group ranks recovered arithmetically:
    * rank = (min global rank of the row's (group, value) tie class)
    * − (group's first global rank) + 1. The tie-class minima are one
    * hash aggregate; the per-group offset table is |groups| rows,
    * broadcast. This is how a group whose population out-scales one
    * partition (a dominant language, a hot label) still ranks in
    * parallel.
    *
    * `groups` and `values` must be SIMPLE column references (the
    * re-join after the tie-class aggregate keys on their names);
    * compute derived keys into named columns first.
    */
  def groupRank(df: DataFrame, rankCol: String, groups: Seq[Column],
      values: Seq[Column], ties: Seq[Column]): DataFrame = {
    val gr = globalRank(df, "__gr", groups ++ values ++ ties: _*)
    val goff = gr.groupBy(groups: _*)
      .agg(min(col("__gr")).as("__goff"))
    val gmin = gr.groupBy(groups ++ values: _*)
      .agg(min(col("__gr")).as("__gmin"))
    val groupNames = goff.columns.dropRight(1)
    val tieNames = gmin.columns.dropRight(1)
    gr.join(gmin, tieNames.toSeq)
      .join(broadcast(goff), groupNames.toSeq)
      .withColumn(rankCol, col("__gmin") - col("__goff") + lit(1L))
      .drop("__gr", "__gmin", "__goff")
  }

  /** Append `rankCol` (1-based, long) under the given total order. */
  def globalRank(df: DataFrame, rankCol: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    // repartitionByRange SAMPLES its input in a separate job before the
    // shuffle — without a cache the upstream lineage runs twice (sample
    // + shuffle). Pin it for the pair, release once the checkpoint has
    // materialized.
    val pinned = df.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val parted = pinned
      .repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    pinned.unpersist()
    val sizes = parted.groupBy(col("__pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] = sizes.map(_._1)
      .zip(sizes.scanLeft(0L)(_ + _._2)).toMap
    parted
      .withColumn(rankCol, row_number().over(
        Window.partitionBy(col("__pid")).orderBy(order: _*)).cast("long")
        + element_at(typedLit(offsets), col("__pid")))
      .drop("__pid")
  }
}
