package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities — the co-located-join strategy for repeated
  * big⋈big joins at scale (builder prompt: "bucketing for co-located
  * joins"). Writing both fact tables bucketed by the join key lets every
  * subsequent join run WITHOUT a shuffle exchange on either side: the
  * planner sees compatible HashPartitioning from the bucket spec. At
  * 100 TB, paying one bucketed write amortizes over every downstream
  * join/aggregation on that key — the batch analog of Flink's
  * pre-partitioned state.
  *
  * BucketingSpec asserts the join plan contains no Exchange.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets, so
    * sort-merge join also skips the sort).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — shuffle-free. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
