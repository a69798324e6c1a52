package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** Loud bound guards for driver-side collects.
  *
  * Every `collect()` in the operators is DESIGNED to be driver-bounded
  * (centroids are k·dims, partition offsets are |partitions|, BPE merges
  * are nMerges…). At 100× scale a violated assumption must fail with a
  * message naming the site and the bound — not OOM the driver three
  * stages later. The guard is memory-safe by construction: `limit
  * (bound+1)` means at most bound+1 rows ever reach the driver, and a
  * result of exactly bound+1 rows proves the bound is violated (so the
  * returned prefix is complete whenever the require passes).
  */
object Bounded {
  // a DataFrame IS Dataset[Row] — one definition of the bound semantics
  def collect(df: DataFrame, bound: Long, what: String): Array[Row] =
    collectDs(df, bound, what)

  def collectDs[T](ds: Dataset[T], bound: Long, what: String): Array[T] = {
    val lim = math.min(bound + 1, Int.MaxValue.toLong).toInt
    val rows = ds.limit(lim).collect()
    require(rows.length <= bound,
      s"$what: driver collect exceeded its design bound of $bound rows — " +
        "this lineage is no longer driver-bounded at this scale; re-shard " +
        "it or raise the bound deliberately")
    rows
  }
}
