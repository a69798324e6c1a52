package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memoization of shared DataFrame lineages.
  *
  * Several operators build the same intermediate (the shingle table, the
  * MinHash signatures, the quantized-embedding corpus). Round 1 cached
  * each privately, so a bench run re-cached identical plans per query
  * ("Asked to cache already cached data" spam in BENCH_r01.json) and paid
  * the build repeatedly. Memoizing the *DataFrame object* per
  * (application, key) means one `.cache()` call and one materialization
  * per lineage per session — warning-free, and every query after the
  * first reuses the in-memory columnar form.
  *
  * Keys include the Spark applicationId so a fresh session (new Verify /
  * Bench process) never sees DataFrames bound to a stopped context.
  * Entries are small derived tables (sketches, signatures, token arrays)
  * — bounded by the corpus; the blocks themselves live in Spark's block
  * manager under its normal LRU eviction.
  */
object Memo {
  private val memo = new ConcurrentHashMap[String, DataFrame]()

  /** Memoize the plan object per (app, key), building at most once per
    * session (modulo a benign race: two threads may build the same cheap
    * plan; one wins the map). `cache=true` additionally marks the plan
    * for storage — callers share one cached lineage instead of each
    * re-marking an identical plan.
    */
  def apply(spark: SparkSession, cache: Boolean, key: String*)(
      build: => DataFrame): DataFrame = {
    val k = (spark.sparkContext.applicationId +: cache.toString +: key).mkString(" ")
    val hit = memo.get(k)
    if (hit ne null) hit
    else {
      // build OUTSIDE computeIfAbsent: builders recurse into other memoized
      // loaders (docShingles → documents), which would deadlock inside a
      // single-bin compute
      val built = if (cache) build.cache() else build
      val prev = memo.putIfAbsent(k, built)
      if (prev ne null) prev else built
    }
  }
}
