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
  * (session, key) means one `.cache()` call and one materialization
  * per lineage per session — warning-free, and every query after the
  * first reuses the in-memory columnar form.
  *
  * Keys use a per-session UUID minted on first touch (weak identity map
  * below) — unique per SparkSession INSTANCE even when two sessions share
  * one SparkContext (`newSession()`); an applicationId key would hand
  * session B a DataFrame bound to session A's state (confs, temp views),
  * and `System.identityHashCode` is not guaranteed collision-free across
  * live objects. Entries whose underlying context has stopped are swept
  * on the next touch, so DataFrames of finished Verify/Bench sessions
  * don't accumulate for the JVM lifetime.
  *
  * A session discarded mid-flight while its context stays alive remains
  * pinned until `release(spark)` — unavoidable while the map holds
  * DataFrames, because a Dataset strongly references its SparkSession
  * (holding the session "weakly" next to its own DataFrames would never
  * collect). Long-lived apps cycling `newSession()` should call
  * `release` when done with a session; entries are small derived tables
  * (sketches, signatures, token arrays) — bounded by the corpus; the
  * blocks themselves live in Spark's block manager under its normal LRU
  * eviction and are dropped eagerly by `release`.
  */
object Memo {
  private val memo = new ConcurrentHashMap[String, (SparkSession, DataFrame)]()

  // Weak identity keys (SparkSession doesn't override equals): a UUID per
  // session instance, collision-free for the JVM lifetime. The weak key
  // costs nothing — memo values pin the session until sweep/release — but
  // guarantees a re-used heap address can never alias a dead session's key.
  private val sessionIds =
    new java.util.WeakHashMap[SparkSession, String]()

  private def sessionId(spark: SparkSession): String =
    sessionIds.synchronized {
      var id = sessionIds.get(spark)
      if (id eq null) {
        id = java.util.UUID.randomUUID().toString
        sessionIds.put(spark, id)
      }
      id
    }

  /** Memoize the plan object per (session, key), building at most once per
    * session (modulo a benign race: two threads may build the same cheap
    * plan; one wins the map). `cache=true` additionally marks the plan
    * for storage — callers share one cached lineage instead of each
    * re-marking an identical plan.
    */
  def apply(spark: SparkSession, cache: Boolean, key: String*)(
      build: => DataFrame): DataFrame = {
    sweep()
    val k = (sessionId(spark) +: cache.toString +: key).mkString(" ")
    val hit = memo.get(k)
    if (hit ne null) hit._2
    else {
      // build OUTSIDE computeIfAbsent: builders recurse into other memoized
      // loaders (docShingles → documents), which would deadlock inside a
      // single-bin compute
      val built = if (cache) build.cache() else build
      val prev = memo.putIfAbsent(k, (spark, built))
      if (prev ne null) prev._2 else built
    }
  }

  /** Drop entries whose session's context has stopped — their cached
    * blocks are gone with the context; holding the DataFrames would pin
    * dead plans (and their session state) for the JVM lifetime.
    */
  private def sweep(): Unit = {
    val it = memo.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
    }
  }

  /** The memo keys currently held for one session (the per-session UUID
    * prefix stripped) — test-only introspection: MemoSpec asserts that
    * query families documented as memo-sharing really collapse to ONE
    * entry per shared intermediate, which is exactly the property that
    * silently broke when a cache key was derived from a default-argument
    * lambda's class name (distinct per call site — round-4 verdict).
    */
  private[graft] def keysFor(spark: SparkSession): Seq[String] = {
    val prefix = sessionId(spark) + " "
    import scala.jdk.CollectionConverters._
    memo.keySet().asScala.toSeq.collect {
      case k if k.startsWith(prefix) => k.stripPrefix(prefix)
    }
  }

  /** Evict one session's entries, unpersisting their cached blocks — the
    * hook for apps that discard sessions (`newSession()`) while the
    * shared context keeps running, where sweep() can't tell the session
    * is gone (the memo's own DataFrames keep it reachable).
    */
  def release(spark: SparkSession): Unit = {
    val it = memo.entrySet().iterator()
    while (it.hasNext) {
      val (s, df) = it.next().getValue
      if (s eq spark) {
        if (!s.sparkContext.isStopped) {
          df.unpersist(blocking = false)
          // localCheckpoint()ed entries store their blocks on the RDD, not
          // the cache manager — unpersist alone would orphan them until
          // GC. Traverse the WHOLE plan: the checkpoint may sit under a
          // Union/Project (dedupLabels memoizes checkpointed-labels ∪
          // singletons), not only at the root
          df.queryExecution.logical.collect {
            case lr: org.apache.spark.sql.execution.LogicalRDD =>
              lr.rdd.unpersist(blocking = false)
          }
        }
        it.remove()
      }
    }
  }
}
