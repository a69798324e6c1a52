package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.functions.Hashing

/** Training-shard materialization — the write path of the corpus
  * pipeline. Documents are assigned to shards by the same
  * partition-independent md5 primitive as hashSplit (membership is a
  * pure function of the doc, so incremental re-materialization never
  * moves a document), laid out one directory per shard with rows sorted
  * by doc_id inside each file.
  *
  * Scale: one hash-partition shuffle to co-locate each shard, a local
  * in-partition sort (no global order — the packing unit is the shard,
  * exactly like packSequences), then a parallel parquet write. Shard
  * count sizes files for the trainer's reader (e.g. ~1 GB each at
  * corpus scale); the `shard=` directory layout gives readers
  * partition pruning for free.
  */
object Sharding {

  /** Deterministic shard id 0..nShards-1 from the md5 of the doc id. */
  def shardOf(idCol: org.apache.spark.sql.Column, nShards: Int) =
    pmod(Hashing.md5Bits32(concat(lit("shard:"), idCol.cast("string")), 1),
      lit(nShards.toLong))

  /** The shard plan: every doc with its shard assignment — the
    * column-level contract `writeShards` materializes.
    */
  def shardPlan(spark: SparkSession, d: String, nShards: Int = 8): DataFrame = {
    import spark.implicits._
    documents(spark, d)
      .select($"doc_id", $"text", $"lang", $"source",
        shardOf($"doc_id", nShards).as("shard"))
  }

  /** q147: shard balance audit — per shard of the q70 plan: doc count,
    * exact whitespace-token sum, and each count's 1e6-quantized share of
    * the total (one double division of exact integers). The writer-side
    * skew check a sharded corpus needs before training: a shard far off
    * 1/n means hot readers and stragglers downstream; the md5 shard
    * hash keeps shares within sampling noise of uniform BY CONSTRUCTION
    * and this query is the evidence.
    *
    * Scale: one (shard) aggregate with map-side combine onto nShards
    * rows; the totals ride a window over those nShards rows.
    */
  def shardBalance(spark: SparkSession, d: String, nShards: Int = 8): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val perShard = shardPlan(spark, d, nShards)
      .select($"shard",
        size(graft.functions.TextFunctions.tokens($"text")).cast("long").as("ntok"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"ntok").as("n_tokens"))
    val w = Window.partitionBy(lit(1))
    perShard
      .withColumn("doc_share_q",
        round($"n_docs".cast("double") / sum($"n_docs").over(w).cast("double")
          * 1000000.0).cast("long"))
      .withColumn("token_share_q",
        round($"n_tokens".cast("double") / sum($"n_tokens").over(w).cast("double")
          * 1000000.0).cast("long"))
  }

  /** q223: shard-local dedup miss audit — for each candidate shard
    * count k: how many of the corpus' near-dup pairs land with both
    * members in the SAME md5 shard (caught by a shard-local dedup pass)
    * vs across shards (silently missed), with the 1e6-quantized miss
    * rate and the random-placement expectation (k−1)/k beside it. The
    * "can I dedup shard-locally" design dial: content-blind hash
    * sharding scatters dup pairs uniformly, so the measured miss rate
    * hugging the (k−1)/k line is the evidence that per-shard dedup is
    * NOT a shortcut — global (band-keyed) candidate generation is
    * load-bearing, at any k.
    *
    * Shape: the memoized exact pair table (q16's lineage) fanned out
    * |shardCounts|-fold against a broadcast k list — |pairs|·5 rows
    * through one map-side-combinable aggregate to |shardCounts| rows.
    * Never touches doc text; at 100 TB the pair table is the already-
    * bucketed dedup output and this is one cheap pass over it.
    */
  def shardDedupMiss(spark: SparkSession, d: String,
      shardCounts: Seq[Int] = Seq(2, 4, 8, 16, 32)): DataFrame = {
    import spark.implicits._
    def shardK(idCol: org.apache.spark.sql.Column) =
      pmod(Hashing.md5Bits32(concat(lit("shard:"), idCol.cast("string")), 1),
        $"n_shards")
    val ks = shardCounts.map(_.toLong).toDF("n_shards")
    Dedup.jaccardPairs(spark, d).select($"x", $"y")
      .crossJoin(broadcast(ks))
      .select($"n_shards",
        (shardK($"x") === shardK($"y")).as("intra"))
      .groupBy($"n_shards")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"intra", 1L).otherwise(0L)).as("n_intra"),
        sum(when(!$"intra", 1L).otherwise(0L)).as("n_cross"))
      .select($"n_shards", $"n_pairs", $"n_intra", $"n_cross",
        round($"n_cross".cast("double") / $"n_pairs".cast("double")
          * lit(1000000.0)).cast("long").as("miss_rate_q6"),
        round(($"n_shards" - 1L).cast("double") / $"n_shards".cast("double")
          * lit(1000000.0)).cast("long").as("random_miss_q6"))
  }

  /** q157: shard zone-map manifest — the per-file min/max statistics a
    * table format (Iceberg/Delta-style data skipping) keeps for every
    * shard, computed for BOTH layouts this engine can write, so the
    * layout choice is made on evidence:
    *
    *  - `hash` (the q70 md5 plan): balanced (q147 proves it) but each
    *    shard's doc_id zone spans essentially the whole corpus —
    *    `id_range` ≈ max_id − min_id everywhere, so a point/range lookup
    *    on doc_id can skip NOTHING.
    *  - `range` (contiguous doc_id blocks of width ⌈span/n⌉ — what
    *    writeShards' sort gives WITHIN files, applied across them):
    *    disjoint zones, so a doc_id predicate prunes all but one shard —
    *    at the price of balance only as good as the id distribution.
    *
    * The classic skew-vs-skipping trade, emitted as one relation:
    * (layout, shard, n_docs, min_id, max_id, id_range, min_chars,
    * max_chars). n_chars zones are kept because length predicates
    * ("drop tiny docs") are the other common skip dimension.
    *
    * Determinism: pure integer min/max/counts. The range layout's block
    * width derives from the corpus id span via one eager scalar (the A3
    * closed-over-scalar shape — q07/q116 precedent).
    *
    * Scale: two |shards|-row aggregates with map-side combine; no
    * windows, no joins. At 100 TB this IS the manifest the writer
    * emits file by file.
    */
  /** q213: shard diversity audit — per shard of the q70 plan: doc
    * count, distinct sources, and the Shannon entropy (bits) of its
    * source mix, 1e12-quantized. The training-order health check a
    * sharded corpus needs beyond q147's SIZE balance: a size-balanced
    * shard that is all one source still trains badly (correlated
    * batches); entropy far below the corpus mix's says the shard hash
    * correlates with source. Uniform-hash sharding keeps every shard's
    * mix near the corpus mix BY CONSTRUCTION — this query is the
    * evidence.
    *
    * Exactness: a float sum of per-source entropy terms would be
    * aggregation-order dependent — each (shard, source) term −p·log₂p
    * quantizes once to a 1e12 integer (the q96 KL discipline) and
    * per-shard totals are exact integer adds.
    *
    * Scale: one (shard, source) aggregate with map-side combine onto
    * |shards|·|sources| cells; everything after runs on those cells.
    */
  def shardDiversity(spark: SparkSession, d: String, nShards: Int = 8): DataFrame = {
    import spark.implicits._
    val cells = shardPlan(spark, d, nShards).select($"shard", $"source")
      .groupBy($"shard", $"source").agg(count(lit(1)).as("c"))
    val totals = cells.groupBy($"shard")
      .agg(sum($"c").as("n_docs"), count(lit(1)).as("n_sources"))
    val p = $"c".cast("double") / $"n_docs".cast("double")
    cells.join(broadcast(totals), "shard")
      .select($"shard", $"n_docs", $"n_sources",
        round(-(p * log2(p)) * lit(1000000000000.0)).cast("long").as("tq"))
      .groupBy($"shard", $"n_docs", $"n_sources")
      .agg(sum($"tq").as("entropy_q12"))
  }

  def shardZoneMap(spark: SparkSession, d: String, nShards: Int = 8): DataFrame = {
    import spark.implicits._
    val docs = documents(spark, d).select($"doc_id", $"n_chars")
    val idr = docs.agg(min($"doc_id"), max($"doc_id")).head()
    // empty corpus → NULL bounds; (0, 0) is inert (no row gets a shard)
    val lo = graft.core.Scalars.longAt(idr, 0, 0L)
    val hi = graft.core.Scalars.longAt(idr, 1, 0L)
    val width = (hi - lo) / nShards + 1
    def zones(tagged: DataFrame, layout: String): DataFrame =
      tagged.groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"),
          min($"doc_id").as("min_id"), max($"doc_id").as("max_id"),
          min($"n_chars").as("min_chars"), max($"n_chars").as("max_chars"))
        .select(lit(layout).as("layout"), $"shard", $"n_docs",
          $"min_id", $"max_id", ($"max_id" - $"min_id").as("id_range"),
          $"min_chars", $"max_chars")
    zones(docs.withColumn("shard", shardOf($"doc_id", nShards)), "hash")
      .unionByName(
        zones(docs.withColumn("shard",
          expr(s"(doc_id - ${lo}L) div ${width}L")), "range"))
  }

  /** q164: z-order layout audit — the Delta/Iceberg OPTIMIZE ZORDER
    * trade made measurable. Orders are normalized onto a 16-bit×16-bit
    * (custkey, order-day) grid, bit-interleaved into a 32-bit Morton
    * code, and binned into fixed z-ranges; the same rows binned by the
    * single-dimension (day) sort are the control. Per (layout, block)
    * zone-map stats show the point: linear blocks are tight on day but
    * span the FULL custkey range (no pruning for customer predicates),
    * z-order blocks have bounded span on BOTH dims — a predicate on
    * either dimension skips most blocks.
    *
    * Scale: the interleave is a scan-stage integer expression (codegen
    * fold over 16 literal bit positions, no UDF); bounds are one 4-scalar
    * driver-bounded aggregate; block ids are fixed-width divisions of
    * the theoretical z range — no sort, no extra pass. The audit itself
    * is one hash aggregate onto ≤ 2·nBlocks cells.
    */
  def zOrderAudit(spark: SparkSession, d: String, nBlocks: Int = 8): DataFrame = {
    import spark.implicits._
    val o = orders(spark, d).select($"o_orderkey", $"o_custkey",
      expr("unix_micros(o_orderdate) div 86400000000").as("dy"))
    val b = o.agg(min($"o_custkey"), max($"o_custkey"),
      min($"dy"), max($"dy")).head()
    // empty orders → NULL bounds; zeros are inert (no row is normalized)
    val (cLo, cHi, dLo, dHi) =
      (graft.core.Scalars.longAt(b, 0, 0L), graft.core.Scalars.longAt(b, 1, 0L),
        graft.core.Scalars.longAt(b, 2, 0L), graft.core.Scalars.longAt(b, 3, 0L))
    // a constant column would make the span 0: Spark's `div 0` yields
    // NULL silently while DuckDB errors — pin the degenerate case to a
    // 1-wide span on BOTH engines (all rows land at coordinate 0)
    val (cW, dW) = (math.max(1L, cHi - cLo), math.max(1L, dHi - dLo))
    val norm = o.select($"o_orderkey",
      expr(s"(o_custkey - ${cLo}L) * 65535L div ${cW}L").as("c16"),
      expr(s"(dy - ${dLo}L) * 65535L div ${dW}L").as("d16"))
    val zv = (0 until 16).map { i =>
      shiftright($"c16", i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright($"d16", i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
    val zWidth = 4294967296L / nBlocks
    val dWidth = 65536L / nBlocks
    val tagged = norm.withColumn("zv", zv)
    val blocks = tagged
      .select(lit("zorder").as("layout"),
        expr(s"zv div ${zWidth}L").as("block"), $"c16", $"d16")
      .unionByName(tagged.select(lit("linear").as("layout"),
        expr(s"d16 div ${dWidth}L").as("block"), $"c16", $"d16"))
    blocks.groupBy($"layout", $"block")
      .agg(count(lit(1)).as("n_rows"),
        min($"c16").as("min_c"), max($"c16").as("max_c"),
        min($"d16").as("min_d"), max($"d16").as("max_d"))
      .withColumn("c_span_q6",
        expr("(max_c - min_c) * 1000000L div 65535L"))
      .withColumn("d_span_q6",
        expr("(max_d - min_d) * 1000000L div 65535L"))
  }

  /** q242: zone-map skip-rate simulation — the q164 layout audit taken
    * to its decision number: sweep `nPreds` equal-width range
    * predicates over EACH dimension against each layout's per-block
    * zone maps and report the fraction of block-checks that prune
    * (block max < lo or min > hi — exactly the parquet min/max skip
    * test a scan planner runs). q164 shows the span geometry; this is
    * the "so how many files does a customer-key query actually skip
    * under each layout" table the OPTIMIZE ZORDER decision is made on —
    * linear stays near 0 on the non-sort dimension, z-order prunes on
    * BOTH.
    *
    * Exactness: predicate edges and skip tests are pure integer
    * comparisons on the exact zone bounds; the one division is the
    * final quantized rate. Shape: the block-stats table is ≤ 2·nBlocks
    * rows — the whole simulation is arithmetic over blocks × preds ×
    * 2 dims (≤ 256 rows), one aggregate to 4 rows.
    */
  def skipRateSim(spark: SparkSession, d: String, nBlocks: Int = 8,
      nPreds: Int = 8): DataFrame = {
    import spark.implicits._
    val w = 65536L / nPreds
    zOrderAudit(spark, d, nBlocks)
      .select($"layout", $"min_c", $"max_c", $"min_d", $"max_d",
        explode(sequence(lit(0L), lit((nPreds - 1).toLong))).as("p"))
      .select($"layout", explode(array(
        struct(lit("c").as("dim"),
          ($"max_c" < $"p" * w || $"min_c" > $"p" * w + (w - 1)).as("skip")),
        struct(lit("d").as("dim"),
          ($"max_d" < $"p" * w || $"min_d" > $"p" * w + (w - 1)).as("skip"))))
        .as("e"))
      .groupBy($"layout", $"e.dim".as("dim"))
      .agg(count(lit(1)).as("n_checks"),
        sum(when($"e.skip", 1L).otherwise(0L)).as("n_skipped"))
      .select($"layout", $"dim", $"n_checks", $"n_skipped",
        round($"n_skipped".cast("double") / $"n_checks".cast("double")
          * lit(1000000.0)).cast("long").as("skip_rate_q6"))
  }

  /** Materialize the z-ordered layout q164 audits: orders re-sorted by
    * their Morton code via ONE range repartition (the OPTIMIZE ZORDER
    * write path — each output file owns a contiguous z-range, so its
    * parquet min/max stats bound BOTH dimensions and either-dim
    * predicates skip files). The interleave is the same scan-stage
    * integer fold as the audit; no global sort — range partitioning +
    * within-partition sort is exactly how a 1000-executor rewrite runs.
    */
  def writeZOrdered(spark: SparkSession, d: String, outDir: String,
      nBlocks: Int = 8): Unit = {
    import spark.implicits._
    val o = orders(spark, d).select($"o_orderkey", $"o_custkey",
      $"o_orderstatus", $"o_totalprice", $"o_orderdate", $"o_orderpriority",
      expr("unix_micros(o_orderdate) div 86400000000").as("dy"))
    val b = o.agg(min($"o_custkey"), max($"o_custkey"),
      min($"dy"), max($"dy")).head()
    // empty orders → NULL bounds; zeros are inert (no row is normalized)
    val (cLo, cHi, dLo, dHi) =
      (graft.core.Scalars.longAt(b, 0, 0L), graft.core.Scalars.longAt(b, 1, 0L),
        graft.core.Scalars.longAt(b, 2, 0L), graft.core.Scalars.longAt(b, 3, 0L))
    val (cW, dW) = (math.max(1L, cHi - cLo), math.max(1L, dHi - dLo))
    val norm = o
      .withColumn("c16", expr(s"(o_custkey - ${cLo}L) * 65535L div ${cW}L"))
      .withColumn("d16", expr(s"(dy - ${dLo}L) * 65535L div ${dW}L"))
    val zv = (0 until 16).map { i =>
      shiftright(col("c16"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(col("d16"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
    norm.withColumn("zv", zv)
      .repartitionByRange(nBlocks, col("zv"))
      .sortWithinPartitions(col("zv"))
      .drop("c16", "d16", "dy")
      .write.mode(SaveMode.Overwrite)
      .parquet(outDir)
  }

  /** Materialize the shards: one directory per shard id, doc_id-sorted
    * within each partition's file.
    */
  def writeShards(spark: SparkSession, d: String, outDir: String,
      nShards: Int = 8): Unit =
    shardPlan(spark, d, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(outDir)

  /** Manifest-committed shard write — the transaction-log discipline a
    * 100 TB materialization needs: data first, then a zone-map manifest
    * written LAST as the commit record (readers treat its presence as
    * the atomic marker, the Delta/Iceberg convention; Spark's own
    * `_SUCCESS` only marks the job, not the contract). Underscore-named
    * so parquet directory listings ignore it. One JSON line per
    * shard: doc count, doc_id and n_chars min/max — enough for a reader
    * to prune shards (the q157 zone-map payload) AND to audit the write
    * (count mismatch ⇒ torn/partial output; `ShardManifestSpec`-style
    * check in PipelineOpsSpec cross-reads data vs manifest).
    *
    * Scale: the stats ride the same single shuffle as the write plan
    * (one aggregate over the shard key); the manifest itself is
    * |shards| rows, driver-bounded by construction.
    */
  def writeShardsWithManifest(spark: SparkSession, d: String,
      outDir: String, nShards: Int = 8): Unit = {
    import spark.implicits._
    writeShards(spark, d, outDir, nShards)
    val stats = shardPlan(spark, d, nShards)
      .select($"shard", $"doc_id", length($"text").cast("long").as("n_chars"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        min($"doc_id").as("min_id"), max($"doc_id").as("max_id"),
        min($"n_chars").as("min_chars"), max($"n_chars").as("max_chars"))
      .orderBy($"shard")
    val statRows = graft.core.Bounded.collect(stats, nShards.toLong,
      "shard manifest stats (nShards rows)")
    val lines = statRows.map { r =>
      s"""{"shard":${r.getLong(0)},"n_docs":${r.getLong(1)},""" +
        s""""min_id":${r.getLong(2)},"max_id":${r.getLong(3)},""" +
        s""""min_chars":${r.getLong(4)},"max_chars":${r.getLong(5)}}"""
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, "_manifest.json"),
      (lines.mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** q193: small-file compaction plan — the OPTIMIZE/bin-packing
    * primitive beside the layout audits (q147 balance, q157 zone maps,
    * q164 z-order): the event log's (event_type, day) ingest partitions
    * are next-fit packed IN DAY ORDER into output files of ≤ `capacity`
    * rows. Day order (not first-fit-decreasing) is deliberate: compacted
    * files stay time-contiguous, so the q157-style min/max day zones of
    * the OUTPUT files remain disjoint and day-predicate pruning
    * survives compaction — an FFD pack would shred the time locality it
    * is supposed to preserve. An oversized single day keeps its own
    * file (next-fit never splits a partition).
    *
    * Scale: the only corpus-sized work is the (type, day) count
    * aggregate (map-side combined, ≤ |types|·|days| cells). The fold
    * runs per type over its calendar-bounded day array — a scan-stage
    * HOF over ≤ |days| elements, the q181 packWaste shape — and the
    * plan it emits is metadata-sized. The DuckDB oracle replays the
    * identical fold per prefix with a single-BIGINT (file, load) state.
    */
  def compactionPlan(spark: SparkSession, d: String,
      capacity: Long = 1000L): DataFrame = {
    import spark.implicits._
    val parts = events(spark, d)
      .groupBy($"event_type",
        expr("unix_micros(ts) div 86400000000L").as("day"))
      .agg(count(lit(1)).as("n_rows"))
    val plan = parts.groupBy($"event_type")
      .agg(sort_array(collect_list(struct($"day", $"n_rows"))).as("ps"))
      .select($"event_type", explode(expr(
        s"""aggregate(ps,
           |  named_struct(
           |    'out', cast(array() as array<struct<day:bigint,n_rows:bigint,out_file:bigint>>),
           |    'f', 0L, 'load', 0L),
           |  (acc, p) -> CASE
           |    WHEN acc.load + p.n_rows > ${capacity}L AND acc.load > 0L
           |    THEN named_struct(
           |      'out', array_append(acc.out,
           |        named_struct('day', p.day, 'n_rows', p.n_rows,
           |                     'out_file', acc.f + 1L)),
           |      'f', acc.f + 1L, 'load', p.n_rows)
           |    ELSE named_struct(
           |      'out', array_append(acc.out,
           |        named_struct('day', p.day, 'n_rows', p.n_rows,
           |                     'out_file', acc.f)),
           |      'f', acc.f, 'load', acc.load + p.n_rows) END,
           |  acc -> acc.out)""".stripMargin)).as("p"))
      .select($"event_type", $"p.day".as("day"),
        $"p.n_rows".as("n_rows"), $"p.out_file".as("out_file"))
    val files = plan.groupBy($"event_type", $"out_file")
      .agg(count(lit(1)).as("file_parts"), sum($"n_rows").as("file_rows"))
    plan.join(files, Seq("event_type", "out_file"))
      .select($"event_type", $"day", $"n_rows", $"out_file",
        $"file_parts", $"file_rows")
  }
}
