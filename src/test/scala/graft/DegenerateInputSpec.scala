package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the DegenSweep contract: a query over an EMPTY
  * input (real schemas, zero rows) returns a defined frame — never an
  * exception. At 100 TB an empty input is a normal state (a new source
  * with no documents, a day partition before ingest, a language with no
  * members), and the round-12 advisor found one crash of this class in
  * the wild (hillTail's |users| ≤ 1). The round-13 sweep
  * (tools/DegenSweep, 252 queries × {empty, tiny} fixtures) found 30
  * more, in four families:
  *
  *  - driver-side scalar reads: `agg(sum(...)).head().getLong(0)` NPEs
  *    because SUM over zero rows is NULL (core/Scalars is the fix);
  *  - `.head()` dims/seed derivations on an empty corpus;
  *  - zero-centroid literal arrays typing as ARRAY<VOID>, failing at
  *    ANALYSIS on `getField` (Similarity.centOptsArray is the fix);
  *  - k-means codebook rebuilds shrinking below their declared m
  *    sub-spaces when the update aggregate is empty.
  *
  * This spec re-runs every formerly-failing query against the empty
  * fixture (the full 504-run sweep stays a tool: `runMain
  * graft.tools.DegenSweep`). Each must evaluate to a count ≥ 0.
  */
class DegenerateInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the 30 queries DegenSweep flagged before the round-13 hardening,
  // plus q217 (the original hillTail advice find)
  private val formerlyFailing = Seq(
    "q116_bm25", "q119_power_iteration", "q122_pmi_collocations",
    "q123_bfs_hops", "q125_rrf_fusion", "q155_hard_negatives",
    "q157_zone_map", "q164_zorder", "q178_value_drift",
    "q182_bm25_ceiling", "q185_ivf_balance", "q192_ivf_probe_sweep",
    "q217_hill_tail", "q237_retrieval_eval", "q242_skip_rate",
    "q248_arm_agreement", "q252_davies_bouldin", "q55_semantic_dedup",
    "q62_kmeans", "q67_ann_ivf_kmeans", "q69_surprisal",
    "q74_calibrated_filter", "q81_calibrated_approx",
    "q83_interp_surprisal", "q84_dsir_weights", "q89_backoff_surprisal",
    "q90_dsir_hashed", "q91_ann_ivf_pq", "q96_source_divergence",
    "q98_linear_probe")

  private lazy val emptyDir: String = {
    val dir = "target/degen-spec/empty"
    tools.DegenSweep.writeFixture(spark, "/root/testdata/sf0.001", dir, 0)
    dir
  }

  // the zero-variance class: unique keys, every other column constant
  // (std = 0, max = min with count > 1, a one-symbol vocabulary, a
  // 100 %-duplicate corpus, all embeddings at one point). The full
  // const sweep was clean on first run — these pins keep the
  // mx==mn/div-0 special cases (zone map, z-order, drift, robust
  // stats, Zipf, k-means) from regressing.
  private val constSensitive = Seq(
    "q157_zone_map", "q164_zorder", "q178_value_drift",
    "q121_robust_stats", "q95_zipf_fit", "q69_surprisal",
    "q62_kmeans", "q252_davies_bouldin", "q129_hist_quantiles",
    "q16_jaccard_neardup", "q32_dedup_clusters", "q174_session_stats")

  private lazy val constDir: String = {
    val dir = "target/degen-spec/const"
    tools.DegenSweep.writeConstFixture(spark, "/root/testdata/sf0.001", dir, 48)
    dir
  }

  test("zero-variance-sensitive queries evaluate on a const fixture") {
    val missing = constSensitive.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unknown query names: $missing")
    val failures = constSensitive.flatMap { name =>
      try { SparkEntry.queries(name)(spark, constDir).count(); Nil }
      catch { case e: Throwable => Seq(s"$name: ${e.getClass.getSimpleName}: ${
        Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ")}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // the null-payload class: valid keys, every other column NULL (a
  // failed enrichment join, a schema-evolved source, a tombstoned
  // ingest). The nulled sweep found 15 crashes in four families: null
  // embeddings seeding lloydCentroids with null Seqs (fixed at
  // corpusWithNorm — a NULL embedding is not a vector), NULL size()
  // cells in dims derivations (probeBase/powerBase filters), a NULL in
  // q115's Int-encoded length dictionary (null text has no title), and
  // the multimodal Tuple3 encoder on null payloads (mediaTable filter).
  private val nulledFailing = Seq(
    "q115_edit_distance", "q119_power_iteration", "q125_rrf_fusion",
    "q155_hard_negatives", "q171_decode_audit", "q185_ivf_balance",
    "q188_phash_neardup", "q192_ivf_probe_sweep", "q252_davies_bouldin",
    "q31_multimodal", "q55_semantic_dedup", "q62_kmeans",
    "q67_ann_ivf_kmeans", "q91_ann_ivf_pq", "q98_linear_probe")

  private lazy val nulledDir: String = {
    val dir = "target/degen-spec/nulled"
    tools.DegenSweep.writeNulledFixture(spark, "/root/testdata/sf0.001", dir, 3)
    dir
  }

  test("null-payload-sensitive queries evaluate on a nulled fixture") {
    val missing = nulledFailing.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unknown query names: $missing")
    val failures = nulledFailing.flatMap { name =>
      try { SparkEntry.queries(name)(spark, nulledDir).count(); Nil }
      catch { case e: Throwable => Seq(s"$name: ${e.getClass.getSimpleName}: ${
        Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ")}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // the interleaved class: null-payload rows UNIONed with healthy rows
  // under disjoint keys. Distinct from all-null: a non-empty frame can
  // now present a NULL first cell to a head()-style read, and (the
  // actual find) the k-means `vec_id < k` seed rule can come up EMPTY
  // on a non-empty corpus once null embeddings are filtered — zero
  // seeds must mean zero centroids (the empty-corpus contract), not a
  // NULL-cluster update aggregate blowing its k·dims collect bound.
  private val mixedFailing = Seq(
    "q125_rrf_fusion", "q155_hard_negatives", "q185_ivf_balance",
    "q192_ivf_probe_sweep", "q252_davies_bouldin", "q55_semantic_dedup",
    "q62_kmeans", "q67_ann_ivf_kmeans", "q91_ann_ivf_pq")

  private lazy val mixedDir: String = {
    val dir = "target/degen-spec/mixed"
    tools.DegenSweep.writeMixedFixture(spark, "/root/testdata/sf0.001", dir, 3)
    dir
  }

  test("seedless-kmeans queries evaluate on a mixed null/real fixture") {
    val missing = mixedFailing.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unknown query names: $missing")
    val failures = mixedFailing.flatMap { name =>
      try { SparkEntry.queries(name)(spark, mixedDir).count(); Nil }
      catch { case e: Throwable => Seq(s"$name: ${e.getClass.getSimpleName}: ${
        Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ")}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("formerly-failing queries evaluate on an empty fixture") {
    val missing = formerlyFailing.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unknown query names: $missing")
    val failures = formerlyFailing.flatMap { name =>
      try { SparkEntry.queries(name)(spark, emptyDir).count(); Nil }
      catch { case e: Throwable => Seq(s"$name: ${e.getClass.getSimpleName}: ${
        Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ")}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
