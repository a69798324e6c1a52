package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the DegenSweep contract: a query over a
  * degenerate input returns a defined frame — never an exception. At
  * 100 TB an empty source/day/language, a referential-integrity-broken
  * shard, a zero-variance column, a null-payload shard, and null rows
  * interleaved with healthy ones are all NORMAL inputs, and the round-12
  * advisor found the first crash of this class in the wild (hillTail's
  * |users| ≤ 1). The round-13 sweeps (tools/DegenSweep, 252 queries ×
  * {empty, tiny, const, nulled, mixed} fixtures = 1260 runs) found 45
  * more; this spec re-runs every formerly-failing query against the
  * fixture class that broke it (the full sweep stays a tool:
  * `runMain graft.tools.DegenSweep`). Each must evaluate to a
  * count ≥ 0.
  */
class DegenerateInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(name: String)(
      write: (org.apache.spark.sql.SparkSession, String, String) => Unit): String = {
    val dir = s"target/degen-spec/$name"
    write(spark, "/root/testdata/sf0.001", dir)
    dir
  }

  private def assertAllEvaluate(dir: String, names: Seq[String]): Unit = {
    val missing = names.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unknown query names: $missing")
    val failures = names.flatMap { name =>
      try { SparkEntry.queries(name)(spark, dir).count(); Nil }
      catch { case e: Throwable => Seq(s"$name: ${e.getClass.getSimpleName}: ${
        Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ")}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // EMPTY (real schemas, zero rows): 30 crashes in four families —
  // NULL driver-scalar reads (SUM over zero rows is SQL NULL;
  // core/Scalars is the fix), .head() dims/seed derivations,
  // zero-centroid literal arrays typing as ARRAY<VOID> and failing at
  // ANALYSIS on getField (Similarity.centOptsArray), and PQ codebook
  // rebuilds shrinking below their declared m sub-spaces. Plus q217,
  // the original hillTail advice find.
  private val emptyFailing = Seq(
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

  test("formerly-failing queries evaluate on an empty fixture") {
    assertAllEvaluate(
      fixture("empty")(tools.DegenSweep.writeFixture(_, _, _, 0)),
      emptyFailing)
  }

  // CONST (unique keys, every other column constant): the zero-variance
  // class — std = 0, max = min with count > 1, a one-symbol vocabulary,
  // a 100 %-duplicate corpus, all embeddings at one point. The full
  // const sweep was clean on first run — these pins keep the
  // mx==mn/div-0 special cases from regressing.
  private val constSensitive = Seq(
    "q157_zone_map", "q164_zorder", "q178_value_drift",
    "q121_robust_stats", "q95_zipf_fit", "q69_surprisal",
    "q62_kmeans", "q252_davies_bouldin", "q129_hist_quantiles",
    "q16_jaccard_neardup", "q32_dedup_clusters", "q174_session_stats")

  test("zero-variance-sensitive queries evaluate on a const fixture") {
    assertAllEvaluate(
      fixture("const")(tools.DegenSweep.writeConstFixture(_, _, _, 48)),
      constSensitive)
  }

  // NULLED (valid keys, every other column NULL): 15 crashes in four
  // families — null embeddings seeding lloydCentroids with null Seqs
  // (fixed at corpusWithNorm: a NULL embedding is not a vector), NULL
  // size() cells in dims derivations (probeBase/powerBase filters), a
  // NULL in q115's Int-encoded length dictionary (null text has no
  // title), and the multimodal Tuple3 encoder on null payloads
  // (mediaTable filter).
  private val nulledFailing = Seq(
    "q115_edit_distance", "q119_power_iteration", "q125_rrf_fusion",
    "q155_hard_negatives", "q171_decode_audit", "q185_ivf_balance",
    "q188_phash_neardup", "q192_ivf_probe_sweep", "q252_davies_bouldin",
    "q31_multimodal", "q55_semantic_dedup", "q62_kmeans",
    "q67_ann_ivf_kmeans", "q91_ann_ivf_pq", "q98_linear_probe")

  test("null-payload-sensitive queries evaluate on a nulled fixture") {
    assertAllEvaluate(
      fixture("nulled")(tools.DegenSweep.writeNulledFixture(_, _, _, 3)),
      nulledFailing)
  }

  // MIXED (null rows unioned with healthy rows, disjoint keys): the
  // interleaved class — a non-empty frame can present a NULL first cell
  // to a head()-style read, and (the actual find) the k-means
  // `vec_id < k` seed rule can come up EMPTY on a non-empty corpus once
  // null embeddings are filtered — zero seeds must mean zero centroids
  // (the empty-corpus contract), not a NULL-cluster update aggregate
  // blowing its k·dims collect bound.
  private val mixedFailing = Seq(
    "q125_rrf_fusion", "q155_hard_negatives", "q185_ivf_balance",
    "q192_ivf_probe_sweep", "q252_davies_bouldin", "q55_semantic_dedup",
    "q62_kmeans", "q67_ann_ivf_kmeans", "q91_ann_ivf_pq")

  test("seedless-kmeans queries evaluate on a mixed null/real fixture") {
    assertAllEvaluate(
      fixture("mixed")(tools.DegenSweep.writeMixedFixture(_, _, _, 3)),
      mixedFailing)
  }
}
