package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family from SURVEY.md §2 (plus the training-data-pipeline
  * extensions) is exposed as a named query over the driver's parquet tables,
  * with an equivalent DuckDB SQL oracle where the semantics are
  * SQL-expressible. Streaming/stateful operators are additionally covered
  * by ScalaTest suites (they cannot be oracle-checked through a batch
  * parquet dump).
  *
  * Cross-engine determinism: double aggregates go through exact DECIMAL
  * sums (see graft.functions.StableNum) so results are bit-identical to the
  * DuckDB oracle regardless of partitioning/parallelism.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q02_filter_project"  -> ((s, d) => Relational.filterProject(s, d)),
    "q03_join_agg"        -> ((s, d) => Relational.joinAgg(s, d)),
    "q04_month_user_count" -> ((s, d) => Relational.monthUserCount(s, d)),
    "q05_member_otm"      -> ((s, d) => Relational.memberOTM(s, d)),
    "q06_self_join"       -> ((s, d) => Relational.selfJoinPairs(s, d)),
    "q20_topk_orders"     -> ((s, d) => Relational.topKOrders(s, d)),
    "q21_distinct"        -> ((s, d) => Relational.distinctPairs(s, d)),
    "q22_set_ops"         -> ((s, d) => Relational.unionEndpoints(s, d)),
    "q07_tfidf"           -> ((s, d) => Text.tfIdf(s, d)),
    "q08_doc_frequency"   -> ((s, d) => Text.docFrequency(s, d)),
    "q17_lang_id"         -> ((s, d) => Text.langId(s, d)),
    "q18_quality_score"   -> ((s, d) => Text.qualityScore(s, d)),
    "q19_token_stats"     -> ((s, d) => Text.tokenStats(s, d)),
    "q26_fingerprint"     -> ((s, d) => Text.fingerprint(s, d)),
    "q27_rolling_fp"      -> ((s, d) => Text.rollingFp(s, d)),
    "q10_window_sliding"  -> ((s, d) => Windowed.slidingCounts(s, d)),
    "q11_window_tumbling" -> ((s, d) => Windowed.tumblingUserCounts(s, d)),
    "q28_sessionize"      -> ((s, d) => Windowed.sessionize(s, d)),
    "q12_regression_origin" -> ((s, d) => Regression.slopePerKey(s, d)),
    "q09_dedup_exact"     -> ((s, d) => Dedup.exact(s, d)),
    "q16_jaccard_neardup" -> ((s, d) => Dedup.jaccardPairs(s, d)),
    "q15_minhash_lsh"     -> ((s, d) => Dedup.minhashLsh(s, d)),
    "q23_simhash"         -> ((s, d) => Dedup.simhashPairs(s, d)),
    "q14_knn_cosine"      -> ((s, d) => Similarity.knnBruteForce(s, d)),
    "q25_embed_neardup"   -> ((s, d) => Similarity.embeddingNearDup(s, d)),
    "q29_ann_lsh"         -> ((s, d) => Similarity.annLsh(s, d)),
    "q13_pagerank"        -> ((s, d) => Graph.pageRank(s, d)),
    "q24_grid_cells"      -> ((s, d) => GeoQueries.gridCells(s, d)),
    "q30_cells_on_way"    -> ((s, d) => GeoQueries.cellsOnWayQuery(s, d)),
    "q49_cells_on_way_exact" -> ((s, d) => GeoQueries.cellsOnWayExactQuery(s, d)),
    "q47_popular_places"  -> ((s, d) => StreamProjections.popularPlacesBatch(s, d)),
    "q48_prediction_slopes" -> ((s, d) => StreamProjections.predictionSlopesBatch(s, d)),
    "q31_multimodal"      -> ((s, d) => graft.multimodal.Multimodal.featureSummary(s, d)),
    "q32_dedup_clusters"  -> ((s, d) => Dedup.dedupClusters(s, d)),
    "q33_salted_agg"      -> ((s, d) => Relational.saltedAgg(s, d)),
    "q34_asof_join"       -> ((s, d) => Relational.asofJoin(s, d)),
    "q35_member_otd"      -> ((s, d) => Relational.memberOTDay(s, d)),
    "q36_distinct_stats"  -> ((s, d) => Relational.distinctStats(s, d)),
    "q37_rollup"          -> ((s, d) => Relational.rollupCounts(s, d)),
    "q38_percentiles"     -> ((s, d) => Relational.percentiles(s, d)),
    "q39_ann_ivf"         -> ((s, d) => Similarity.annIvf(s, d)),
    "q40_anti_join"       -> ((s, d) => Relational.antiSemiJoin(s, d)),
    "q41_session_window"  -> ((s, d) => Windowed.sessionWindows(s, d)),
    "q42_curation_pipeline" -> ((s, d) => Pipeline.curateCorpus(s, d)),
    "q43_asof_custom"     -> ((s, d) => Relational.asofJoinCustom(s, d)),
    "q44_approx_stats"    -> ((s, d) => Relational.approxStats(s, d)),
    "q45_intersect"       -> ((s, d) => Relational.intersectUsers(s, d)),
    "q46_except"          -> ((s, d) => Relational.exceptUsers(s, d)),
    "q50_normalize"       -> ((s, d) => Text.normalizeAdjacent(s, d)),
    "q51_repetition"      -> ((s, d) => Text.repetitionStats(s, d)),
    "q52_hash_split"      -> ((s, d) => Sampling.hashSplit(s, d)),
    "q53_stratified_sample" -> ((s, d) => Sampling.stratifiedSample(s, d)),
    "q54_domain_mixture"  -> ((s, d) => Sampling.domainMixture(s, d)),
    "q55_semantic_dedup"  -> ((s, d) => Similarity.semanticDedup(s, d)),
    "q56_chunking"        -> ((s, d) => Text.chunk(s, d)),
    "q57_seq_packing"     -> ((s, d) => Sampling.packSequences(s, d)),
    "q58_label_centroids" -> ((s, d) => Similarity.labelCentroids(s, d)),
    "q59_decontaminate"   -> ((s, d) => Contamination.decontaminate(s, d)),
    "q60_pii_scan"        -> ((s, d) => Text.piiScan(s, d)),
    "q61_boilerplate"     -> ((s, d) => Contamination.boilerplate(s, d)),
    "q62_kmeans"          -> ((s, d) => Similarity.kmeansAssign(s, d)),
    "q63_split_leakage"   -> ((s, d) => Sampling.splitLeakage(s, d)),
    "q64_bpe_pairs"       -> ((s, d) => Text.bpePairCounts(s, d)),
    "q65_mixture_materialize" -> ((s, d) => Sampling.materializeMixture(s, d)),
    "q66_centroid_outliers" -> ((s, d) => Similarity.centroidOutliers(s, d)),
    "q67_ann_ivf_kmeans"  -> ((s, d) => Similarity.annIvfKmeans(s, d)),
    "q68_substring_dup"   -> ((s, d) => Dedup.substringDupCoverage(s, d)),
    "q69_surprisal"       -> ((s, d) => Text.surprisal(s, d)),
    "q70_shard_plan"      -> ((s, d) =>
      Sharding.shardPlan(s, d).select("doc_id", "lang", "source", "shard")),
    "q71_incremental_dedup" -> ((s, d) => Dedup.incrementalDedup(s, d)),
    "q72_tokenize_ids"    -> ((s, d) => Text.tokenizeIds(s, d)),
    "q73_bigram_lm"       -> ((s, d) => Text.bigramLm(s, d)),
    "q74_calibrated_filter" -> ((s, d) => Text.calibratedFilter(s, d)),
    "q75_pack_materialize" -> ((s, d) => Sampling.materializePacks(s, d)),
    "q76_corpus_report"   -> ((s, d) => Text.corpusReport(s, d)),
    "q77_bigram_surprisal" -> ((s, d) => Text.bigramSurprisal(s, d)),
    "q78_crossmodal_quality" -> ((s, d) => Similarity.crossModalQuality(s, d)),
    "q79_bpe_train"       -> ((s, d) => Text.bpeTrained(s, d)),
    "q80_report_approx"   -> ((s, d) => Text.corpusReportApprox(s, d)),
    "q81_calibrated_approx" -> ((s, d) => Text.calibratedFilterApprox(s, d)),
    "q82_canonical_docs"  -> ((s, d) => Dedup.canonicalDocs(s, d)),
    "q83_interp_surprisal" -> ((s, d) => Text.interpSurprisal(s, d)),
    "q84_dsir_weights"    -> ((s, d) => Text.dsirWeights(s, d)),
    "q85_ngram_novelty"   -> ((s, d) => Dedup.ngramNovelty(s, d)),
    "q86_cc_converged"    -> ((s, d) => Dedup.dedupClustersConverged(s, d)),
    "q87_cc_star"         -> ((s, d) => Dedup.dedupClustersStar(s, d)),
    "q88_max_dup_run"     -> ((s, d) => Dedup.maxDupRuns(s, d)),
    "q89_backoff_surprisal" -> ((s, d) => Text.backoffSurprisal(s, d)),
    "q90_dsir_hashed"     -> ((s, d) => Text.dsirHashedWeights(s, d)),
    "q91_ann_ivf_pq"      -> ((s, d) => Similarity.annIvfPq(s, d)),
    "q92_budget_admission" -> ((s, d) => StreamProjections.budgetAdmissionBatch(s, d)),
    "q93_substring_decon" -> ((s, d) => Contamination.substringDecontaminate(s, d)),
    "q94_bpe_encode"      -> ((s, d) => Text.bpeEncode(s, d)),
    "q95_zipf_fit"        -> ((s, d) => Text.zipfFit(s, d)),
    "q96_source_divergence" -> ((s, d) => Text.sourceDivergence(s, d)),
    "q97_attribution_join" -> ((s, d) => StreamProjections.attributionJoinBatch(s, d)),
    "q98_linear_probe"    -> ((s, d) => Similarity.linearProbe(s, d)),
    "q99_chunk_dedup"     -> ((s, d) => Dedup.chunkDedup(s, d)),
    "q100_ppl_buckets"    -> ((s, d) => Text.perplexityBuckets(s, d)),
    "q101_temp_mixture"   -> ((s, d) => Sampling.temperatureMixture(s, d)),
    "q102_pivot_events"   -> ((s, d) => Relational.pivotEventCounts(s, d)),
    "q103_cube_orders"    -> ((s, d) => Relational.cubeOrders(s, d)),
    "q104_rolling_stats"  -> ((s, d) => Relational.rollingStats(s, d)),
    "q105_bloom_decon"    -> ((s, d) => Contamination.bloomDecontaminate(s, d)),
    "q106_heavy_hitters"  -> ((s, d) => Text.heavyHitters(s, d)),
    "q107_kn_surprisal"   -> ((s, d) => Text.knSurprisal(s, d)),
    "q108_containment"    -> ((s, d) => Dedup.containmentPairs(s, d)),
    "q109_prefix_jaccard" -> ((s, d) => Dedup.jaccardPrefixJoin(s, d)),
    "q110_triangles"      -> ((s, d) => Graph.triangleCounts(s, d)),
    "q111_copurchase"     -> ((s, d) => Graph.copurchasePairs(s, d)),
    "q112_kcore"          -> ((s, d) => Graph.kCore(s, d)),
    "q113_funnel"         -> ((s, d) => Windowed.funnelStages(s, d)),
    "q114_priority_sample" -> ((s, d) => Sampling.prioritySample(s, d)),
    "q115_edit_distance"  -> ((s, d) => Dedup.editDistanceNearDup(s, d)),
    "q116_bm25"           -> ((s, d) => Retrieval.bm25TopK(s, d)),
    "q117_gopher_quality" -> ((s, d) =>
      Text.gopherQuality(s, d, graft.functions.TextFunctions.StopWords)),
    "q118_link_prediction" -> ((s, d) => Graph.linkPrediction(s, d)),
    "q119_power_iteration" -> ((s, d) => Similarity.powerIteration(s, d)),
    "q120_retention"      -> ((s, d) => Windowed.retentionCohorts(s, d)),
    "q121_robust_stats"   -> ((s, d) => Text.robustSourceStats(s, d)),
    "q122_pmi_collocations" -> ((s, d) => Text.pmiCollocations(s, d)),
    "q123_bfs_hops"       -> ((s, d) => Graph.bfsHops(s, d)),
    "q124_top_ngram"      -> ((s, d) => Text.topNgramRepetition(s, d)),
    "q125_rrf_fusion"     -> ((s, d) => Retrieval.rrfFusion(s, d)),
    "q126_label_prop"     -> ((s, d) => Graph.labelPropagation(s, d)),
    "q127_hll_sketch"     -> ((s, d) => Relational.hllDistinct(s, d)),
    "q128_markov"         -> ((s, d) => Windowed.eventTransitions(s, d)),
    "q129_hist_quantiles" -> ((s, d) => Relational.histogramQuantiles(s, d)),
    "q130_json_props"     -> ((s, d) => Relational.propsExtract(s, d)),
    "q131_event_paths"    -> ((s, d) => Windowed.eventPaths(s, d)),
    "q132_cluster_split"  -> ((s, d) => Sampling.clusterSafeSplit(s, d)),
    "q133_local_volume"   -> ((s, d) => Relational.localSupplierVolume(s, d)),
    "q134_assoc_rules"    -> ((s, d) => Graph.associationRules(s, d)),
    "q135_dwell_times"    -> ((s, d) => Windowed.interEventGaps(s, d)),
    "q136_quality_rank"   -> ((s, d) => Text.qualityRank(s, d)),
    "q137_exact_variance" -> ((s, d) => Relational.exactVariance(s, d)),
    "q138_quality_filter" -> ((s, d) => Text.qualityFilter(s, d)),
    "q139_activity_grid"  -> ((s, d) => Windowed.activityGrid(s, d)),
    "q140_token_entropy"  -> ((s, d) => Text.tokenEntropy(s, d)),
    "q141_embedding_audit" -> ((s, d) => Similarity.embeddingAudit(s, d)),
    "q142_column_profile" -> ((s, d) => Relational.columnProfile(s, d)),
    "q143_latest_per_key" -> ((s, d) => Relational.latestPerUser(s, d)),
    "q144_nbr_degrees"    -> ((s, d) => Graph.neighborhoodDegrees(s, d)),
    "q145_random_walks"   -> ((s, d) => Graph.randomWalks(s, d)),
    "q146_manifest"       -> ((s, d) => Pipeline.trainingManifest(s, d)),
    "q147_shard_balance"  -> ((s, d) => Sharding.shardBalance(s, d)),
    "q148_rev_contrib"    -> ((s, d) => Relational.revenueContribution(s, d)),
    "q149_incr_manifest"  -> ((s, d) => Pipeline.incrementalManifestBatch(s, d)),
    "q150_session_overlap" -> ((s, d) => Windowed.sessionOverlap(s, d)),
    "q151_scd2_history"   -> ((s, d) => Relational.scd2History(s, d)),
    "q152_int8_audit"     -> ((s, d) => Similarity.int8QuantAudit(s, d)),
    "q153_daily_anomaly"  -> ((s, d) => Windowed.dailyAnomaly(s, d)),
    "q154_fertility"      -> ((s, d) => Text.tokenizerFertility(s, d)),
    "q155_hard_negatives" -> ((s, d) => Similarity.hardNegatives(s, d)),
    "q156_curriculum"     -> ((s, d) => Sampling.curriculumOrder(s, d)),
    "q157_zone_map"       -> ((s, d) => Sharding.shardZoneMap(s, d)),
    "q158_vocab_overlap"  -> ((s, d) => Text.vocabOverlap(s, d)),
    "q159_growth"         -> ((s, d) => Windowed.periodGrowth(s, d)),
    "q160_attribution"    -> ((s, d) => Windowed.linearAttribution(s, d)),
    "q161_committee"      -> ((s, d) => Text.qualityCommittee(s, d)),
    "q162_cms_counts"     -> ((s, d) => Relational.cmsUserCounts(s, d)),
    "q163_join_size"      -> ((s, d) => Relational.cmsSelfJoinSize(s, d)),
    "q164_zorder"         -> ((s, d) => Sharding.zOrderAudit(s, d)),
    "q165_rfm"            -> ((s, d) => Windowed.rfmSegments(s, d)),
    "q166_dim_health"     -> ((s, d) => Similarity.dimHealth(s, d)),
    "q167_skew_advisor"   -> ((s, d) => Relational.joinSkewAdvisor(s, d)),
    "q168_deletion_audit" -> ((s, d) => Relational.deletionAudit(s, d)),
    "q169_ref_integrity"  -> ((s, d) => Relational.refIntegrityAudit(s, d)),
    "q170_frame_manifest" -> ((s, d) => graft.multimodal.Multimodal.frameSampleManifest(s, d)),
    "q171_decode_audit"   -> ((s, d) => graft.multimodal.Multimodal.decodeAudit(s, d)),
    "q172_reach_curve"    -> ((s, d) => Relational.hllReachCurve(s, d)),
    "q173_funnel_latency" -> ((s, d) => Windowed.funnelLatency(s, d)),
    "q174_session_stats"  -> ((s, d) => Windowed.sessionStats(s, d)),
    "q175_dedup_eval"     -> ((s, d) => Dedup.dedupEval(s, d)),
    "q176_effective_tokens" -> ((s, d) => Dedup.effectiveTokens(s, d)),
    "q177_watermark_advisor" -> ((s, d) => Windowed.watermarkAdvisor(s, d)),
    "q178_value_drift"    -> ((s, d) => Windowed.valueDrift(s, d)),
    "q179_k_anonymity"    -> ((s, d) => Relational.kAnonymityAudit(s, d)),
    "q180_dup_topology"   -> ((s, d) => Dedup.dupTopology(s, d)),
    "q181_pack_waste"     -> ((s, d) => Sampling.packWaste(s, d)),
    "q182_bm25_ceiling"   -> ((s, d) => Retrieval.bm25TopKCeiled(s, d)),
    "q183_eval_contamination" -> ((s, d) => Dedup.evalContamination(s, d)),
    "q184_surprisal_mixture" -> ((s, d) => Sampling.surprisalMixture(s, d)),
    "q185_ivf_balance"    -> ((s, d) => Similarity.ivfBalance(s, d)),
    "q186_langid_confusion" -> ((s, d) => Text.langIdConfusion(s, d)),
    "q187_decontam_manifest" -> ((s, d) => Dedup.decontaminatedManifest(s, d)),
    "q188_phash_neardup"  -> ((s, d) => graft.multimodal.Multimodal.phashPairs(s, d)),
    "q189_source_sample"  -> ((s, d) => Sampling.groupPrioritySample(s, d)),
    "q190_snapshot_diff"  -> ((s, d) => Relational.snapshotDiff(s, d)),
    "q191_equidepth_hist" -> ((s, d) => Relational.equiDepthHist(s, d)),
    "q192_ivf_probe_sweep" -> ((s, d) => Similarity.ivfProbeSweep(s, d)),
    "q193_compaction_plan" -> ((s, d) => Sharding.compactionPlan(s, d)),
    "q194_negative_samples" -> ((s, d) => Graph.negativeSamples(s, d)),
    "q195_epoch_plan"     -> ((s, d) => Sampling.epochPlan(s, d)),
    "q196_hll_overlap"    -> ((s, d) => Relational.hllOverlap(s, d)),
    "q197_split_drift"    -> ((s, d) => Sampling.splitDriftAudit(s, d)),
    "q198_span_corruption" -> ((s, d) => Text.spanCorruptionPlan(s, d)),
    "q199_cluster_spectrum" -> ((s, d) => Dedup.clusterSpectrum(s, d)),
    "q200_vocab_coverage" -> ((s, d) => Text.vocabCoverage(s, d)),
    "q201_sliding_actives" -> ((s, d) => Relational.slidingActives(s, d)),
    "q202_bootstrap_ci"   -> ((s, d) => Sampling.bootstrapCi(s, d)),
    "q203_fisher_separation" -> ((s, d) => Similarity.fisherSeparation(s, d)),
    "q204_modularity"     -> ((s, d) => Graph.modularity(s, d)),
    "q205_threshold_sweep" -> ((s, d) => Dedup.thresholdSweep(s, d)),
    "q206_centroid_sim"   -> ((s, d) => Similarity.centroidSimilarity(s, d)),
    "q207_aspect_batching" -> ((s, d) => graft.multimodal.Multimodal.aspectBatching(s, d)),
    "q208_heaps_fit"      -> ((s, d) => Text.heapsFit(s, d)),
    "q209_canonical_policy" -> ((s, d) => Dedup.canonicalPolicy(s, d)),
    "q210_knn_purity"     -> ((s, d) => Similarity.knnLabelPurity(s, d)),
    "q211_cross_source_dups" -> ((s, d) => Dedup.crossSourceDups(s, d)),
    "q212_source_zipf"    -> ((s, d) => Text.sourceZipf(s, d)),
    "q213_shard_diversity" -> ((s, d) => Sharding.shardDiversity(s, d)),
    "q214_trending"       -> ((s, d) => Relational.trendingTypes(s, d)),
    "q215_dup_agreement"  -> ((s, d) => Similarity.dupModalityAgreement(s, d)),
    "q216_length_gini"    -> ((s, d) => Text.lengthGini(s, d)),
    "q217_hill_tail"      -> ((s, d) => Relational.hillTail(s, d)),
    "q218_signal_corr"    -> ((s, d) => Text.signalCorrelation(s, d)),
    "q219_batch_sweep"    -> ((s, d) => graft.multimodal.Multimodal.batchSizeSweep(s, d)),
    "q220_labelprop_churn" -> ((s, d) => Graph.labelPropChurn(s, d)),
    "q221_source_dup_rate" -> ((s, d) => Dedup.sourceDupRate(s, d)),
    "q222_rule_matrix"    -> ((s, d) => Text.sourceRuleMatrix(s, d)),
    "q223_shard_dedup_miss" -> ((s, d) => Sharding.shardDedupMiss(s, d)),
    "q224_dup_quality"    -> ((s, d) => Dedup.dupQualityAudit(s, d)),
    "q225_cross_lang_dups" -> ((s, d) => Dedup.crossLangDups(s, d)),
    "q226_cluster_cohesion" -> ((s, d) => Dedup.clusterCohesion(s, d)),
    "q227_decayed_rank"   -> ((s, d) => Windowed.decayedLeaderboard(s, d)),
    "q228_rule_ablation"  -> ((s, d) => Text.ruleAblation(s, d)),
    "q229_twonn_dim"      -> ((s, d) => Similarity.twoNNDim(s, d)),
    "q230_assortativity"  -> ((s, d) => Graph.degreeAssortativity(s, d)),
    "q231_bloom_fpr"      -> ((s, d) => Contamination.bloomFprAudit(s, d)),
    "q232_ks_split"       -> ((s, d) => Sampling.ksSplitAudit(s, d)),
    "q233_pos_entropy"    -> ((s, d) => Text.positionalEntropy(s, d)),
    "q234_burstiness"     -> ((s, d) => Windowed.burstiness(s, d)),
    "q235_centroid_drift" -> ((s, d) => Similarity.centroidDriftAudit(s, d)),
    "q236_pad_split"      -> ((s, d) => Sampling.padSplitPlan(s, d)),
    "q237_retrieval_eval" -> ((s, d) => Retrieval.retrievalEval(s, d)),
    "q238_simhash_bits"   -> ((s, d) => Dedup.simhashBitBias(s, d)),
    "q239_theil_sen"      -> ((s, d) => Windowed.theilSenTrend(s, d)),
    "q240_axis_isotropy"  -> ((s, d) => Similarity.axisIsotropy(s, d)),
    "q241_source_hhi"     -> ((s, d) => Sampling.sourceConcentration(s, d)),
    "q242_skip_rate"      -> ((s, d) => Sharding.skipRateSim(s, d)),
    "q243_canonical_bias" -> ((s, d) => Dedup.canonicalLengthBias(s, d)),
    "q244_pii_by_source"  -> ((s, d) => Text.piiBySource(s, d)),
    "q245_session_sweep"  -> ((s, d) => Windowed.sessionGapSweep(s, d)),
    "q246_cusum"          -> ((s, d) => Windowed.cusumChangePoint(s, d)),
    "q247_survivorship"   -> ((s, d) => Dedup.dedupSurvivorship(s, d)),
    "q248_arm_agreement"  -> ((s, d) => Retrieval.retrievalAgreement(s, d)),
    "q249_source_quality" -> ((s, d) => Text.sourceQualityPanel(s, d)),
    "q250_neyman_alloc"   -> ((s, d) => Sampling.neymanAllocation(s, d)),
    "q251_knapsack"       -> ((s, d) => Sampling.qualityKnapsack(s, d)),
    "q252_davies_bouldin" -> ((s, d) => Similarity.daviesBouldin(s, d)),
    // the deployment-dial forms of the three fixed-8-list IVF queries
    // (nLists = max(8, N/targetCell) holds the mean Voronoi cell
    // constant → linear total work; the static forms are N²/nLists).
    // Below the dial knee (N ≤ 8·targetCell — true at every fixture
    // SF) they resolve to the identical trajectory, so the static
    // oracles apply verbatim; above the knee the specs pin precision
    // against the static form (DedupSimilaritySpec/RetrievalSpec).
    "q253_semantic_dedup_scaled" -> ((s, d) => Similarity.semanticDedupScaled(s, d)),
    "q254_hard_negatives_scaled" -> ((s, d) => Similarity.hardNegativesScaled(s, d)),
    "q255_rrf_fusion_scaled"     -> ((s, d) =>
      Retrieval.rrfFusion(s, d, denseGen = Retrieval.DenseIvfScaledGen)),
  )

  /** The exact 5-gram eval-overlap decontamination result — shared by
    * q59 (direct dictionary join) and q105 (Bloom pre-filter + exact
    * re-check): the Bloom pass only prunes the candidate stream, never
    * the answer, so both queries are row-identical by construction.
    */
  private def decontaminateSql: String =
    s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w,
       |  ${md5Bits32Sql("'eval:' || doc_id::VARCHAR", 1)} % 100 AS b FROM documents),
       |sh AS (SELECT DISTINCT doc_id, b, s FROM (
       |  SELECT doc_id, b,
       |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS s
       |  FROM toks, unnest(range(1, len(w)-3)) AS t(i) WHERE len(w) >= 5)),
       |ev AS (SELECT DISTINCT s FROM sh WHERE b < 5),
       |ov AS (SELECT sh.doc_id, count(*) AS n FROM sh JOIN ev ON sh.s = ev.s
       |       WHERE sh.b >= 5 GROUP BY 1)
       |SELECT t.doc_id, coalesce(ov.n, 0)::BIGINT AS n_overlap,
       |       coalesce(ov.n, 0) > 0 AS contaminated
       |FROM toks t LEFT JOIN ov ON t.doc_id = ov.doc_id WHERE t.b >= 5""".stripMargin

  /** Jelinek-Mercer interpolation oracle: λ and 1−λ are emitted from the
    * same Scala doubles the engine closes over (1−0.7 is
    * 0.30000000000000004 in IEEE — printing the Scala value keeps both
    * engines on the identical literal), and the mix uses the identical
    * operation order so the 1e6 quantization sees the same double.
    */
  private def interpSurprisalSql(lambda: Double): String = {
    val l2 = 1 - lambda
    s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
       |              FROM documents),
       |bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
       |       FROM toks, unnest(range(1, len(w))) AS t(i) WHERE len(w) >= 2),
       |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
       |c1 AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY 1),
       |u AS (SELECT w, count(*) AS cu FROM (
       |        SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
       |        FROM documents) GROUP BY 1),
       |t AS (SELECT sum(cu)::BIGINT AS total FROM u),
       |s AS (SELECT c12.w1, c12.w2,
       |        round((-log2($lambda * (c12.c12::DOUBLE / c1.c1::DOUBLE) +
       |                     $l2 * (u.cu::DOUBLE / t.total::DOUBLE)))
       |              * 1000000.0)::BIGINT AS sq
       |      FROM c12 JOIN c1 USING (w1) JOIN u ON c12.w2 = u.w, t),
       |pd AS (SELECT bg.doc_id, count(*) AS n_bigrams, sum(s.sq)::BIGINT AS bits_q
       |       FROM bg JOIN s ON bg.w1 = s.w1 AND bg.w2 = s.w2 GROUP BY 1)
       |SELECT d.doc_id, coalesce(pd.n_bigrams, 0)::BIGINT AS n_bigrams,
       |       coalesce(pd.bits_q, 0)::BIGINT AS bits_q,
       |       coalesce(pd.bits_q::DOUBLE / (pd.n_bigrams::DOUBLE * 1000000.0), 0.0)
       |         AS mean_interp_surprisal
       |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id""".stripMargin
  }

  /** Unrolled BPE-training oracle: `nMerges` chained (pair-count →
    * argmax → string-replace merge) CTE steps over '|'-framed symbol
    * strings — mirrors Text.bpeTrain step for step (the q62 unrolled-
    * trajectory pattern). `replace` shares the left-to-right
    * non-overlapping contract across both engines.
    */
  /** The shared BPE-training CTE chain (w0 word table, per-step pair
    * counts pc_j, best pair b_j, merged word tables w_j) — the body of
    * both the q79 trajectory oracle and q94's encode oracle.
    */
  private def bpeStepCtes(nMerges: Int): String = {
    val base =
      """WITH w0 AS (
        |  SELECT regexp_replace(w, '(.)', '|\1|', 'g') AS s, count(*) AS n
        |  FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |        FROM documents)
        |  WHERE regexp_full_match(w, '[a-z]+') AND strlen(w) >= 2
        |  GROUP BY 1)""".stripMargin
    val steps = (1 to nMerges).map { j =>
      val merge = if (j < nMerges)
        s""",
           |w$j AS (SELECT replace(w.s, '|' || b.lsym || '||' || b.rsym || '|',
           |                       '|' || b.lsym || b.rsym || '|') AS s, w.n
           |        FROM w${j - 1} w, b$j b)""".stripMargin
      else ""
      s""",
         |pc$j AS (SELECT sy[i] AS lsym, sy[i+1] AS rsym, sum(n)::BIGINT AS cnt
         |         FROM (SELECT n, string_split(trim(s, '|'), '||') AS sy
         |               FROM w${j - 1}),
         |              unnest(range(1, len(sy))) AS t(i)
         |         GROUP BY 1, 2),
         |b$j AS (SELECT lsym, rsym, cnt FROM pc$j
         |        ORDER BY cnt DESC, lsym, rsym LIMIT 1)""".stripMargin + merge
    }.mkString
    base + steps
  }

  private def bpeTrainSql(nMerges: Int): String = {
    val out = (1 to nMerges).map { j =>
      s"SELECT $j::BIGINT AS step, lsym, rsym, lsym || rsym AS merged, cnt FROM b$j"
    }.mkString("\n", "\nUNION ALL ", "")
    bpeStepCtes(nMerges) + out
  }

  /** q94: re-derive the merges (bpeStepCtes), then apply them to every
    * eligible word occurrence as the same nested left-to-right replace
    * the trainer uses; pieces = number of `||` separators + 1.
    */

  private def bpeEncodeSql(nMerges: Int): String = {
    // coalesce each merge's pattern to a chr(1) sentinel (a byte that can
    // never appear in the '|'-delimited encoding): if the trajectory
    // exhausts before nMerges (empty b_j — the corpus ran out of pairs),
    // the replace becomes a no-op instead of NULL-poisoning every word,
    // matching Spark's bpeEncode which simply applies the shorter
    // trajectory
    val encExpr = (1 to nMerges).foldLeft("regexp_replace(w, '(.)', '|\\1|', 'g')") {
      (acc, j) =>
        s"""replace($acc,
           |  coalesce((SELECT '|' || lsym || '||' || rsym || '|' FROM b$j), chr(1)),
           |  coalesce((SELECT '|' || lsym || rsym || '|' FROM b$j), chr(1)))""".stripMargin
    }
    bpeStepCtes(nMerges) + s""",
       |enc AS (SELECT doc_id, $encExpr AS s
       |        FROM (SELECT doc_id,
       |                unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
       |              FROM documents)
       |        WHERE regexp_full_match(w, '[a-z]+') AND strlen(w) >= 2),
       |pd AS (SELECT doc_id, count(*) AS n_bpe_words,
       |         sum((strlen(s) - strlen(replace(s, '||', ''))) // 2 + 1)::BIGINT
       |           AS n_pieces
       |       FROM enc GROUP BY 1)
       |SELECT d.doc_id, coalesce(pd.n_bpe_words, 0)::BIGINT AS n_bpe_words,
       |       coalesce(pd.n_pieces, 0)::BIGINT AS n_pieces,
       |       coalesce(pd.n_pieces::DOUBLE / pd.n_bpe_words::DOUBLE, 0.0)
       |         AS mean_pieces
       |FROM (SELECT doc_id FROM documents) d LEFT JOIN pd ON d.doc_id = pd.doc_id""".stripMargin
  }

  /** q154's oracle: the q94 encode chain kept per (lang, word-length),
    * aggregated to the per-language fertility/compression ratios.
    */
  private def fertilitySql(nMerges: Int): String = {
    val encExpr = (1 to nMerges).foldLeft("regexp_replace(w, '(.)', '|\\1|', 'g')") {
      (acc, j) =>
        s"""replace($acc,
           |  coalesce((SELECT '|' || lsym || '||' || rsym || '|' FROM b$j), chr(1)),
           |  coalesce((SELECT '|' || lsym || rsym || '|' FROM b$j), chr(1)))""".stripMargin
    }
    bpeStepCtes(nMerges) + s""",
       |enc AS (SELECT lang, strlen(w)::BIGINT AS wlen, $encExpr AS s
       |        FROM (SELECT lang,
       |                unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
       |              FROM documents)
       |        WHERE regexp_full_match(w, '[a-z]+') AND strlen(w) >= 2),
       |agg AS (SELECT lang, count(*)::BIGINT AS n_words,
       |          sum(wlen)::BIGINT AS n_chars,
       |          sum((strlen(s) - strlen(replace(s, '||', ''))) // 2 + 1)::BIGINT
       |            AS n_pieces
       |        FROM enc GROUP BY 1)
       |SELECT lang, n_words, n_chars, n_pieces,
       |  n_pieces::DOUBLE / n_words::DOUBLE AS fertility,
       |  n_chars::DOUBLE / n_pieces::DOUBLE AS chars_per_piece
       |FROM agg""".stripMargin
  }

  /** q98: the batch-perceptron trajectory unrolled as epoch CTEs —
    * epoch 1 updates on every vector (zero weights ⇒ zero margins),
    * later epochs update on vectors with y·⟨w, x⟩ ≤ 0; predictions and
    * the per-label confusion row come from the final weight vector.
    * Mirrors Similarity.linearProbe's integer arithmetic exactly.
    */
  private def linearProbeSql(targetLabel: Int, epochs: Int): String = {
    val base =
      s"""WITH ex3 AS (SELECT vec_id, label,
         |  CASE WHEN label = $targetLabel THEN 1 ELSE -1 END AS y,
         |  round(unnest(embedding)::DOUBLE * 1000)::BIGINT AS e,
         |  unnest(range(len(embedding))) AS i FROM embeddings),
         |w1 AS (SELECT i, sum(y * e)::BIGINT AS w FROM ex3 GROUP BY 1)""".stripMargin
    val steps = (2 to epochs).map { j =>
      s""",
         |d${j - 1} AS (SELECT x.vec_id, sum(w.w * x.e)::BIGINT AS d
         |        FROM ex3 x JOIN w${j - 1} w ON w.i = x.i GROUP BY 1),
         |u$j AS (SELECT x.i, sum(x.y * x.e)::BIGINT AS dw
         |        FROM ex3 x JOIN d${j - 1} m ON m.vec_id = x.vec_id
         |        WHERE x.y * m.d <= 0 GROUP BY 1),
         |w$j AS (SELECT w.i, w.w + coalesce(u.dw, 0) AS w
         |        FROM w${j - 1} w LEFT JOIN u$j u ON u.i = w.i)""".stripMargin
    }.mkString
    base + steps +
      s""",
         |df AS (SELECT x.vec_id, sum(w.w * x.e)::BIGINT AS d
         |       FROM ex3 x JOIN w$epochs w ON w.i = x.i GROUP BY 1)
         |SELECT x.label, count(*)::BIGINT AS n,
         |       sum(CASE WHEN df.d > 0 THEN 1 ELSE 0 END)::BIGINT AS n_pred_pos
         |FROM (SELECT DISTINCT vec_id, label FROM ex3) x
         |JOIN df ON df.vec_id = x.vec_id GROUP BY 1""".stripMargin
  }

  /** Unrolled min-label-propagation oracle for dedup clusters (mirrors
    * Dedup.dedupClusters' loop; near-dup components are shallow so 5
    * supersteps are exhaustive on this corpus).
    */
  private def dedupLabelCtes(iters: Int): String = {
    val base =
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
        |              FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM toks, unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT x, y
        |          FROM inter JOIN sizes sa ON x = sa.doc_id
        |                     JOIN sizes sb ON y = sb.doc_id
        |          WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.5),
        |edges AS (SELECT x, y FROM pairs UNION ALL SELECT y AS x, x AS y FROM pairs),
        |l0 AS (SELECT doc_id, doc_id AS label FROM documents)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s""",
         |l$i AS (SELECT l.doc_id,
         |    least(l.label, coalesce(m.nlabel, l.label)) AS label
         |  FROM l${i - 1} l LEFT JOIN (
         |    SELECT e.x, min(p.label) AS nlabel
         |    FROM edges e JOIN l${i - 1} p ON e.y = p.doc_id GROUP BY 1) m
         |  ON l.doc_id = m.x)""".stripMargin
    }.mkString
    base + iterCtes
  }

  private def dedupClustersSql(iters: Int): String =
    dedupLabelCtes(iters) +
      s"\nSELECT label AS cluster_id, count(*) AS cluster_size FROM l$iters GROUP BY 1"

  /** Survivorship oracle: the label CTE chain plus a per-cluster argmax
    * (n_chars desc, doc_id asc) — mirrors Dedup.canonicalDocs.
    */
  private def canonicalDocsSql(iters: Int): String =
    dedupLabelCtes(iters) +
      s""",
         |r AS (SELECT l.label, l.doc_id, d.n_chars,
         |        row_number() OVER (PARTITION BY l.label
         |                           ORDER BY d.n_chars DESC, l.doc_id) AS rn
         |      FROM l$iters l JOIN documents d ON l.doc_id = d.doc_id),
         |sz AS (SELECT label, count(*) AS cluster_size FROM l$iters GROUP BY 1)
         |SELECT r.label AS cluster_id, r.doc_id AS canonical_doc, sz.cluster_size
         |FROM r JOIN sz ON r.label = sz.label WHERE rn = 1""".stripMargin

  /** q176's oracle: the q82 survivorship chain reduced to the canonical
    * set, then one per-source raw-vs-effective token budget.
    */
  private def effectiveTokensSql(iters: Int): String =
    dedupLabelCtes(iters) +
      s""",
         |r AS (SELECT l.label, l.doc_id,
         |        row_number() OVER (PARTITION BY l.label
         |                           ORDER BY d.n_chars DESC, l.doc_id) AS rn
         |      FROM l$iters l JOIN documents d ON l.doc_id = d.doc_id),
         |canon AS (SELECT doc_id FROM r WHERE rn = 1),
         |t AS (SELECT d.doc_id, d.source,
         |        len(regexp_split_to_array(lower(d.text), '\\s+'))::BIGINT AS ntok,
         |        (d.doc_id IN (SELECT doc_id FROM canon))::BIGINT AS is_c
         |      FROM documents d)
         |SELECT source, count(*)::BIGINT AS raw_docs,
         |  sum(ntok)::BIGINT AS raw_tokens,
         |  sum(is_c)::BIGINT AS effective_docs,
         |  sum(is_c * ntok)::BIGINT AS effective_tokens,
         |  ((sum(ntok) - sum(is_c * ntok)) * 1000000 // sum(ntok))::BIGINT
         |    AS discount_q6
         |FROM t GROUP BY 1""".stripMargin

  /** Unrolled fixed-iteration PageRank oracle (DuckDB has no iterative
    * DataFrame loop; 10 chained CTEs replicate the loop exactly —
    * contribution sums quantized to 1e14-scaled integers in both engines,
    * so ranks are bit-identical).
    */
  private def pagerankSql(iters: Int): String = {
    val base =
      """WITH edges AS (
        |  SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |outs AS (SELECT src, sum(w) AS sumout FROM edges GROUP BY 1),
        |prob AS (SELECT edges.src, edges.dst,
        |                edges.w::DOUBLE / outs.sumout::DOUBLE AS p
        |         FROM edges JOIN outs ON edges.src = outs.src),
        |verts AS (SELECT DISTINCT id FROM
        |          (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
        |nn AS (SELECT count(*)::DOUBLE AS n FROM verts),
        |r0 AS (SELECT id, 1.0::DOUBLE AS rank FROM verts)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s""",
         |r$i AS (SELECT v.id,
         |    0.85::DOUBLE * coalesce(c.s, 0.0::DOUBLE)
         |      + 0.15::DOUBLE / (SELECT n FROM nn) AS rank
         |  FROM verts v LEFT JOIN (
         |    SELECT p.dst, sum(round((r.rank * p.p) * 1e14)::BIGINT)::DOUBLE / 1e14 AS s
         |    FROM r${i - 1} r JOIN prob p ON r.id = p.src GROUP BY 1) c
         |  ON v.id = c.dst)""".stripMargin
    }.mkString
    base + iterCtes + s"\nSELECT id AS nationkey, rank FROM r$iters"
  }

  /** Unrolled Lloyd's-k-means oracle (mirrors Similarity.kmeansAssign:
    * `iters` assignment rounds, `iters − 1` centroid updates, all exact
    * integer math at the 1e7 quantization scale — the assignment
    * trajectory is bit-identical across engines).
    */
  private def kmeansSql(k: Int, iters: Int): String = {
    val base =
      s"""WITH ex AS (SELECT vec_id, round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS q,
         |                   unnest(range(len(embedding))) AS i FROM embeddings),
         |c0 AS (SELECT vec_id AS cid, i, q AS cq FROM ex WHERE vec_id IN
         |       (SELECT vec_id FROM (SELECT DISTINCT vec_id FROM ex ORDER BY vec_id LIMIT $k)))""".stripMargin
    val steps = (1 to iters).map { j =>
      val assign =
        s""",
           |d$j AS (SELECT e.vec_id, c.cid, sum((e.q - c.cq) * (e.q - c.cq))::BIGINT AS dist
           |        FROM ex e JOIN c${j - 1} c ON e.i = c.i GROUP BY 1, 2),
           |a$j AS (SELECT vec_id, cid, dist FROM (
           |          SELECT vec_id, cid, dist,
           |                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
           |          FROM d$j) WHERE rn = 1)""".stripMargin
      val update = if (j < iters)
        s""",
           |c$j AS (SELECT a.cid, e.i, round(sum(e.q)::DOUBLE / count(*))::BIGINT AS cq
           |        FROM ex e JOIN a$j a ON e.vec_id = a.vec_id GROUP BY 1, 2)""".stripMargin
      else ""
      assign + update
    }.mkString
    base + steps +
      s"\nSELECT vec_id, cid::BIGINT AS cluster, dist AS dist2 FROM a$iters"
  }

  /** Lloyd-trained centroid CTE chain over embedCtes' `ex(vec_id, e, i)`
    * rows: c0 = seed (k lowest vec_ids), then `updates` rounds of
    * exact-L2 assign (kd/ka) + re-quantized-mean update (c1..c_updates) —
    * the training trajectory of Similarity.lloydCentroids, bit-exact.
    */
  private def kmeansCentroidCtes(k: Int, updates: Int): String = {
    // rank-based seed (k lowest vec_ids), mirroring lloydCentroids'
    // orderBy/limit — NOT the absolute `vec_id < k` predicate
    val c0 = s"c0 AS (SELECT vec_id AS cid, i, e AS cq FROM ex WHERE vec_id IN " +
      s"(SELECT vec_id FROM (SELECT DISTINCT vec_id FROM ex ORDER BY vec_id LIMIT $k)))"
    val steps = (1 to updates).map { j =>
      s""",
         |kd$j AS (SELECT x.vec_id, c.cid, sum((x.e - c.cq) * (x.e - c.cq))::BIGINT AS dist
         |         FROM ex x JOIN c${j - 1} c ON x.i = c.i GROUP BY 1, 2),
         |ka$j AS (SELECT vec_id, cid FROM (
         |           SELECT vec_id, cid,
         |                  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |           FROM kd$j) WHERE rn = 1),
         |c$j AS (SELECT a.cid, x.i, round(sum(x.e)::DOUBLE / count(*))::BIGINT AS cq
         |        FROM ex x JOIN ka$j a ON x.vec_id = a.vec_id GROUP BY 1, 2)""".stripMargin
    }.mkString
    c0 + steps
  }

  /** The reference stop list / lang markers as DuckDB literals — generated
    * from the same Scala constants the Spark side uses, so the oracle can
    * never drift from the engine.
    */
  /** q145's oracle: the deterministic walk trajectory unrolled — per
    * step, a join onto the id-ranked adjacency at neighbor index
    * md5("walk:start:t:cur") mod deg, mirroring Graph.randomWalks
    * step for step.
    */
  private def randomWalksSql(steps: Int): String = {
    def pick(t: Int, cur: String) =
      s"${md5Bits32Sql(s"'walk:' || start_id::VARCHAR || ':$t:' || $cur::VARCHAR", 1)} % rk.deg"
    val stages = (1 to steps).map { t =>
      val prev = if (t == 1) "w0" else s"w${t - 1}"
      val cur = if (t == 1) "cur" else s"v${t - 1}"
      val carried = ("start_id" +: (1 until t).map(i => s"v$i")).map(c => s"$prev.$c")
      s""",
         |w$t AS MATERIALIZED (SELECT ${carried.mkString(", ")}, rk.u AS v$t
         |  FROM $prev JOIN rk ON $prev.$cur = rk.v
         |  AND rk.idx = ${pick(t, s"$prev.$cur")})""".stripMargin
    }.mkString
    s"""WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e AS (SELECT p1, p2 FROM (
       |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS cnt
       |  FROM pp a JOIN pp b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2) WHERE cnt >= 2),
       |nb AS MATERIALIZED (
       |  SELECT p1 AS v, p2 AS u FROM e UNION ALL SELECT p2, p1 FROM e),
       |rk AS MATERIALIZED (SELECT v, u,
       |  row_number() OVER (PARTITION BY v ORDER BY u) - 1 AS idx,
       |  count(*) OVER (PARTITION BY v) AS deg FROM nb),
       |w0 AS (SELECT DISTINCT v AS start_id, v AS cur FROM nb)$stages
       |SELECT start_id, ${(1 to steps).map(i => s"v$i").mkString(", ")}
       |FROM w$steps""".stripMargin
  }

  /** q146's oracle body — also the manifest STATE q149's incremental
    * projection joins (one definition, both entries). */
  private def manifestSql: String =
    s"""SELECT d.doc_id, d.lang, d.source, d.n_chars,
       |  CASE WHEN b.bucket < 80 THEN 'train'
       |       WHEN b.bucket < 90 THEN 'validation'
       |       ELSE 'test' END AS split,
       |  qr.decile, lb.label AS cluster_id, e.label AS emb_label
       |FROM documents d
       |JOIN (SELECT doc_id,
       |  ${md5Bits32Sql("'split:' || doc_id::VARCHAR", 1)} % 100 AS bucket
       |  FROM documents) b USING (doc_id)
       |JOIN ($qualityRankSql) qr USING (doc_id)
       |JOIN (${dedupLabelCtes(5)}
       |  SELECT doc_id, label FROM l5) lb USING (doc_id)
       |LEFT JOIN embeddings e ON d.doc_id = e.vec_id""".stripMargin

  /** q136's oracle body — also the quality signal q138's filter rides
    * (one definition, both entries). */
  private def qualityRankSql: String =
    s"""WITH w AS (SELECT doc_id, lang,
       |  regexp_split_to_array(lower(text), '\\s+') AS ws
       |  FROM documents),
       |q AS (SELECT doc_id, lang,
       |  len(list_filter(ws, x -> list_contains($stopList, x)))::DOUBLE
       |    / len(ws) AS stop_ratio
       |  FROM w),
       |r AS (SELECT doc_id, lang, stop_ratio,
       |  rank() OVER (PARTITION BY lang ORDER BY stop_ratio)::BIGINT AS rnk,
       |  count(*) OVER (PARTITION BY lang) AS n
       |  FROM q)
       |SELECT doc_id, lang, stop_ratio, rnk,
       |  CASE WHEN n = 1 THEN 0.0
       |       ELSE (rnk - 1)::DOUBLE / (n - 1)::DOUBLE END AS pr,
       |  least(floor(CASE WHEN n = 1 THEN 0.0
       |       ELSE (rnk - 1)::DOUBLE / (n - 1)::DOUBLE END * 10),
       |    9::DOUBLE)::BIGINT AS decile
       |FROM r""".stripMargin

  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ",", "]")
  private def sqlLongList(xs: Seq[Long]): String =
    xs.mkString("[", ",", "]")
  private def stopList = sqlList(graft.functions.TextFunctions.StopWords)
  private def markerValues: String = graft.functions.TextFunctions.LangMarkers
    .flatMap { case (l, ws) => ws.map(w => s"('$l','$w')") }.mkString(",")
  private val cleanToksCte =
    s"""toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |         t -> regexp_full_match(t, '[a-z]+') AND NOT list_contains($stopList, t)) AS ws
       |  FROM documents)""".stripMargin

  /** DuckDB mirror of graft.functions.Hashing.md5Bits32: unsigned 32-bit
    * value of md5-hex chars [from, from+8) as BIGINT — the cross-engine
    * token-hash primitive behind the simhash/rolling-fp/ANN-LSH oracles.
    */
  private def md5Bits32Sql(expr: String, from: Int): String =
    s"""list_sum(list_transform(range($from, ${from + 8}), j ->
       |  (strpos('0123456789abcdef', substr(md5($expr), j::INT, 1)) - 1)::BIGINT
       |  * (1::BIGINT << (4 * (${from + 7} - j)::INT))))::BIGINT""".stripMargin

  /** The exact 3-gram-Jaccard pair derivation (q16's oracle body) — also
    * the expected output of the MinHash-LSH path: banding at 32×2 has
    * miss probability ~1e-4 per true pair at j = 0.5 and the exact
    * re-check makes precision 1, so recall 1 ⇒ row-identical results
    * (asserted to hold on this corpus at sf0.001/0.01/0.1; a regression
    * that drops a band or breaks a signature loses a pair and fails the
    * hash compare).
    */
  private val jaccardPairsSql =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
      |              FROM documents),
      |sh AS (SELECT DISTINCT doc_id, s FROM (
      |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
      |  FROM toks, unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3)),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
      |inter AS (SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT x, y, inter::DOUBLE / (sa.sz + sb.sz - inter) AS jac
      |FROM inter JOIN sizes sa ON x = sa.doc_id JOIN sizes sb ON y = sb.doc_id
      |WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.5""".stripMargin

  /** q23's full simhash re-derivation (also the prediction side of the
    * q175 evaluation harness): md5 64-bit token hashes, per-bit votes,
    * sign bits, brute Hamming ≤ 3 pairs.
    */
  private lazy val simhashPairsSql =
    s"""WITH $cleanToksCte,
       |tok AS (SELECT doc_id, unnest(ws) AS t FROM toks),
       |th AS (SELECT doc_id,
       |  ${md5Bits32Sql("t", 1)} AS hi,
       |  ${md5Bits32Sql("t", 9)} AS lo
       |  FROM tok),
       |votes AS (SELECT doc_id, k,
       |  sum(CASE WHEN (CASE WHEN k < 32 THEN (lo >> k::INT) & 1
       |                      ELSE (hi >> (k - 32)::INT) & 1 END) = 1
       |      THEN 1 ELSE -1 END) AS vote
       |  FROM th, range(64) kk(k) GROUP BY 1, 2),
       |skv AS (SELECT doc_id,
       |  list(CASE WHEN vote > 0 THEN 1 ELSE 0 END ORDER BY k) AS bl
       |  FROM votes GROUP BY 1),
       |sk AS (SELECT d.doc_id, coalesce(s.bl, list_transform(range(64), z -> 0)) AS bl
       |       FROM documents d LEFT JOIN skv s USING (doc_id))
       |SELECT a.doc_id AS x, b.doc_id AS y,
       |  list_sum(list_transform(range(1, 65), k ->
       |    CASE WHEN a.bl[k::INT] <> b.bl[k::INT] THEN 1 ELSE 0 END))::INT AS dist
       |FROM sk a JOIN sk b ON a.doc_id < b.doc_id
       |WHERE list_sum(list_transform(range(1, 65), k ->
       |    CASE WHEN a.bl[k::INT] <> b.bl[k::INT] THEN 1 ELSE 0 END)) <= 3""".stripMargin

  /** Shared quantized-embedding CTEs (q14's oracle prelude). */
  private val embedCtes =
    """ex AS (SELECT vec_id, round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS e,
      |              unnest(range(len(embedding))) AS i FROM embeddings),
      |n2 AS (SELECT vec_id, sum(e*e)::DOUBLE AS n2 FROM ex GROUP BY 1)""".stripMargin

  /** Exact re-scoring + top-k tail over a `cand(q_id, n_id)` CTE. */
  private def rescoreTopKSql(k: Int): String =
    s"""dq AS (SELECT c.q_id, c.n_id, sum(a.e * b.e)::DOUBLE AS dot
       |       FROM cand c JOIN ex a ON a.vec_id = c.q_id
       |                   JOIN ex b ON b.vec_id = c.n_id AND b.i = a.i
       |       GROUP BY 1, 2),
       |cosx AS (SELECT q_id, n_id, dot / (sqrt(qa.n2) * sqrt(qb.n2)) AS cos
       |         FROM dq JOIN n2 qa ON q_id = qa.vec_id
       |                 JOIN n2 qb ON n_id = qb.vec_id)
       |SELECT q_id, n_id, cos, rnk FROM (
       |  SELECT q_id, n_id, cos,
       |         row_number() OVER (PARTITION BY q_id
       |                            ORDER BY cos DESC, n_id ASC) AS rnk
       |  FROM cosx)
       |WHERE rnk <= $k""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * The q253–q255 deployment-dial entries reuse their static twins'
    * SQL verbatim: below the dial knee (every fixture SF) the scaled
    * forms replay the IDENTICAL nLists=8 trajectory, pair for pair.
    * The knee is N ≤ 8·targetCell = 2048 and the margin is thin at
    * sf0.1 (2000 embeddings, 2.4%) — DedupSimilaritySpec's "dial knee
    * holds" test asserts it per fixture SF with a readable message, so
    * fixture growth surfaces as a knee violation, not a digest
    * mismatch.
    */
  def oracleSql: Map[String, String] = {
    val base = oracleSqlBase
    base ++ Map(
      "q253_semantic_dedup_scaled" -> base("q55_semantic_dedup"),
      "q254_hard_negatives_scaled" -> base("q155_hard_negatives"),
      "q255_rrf_fusion_scaled"     -> base("q125_rrf_fusion"))
  }

  private def oracleSqlBase: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
        |  sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
        |  sum(l_extendedprice::DECIMAL(18,2) * (1.0 - l_discount)::DECIMAL(18,2))::DOUBLE AS sum_disc_price,
        |  sum(l_quantity::DECIMAL(18,2))::DOUBLE / count(l_quantity) AS avg_qty,
        |  sum(l_discount::DECIMAL(18,4))::DOUBLE / count(l_discount) AS avg_disc,
        |  count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events
        |WHERE event_type IN ('click','purchase') AND value BETWEEN 50.0 AND 150.0""".stripMargin,
    "q03_join_agg" ->
      """SELECT n_name,
        |  sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q04_month_user_count" ->
      """SELECT strftime(ts, '%Y-%m') AS month, user_id, count(*) AS cnt
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q05_member_otm" ->
      """WITH counts AS (
        |  SELECT strftime(ts, '%Y-%m') AS month, user_id, count(*) AS cnt
        |  FROM events WHERE event_type <> 'error' GROUP BY 1, 2)
        |SELECT month, user_id, cnt FROM (
        |  SELECT month, user_id, cnt,
        |         rank() OVER (PARTITION BY month ORDER BY cnt DESC) AS rnk
        |  FROM counts)
        |WHERE rnk = 1""".stripMargin,
    "q06_self_join" ->
      """SELECT c.l_returnflag AS child_flag, p.l_returnflag AS parent_flag,
        |       count(*) AS cnt
        |FROM lineitem c
        |JOIN lineitem p
        |  ON c.l_orderkey = p.l_orderkey AND c.l_linenumber = p.l_linenumber + 1
        |GROUP BY 1, 2""".stripMargin,
    "q20_topk_orders" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders)
        |WHERE rnk <= 10""".stripMargin,
    "q21_distinct" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "q22_set_ops" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey FROM supplier)""".stripMargin,
    "q07_tfidf" ->
      s"""WITH $cleanToksCte,
         |ex AS (SELECT doc_id, unnest(ws) AS word FROM toks),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM ex GROUP BY 1, 2),
         |df AS (SELECT word, count(*) AS df FROM
         |        (SELECT DISTINCT doc_id, word FROM ex) GROUP BY 1),
         |n AS (SELECT count(*)::DOUBLE AS n FROM documents)
         |SELECT tf.doc_id, tf.word, tf.tf * ((SELECT n FROM n) / df.df) AS tfidf
         |FROM tf JOIN df USING (word)""".stripMargin,
    "q08_doc_frequency" ->
      s"""WITH $cleanToksCte,
         |ex AS (SELECT DISTINCT doc_id, word FROM
         |        (SELECT doc_id, unnest(ws) AS word FROM toks))
         |SELECT word, count(*) AS df FROM ex GROUP BY 1""".stripMargin,
    "q17_lang_id" ->
      s"""WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
         |            FROM documents),
         |m(mlang, w) AS (VALUES $markerValues),
         |scores AS (SELECT doc_id, mlang, count(*) AS c
         |           FROM tok JOIN m USING (w) GROUP BY 1, 2),
         |best AS (SELECT doc_id, mlang, c,
         |                row_number() OVER (PARTITION BY doc_id
         |                                   ORDER BY c DESC, mlang ASC) AS rn
         |         FROM scores)
         |SELECT d.doc_id, coalesce(b.mlang, 'und') AS lang_pred,
         |       coalesce(b.c, 0) AS n_markers
         |FROM documents d
         |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)""".stripMargin,
    "q18_quality_score" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws
         |           FROM documents),
         |s AS (SELECT doc_id, len(ws)::BIGINT AS n_tokens,
         |  len(list_filter(ws, x -> list_contains($stopList, x)))::BIGINT AS n_stop,
         |  len(list_filter(ws, x -> regexp_full_match(x, '[a-z]+')))::BIGINT AS n_alpha,
         |  list_sum(list_transform(ws, x -> strlen(x)))::BIGINT AS sum_tok_len
         |  FROM t)
         |SELECT doc_id, n_tokens, n_stop, n_alpha,
         |       n_stop::DOUBLE / n_tokens AS stop_ratio,
         |       sum_tok_len::DOUBLE / n_tokens AS mean_tok_len,
         |       n_alpha::DOUBLE / n_tokens AS alpha_ratio
         |FROM s""".stripMargin,
    "q19_token_stats" ->
      """SELECT doc_id, len(ws)::BIGINT AS ws_tokens,
        |  list_sum(list_transform(ws, w -> floor((strlen(w)+3)/4)::BIGINT))::BIGINT AS bpe_tokens
        |FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws
        |      FROM documents)""".stripMargin,
    "q26_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,
    // full simhash re-derivation: md5-derived 64-bit token hashes →
    // per-bit ±1 vote sums → sign bits → brute-force Hamming ≤ 3 pairs
    // (the engine's pigeonhole banding is complete for d ≤ 3, so the
    // candidate-generation shortcut emits exactly this set)
    "q23_simhash" -> simhashPairsSql,
    // rolling polynomial fingerprint: fold (h*31 + md5_32(token)) mod 2^57
    "q27_rolling_fp" ->
      s"""WITH $cleanToksCte
         |SELECT doc_id,
         |  list_reduce(list_prepend(0::BIGINT, list_transform(ws, t ->
         |    ${md5Bits32Sql("t", 1)})),
         |    (acc, x) -> (acc * 31 + x) % 144115188075855872)::BIGINT AS rolling_fp
         |FROM toks""".stripMargin,
    "q10_window_sliding" ->
      """WITH w AS (
        |  SELECT time_bucket(INTERVAL '6 hours', ts) - to_hours(6*k) AS ws,
        |         event_type, value
        |  FROM events, (VALUES (0),(1),(2),(3)) t(k))
        |SELECT epoch(ws)::BIGINT AS w_start,
        |       epoch(ws + INTERVAL '1 day')::BIGINT AS w_end,
        |       event_type, count(*) AS cnt,
        |       sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
        |FROM w GROUP BY 1, 2, 3 HAVING count(*) >= 20""".stripMargin,
    "q11_window_tumbling" ->
      """SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT AS w_start,
        |       user_id, count(*) AS cnt,
        |       sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q28_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events),
        |g AS (SELECT *, CASE WHEN tsu - lag(tsu) OVER
        |        (PARTITION BY user_id ORDER BY tsu, event_id) > 1800000000
        |        THEN 1 ELSE 0 END AS gap FROM e),
        |s AS (SELECT *, sum(gap) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |        ROWS UNBOUNDED PRECEDING) AS session_seq FROM g)
        |SELECT user_id, session_seq::BIGINT AS session_seq, count(*) AS n_events,
        |       min(tsu) AS session_start_us,
        |       max(tsu) - min(tsu) AS duration_us,
        |       sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
        |FROM s GROUP BY 1, 2""".stripMargin,
    "q12_regression_origin" ->
      """SELECT l_suppkey,
        |  CASE WHEN sxx > 0.0 THEN sxy / sxx ELSE -1.0 END AS slope, n
        |FROM (SELECT l_suppkey,
        |  sum(l_quantity::DECIMAL(18,2) * l_extendedprice::DECIMAL(18,2))::DOUBLE AS sxy,
        |  sum(l_quantity::DECIMAL(18,2) * l_quantity::DECIMAL(18,2))::DOUBLE AS sxx,
        |  count(*) AS n
        |  FROM lineitem GROUP BY 1)""".stripMargin,
    "q09_dedup_exact" ->
      """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
        |       min(doc_id) AS canonical_id, count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,
    "q16_jaccard_neardup" -> jaccardPairsSql,
    // LSH path: candidates from banded MinHash, exact Jaccard re-check ⇒
    // expected rows = the exact pair set (recall-1 contract, see
    // jaccardPairsSql scaladoc)
    "q15_minhash_lsh" -> jaccardPairsSql,
    "q14_knn_cosine" ->
      """WITH ex AS (SELECT vec_id, round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS v,
        |                   unnest(range(len(embedding))) AS i FROM embeddings),
        |n2 AS (SELECT vec_id, sum(v*v)::DOUBLE AS n2 FROM ex GROUP BY 1),
        |dots AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id, sum(a.v*b.v)::DOUBLE AS dot
        |         FROM ex a JOIN ex b ON a.i = b.i AND b.vec_id <> a.vec_id
        |         WHERE a.vec_id < 10 GROUP BY 1, 2),
        |cosx AS (SELECT q_id, n_id, dot / (sqrt(qa.n2) * sqrt(qb.n2)) AS cos
        |         FROM dots JOIN n2 qa ON q_id = qa.vec_id
        |                   JOIN n2 qb ON n_id = qb.vec_id)
        |SELECT q_id, n_id, cos, rnk FROM (
        |  SELECT q_id, n_id, cos,
        |         row_number() OVER (PARTITION BY q_id
        |                            ORDER BY cos DESC, n_id ASC) AS rnk
        |  FROM cosx)
        |WHERE rnk <= 5""".stripMargin,
    "q25_embed_neardup" ->
      """WITH ex AS (SELECT vec_id, round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS v,
        |                   unnest(range(len(embedding))) AS i FROM embeddings),
        |n2 AS (SELECT vec_id, sum(v*v)::DOUBLE AS n2 FROM ex GROUP BY 1),
        |dots AS (SELECT a.vec_id AS x, b.vec_id AS y, sum(a.v*b.v)::DOUBLE AS dot
        |         FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
        |         GROUP BY 1, 2)
        |SELECT x, y, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cos
        |FROM dots JOIN n2 na ON x = na.vec_id JOIN n2 nb ON y = nb.vec_id
        |WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.4""".stripMargin,
    // full hyperplane-LSH re-derivation: md5-derived integer plane
    // weights (mirrors plans.Hyperplanes.weight exactly) → integer sign
    // bits → per-table signatures → bucket candidates → exact re-score
    "q29_ann_lsh" ->
      s"""WITH w AS (SELECT t, p, i,
         |  (${md5Bits32Sql("t || ',' || p || ',' || i", 1)} - 2147483648) AS v
         |  FROM range(8) tt(t), range(6) pp(p), range(64) ii(i)),
         |$embedCtes,
         |dots AS (SELECT vec_id, t, p, sum(e * v)::BIGINT AS dot
         |         FROM ex JOIN w USING (i) GROUP BY 1, 2, 3),
         |sigs AS (SELECT vec_id, t,
         |         sum(CASE WHEN dot > 0 THEN 1::BIGINT << (5 - p)::INT
         |             ELSE 0 END)::BIGINT AS sig
         |         FROM dots GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS n_id
         |         FROM sigs a JOIN sigs b
         |           ON a.t = b.t AND a.sig = b.sig AND b.vec_id <> a.vec_id
         |         WHERE a.vec_id < 10),
         |${rescoreTopKSql(5)}""".stripMargin,
    // full IVF re-derivation: deterministic centroids (vec_id < 16),
    // exact-cosine assignment, 4-probe query fan-out, exact re-score
    "q39_ann_ivf" ->
      s"""WITH $embedCtes,
         |cc AS (SELECT a.vec_id, c.vec_id AS list_id, sum(a.e * c.e)::DOUBLE AS dot
         |       FROM ex a JOIN ex c ON c.vec_id < 16 AND c.i = a.i GROUP BY 1, 2),
         |ccos AS (SELECT cc.vec_id, cc.list_id,
         |                dot / (sqrt(na.n2) * sqrt(nc.n2)) AS ccos
         |         FROM cc JOIN n2 na ON cc.vec_id = na.vec_id
         |                 JOIN n2 nc ON cc.list_id = nc.vec_id),
         |rk AS (SELECT vec_id, list_id,
         |       row_number() OVER (PARTITION BY vec_id
         |                          ORDER BY ccos DESC, list_id ASC) AS crnk
         |       FROM ccos),
         |assigned AS (SELECT vec_id, list_id FROM rk WHERE crnk = 1),
         |probes AS (SELECT vec_id AS q_id, list_id AS p_list
         |           FROM rk WHERE crnk <= 4 AND vec_id < 10),
         |cand AS (SELECT DISTINCT p.q_id, a.vec_id AS n_id
         |         FROM probes p JOIN assigned a
         |           ON a.list_id = p.p_list AND a.vec_id <> p.q_id),
         |${rescoreTopKSql(5)}""".stripMargin,
    "q13_pagerank" -> pagerankSql(10),
    "q24_grid_cells" ->
      """SELECT * FROM (
        |WITH pts AS (SELECT event_id,
        |  -74.06::DOUBLE + (event_id % 40)::DOUBLE * 0.01::DOUBLE AS lon1,
        |  40.49::DOUBLE + ((event_id // 7) % 53)::DOUBLE * 0.01::DOUBLE AS lat1,
        |  -74.05::DOUBLE + ((event_id // 11) % 35)::DOUBLE * 0.01::DOUBLE AS lon2,
        |  40.5::DOUBLE + ((event_id // 13) % 50)::DOUBLE * 0.01::DOUBLE AS lat2
        |  FROM events),
        |nyc AS (SELECT * FROM pts
        |  WHERE NOT (lon1 > -73.7 OR lon1 < -74.05)
        |    AND NOT (lat1 > 41.0 OR lat1 < 40.5)
        |    AND NOT (lon2 > -73.7 OR lon2 < -74.05)
        |    AND NOT (lat2 > 41.0 OR lat2 < 40.5)),
        |cells AS (SELECT *,
        |  floor((abs(-74.05::DOUBLE) - abs(lon1)) / 0.0014::DOUBLE)::INT
        |    + 250 * floor((41.0::DOUBLE - lat1) / 0.00125::DOUBLE)::INT AS cell
        |  FROM nyc)
        |SELECT event_id, cell,
        |  (-((abs(-74.05::DOUBLE) - ((cell % 250) * 0.0014::DOUBLE)
        |      - (0.0014::DOUBLE / 2))::REAL))::REAL AS center_lon,
        |  (41.0::DOUBLE - (((cell - (cell % 250)) / 250) * 0.00125::DOUBLE)
        |      - (0.00125::DOUBLE / 2))::REAL AS center_lat,
        |  round(110.25::DOUBLE * sqrt((lat1 - lat2) * (lat1 - lat2)
        |      + ((lon1 - lon2) * cos(lat2)) * ((lon1 - lon2) * cos(lat2))), 7) AS dist,
        |  trunc(degrees(atan2(lat2 - lat1, (lon2 - lon1) * cos(lat1))))::INT + 179 AS dir
        |FROM cells
        |) WHERE dist > 0.001""".stripMargin,
    "q31_multimodal" ->
      """WITH f AS (SELECT doc_id, strlen(text) AS n_bytes,
        |                  (n_chars % 64 + 1)::INT AS width FROM documents),
        |g AS (SELECT doc_id, n_bytes, width,
        |             ((n_bytes + width - 1) // width)::INT AS height FROM f)
        |SELECT (width % 8) AS width_bucket, count(*) AS n,
        |       sum(n_bytes)::BIGINT AS total_bytes, max(height) AS max_height
        |FROM g GROUP BY 1""".stripMargin,
    "q32_dedup_clusters" -> dedupClustersSql(5),
    // mirror of GeoQueries.cellsOnWayQuery: same synthesized endpoints as
    // q24, same cell-index math, unnest(range(0, steps)) ≙ Spark's
    // explode(sequence(0, steps)), identical double interpolation + round
    "q30_cells_on_way" ->
      """WITH pts AS (SELECT event_id,
        |  -74.06::DOUBLE + (event_id % 40)::DOUBLE * 0.01::DOUBLE AS lon1,
        |  40.49::DOUBLE + ((event_id // 7) % 53)::DOUBLE * 0.01::DOUBLE AS lat1,
        |  -74.05::DOUBLE + ((event_id // 11) % 35)::DOUBLE * 0.01::DOUBLE AS lon2,
        |  40.5::DOUBLE + ((event_id // 13) % 50)::DOUBLE * 0.01::DOUBLE AS lat2
        |  FROM events),
        |nyc AS (SELECT * FROM pts
        |  WHERE NOT (lon1 > -73.7 OR lon1 < -74.05)
        |    AND NOT (lat1 > 41.0 OR lat1 < 40.5)
        |    AND NOT (lon2 > -73.7 OR lon2 < -74.05)
        |    AND NOT (lat2 > 41.0 OR lat2 < 40.5)),
        |seg AS (SELECT event_id,
        |  floor((74.05::DOUBLE - abs(lon1)) / 0.0014::DOUBLE)::INT AS x1,
        |  floor((41.0::DOUBLE - lat1) / 0.00125::DOUBLE)::INT AS y1,
        |  floor((74.05::DOUBLE - abs(lon2)) / 0.0014::DOUBLE)::INT AS x2,
        |  floor((41.0::DOUBLE - lat2) / 0.00125::DOUBLE)::INT AS y2
        |  FROM nyc),
        |st AS (SELECT event_id, x1, y1, x2 - x1 AS dx, y2 - y1 AS dy,
        |       greatest(abs(x2 - x1), abs(y2 - y1)) AS steps FROM seg)
        |SELECT event_id,
        |  (x1 + round(fx * dx)::INT) + 250 * (y1 + round(fx * dy)::INT) AS cell
        |FROM (SELECT *, CASE WHEN steps = 0 THEN 0.0
        |                     ELSE i::DOUBLE / steps::DOUBLE END AS fx
        |      FROM st, unnest(range(0, steps + 1)) AS t(i))""".stripMargin,
    // the reference slope-walk (GeoUtils.java:95-161) re-derived as a
    // recursive CTE: one recursion level per walk step, identical int and
    // double arithmetic to plans.SlopeWalk (incl. the +1e-8 slope
    // denominator and the negative-branch double-step quirk); terminates
    // on this domain (exhaustively scanned, max 619 steps)
    "q49_cells_on_way_exact" ->
      """WITH RECURSIVE pts AS (SELECT event_id,
        |  -74.06::DOUBLE + (event_id % 40)::DOUBLE * 0.01::DOUBLE AS lon1,
        |  40.49::DOUBLE + ((event_id // 7) % 53)::DOUBLE * 0.01::DOUBLE AS lat1,
        |  -74.05::DOUBLE + ((event_id // 11) % 35)::DOUBLE * 0.01::DOUBLE AS lon2,
        |  40.5::DOUBLE + ((event_id // 13) % 50)::DOUBLE * 0.01::DOUBLE AS lat2
        |  FROM events),
        |nyc AS (SELECT * FROM pts
        |  WHERE NOT (lon1 > -73.7 OR lon1 < -74.05)
        |    AND NOT (lat1 > 41.0 OR lat1 < 40.5)
        |    AND NOT (lon2 > -73.7 OR lon2 < -74.05)
        |    AND NOT (lat2 > 41.0 OR lat2 < 40.5)),
        |cellxy AS (SELECT event_id,
        |  floor((74.05::DOUBLE - abs(lon1)) / 0.0014::DOUBLE)::INT AS x1,
        |  floor((41.0::DOUBLE - lat1) / 0.00125::DOUBLE)::INT AS y1,
        |  floor((74.05::DOUBLE - abs(lon2)) / 0.0014::DOUBLE)::INT AS x2,
        |  floor((41.0::DOUBLE - lat2) / 0.00125::DOUBLE)::INT AS y2
        |  FROM nyc),
        |seg AS (SELECT event_id,
        |  CASE WHEN x1 <= x2 THEN x1 ELSE x2 END AS sx,
        |  CASE WHEN x1 <= x2 THEN y1 ELSE y2 END AS sy,
        |  CASE WHEN x1 <= x2 THEN x2 ELSE x1 END AS ex,
        |  CASE WHEN x1 <= x2 THEN y2 ELSE y1 END AS ey,
        |  ((CASE WHEN x1 <= x2 THEN y2 ELSE y1 END)
        |    - (CASE WHEN x1 <= x2 THEN y1 ELSE y2 END))::DOUBLE
        |   / (((CASE WHEN x1 <= x2 THEN x2 ELSE x1 END)
        |    - (CASE WHEN x1 <= x2 THEN x1 ELSE x2 END))::DOUBLE
        |      + 0.00000001::DOUBLE) AS slope
        |  FROM cellxy),
        |walk AS (
        |  SELECT event_id, sx, sy, ex, ey, slope, sx AS cx, sy AS cy FROM seg
        |  UNION ALL
        |  SELECT event_id, sx, sy, ex, ey, slope,
        |    CASE WHEN slope > 0 THEN
        |      CASE WHEN yy > cy - 0.05 AND yy < cy + 0.05 THEN cx + 1
        |           WHEN yy < cy THEN cx + 1 ELSE cx END
        |    ELSE
        |      CASE WHEN yy > cy - 0.05 AND yy < cy + 0.05 THEN cx + 2
        |           WHEN yy > cy THEN cx + 1 ELSE cx END
        |    END AS cx,
        |    CASE WHEN slope > 0 THEN
        |      CASE WHEN yy > cy - 0.05 AND yy < cy + 0.05 THEN cy + 1
        |           WHEN yy < cy THEN cy ELSE cy + 1 END
        |    ELSE
        |      CASE WHEN yy > cy - 0.05 AND yy < cy + 0.05 THEN cy - 1
        |           WHEN yy > cy THEN cy ELSE cy - 1 END
        |    END AS cy
        |  FROM (SELECT *,
        |          (cx - sx + 0.5::DOUBLE) * slope + sy
        |            + (CASE WHEN slope > 0 THEN -0.5 ELSE 0.5 END)::DOUBLE AS yy
        |        FROM walk
        |        WHERE cx < ex OR cy <> ey) s)
        |SELECT event_id, cx + 250 * cy AS cell FROM walk""".stripMargin,
    // PopularPlaces batch projection: same synthesized rides, q10's
    // proven sliding-window alignment, q24's center math
    "q47_popular_places" ->
      """WITH pts AS (SELECT event_id, ts, (event_id % 2 = 0) AS is_start,
        |  -74.06::DOUBLE + (event_id % 40)::DOUBLE * 0.01::DOUBLE AS lon1,
        |  40.49::DOUBLE + ((event_id // 7) % 53)::DOUBLE * 0.01::DOUBLE AS lat1,
        |  -74.05::DOUBLE + ((event_id // 11) % 35)::DOUBLE * 0.01::DOUBLE AS lon2,
        |  40.5::DOUBLE + ((event_id // 13) % 50)::DOUBLE * 0.01::DOUBLE AS lat2
        |  FROM events),
        |nyc AS (SELECT * FROM pts
        |  WHERE NOT (lon1 > -73.7 OR lon1 < -74.05)
        |    AND NOT (lat1 > 41.0 OR lat1 < 40.5)
        |    AND NOT (lon2 > -73.7 OR lon2 < -74.05)
        |    AND NOT (lat2 > 41.0 OR lat2 < 40.5)),
        |cells AS (SELECT ts, is_start,
        |  CASE WHEN is_start
        |    THEN floor((74.05::DOUBLE - abs(lon1)) / 0.0014::DOUBLE)::INT
        |         + 250 * floor((41.0::DOUBLE - lat1) / 0.00125::DOUBLE)::INT
        |    ELSE floor((74.05::DOUBLE - abs(lon2)) / 0.0014::DOUBLE)::INT
        |         + 250 * floor((41.0::DOUBLE - lat2) / 0.00125::DOUBLE)::INT
        |  END AS cell FROM nyc),
        |w AS (SELECT time_bucket(INTERVAL '6 hours', ts) - to_hours(6*k) AS ws,
        |             cell, is_start
        |      FROM cells, (VALUES (0),(1),(2),(3)) t(k)),
        |c AS (SELECT ws, cell, is_start, count(*) AS cnt
        |      FROM w GROUP BY 1, 2, 3 HAVING count(*) >= 3)
        |SELECT
        |  (-((abs(-74.05::DOUBLE) - ((cell % 250) * 0.0014::DOUBLE)
        |      - (0.0014::DOUBLE / 2))::REAL))::REAL AS lon,
        |  (41.0::DOUBLE - (((cell - (cell % 250)) / 250) * 0.00125::DOUBLE)
        |      - (0.00125::DOUBLE / 2))::REAL AS lat,
        |  ws + INTERVAL '1 day' AS window_end, is_start, cnt
        |FROM c""".stripMargin,
    // TravelTimePrediction final model state: the keyed-state fold's
    // quantized sums re-derived as plain integer aggregates (direction is
    // dest -> start, the reference's quirk)
    "q48_prediction_slopes" ->
      """WITH pts AS (SELECT event_id, value,
        |  -74.06::DOUBLE + (event_id % 40)::DOUBLE * 0.01::DOUBLE AS lon1,
        |  40.49::DOUBLE + ((event_id // 7) % 53)::DOUBLE * 0.01::DOUBLE AS lat1,
        |  -74.05::DOUBLE + ((event_id // 11) % 35)::DOUBLE * 0.01::DOUBLE AS lon2,
        |  40.5::DOUBLE + ((event_id // 13) % 50)::DOUBLE * 0.01::DOUBLE AS lat2
        |  FROM events),
        |nyc AS (SELECT * FROM pts
        |  WHERE NOT (lon1 > -73.7 OR lon1 < -74.05)
        |    AND NOT (lat1 > 41.0 OR lat1 < 40.5)
        |    AND NOT (lon2 > -73.7 OR lon2 < -74.05)
        |    AND NOT (lat2 > 41.0 OR lat2 < 40.5)),
        |obs AS (SELECT
        |  floor((74.05::DOUBLE - abs(lon1)) / 0.0014::DOUBLE)::INT
        |    + 250 * floor((41.0::DOUBLE - lat1) / 0.00125::DOUBLE)::INT AS cell,
        |  ((trunc(degrees(atan2(lat1 - lat2, (lon1 - lon2) * cos(lat2))))::INT + 179)
        |    // 45)::INT AS bucket,
        |  round((110.25::DOUBLE * sqrt((lat1 - lat2) * (lat1 - lat2)
        |      + ((lon1 - lon2) * cos(lat2)) * ((lon1 - lon2) * cos(lat2))))
        |    * (110.25::DOUBLE * sqrt((lat1 - lat2) * (lat1 - lat2)
        |      + ((lon1 - lon2) * cos(lat2)) * ((lon1 - lon2) * cos(lat2))))
        |    * 1000000000.0::DOUBLE)::BIGINT AS xx,
        |  round((110.25::DOUBLE * sqrt((lat1 - lat2) * (lat1 - lat2)
        |      + ((lon1 - lon2) * cos(lat2)) * ((lon1 - lon2) * cos(lat2))))
        |    * value * 1000000000.0::DOUBLE)::BIGINT AS xy
        |  FROM nyc
        |  WHERE 110.25::DOUBLE * sqrt((lat1 - lat2) * (lat1 - lat2)
        |      + ((lon1 - lon2) * cos(lat2)) * ((lon1 - lon2) * cos(lat2))) > 0.001)
        |SELECT cell, bucket,
        |  CASE WHEN sum(xx) > 0 THEN sum(xy)::DOUBLE / sum(xx)::DOUBLE
        |       ELSE -1.0 END AS slope,
        |  count(*) AS n
        |FROM obs GROUP BY 1, 2""".stripMargin,
    // sketch error-bound contract: booleans must all be TRUE (see
    // Relational.approxStats scaladoc)
    "q44_approx_stats" ->
      """SELECT event_type, count(*) AS n_events,
        |       TRUE AS hll_in_bound, TRUE AS p50_in_bound
        |FROM events GROUP BY 1""".stripMargin,
    "q33_salted_agg" ->
      """SELECT event_type, count(*) AS cnt,
        |       sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
        |FROM events GROUP BY 1""".stripMargin,
    "q34_asof_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |                  epoch_us(ts) AS tsu FROM events),
        |w AS (SELECT *,
        |  last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pcv,
        |  last_value(CASE WHEN event_type = 'click' THEN tsu END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pct
        |  FROM e)
        |SELECT user_id, event_id, tsu,
        |       coalesce(pcv, -1.0) AS prev_click_value,
        |       coalesce(pct, -1) AS prev_click_tsu
        |FROM w WHERE event_type = 'purchase'""".stripMargin,
    "q35_member_otd" ->
      """WITH counts AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, user_id, count(*) AS cnt
        |  FROM events WHERE event_type <> 'error' GROUP BY 1, 2)
        |SELECT day, user_id, cnt FROM (
        |  SELECT day, user_id, cnt,
        |         rank() OVER (PARTITION BY day ORDER BY cnt DESC) AS rnk
        |  FROM counts)
        |WHERE rnk = 1""".stripMargin,
    "q36_distinct_stats" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |       count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,
    "q37_rollup" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |       coalesce(user_id::VARCHAR, 'ALL') AS user_id,
        |       count(*) AS cnt,
        |       sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
        |FROM events GROUP BY ROLLUP (event_type, user_id)""".stripMargin,
    "q38_percentiles" ->
      """SELECT event_type,
        |       quantile_cont(value, 0.5) AS p50,
        |       quantile_cont(value, 0.9) AS p90
        |FROM events GROUP BY 1""".stripMargin,
    "q40_anti_join" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |  AND user_id NOT IN
        |    (SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 190)""".stripMargin,
    // oracle derives the same 30-min-gap sessions from first principles
    // (lag + running sum) — cross-checks Spark's native session_window
    "q41_session_window" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events),
        |g AS (SELECT *, CASE WHEN tsu - lag(tsu) OVER
        |        (PARTITION BY user_id ORDER BY tsu, event_id) > 1800000000
        |        THEN 1 ELSE 0 END AS gap FROM e),
        |s AS (SELECT *, sum(gap) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |        ROWS UNBOUNDED PRECEDING) AS session_seq FROM g)
        |SELECT user_id, min(tsu) AS session_start_us, count(*) AS n_events,
        |       sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
        |FROM s GROUP BY user_id, session_seq""".stripMargin,
    // full curation pipeline re-derived from scratch: quality gate,
    // md5 exact-dedup canonical, 3-gram Jaccard>=0.5 near-dup removal,
    // per-lang doc count + BPE token budget
    "q42_curation_pipeline" ->
      """WITH toksr AS (SELECT doc_id, lang,
        |         regexp_split_to_array(lower(text), '\s+') AS w,
        |         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |       FROM documents),
        |q AS (SELECT * FROM toksr WHERE len(w) >= 30),
        |canon AS (SELECT fp, min(doc_id) AS keep_id FROM q GROUP BY 1),
        |exact_kept AS (SELECT q.doc_id, q.lang, q.w
        |               FROM q JOIN canon ON q.doc_id = canon.keep_id),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
        |        FROM documents) tw,
        |       unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |losers AS (SELECT DISTINCT y AS doc_id
        |           FROM inter JOIN sizes sa ON x = sa.doc_id
        |                      JOIN sizes sb ON y = sb.doc_id
        |           WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.5),
        |curated AS (SELECT * FROM exact_kept
        |            WHERE doc_id NOT IN (SELECT doc_id FROM losers))
        |SELECT lang, count(*) AS n_docs,
        |       sum(list_sum(list_transform(w,
        |           x -> floor((strlen(x)+3)/4)::BIGINT)))::BIGINT AS bpe_tokens
        |FROM curated GROUP BY 1""".stripMargin,
    // same derivation as q34 — the custom AsOfJoinExec must reproduce the
    // relational as-of semantics exactly
    "q43_asof_custom" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |                  epoch_us(ts) AS tsu FROM events),
        |w AS (SELECT *,
        |  last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pcv,
        |  last_value(CASE WHEN event_type = 'click' THEN tsu END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pct
        |  FROM e)
        |SELECT user_id, event_id, tsu,
        |       coalesce(pcv, -1.0) AS prev_click_value,
        |       coalesce(pct, -1) AS prev_click_tsu
        |FROM w WHERE event_type = 'purchase'""".stripMargin,
    "q45_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin,
    "q46_except" ->
      """SELECT user_id FROM events WHERE event_type = 'view'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'signup' AND value > 180""".stripMargin,
    // adjacent-duplicate-token collapse: DuckDB's positional list_filter
    // lambda (1-based i, ws[i-1] = previous element) ≙ Spark's positional
    // filter HOF (0-based i, element_at(ws, i) = previous element)
    "q50_normalize" ->
      """WITH toks AS (SELECT doc_id,
        |  regexp_split_to_array(lower(text), '\s+') AS ws FROM documents),
        |k AS (SELECT doc_id, ws,
        |  list_filter(ws, (t, i) -> i = 1 OR ws[i-1] <> t) AS kept FROM toks)
        |SELECT doc_id, array_to_string(kept, ' ') AS norm_text,
        |       (len(ws) - len(kept))::BIGINT AS n_collapsed
        |FROM k""".stripMargin,
    "q51_repetition" ->
      """WITH toks AS (SELECT doc_id,
        |  regexp_split_to_array(lower(text), '\s+') AS ws FROM documents),
        |tc AS (SELECT doc_id, w, count(*) AS c
        |       FROM (SELECT doc_id, unnest(ws) AS w FROM toks) GROUP BY 1, 2),
        |ts AS (SELECT doc_id, sum(c) AS n, max(c) AS maxc,
        |              sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dupc
        |       FROM tc GROUP BY 1),
        |bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b
        |       FROM toks, unnest(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
        |bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
        |bs AS (SELECT doc_id, sum(c) AS bn,
        |              sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS bdup
        |       FROM bc GROUP BY 1)
        |SELECT ts.doc_id, n::BIGINT AS n_tokens,
        |       maxc::DOUBLE / n::DOUBLE AS top_token_frac,
        |       dupc::DOUBLE / n::DOUBLE AS dup_token_frac,
        |       coalesce(bdup::DOUBLE / bn::DOUBLE, 0.0::DOUBLE) AS dup_bigram_frac
        |FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id""".stripMargin,
    "q52_hash_split" ->
      s"""SELECT doc_id, bucket,
         |  CASE WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'validation'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id,
         |  ${md5Bits32Sql("'split:' || doc_id::VARCHAR", 1)} % 100 AS bucket
         |  FROM documents)""".stripMargin,
    "q53_stratified_sample" ->
      s"""WITH b AS (SELECT doc_id, lang,
         |  ${md5Bits32Sql("'strat:' || doc_id::VARCHAR", 1)} % 100 AS h
         |  FROM documents),
         |r AS (SELECT doc_id, lang,
         |  row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS smp_rank
         |  FROM b),
         |t AS (SELECT min(c) AS t FROM
         |      (SELECT count(*) AS c FROM documents GROUP BY lang))
         |SELECT doc_id, lang, smp_rank::BIGINT AS smp_rank
         |FROM r, t WHERE smp_rank <= t.t""".stripMargin,
    "q54_domain_mixture" ->
      """WITH g AS (SELECT lang, source, count(*) AS n_docs,
        |                  sum(n_chars)::BIGINT AS n_chars
        |           FROM documents GROUP BY 1, 2),
        |t AS (SELECT sum(n_docs)::BIGINT AS total, count(*) AS n_groups FROM g)
        |SELECT lang, source, n_docs, n_chars,
        |       n_docs::DOUBLE / total::DOUBLE AS frac,
        |       (1.0::DOUBLE / n_groups::DOUBLE)
        |         / (n_docs::DOUBLE / total::DOUBLE) AS weight
        |FROM g, t""".stripMargin,
    // the IVF-blocked pair derivation (semanticDedup's default pairGen):
    // Lloyd-trained quantizer (2 updates, the q67 trajectory), 4-probe
    // multi-assignment, probe-set-intersection candidates (self-join),
    // exact quantized re-score, then the greedy keep-lowest-id rule
    "q55_semantic_dedup" ->
      s"""WITH $embedCtes,
         |${kmeansCentroidCtes(8, 2)},
         |ad AS (SELECT x.vec_id, c.cid, sum((x.e - c.cq) * (x.e - c.cq))::BIGINT AS dist
         |       FROM ex x JOIN c2 c ON x.i = c.i GROUP BY 1, 2),
         |pr AS (SELECT vec_id, cid FROM (
         |         SELECT vec_id, cid,
         |                row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |         FROM ad) WHERE rn <= 4),
         |cand AS (SELECT DISTINCT p.vec_id AS x, b.vec_id AS y
         |         FROM pr p JOIN pr b ON p.cid = b.cid AND p.vec_id < b.vec_id),
         |dots AS (SELECT c.x, c.y, sum(a.e * b.e)::DOUBLE AS dot
         |         FROM cand c JOIN ex a ON a.vec_id = c.x
         |                     JOIN ex b ON b.vec_id = c.y AND b.i = a.i
         |         GROUP BY 1, 2),
         |pairs AS (SELECT x, y FROM dots
         |          JOIN n2 na ON x = na.vec_id JOIN n2 nb ON y = nb.vec_id
         |          WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.4)
         |SELECT e.vec_id, e.label FROM embeddings e
         |WHERE e.vec_id NOT IN (SELECT y FROM pairs)""".stripMargin,
    // sliding 32-token window, stride 24: range(0, len, 24) ≙ Spark's
    // explode(sequence(0, len-1, 24)); list_slice is 1-based inclusive
    "q56_chunking" ->
      """WITH toks AS (SELECT doc_id,
        |  regexp_split_to_array(lower(text), '\s+') AS ws FROM documents)
        |SELECT doc_id, (start // 24)::BIGINT AS chunk_id,
        |  array_to_string(list_slice(ws, start + 1, least(start + 32, len(ws))), ' ')
        |    AS chunk_text,
        |  least(32, len(ws) - start)::BIGINT AS n_tokens
        |FROM toks, unnest(range(0, len(ws), 24)) AS t(start)""".stripMargin,
    "q57_seq_packing" ->
      """WITH n AS (SELECT doc_id, source,
        |  list_sum(list_transform(regexp_split_to_array(lower(text), '\s+'),
        |    w -> floor((strlen(w)+3)/4)::BIGINT))::BIGINT AS n_toks
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_toks,
        |  sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        |  FROM n)
        |SELECT doc_id, source, n_toks,
        |  ((cum - n_toks) // 2048)::BIGINT AS pack_id,
        |  ((cum - n_toks) % 2048)::BIGINT AS pack_offset
        |FROM c""".stripMargin,
    // exact integer sums at the shared 1e7 quantization scale, divided
    // back out with the same parenthesization as the engine
    "q58_label_centroids" ->
      """WITH ex AS (SELECT label,
        |  round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS q,
        |  unnest(range(len(embedding))) AS i FROM embeddings)
        |SELECT label, i::BIGINT AS i,
        |  (sum(q)::DOUBLE / 10000000.0) / count(*)::DOUBLE AS mean
        |FROM ex GROUP BY label, i""".stripMargin,
    // 5-gram overlap vs the deterministic 5% eval bucket; docs with < 5
    // tokens re-enter with n_overlap = 0 via the left join
    "q59_decontaminate" -> decontaminateSql,
    // the exact same patterns Spark runs (TextFunctions.PiiPatterns) —
    // kept in the Java/RE2-shared regex subset; 'g' = replace all
    "q60_pii_scan" -> {
      import graft.functions.TextFunctions.PiiPatterns
      val counts = PiiPatterns.map { case (k, p) =>
        s"len(regexp_extract_all(text, '$p'))::BIGINT AS n_$k"
      }.mkString(",\n|       ")
      val redacted = PiiPatterns.foldLeft("text") { case (acc, (k, p)) =>
        s"regexp_replace($acc, '$p', '<${k.toUpperCase}>', 'g')"
      }
      s"""SELECT doc_id,
         |       $counts,
         |       strlen($redacted)::BIGINT AS redacted_len
         |FROM documents""".stripMargin
    },
    "q61_boilerplate" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
        |              FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM toks, unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3)),
        |df AS (SELECT s, count(*) AS df FROM sh GROUP BY 1),
        |nd AS (SELECT count(*) AS n FROM documents),
        |b AS (SELECT s FROM df, nd WHERE df >= ceil(0.01 * n)),
        |pd AS (SELECT sh.doc_id, count(*) AS n_shingles,
        |              sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS n_boiler
        |       FROM sh LEFT JOIN b ON sh.s = b.s GROUP BY 1)
        |SELECT doc_id, n_shingles::BIGINT AS n_shingles, n_boiler::BIGINT AS n_boiler,
        |       n_boiler::DOUBLE / n_shingles::DOUBLE AS boiler_frac FROM pd""".stripMargin,
    "q62_kmeans" -> kmeansSql(8, 3),
    // q16's exact pair derivation × q52's split map: near-dup pairs that
    // straddle split boundaries
    "q63_split_leakage" ->
      s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
         |              FROM documents),
         |sh AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM toks, unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3)),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |pairs AS (SELECT x, y
         |          FROM inter JOIN sizes sa ON x = sa.doc_id
         |                     JOIN sizes sb ON y = sb.doc_id
         |          WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.5),
         |sp AS (SELECT doc_id,
         |  CASE WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'validation'
         |       ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |    ${md5Bits32Sql("'split:' || doc_id::VARCHAR", 1)} % 100 AS bucket
         |    FROM documents))
         |SELECT least(a.split, b.split) AS split_a,
         |       greatest(a.split, b.split) AS split_b,
         |       count(*)::BIGINT AS n_pairs
         |FROM pairs JOIN sp a ON pairs.x = a.doc_id
         |           JOIN sp b ON pairs.y = b.doc_id
         |GROUP BY 1, 2""".stripMargin,
    "q64_bpe_pairs" ->
      """WITH wc AS (SELECT w, count(*) AS n FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |    FROM documents) GROUP BY 1)
        |SELECT substr(w, i::INT, 2) AS pair, sum(n)::BIGINT AS cnt
        |FROM wc, unnest(range(1, strlen(w))) AS t(i)
        |WHERE strlen(w) >= 2
        |GROUP BY 1""".stripMargin,
    // stochastic-rounded copy counts from the q54 weights, decided by the
    // doc's own md5 bucket — deterministic in both engines
    "q65_mixture_materialize" ->
      s"""WITH g AS (SELECT lang, source, count(*) AS n_docs FROM documents GROUP BY 1, 2),
         |t AS (SELECT sum(n_docs)::BIGINT AS total, count(*) AS n_groups FROM g),
         |w AS (SELECT lang, source,
         |        (1.0::DOUBLE / n_groups::DOUBLE)
         |          / (n_docs::DOUBLE / total::DOUBLE) AS weight FROM g, t),
         |dc AS (SELECT d.doc_id, d.lang, d.source, w.weight,
         |         CASE WHEN ${md5Bits32Sql("'mix:' || doc_id::VARCHAR", 1)} % 100
         |                   < round((w.weight - floor(w.weight)) * 100)::BIGINT
         |              THEN 1 ELSE 0 END AS extra
         |       FROM documents d JOIN w ON d.lang = w.lang AND d.source = w.source),
         |nc AS (SELECT doc_id, lang, source,
         |              least(floor(weight)::BIGINT + extra, 10) AS n_copies FROM dc)
         |SELECT doc_id, lang, source, unnest(range(1, n_copies + 1))::BIGINT AS copy_id
         |FROM nc WHERE n_copies >= 1""".stripMargin,
    // centroid components re-quantized via the k-means update formula,
    // cosine in the exact cosineFromParts parenthesization
    "q66_centroid_outliers" ->
      """WITH ex AS (SELECT vec_id, label,
        |  round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS q,
        |  unnest(range(len(embedding))) AS i FROM embeddings),
        |n2 AS (SELECT vec_id, sum(q*q)::BIGINT AS n2 FROM ex GROUP BY 1),
        |cent AS (SELECT label, i, round(sum(q)::DOUBLE / count(*))::BIGINT AS cq
        |         FROM ex GROUP BY 1, 2),
        |cn2 AS (SELECT label, sum(cq*cq)::BIGINT AS cn2 FROM cent GROUP BY 1),
        |dots AS (SELECT e.vec_id, e.label, sum(e.q * c.cq)::BIGINT AS dot
        |         FROM ex e JOIN cent c ON e.label = c.label AND e.i = c.i
        |         GROUP BY 1, 2),
        |sc AS (SELECT d.vec_id, d.label,
        |         d.dot::DOUBLE / (sqrt(n2.n2::DOUBLE) * sqrt(cn2.cn2::DOUBLE)) AS ccos
        |       FROM dots d JOIN n2 ON d.vec_id = n2.vec_id
        |                   JOIN cn2 ON d.label = cn2.label),
        |sz AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
        |r AS (SELECT vec_id, label, ccos,
        |        row_number() OVER (PARTITION BY label ORDER BY ccos, vec_id) AS rn
        |      FROM sc)
        |SELECT r.vec_id, r.label, r.ccos, (r.rn <= ceil(0.05 * sz.n)) AS outlier
        |FROM r JOIN sz ON r.label = sz.label""".stripMargin,
    // full IVF pipeline with the Lloyd-trained quantizer: training
    // trajectory (2 updates) + L2 assignment + 3-probe + exact rescore
    "q67_ann_ivf_kmeans" ->
      s"""WITH $embedCtes,
         |${kmeansCentroidCtes(8, 2)},
         |ad AS (SELECT x.vec_id, c.cid, sum((x.e - c.cq) * (x.e - c.cq))::BIGINT AS dist
         |       FROM ex x JOIN c2 c ON x.i = c.i GROUP BY 1, 2),
         |adr AS (SELECT vec_id, cid,
         |               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |        FROM ad),
         |asg AS (SELECT vec_id, cid FROM adr WHERE rn = 1),
         |qp AS (SELECT vec_id AS q_id, cid FROM adr WHERE vec_id < 10 AND rn <= 3),
         |cand AS (SELECT qp.q_id, a.vec_id AS n_id
         |         FROM qp JOIN asg a ON qp.cid = a.cid AND a.vec_id <> qp.q_id),
         |${rescoreTopKSql(5)}""".stripMargin,
    // positional 10-grams (dups kept), cross-doc df >= 2 filter, then the
    // interval-union sweep via one running-max window — both engines run
    // the identical integer sweep
    "q68_substring_dup" ->
      s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
         |              FROM documents),
         |pg AS (SELECT doc_id, i AS p,
         |         ${(0 until 10).map(j => s"w[i+$j]").mkString(" || ' ' || ")} AS s
         |       FROM toks, unnest(range(1, len(w)-8)) AS t(i) WHERE len(w) >= 10),
         |dupg AS (SELECT s FROM (
         |           SELECT s, count(DISTINCT doc_id) AS df FROM pg GROUP BY 1)
         |         WHERE df >= 2),
         |occ AS (SELECT doc_id, p FROM pg JOIN dupg USING (s)),
         |sw AS (SELECT doc_id, p,
         |         max(p + 9) OVER (PARTITION BY doc_id ORDER BY p
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |       FROM occ),
         |cv AS (SELECT doc_id,
         |         sum(greatest(0, (p + 9) - greatest(coalesce(prev_end, 0), p - 1)))::BIGINT
         |           AS covered
         |       FROM sw GROUP BY 1)
         |SELECT t.doc_id, len(t.w)::BIGINT AS n_tokens,
         |       coalesce(cv.covered, 0)::BIGINT AS covered_tokens,
         |       coalesce(cv.covered, 0)::DOUBLE / len(t.w)::DOUBLE AS dup_frac
         |FROM toks t LEFT JOIN cv ON t.doc_id = cv.doc_id""".stripMargin,
    // per-word surprisal quantized to 1e6 once per vocab entry; document
    // sums are exact integer adds
    "q69_surprisal" ->
      """WITH tk AS (SELECT doc_id,
        |  unnest(regexp_split_to_array(lower(text), '\s+')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS c FROM tk GROUP BY 1),
        |tot AS (SELECT sum(c)::BIGINT AS t FROM wc),
        |s AS (SELECT w, round((-log2(c::DOUBLE / t::DOUBLE)) * 1000000.0)::BIGINT AS sq
        |      FROM wc, tot)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(sq)::BIGINT AS bits_q,
        |       sum(sq)::DOUBLE / (count(*)::DOUBLE * 1000000.0) AS mean_surprisal
        |FROM tk JOIN s USING (w) GROUP BY 1""".stripMargin,
    "q70_shard_plan" ->
      s"""SELECT doc_id, lang, source,
         |  ${md5Bits32Sql("'shard:' || doc_id::VARCHAR", 1)} % 8 AS shard
         |FROM documents""".stripMargin,
    // incoming 10% slice checked against the existing 90% only — exact
    // fingerprint semi-join + asymmetric shingle-index probe
    "q71_incremental_dedup" ->
      s"""WITH b AS (SELECT doc_id, text,
         |  ${md5Bits32Sql("'incr:' || doc_id::VARCHAR", 1)} % 100 AS bk FROM documents),
         |inc AS (SELECT doc_id, text FROM b WHERE bk >= 90),
         |ex AS (SELECT doc_id, text FROM b WHERE bk < 90),
         |ed AS (SELECT DISTINCT i.doc_id FROM
         |  (SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
         |   FROM inc) i
         |  JOIN (SELECT DISTINCT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
         |        FROM ex) e USING (fp)),
         |ish AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM inc) t,
         |       unnest(range(1, len(w)-1)) AS u(i) WHERE len(w) >= 3)),
         |esh AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM ex) t,
         |       unnest(range(1, len(w)-1)) AS u(i) WHERE len(w) >= 3)),
         |isz AS (SELECT doc_id, count(*) AS sz FROM ish GROUP BY 1),
         |esz AS (SELECT doc_id, count(*) AS sz FROM esh GROUP BY 1),
         |nd AS (SELECT DISTINCT p.x FROM (
         |    SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS inter
         |    FROM ish a JOIN esh b ON a.s = b.s GROUP BY 1, 2) p
         |  JOIN isz ON p.x = isz.doc_id JOIN esz ON p.y = esz.doc_id
         |  WHERE inter::DOUBLE / (isz.sz + esz.sz - inter) >= 0.5)
         |SELECT inc.doc_id,
         |  (ed.doc_id IS NOT NULL) AS exact_dup,
         |  (nd.x IS NOT NULL) AS near_dup,
         |  (ed.doc_id IS NULL AND nd.x IS NULL) AS keep
         |FROM inc LEFT JOIN ed ON inc.doc_id = ed.doc_id
         |         LEFT JOIN nd ON inc.doc_id = nd.x""".stripMargin,
    // frequency-ranked vocabulary ids (1 = most frequent, ties lexical)
    "q72_tokenize_ids" ->
      """WITH toks AS (SELECT doc_id,
        |  regexp_split_to_array(lower(text), '\s+') AS ws FROM documents),
        |tk AS (SELECT doc_id, i AS pos, ws[i] AS w
        |       FROM toks, unnest(range(1, len(ws)+1)) AS t(i)),
        |wc AS (SELECT w, count(*) AS c FROM tk GROUP BY 1),
        |v AS (SELECT w, row_number() OVER (ORDER BY c DESC, w) AS token_id FROM wc)
        |SELECT tk.doc_id, tk.pos::BIGINT AS pos, v.token_id::BIGINT AS token_id
        |FROM tk JOIN v USING (w)""".stripMargin,
    "q73_bigram_lm" ->
      """WITH toks AS (SELECT regexp_split_to_array(lower(text), '\s+') AS w
        |              FROM documents),
        |bg AS (SELECT w[i] AS w1, w[i+1] AS w2
        |       FROM toks, unnest(range(1, len(w))) AS t(i) WHERE len(w) >= 2),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY 1)
        |SELECT c12.w1, c12.w2, c12.c12, c1.c1,
        |       c12.c12::DOUBLE / c1.c1::DOUBLE AS p
        |FROM c12 JOIN c1 USING (w1)""".stripMargin,
    // q69's surprisal scores + a corpus-median keep band
    "q74_calibrated_filter" ->
      """WITH tk AS (SELECT doc_id,
        |  unnest(regexp_split_to_array(lower(text), '\s+')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS c FROM tk GROUP BY 1),
        |tot AS (SELECT sum(c)::BIGINT AS t FROM wc),
        |s AS (SELECT w, round((-log2(c::DOUBLE / t::DOUBLE)) * 1000000.0)::BIGINT AS sq
        |      FROM wc, tot),
        |sc AS (SELECT doc_id,
        |         sum(sq)::DOUBLE / (count(*)::DOUBLE * 1000000.0) AS mean_surprisal
        |       FROM tk JOIN s USING (w) GROUP BY 1),
        |m AS (SELECT quantile_cont(mean_surprisal, 0.5) AS med FROM sc)
        |SELECT doc_id, mean_surprisal, med,
        |       (abs(mean_surprisal - med) <= 0.2 * med) AS keep
        |FROM sc, m""".stripMargin,
    // q57's pack assignment + ordered concatenation per pack, emitted as
    // md5 (the verifiable contract for the assembled training example)
    "q75_pack_materialize" ->
      """WITH n AS (SELECT doc_id, source, text,
        |  list_sum(list_transform(regexp_split_to_array(lower(text), '\s+'),
        |    w -> floor((strlen(w)+3)/4)::BIGINT))::BIGINT AS n_toks
        |  FROM documents),
        |c AS (SELECT doc_id, source, text, n_toks,
        |  sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        |  FROM n)
        |SELECT source, ((cum - n_toks) // 2048)::BIGINT AS pack_id,
        |       count(*)::BIGINT AS n_docs, sum(n_toks)::BIGINT AS n_tokens,
        |       md5(string_agg(text, ' <eod> ' ORDER BY doc_id)) AS pack_md5
        |FROM c GROUP BY 1, 2""".stripMargin,
    // the one-pass per-source datasheet: exact counts/sums/distincts +
    // exact median of the normalized mean token length
    "q76_corpus_report" ->
      """WITH per AS (SELECT source, lang, n_chars,
        |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
        |  list_sum(list_transform(regexp_split_to_array(lower(text), '\s+'),
        |    w -> floor((strlen(w)+3)/4)::BIGINT))::BIGINT AS bpe,
        |  strlen(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))::DOUBLE
        |    / len(regexp_split_to_array(lower(text), '\s+'))::DOUBLE AS mtl
        |  FROM documents)
        |SELECT source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS n_chars,
        |       sum(bpe)::BIGINT AS bpe_tokens,
        |       count(DISTINCT lang)::BIGINT AS n_langs,
        |       (count(*) - count(DISTINCT fp))::BIGINT AS n_exact_dups,
        |       quantile_cont(mtl, 0.5) AS p50_mean_tok_len
        |FROM per GROUP BY 1""".stripMargin,
    // q73's LM + 1e6-quantized per-bigram surprisal, exact doc sums
    "q77_bigram_surprisal" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
        |              FROM documents),
        |bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        |       FROM toks, unnest(range(1, len(w))) AS t(i) WHERE len(w) >= 2),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY 1),
        |s AS (SELECT c12.w1, c12.w2,
        |        round((-log2(c12.c12::DOUBLE / c1.c1::DOUBLE)) * 1000000.0)::BIGINT AS sq
        |      FROM c12 JOIN c1 USING (w1)),
        |pd AS (SELECT bg.doc_id, count(*) AS n_bigrams, sum(s.sq)::BIGINT AS bits_q
        |       FROM bg JOIN s ON bg.w1 = s.w1 AND bg.w2 = s.w2 GROUP BY 1)
        |SELECT d.doc_id, coalesce(pd.n_bigrams, 0)::BIGINT AS n_bigrams,
        |       coalesce(pd.bits_q, 0)::BIGINT AS bits_q,
        |       coalesce(pd.bits_q::DOUBLE / (pd.n_bigrams::DOUBLE * 1000000.0), 0.0)
        |         AS mean_bigram_surprisal
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id""".stripMargin,
    // q18's stop_ratio × q66's centroid-cosine outlier flag, fused on id
    "q78_crossmodal_quality" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws
         |           FROM documents),
         |tq AS (SELECT doc_id,
         |  len(list_filter(ws, x -> list_contains($stopList, x)))::DOUBLE / len(ws)
         |    AS stop_ratio FROM t),
         |ex AS (SELECT vec_id, label,
         |  round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS q,
         |  unnest(range(len(embedding))) AS i FROM embeddings),
         |n2 AS (SELECT vec_id, sum(q*q)::BIGINT AS n2 FROM ex GROUP BY 1),
         |cent AS (SELECT label, i, round(sum(q)::DOUBLE / count(*))::BIGINT AS cq
         |         FROM ex GROUP BY 1, 2),
         |cn2 AS (SELECT label, sum(cq*cq)::BIGINT AS cn2 FROM cent GROUP BY 1),
         |dots AS (SELECT e.vec_id, e.label, sum(e.q * c.cq)::BIGINT AS dot
         |         FROM ex e JOIN cent c ON e.label = c.label AND e.i = c.i
         |         GROUP BY 1, 2),
         |sc AS (SELECT d.vec_id, d.label,
         |         d.dot::DOUBLE / (sqrt(n2.n2::DOUBLE) * sqrt(cn2.cn2::DOUBLE)) AS ccos
         |       FROM dots d JOIN n2 ON d.vec_id = n2.vec_id
         |                   JOIN cn2 ON d.label = cn2.label),
         |sz AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
         |r AS (SELECT vec_id, label, ccos,
         |        row_number() OVER (PARTITION BY label ORDER BY ccos, vec_id) AS rn
         |      FROM sc)
         |SELECT r.vec_id AS doc_id, r.label, tq.stop_ratio, r.ccos,
         |       (r.rn <= ceil(0.05 * sz.n)) AS outlier,
         |       (NOT (r.rn <= ceil(0.05 * sz.n)) AND tq.stop_ratio >= 0.01) AS keep
         |FROM r JOIN sz ON r.label = sz.label
         |       JOIN tq ON r.vec_id = tq.doc_id""".stripMargin,
    "q79_bpe_train" -> bpeTrainSql(3),
    // sketch error-bound contracts (the q44 pattern): booleans must all be
    // TRUE — see Text.corpusReportApprox / calibratedFilterApprox scaladocs
    "q80_report_approx" ->
      """SELECT source, count(*) AS n_docs,
        |       TRUE AS fp_in_bound, TRUE AS p50_in_bound
        |FROM documents GROUP BY 1""".stripMargin,
    "q81_calibrated_approx" ->
      """SELECT count(*) AS n_docs,
        |       TRUE AS med_in_bound, TRUE AS keep_in_bound
        |FROM documents""".stripMargin,
    "q82_canonical_docs" -> canonicalDocsSql(5),
    "q83_interp_surprisal" -> interpSurprisalSql(0.7),
    // DSIR log importance ratio: add-one-smoothed target unigram LM over
    // the corpus vocabulary vs the raw corpus LM, quantized per word
    "q84_dsir_weights" ->
      """WITH tk AS (SELECT doc_id, lang,
        |              unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |            FROM documents),
        |u AS (SELECT w, count(*) AS c FROM tk GROUP BY 1),
        |tc AS (SELECT w, count(*) AS ct FROM tk WHERE lang = 'en' GROUP BY 1),
        |v AS (SELECT u.w, u.c, coalesce(tc.ct, 0)::BIGINT AS ct
        |      FROM u LEFT JOIN tc USING (w)),
        |sc AS (SELECT count(*)::BIGINT AS vs, sum(ct)::BIGINT AS tt,
        |              sum(c)::BIGINT AS total FROM v),
        |s AS (SELECT v.w,
        |        round((log2((v.ct + 1)::DOUBLE / (sc.tt + sc.vs)::DOUBLE) -
        |               log2(v.c::DOUBLE / sc.total::DOUBLE))
        |              * 1000000.0)::BIGINT AS sq
        |      FROM v, sc)
        |SELECT tk.doc_id, count(*) AS n_tokens, sum(s.sq)::BIGINT AS logratio_q,
        |       (sum(s.sq)::DOUBLE / 1000000.0) AS log_ratio
        |FROM tk JOIN s USING (w) GROUP BY 1""".stripMargin,
    // first-occurrence novelty over the q16 shingle construction
    "q85_ngram_novelty" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
        |              FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM toks, unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3)),
        |f AS (SELECT s, min(doc_id) AS fd FROM sh GROUP BY 1),
        |pd AS (SELECT sh.doc_id, count(*) AS n_grams,
        |         sum(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel
        |       FROM sh JOIN f USING (s) GROUP BY 1)
        |SELECT d.doc_id, coalesce(pd.n_grams, 0)::BIGINT AS n_grams,
        |       coalesce(pd.n_novel, 0)::BIGINT AS n_novel,
        |       coalesce(pd.n_novel::DOUBLE / pd.n_grams, 0.0) AS novelty
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id""".stripMargin,
    // converged propagation == the 5-step contract on this corpus: planted
    // dup components have diameter <= 2 (see dedupLabelsConverged scaladoc;
    // the deep-chain divergence case is spec-tested on synthetic edges)
    "q86_cc_converged" -> dedupClustersSql(5),
    // true CC again (big-star/small-star) — same oracle contract as q86
    "q87_cc_star" -> dedupClustersSql(5),
    // maximal cross-doc duplicate runs: same diagonal-run (gaps-and-
    // islands) construction as Dedup.maxDupRuns — seed grams with df>=2,
    // equal-gram cross-doc pairs, consecutive positions per (partner,
    // diagonal) = one run of len count+9, then max + interval union
    "q88_max_dup_run" ->
      s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
         |              FROM documents),
         |pg AS (SELECT doc_id, i AS p,
         |         ${(0 until 10).map(j => s"w[i+$j]").mkString(" || ' ' || ")} AS s
         |       FROM toks, unnest(range(1, len(w)-8)) AS t(i) WHERE len(w) >= 10),
         |dupg AS (SELECT s FROM (
         |           SELECT s, count(DISTINCT doc_id) AS df FROM pg GROUP BY 1)
         |         WHERE df >= 2),
         |occ AS (SELECT doc_id, p, s FROM pg JOIN dupg USING (s)),
         |pairs AS (SELECT a.doc_id AS doc_id, a.p AS p, b.doc_id AS od,
         |            a.p - b.p AS diag
         |          FROM occ a JOIN occ b ON a.s = b.s AND a.doc_id <> b.doc_id),
         |runs AS (SELECT doc_id, od, diag, grp, min(p) AS start,
         |           count(*) + 9 AS len
         |         FROM (SELECT doc_id, p, od, diag,
         |                 p - row_number() OVER (
         |                   PARTITION BY doc_id, od, diag ORDER BY p) AS grp
         |               FROM pairs)
         |         GROUP BY 1, 2, 3, 4),
         |sw AS (SELECT doc_id, start, len,
         |         max(start + len - 1) OVER (PARTITION BY doc_id
         |           ORDER BY start, (start + len) DESC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |       FROM runs),
         |pd AS (SELECT doc_id, max(len) AS mx,
         |         sum(greatest(0, (start + len - 1)
         |           - greatest(coalesce(prev_end, 0), start - 1))) AS covered
         |       FROM sw GROUP BY 1)
         |SELECT t.doc_id, len(t.w)::BIGINT AS n_tokens,
         |       coalesce(pd.mx, 0)::BIGINT AS max_dup_run,
         |       coalesce(pd.covered, 0)::BIGINT AS covered_tokens
         |FROM toks t LEFT JOIN pd ON t.doc_id = pd.doc_id""".stripMargin,
    // trigram stupid backoff (α=0.4), LM trained on the q52 80% train
    // bucket, scored over ALL docs; CASE nesting mirrors Text
    // .backoffSurprisal's `when` tree operation-for-operation so the
    // doubles agree before the per-type 1e6 quantization
    "q89_backoff_surprisal" ->
      s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
         |              FROM documents),
         |train AS (SELECT doc_id, w FROM toks
         |          WHERE ${md5Bits32Sql("'split:' || doc_id::VARCHAR", 1)} % 100 < 80),
         |tg AS (SELECT w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3, count(*) AS c123
         |       FROM train, unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3
         |       GROUP BY 1, 2, 3),
         |tgm AS (SELECT w1, w2, sum(c123)::BIGINT AS c12m FROM tg GROUP BY 1, 2),
         |bg AS (SELECT w[i] AS w1, w[i+1] AS w2, count(*) AS c12
         |       FROM train, unnest(range(1, len(w))) AS t(i) WHERE len(w) >= 2
         |       GROUP BY 1, 2),
         |bgm AS (SELECT w1, sum(c12)::BIGINT AS c1m FROM bg GROUP BY 1),
         |uc AS (SELECT wd, count(*) AS cu FROM (SELECT unnest(w) AS wd FROM train)
         |       GROUP BY 1),
         |nv AS (SELECT (sum(cu) + count(*))::BIGINT AS nv FROM uc),
         |t3 AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3
         |       FROM toks, unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3),
         |p2 AS (SELECT doc_id, w[1] AS w1, w[2] AS w2 FROM toks WHERE len(w) >= 2),
         |trip AS (SELECT DISTINCT w1, w2, w3 FROM t3),
         |tsc AS (SELECT trip.w1, trip.w2, trip.w3,
         |          round((-log2(
         |            CASE WHEN tg.c123 IS NOT NULL
         |                 THEN tg.c123::DOUBLE / tgm.c12m::DOUBLE
         |                 ELSE 0.4 * (CASE WHEN b2.c12 IS NOT NULL
         |                                  THEN b2.c12::DOUBLE / b2m.c1m::DOUBLE
         |                                  ELSE 0.4 * ((coalesce(uc.cu, 0)::DOUBLE + 1.0)
         |                                              / nv.nv::DOUBLE) END)
         |            END)) * 1000000.0)::BIGINT AS sq
         |        FROM trip
         |        LEFT JOIN tg ON tg.w1 = trip.w1 AND tg.w2 = trip.w2 AND tg.w3 = trip.w3
         |        LEFT JOIN tgm ON tgm.w1 = trip.w1 AND tgm.w2 = trip.w2
         |        LEFT JOIN bg b2 ON b2.w1 = trip.w2 AND b2.w2 = trip.w3
         |        LEFT JOIN bgm b2m ON b2m.w1 = trip.w2
         |        LEFT JOIN uc ON uc.wd = trip.w3
         |        CROSS JOIN nv),
         |pr AS (SELECT DISTINCT w1, w2 FROM p2),
         |psc AS (SELECT pr.w1, pr.w2,
         |          round((-log2(
         |            CASE WHEN bg.c12 IS NOT NULL
         |                 THEN bg.c12::DOUBLE / bgm.c1m::DOUBLE
         |                 ELSE 0.4 * ((coalesce(uc.cu, 0)::DOUBLE + 1.0)
         |                             / nv.nv::DOUBLE) END))
         |            * 1000000.0)::BIGINT AS sq
         |        FROM pr
         |        LEFT JOIN bg ON bg.w1 = pr.w1 AND bg.w2 = pr.w2
         |        LEFT JOIN bgm ON bgm.w1 = pr.w1
         |        LEFT JOIN uc ON uc.wd = pr.w2
         |        CROSS JOIN nv),
         |sc AS (SELECT doc_id, sq FROM t3 JOIN tsc USING (w1, w2, w3)
         |       UNION ALL SELECT doc_id, sq FROM p2 JOIN psc USING (w1, w2)),
         |pd AS (SELECT doc_id, count(*) AS n_scored, sum(sq)::BIGINT AS bits_q
         |       FROM sc GROUP BY 1)
         |SELECT t.doc_id, coalesce(pd.n_scored, 0)::BIGINT AS n_scored,
         |       coalesce(pd.bits_q, 0)::BIGINT AS bits_q,
         |       coalesce(pd.bits_q::DOUBLE / (pd.n_scored::DOUBLE * 1000000.0), 0.0)
         |         AS mean_backoff_surprisal
         |FROM toks t LEFT JOIN pd ON t.doc_id = pd.doc_id""".stripMargin,
    // hashed-n-gram DSIR: unigram+bigram features md5-hashed into 4096
    // buckets; both LMs add-one over the bucket space (vs q84's word rung)
    "q90_dsir_hashed" ->
      s"""WITH toks AS (SELECT doc_id, lang,
         |                regexp_split_to_array(lower(text), '\\s+') AS w
         |              FROM documents),
         |f AS (SELECT doc_id, lang, unnest(w) AS f FROM toks
         |      UNION ALL
         |      SELECT doc_id, lang, w[i] || ' ' || w[i+1] AS f
         |      FROM toks, unnest(range(1, len(w))) AS t(i) WHERE len(w) >= 2),
         |hb AS (SELECT doc_id, lang,
         |         (${md5Bits32Sql("'dsir:' || f", 1)}) % 4096 AS b FROM f),
         |c AS (SELECT b, count(*) AS cr,
         |        sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS ct
         |      FROM hb GROUP BY 1),
         |sc AS (SELECT sum(cr)::BIGINT AS tr, sum(ct)::BIGINT AS tt FROM c),
         |s AS (SELECT c.b,
         |        round((log2((c.ct + 1)::DOUBLE / (sc.tt + 4096)::DOUBLE) -
         |               log2((c.cr + 1)::DOUBLE / (sc.tr + 4096)::DOUBLE))
         |              * 1000000.0)::BIGINT AS sq
         |      FROM c, sc)
         |SELECT hb.doc_id, count(*) AS n_feats, sum(s.sq)::BIGINT AS logratio_q,
         |       (sum(s.sq)::DOUBLE / 1000000.0) AS log_ratio
         |FROM hb JOIN s USING (b) GROUP BY 1""".stripMargin,
    // IVF-PQ full-trajectory replay: coarse Lloyd (the q67 CTEs), residual
    // sub-space codebooks (seed = ks lowest vec_ids, one re-quantized
    // Lloyd round), encoding, and ADC scoring via the (list,sub,code)
    // integer lookup decomposition — mirrors Similarity.annIvfPq; the
    // Spark side's reduced sub-space argmin differs from the full distance
    // here only by a per-row constant, so argmins and ties are identical
    "q91_ann_ivf_pq" ->
      s"""WITH $embedCtes,
         |${kmeansCentroidCtes(8, 2)},
         |ad AS (SELECT x.vec_id, c.cid, sum((x.e - c.cq) * (x.e - c.cq))::BIGINT AS dist
         |       FROM ex x JOIN c2 c ON x.i = c.i GROUP BY 1, 2),
         |adr AS (SELECT vec_id, cid,
         |               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |        FROM ad),
         |asg AS (SELECT vec_id, cid FROM adr WHERE rn = 1),
         |rs AS (SELECT x.vec_id, a.cid, (x.i // 4)::INT AS sub, (x.i % 4)::INT AS si,
         |              x.e - c.cq AS r
         |       FROM ex x JOIN asg a ON x.vec_id = a.vec_id
         |                 JOIN c2 c ON c.cid = a.cid AND c.i = x.i),
         |b0 AS (SELECT vec_id AS code, sub, si, r AS cq FROM rs WHERE vec_id IN
         |       (SELECT vec_id FROM (SELECT DISTINCT vec_id FROM rs ORDER BY vec_id LIMIT 16))),
         |pd1 AS (SELECT rs.vec_id, rs.sub, b.code,
         |               sum((rs.r - b.cq) * (rs.r - b.cq))::BIGINT AS dist
         |        FROM rs JOIN b0 b ON rs.sub = b.sub AND rs.si = b.si GROUP BY 1, 2, 3),
         |pa1 AS (SELECT vec_id, sub, code FROM (
         |          SELECT vec_id, sub, code,
         |                 row_number() OVER (PARTITION BY vec_id, sub
         |                                    ORDER BY dist, code) AS rn
         |          FROM pd1) WHERE rn = 1),
         |b1 AS (SELECT a.code, rs.sub, rs.si,
         |              round(sum(rs.r)::DOUBLE / count(*))::BIGINT AS cq
         |       FROM rs JOIN pa1 a ON rs.vec_id = a.vec_id AND rs.sub = a.sub
         |       GROUP BY 1, 2, 3),
         |ed AS (SELECT rs.vec_id, rs.sub, b.code,
         |              sum((rs.r - b.cq) * (rs.r - b.cq))::BIGINT AS dist
         |       FROM rs JOIN b1 b ON rs.sub = b.sub AND rs.si = b.si GROUP BY 1, 2, 3),
         |enc AS (SELECT vec_id, sub, code FROM (
         |          SELECT vec_id, sub, code,
         |                 row_number() OVER (PARTITION BY vec_id, sub
         |                                    ORDER BY dist, code) AS rn
         |          FROM ed) WHERE rn = 1),
         |u2 AS (SELECT sub, code, sum(cq * cq)::BIGINT AS u2 FROM b1 GROUP BY 1, 2),
         |cu AS (SELECT c.cid, b.sub, b.code, sum(c.cq * b.cq)::BIGINT AS cu
         |       FROM c2 c JOIN b1 b ON c.i = b.sub * 4 + b.si GROUP BY 1, 2, 3),
         |cc2 AS (SELECT cid, sum(cq * cq)::BIGINT AS cc2 FROM c2 GROUP BY 1),
         |an2 AS (SELECT e.vec_id, max(cc2.cc2) + sum(2 * cu.cu + u2.u2)::BIGINT AS pq_n2
         |        FROM enc e JOIN asg a ON a.vec_id = e.vec_id
         |                   JOIN cu ON cu.cid = a.cid AND cu.sub = e.sub AND cu.code = e.code
         |                   JOIN u2 ON u2.sub = e.sub AND u2.code = e.code
         |                   JOIN cc2 ON cc2.cid = a.cid
         |        GROUP BY 1),
         |qp AS (SELECT vec_id AS q_id, cid FROM adr WHERE vec_id < 10 AND rn <= 3),
         |qdc AS (SELECT x.vec_id AS q_id, c.cid, sum(x.e * c.cq)::BIGINT AS qdot
         |        FROM ex x JOIN c2 c ON x.i = c.i WHERE x.vec_id < 10 GROUP BY 1, 2),
         |qdu AS (SELECT x.vec_id AS q_id, b.sub, b.code, sum(x.e * b.cq)::BIGINT AS qu
         |        FROM ex x JOIN b1 b ON x.i = b.sub * 4 + b.si
         |        WHERE x.vec_id < 10 GROUP BY 1, 2, 3),
         |cand AS (SELECT qp.q_id, a.vec_id AS n_id, a.cid
         |         FROM qp JOIN asg a ON qp.cid = a.cid AND a.vec_id <> qp.q_id),
         |sq AS (SELECT c.q_id, c.n_id, max(qdc.qdot) + sum(qdu.qu)::BIGINT AS adot
         |       FROM cand c JOIN enc e ON e.vec_id = c.n_id
         |                   JOIN qdu ON qdu.q_id = c.q_id AND qdu.sub = e.sub
         |                           AND qdu.code = e.code
         |                   JOIN qdc ON qdc.q_id = c.q_id AND qdc.cid = c.cid
         |       GROUP BY 1, 2),
         |cosx AS (SELECT s.q_id, s.n_id,
         |                s.adot::DOUBLE / (sqrt(qn.n2) * sqrt(an2.pq_n2::DOUBLE)) AS approx_cos
         |         FROM sq s JOIN n2 qn ON qn.vec_id = s.q_id
         |                   JOIN an2 ON an2.vec_id = s.n_id)
         |SELECT q_id, n_id, approx_cos, rnk FROM (
         |  SELECT q_id, n_id, approx_cos,
         |         row_number() OVER (PARTITION BY q_id
         |                            ORDER BY approx_cos DESC, n_id ASC) AS rnk
         |  FROM cosx)
         |WHERE rnk <= 5""".stripMargin,
    // event-time-ordered budget admission: running sum per source over
    // the md5 pseudo-arrival order; admit while used-before < budget
    "q92_budget_admission" ->
      s"""WITH docs AS (SELECT doc_id, source,
         |  len(regexp_split_to_array(lower(text), '\\s+'))::BIGINT AS n_tokens,
         |  (${md5Bits32Sql("'curts:' || doc_id::VARCHAR", 1)}) % 86400 AS ts_s
         |  FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |        sum(n_tokens) OVER (PARTITION BY source ORDER BY ts_s, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM docs)
         |SELECT doc_id, source, n_tokens, cum::BIGINT AS budget_used
         |FROM c WHERE cum - n_tokens < 700""".stripMargin,
    // asymmetric diagonal-run overlap (the q88 construction) between the
    // md5 "eval:" 5% bucket and the training remainder, 8-gram seeds
    "q93_substring_decon" ->
      s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w,
         |                (${md5Bits32Sql("'eval:' || doc_id::VARCHAR", 1)}) % 100 AS b
         |              FROM documents),
         |pg AS (SELECT doc_id, b, i AS p,
         |         ${(0 until 8).map(j => s"w[i+$j]").mkString(" || ' ' || ")} AS s
         |       FROM toks, unnest(range(1, len(w)-6)) AS t(i) WHERE len(w) >= 8),
         |ev AS (SELECT doc_id AS ed, p AS ep, s FROM pg WHERE b < 5),
         |tr AS (SELECT doc_id, p, s FROM pg WHERE b >= 5),
         |pairs AS (SELECT tr.doc_id, tr.p, ev.ed, tr.p - ev.ep AS diag
         |          FROM tr JOIN ev USING (s)),
         |runs AS (SELECT doc_id, ed, diag, grp, min(p) AS start, count(*) + 7 AS len
         |         FROM (SELECT doc_id, p, ed, diag,
         |                 p - row_number() OVER (
         |                   PARTITION BY doc_id, ed, diag ORDER BY p) AS grp
         |               FROM pairs)
         |         GROUP BY 1, 2, 3, 4),
         |sw AS (SELECT doc_id, start, len,
         |         max(start + len - 1) OVER (PARTITION BY doc_id
         |           ORDER BY start, (start + len) DESC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |       FROM runs),
         |pd AS (SELECT doc_id, max(len) AS mx,
         |         sum(greatest(0, (start + len - 1)
         |           - greatest(coalesce(prev_end, 0), start - 1))) AS covered
         |       FROM sw GROUP BY 1)
         |SELECT t.doc_id, len(t.w)::BIGINT AS n_tokens,
         |       coalesce(pd.mx, 0)::BIGINT AS max_eval_run,
         |       coalesce(pd.covered, 0)::BIGINT AS covered_tokens,
         |       coalesce(pd.mx, 0) >= 8 AS contaminated
         |FROM toks t LEFT JOIN pd ON t.doc_id = pd.doc_id WHERE t.b >= 5""".stripMargin,
    "q94_bpe_encode" -> bpeEncodeSql(3),
    // OLS of log2(count) on log2(rank) over the ranked vocab; the slope
    // double derives from the same exact integer sums in the same order
    "q95_zipf_fit" ->
      """WITH u AS (SELECT w, count(*) AS c FROM (
        |        SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |        FROM documents) GROUP BY 1),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rank FROM u),
        |q AS (SELECT round(log2(rank::DOUBLE) * 1000000.0)::BIGINT AS xq,
        |             round(log2(c::DOUBLE) * 1000000.0)::BIGINT AS yq FROM r),
        |s AS (SELECT count(*)::BIGINT AS n, sum(xq) AS sx,
        |             sum(yq) AS sy, sum(xq*yq) AS sxy,
        |             sum(xq*xq) AS sxx FROM q)
        |SELECT n AS n_vocab,
        |       (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |         / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) AS slope,
        |       (sy::DOUBLE - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |           / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))
        |          * sx::DOUBLE) / (n::DOUBLE * 1000000.0) AS intercept
        |FROM s""".stripMargin,
    // per-source KL(p_source || p_corpus) over the full hashed bucket
    // space, add-one smoothed both sides; per-(source,bucket) terms
    // quantize to 1e12 integers so the sums are order-independent
    "q96_source_divergence" ->
      s"""WITH toks AS (SELECT doc_id, source,
         |                regexp_split_to_array(lower(text), '\\s+') AS w
         |              FROM documents),
         |f AS (SELECT doc_id, source, unnest(w) AS f FROM toks
         |      UNION ALL
         |      SELECT doc_id, source, w[i] || ' ' || w[i+1] AS f
         |      FROM toks, unnest(range(1, len(w))) AS t(i) WHERE len(w) >= 2),
         |hb AS (SELECT source, (${md5Bits32Sql("'dsir:' || f", 1)}) % 4096 AS b
         |       FROM f),
         |allb AS (SELECT unnest(range(4096)) AS b),
         |corpus AS (SELECT b, count(*) AS cb FROM hb GROUP BY 1),
         |nt AS (SELECT sum(cb)::BIGINT AS n FROM corpus),
         |bs AS (SELECT source, b, count(*) AS csb FROM hb GROUP BY 1, 2),
         |tt AS (SELECT source, sum(csb)::BIGINT AS ns FROM bs GROUP BY 1),
         |grid AS (SELECT tt.source, tt.ns, coalesce(bs.csb, 0)::BIGINT AS csb,
         |                coalesce(c.cb, 0)::BIGINT AS cb
         |         FROM allb a CROSS JOIN tt
         |         LEFT JOIN corpus c ON c.b = a.b
         |         LEFT JOIN bs ON bs.source = tt.source AND bs.b = a.b),
         |term AS (SELECT source, ns,
         |           round(((csb + 1)::DOUBLE / (ns + 4096)::DOUBLE)
         |             * (log2((csb + 1)::DOUBLE / (ns + 4096)::DOUBLE)
         |                - log2((cb + 1)::DOUBLE / (nt.n + 4096)::DOUBLE))
         |             * 1000000000000.0)::BIGINT AS tq
         |         FROM grid, nt)
         |SELECT source, max(ns)::BIGINT AS n_feats, sum(tq)::BIGINT AS kl_q,
         |       sum(tq)::DOUBLE / 1000000000000.0 AS kl_bits
         |FROM term GROUP BY 1""".stripMargin,
    // purchase ⋈ same-user clicks in the preceding hour — the batch view
    // of the stream-stream interval join
    "q97_attribution_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |             epoch_us(ts) AS tsu FROM events),
        |c AS (SELECT user_id, tsu AS c_ts_us, value AS click_value
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, tsu AS p_ts_us,
        |        value AS purchase_value
        |      FROM e WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id, p.p_ts_us, c.c_ts_us,
        |       c.click_value, p.purchase_value
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c.c_ts_us >= p.p_ts_us - 3600000000
        |  AND c.c_ts_us <= p.p_ts_us""".stripMargin,
    "q98_linear_probe" -> linearProbeSql(0, 3),
    // 16-token non-overlapping chunks, md5 fingerprints, keep the
    // globally first (doc_id, chunk_id) occurrence per fingerprint
    "q99_chunk_dedup" ->
      """WITH toks AS (SELECT doc_id,
        |  regexp_split_to_array(lower(text), '\s+') AS ws FROM documents),
        |ch AS (SELECT doc_id, (start // 16)::BIGINT AS chunk_id,
        |  md5(array_to_string(list_slice(ws, start + 1,
        |    least(start + 16, len(ws))), ' ')) AS fp,
        |  least(16, len(ws) - start)::BIGINT AS n_tokens
        |  FROM toks, unnest(range(0, len(ws), 16)) AS t(start)),
        |rk AS (SELECT *, row_number() OVER (
        |         PARTITION BY fp ORDER BY doc_id, chunk_id) AS rn FROM ch)
        |SELECT doc_id, count(*)::BIGINT AS n_chunks,
        |  sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
        |  sum(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END)::BIGINT AS n_tokens_kept,
        |  sum(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END)::DOUBLE
        |    / sum(n_tokens)::DOUBLE AS retained_frac
        |FROM rk GROUP BY doc_id""".stripMargin,
    // q77's surprisal, ranked within language and cut into thirds; the
    // rank orders on (surprisal, doc_id) — surprisal doubles are
    // bit-identical cross-engine, so the buckets are deterministic
    "q100_ppl_buckets" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
        |              FROM documents),
        |bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        |       FROM toks, unnest(range(1, len(w))) AS t(i) WHERE len(w) >= 2),
        |c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY 1),
        |sc AS (SELECT p.w1, p.w2,
        |  round((-log2(p.c12::DOUBLE / c1.c1::DOUBLE)) * 1000000)::BIGINT AS sq
        |  FROM c12 p JOIN c1 ON p.w1 = c1.w1),
        |pd AS (SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams,
        |         sum(sc.sq)::BIGINT AS bits_q
        |       FROM bg JOIN sc ON bg.w1 = sc.w1 AND bg.w2 = sc.w2 GROUP BY 1),
        |m AS (SELECT d.doc_id, d.lang, coalesce(pd.n_bigrams, 0)::BIGINT AS n_bigrams,
        |        coalesce(pd.bits_q, 0)::BIGINT AS bits_q,
        |        coalesce(pd.bits_q::DOUBLE / (pd.n_bigrams::DOUBLE * 1000000.0),
        |          0.0) AS mean_bigram_surprisal
        |      FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |          ORDER BY mean_bigram_surprisal, doc_id) AS rn,
        |        count(*) OVER (PARTITION BY lang) AS n FROM m)
        |SELECT doc_id, lang, n_bigrams, bits_q, mean_bigram_surprisal,
        |  CASE WHEN 3*rn <= n THEN 'head'
        |       WHEN 3*rn <= 2*n THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket
        |FROM r""".stripMargin,
    // T = 0.5 temperature (sqrt is correctly rounded IEEE in both
    // engines); √p quantized to 1e12 ints before the normalizing sum
    "q101_temp_mixture" ->
      """WITH g AS (SELECT source, count(*)::BIGINT AS n_docs
        |           FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_docs)::BIGINT AS total FROM g),
        |w AS (SELECT source, n_docs,
        |  n_docs::DOUBLE / total::DOUBLE AS frac,
        |  round(sqrt(n_docs::DOUBLE / total::DOUBLE)
        |    * 1000000000000.0)::BIGINT AS wq
        |  FROM g, t),
        |s AS (SELECT sum(wq)::BIGINT AS sw FROM w)
        |SELECT source, n_docs, frac,
        |  wq::DOUBLE / sw::DOUBLE AS weight,
        |  (wq::DOUBLE / sw::DOUBLE) * 100000.0 AS expected_docs
        |FROM w, s""".stripMargin,
    // FILTER aggregates ≙ Spark's pivot with the explicit value list;
    // n_total is the row-sum because the five types partition events
    "q102_pivot_events" ->
      """SELECT date_trunc('day', ts)::DATE AS day,
        |  count(*) FILTER (WHERE event_type = 'click')::BIGINT AS n_click,
        |  count(*) FILTER (WHERE event_type = 'error')::BIGINT AS n_error,
        |  count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS n_purchase,
        |  count(*) FILTER (WHERE event_type = 'signup')::BIGINT AS n_signup,
        |  count(*) FILTER (WHERE event_type = 'view')::BIGINT AS n_view,
        |  count(*)::BIGINT AS n_total
        |FROM events GROUP BY 1""".stripMargin,
    // GROUPING(a, b) carries the identical MSB-first bitmask semantics
    // as Spark's grouping_id(); null rollup keys coalesce to 'ALL' per
    // the q37 convention; price sums are exact integer cents
    "q103_cube_orders" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |  coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |  grouping(o_orderpriority, o_orderstatus)::BIGINT AS gid,
        |  count(*)::BIGINT AS n_orders,
        |  sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS total_cents
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin,
    // one window spec (user_id, ts, event_id) shared by all four frames;
    // values quantized to 1e6 ints so windowed sums are order-exact
    "q104_rolling_stats" ->
      """WITH q AS (SELECT event_id, user_id, ts,
        |  round(value * 1000000)::BIGINT AS vq FROM events)
        |SELECT event_id, user_id, vq,
        |  lag(vq) OVER w AS prev_vq,
        |  sum(vq) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)::BIGINT AS mov_sum_q,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)::BIGINT AS mov_n,
        |  max(vq) OVER (PARTITION BY user_id ORDER BY ts, event_id)::BIGINT
        |    AS run_max_q
        |FROM q WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    // the Bloom pass is a pure candidate prune — the exact re-check
    // makes the result row-identical to q59, so the oracle is shared
    "q105_bloom_decon" -> decontaminateSql,
    // exact frequent tokens (≥ 1% of the stream); the MG candidate
    // prune on the Spark side never changes the answer, only the plan
    "q106_heavy_hitters" ->
      """WITH tk AS (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |            FROM documents),
        |c AS (SELECT w, count(*)::BIGINT AS cnt FROM tk GROUP BY 1),
        |t AS (SELECT sum(cnt)::BIGINT AS n FROM c)
        |SELECT w, cnt FROM c, t WHERE 100 * cnt >= n""".stripMargin,
    // interpolated Kneser-Ney, D = 0.75 (exact in binary); identical
    // ratio composition order as the engine, 1e6-quantized per pair type
    "q107_kn_surprisal" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
        |              FROM documents),
        |bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        |       FROM toks, unnest(range(1, len(w))) AS t(i) WHERE len(w) >= 2),
        |c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(c12)::BIGINT AS c1, count(*)::BIGINT AS n1f
        |       FROM c12 GROUP BY 1),
        |nb AS (SELECT w2, count(*)::BIGINT AS n1b FROM c12 GROUP BY 1),
        |bt AS (SELECT count(*)::BIGINT AS b FROM c12),
        |sc AS (SELECT p.w1, p.w2,
        |  round((-log2(((p.c12::DOUBLE - 0.75) / c1.c1::DOUBLE)
        |    + (((0.75 * c1.n1f::DOUBLE) / c1.c1::DOUBLE)
        |       * (nb.n1b::DOUBLE / bt.b::DOUBLE))))
        |    * 1000000)::BIGINT AS sq
        |  FROM c12 p JOIN c1 ON p.w1 = c1.w1 JOIN nb ON p.w2 = nb.w2, bt),
        |pd AS (SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams,
        |         sum(sc.sq)::BIGINT AS bits_q
        |       FROM bg JOIN sc ON bg.w1 = sc.w1 AND bg.w2 = sc.w2 GROUP BY 1)
        |SELECT d.doc_id, coalesce(pd.n_bigrams, 0)::BIGINT AS n_bigrams,
        |  coalesce(pd.bits_q, 0)::BIGINT AS bits_q,
        |  coalesce(pd.bits_q::DOUBLE / (pd.n_bigrams::DOUBLE * 1000000.0), 0.0)
        |    AS mean_kn_surprisal
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id""".stripMargin,
    // directed containment |Sx∩Sy|/|Sx| ≥ 9/10 as the exact integer
    // comparison 10·∩ ≥ 9·|Sx|; the double is one division after
    "q108_containment" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
        |              FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM toks, unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3)),
        |sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS x, b.doc_id AS y, count(*)::BIGINT AS n_shared
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        |          GROUP BY 1, 2)
        |SELECT x, y, n_shared,
        |  n_shared::DOUBLE / sz.sz::DOUBLE AS containment
        |FROM inter JOIN sz ON inter.x = sz.doc_id
        |WHERE n_shared * 10 >= sz.sz * 9""".stripMargin,
    // the prefix-filter theorem makes the candidate prune lossless, so
    // the prefix join is row-identical to q16's full inverted-index join
    "q109_prefix_jaccard" -> jaccardPairsSql,
    // degree-ordered orientation: (deg, id) tuple compare picks each
    // edge's unique apex side; every triangle closes at its min-rank
    // apex exactly once; per-vertex counts via endpoint explode
    "q110_triangles" ->
      """WITH edges AS (
        |  SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |        FROM edges WHERE src <> dst),
        |deg AS (SELECT id, count(*)::BIGINT AS deg FROM (
        |          SELECT a AS id FROM und UNION ALL SELECT b FROM und)
        |        GROUP BY 1),
        |ornt AS (SELECT
        |    CASE WHEN (da.deg, a) < (db.deg, b) THEN a ELSE b END AS u,
        |    CASE WHEN (da.deg, a) < (db.deg, b) THEN b ELSE a END AS v
        |  FROM und JOIN deg da ON a = da.id JOIN deg db ON b = db.id),
        |tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
        |        FROM ornt e1 JOIN ornt e2 ON e1.u = e2.u AND e1.v < e2.v
        |        JOIN und ON und.a = e1.v AND und.b = e2.v),
        |pv AS (SELECT id, count(*)::BIGINT AS n_triangles FROM (
        |         SELECT x AS id FROM tri
        |         UNION ALL SELECT y FROM tri
        |         UNION ALL SELECT z FROM tri) GROUP BY 1)
        |SELECT d.id AS nationkey, d.deg,
        |       coalesce(pv.n_triangles, 0)::BIGINT AS n_triangles
        |FROM deg d LEFT JOIN pv ON d.id = pv.id""".stripMargin,
    // the bipartite order-part projection: one pair per order containing
    // both parts, kept at support >= 2 — each side of the self-join is
    // the same distinct (order, part) list, joined on the order key
    "q111_copurchase" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*)::BIGINT AS cnt
        |FROM pp a JOIN pp b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    "q112_kcore" -> kCoreSql(3, 16),
    // strictly-ordered first-occurrence funnel: each stage is the min
    // event time after the previous stage within the 24 h window
    "q113_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_type FROM events),
        |f1 AS (SELECT user_id, min(tsu) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |f2 AS (SELECT e.user_id, min(tsu) AS t2 FROM e JOIN f1 USING (user_id)
        |       WHERE event_type = 'click' AND tsu > t1
        |         AND tsu <= t1 + 86400000000 GROUP BY 1),
        |f3 AS (SELECT e.user_id, min(tsu) AS t3 FROM e JOIN f2 USING (user_id)
        |       WHERE event_type = 'purchase' AND tsu > t2
        |         AND tsu <= t2 + 86400000000 GROUP BY 1)
        |SELECT f1.user_id,
        |  (1 + (f2.t2 IS NOT NULL)::BIGINT + (f3.t3 IS NOT NULL)::BIGINT) AS stage,
        |  f1.t1, coalesce(f2.t2, -1) AS t2, coalesce(f3.t3, -1) AS t3
        |FROM f1 LEFT JOIN f2 ON f1.user_id = f2.user_id
        |LEFT JOIN f3 ON f1.user_id = f3.user_id""".stripMargin,
    // priority sampling (Duffield-Lund-Thorup): pri = (w << 32)/(h+1) is
    // one exact integer product and one IEEE division — bit-identical
    // cross-engine; tau = the (k+1)-th priority; HT estimate max(w, tau)
    "q114_priority_sample" ->
      s"""WITH pri0 AS (SELECT doc_id, n_chars AS w,
         |  (${md5Bits32Sql("'ps:' || doc_id::VARCHAR", 1)} + 1) AS h1
         |  FROM documents),
         |pri AS (SELECT doc_id, w,
         |  (w::DOUBLE * 4294967296) / h1::DOUBLE AS pri FROM pri0),
         |top AS (SELECT doc_id, w, pri,
         |        row_number() OVER (ORDER BY pri DESC, doc_id) AS rn
         |        FROM pri ORDER BY pri DESC, doc_id LIMIT 51),
         |tau AS (SELECT pri AS tau FROM top WHERE rn = 51)
         |SELECT doc_id, w, pri,
         |  greatest(w::DOUBLE, coalesce(tau.tau, 0.0)) AS est_w
         |FROM top LEFT JOIN tau ON TRUE WHERE rn <= 50""".stripMargin,
    // full Levenshtein self-join over the normalized 40-char title (the
    // Spark side prunes it losslessly via PassJoin segment signatures —
    // pigeonhole makes the candidate set complete, so the quadratic
    // oracle and the segment-join agree exactly). DuckDB needs the
    // explicit 'g' flag to match Spark's replace-all regexp_replace;
    // levenshtein is the same classic DP in both engines
    "q115_edit_distance" ->
      """WITH t AS (SELECT doc_id,
        |  substr(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 40) AS ti
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
        |  levenshtein(a.ti, c.ti)::BIGINT AS dist
        |FROM t a JOIN t c ON a.doc_id < c.doc_id
        |  AND abs(length(a.ti) - length(c.ti)) <= 3
        |WHERE levenshtein(a.ti, c.ti) <= 3""".stripMargin,
    // Okapi BM25 against the q59 eval split: every weight input is an
    // exact integer; the one double weight expression has identical
    // shape in both engines and quantizes to 1e6 per posting (the
    // q77/q107 discipline), so doc scores are exact integer sums
    "q116_bm25" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |    t -> regexp_full_match(t, '[a-z]+') AND NOT list_contains($stopList, t))) AS t
         |  FROM documents),
         |ev AS (SELECT doc_id,
         |  ${md5Bits32Sql("'eval:' || doc_id::VARCHAR", 1)} % 100 < 5 AS ev
         |  FROM documents),
         |tf AS (SELECT toks.doc_id, t, count(*)::BIGINT AS tf
         |       FROM toks JOIN ev USING (doc_id) WHERE NOT ev GROUP BY 1, 2),
         |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
         |st AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sumdl FROM dl),
         |dfT AS (SELECT t, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |q AS (SELECT DISTINCT toks.doc_id AS query_id, t
         |      FROM toks JOIN ev USING (doc_id) WHERE ev),
         |sq AS (SELECT q.query_id, tf.doc_id,
         |  round(log2(((n - df + 0.5) / (df + 0.5)) + 1.0)
         |    * (tf * 2.2)
         |    / (tf + 1.2 * (0.25 + 0.75 * ((dl * n)::DOUBLE / sumdl::DOUBLE)))
         |    * 1000000.0)::BIGINT AS sq
         |  FROM q JOIN tf USING (t) JOIN dfT USING (t)
         |  JOIN dl ON tf.doc_id = dl.doc_id, st),
         |sc AS (SELECT query_id, doc_id, sum(sq)::BIGINT AS score_q
         |       FROM sq GROUP BY 1, 2),
         |rk AS (SELECT query_id, doc_id, score_q,
         |       row_number() OVER (PARTITION BY query_id
         |         ORDER BY score_q DESC, doc_id)::BIGINT AS rank FROM sc)
         |SELECT query_id, doc_id, rank, score_q FROM rk WHERE rank <= 10""".stripMargin,
    // every ratio rule is an exact integer cross-product; the only
    // double is the mean-word-length division of two exact integers.
    // Required set = the reference 29-word stop list (see the operator
    // scaladoc for why the canonical Gopher 8 is fixture-degenerate)
    "q117_gopher_quality" ->
      s"""WITH w AS (SELECT doc_id,
         |  list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |    t -> strlen(t) > 0) AS w
         |  FROM documents),
         |c AS (SELECT doc_id,
         |  len(w)::BIGINT AS n_words,
         |  coalesce(list_sum(list_transform(w, t -> strlen(t))), 0)::BIGINT AS n_wchars,
         |  len(list_filter(w, t -> regexp_matches(t, '[a-z]')))::BIGINT AS n_alpha,
         |  len(list_filter(w, t -> contains(t, '#') OR contains(t, '...')))::BIGINT AS n_sym,
         |  len(list_intersect(list_distinct(w), $stopList))::BIGINT AS n_req
         |  FROM w)
         |SELECT doc_id, n_words, n_wchars,
         |  n_wchars::DOUBLE / n_words::DOUBLE AS mean_wlen,
         |  n_alpha, n_sym, n_req,
         |  (n_words >= 50 AND n_words <= 100000) AS pass_words,
         |  (n_wchars >= n_words * 3 AND n_wchars <= n_words * 10) AS pass_mean,
         |  (n_alpha * 10 >= n_words * 8) AS pass_alpha,
         |  (n_sym * 10 < n_words) AS pass_sym,
         |  (n_req >= 2) AS pass_req,
         |  (n_words >= 50 AND n_words <= 100000 AND n_wchars >= n_words * 3
         |   AND n_wchars <= n_words * 10 AND n_alpha * 10 >= n_words * 8
         |   AND n_sym * 10 < n_words AND n_req >= 2) AS pass
         |FROM c""".stripMargin,
    // common-neighbor link prediction on the q111 co-purchase graph:
    // wedge join + anti-join against the edge list; Jaccard is exact
    // integers + one division
    "q118_link_prediction" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS MATERIALIZED (SELECT p1, p2 FROM (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS cnt
        |  FROM pp a JOIN pp b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2) WHERE cnt >= 2),
        |nb AS (SELECT p1 AS z, p2 AS x FROM e UNION ALL SELECT p2, p1 FROM e),
        |deg AS (SELECT x AS id, count(*)::BIGINT AS deg FROM nb GROUP BY 1),
        |cn AS (SELECT a.x AS p1, b.x AS p2, count(*)::BIGINT AS cn
        |       FROM nb a JOIN nb b ON a.z = b.z AND a.x < b.x
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |nonedge AS (SELECT cn.p1, cn.p2, cn.cn FROM cn LEFT JOIN e
        |            ON cn.p1 = e.p1 AND cn.p2 = e.p2 WHERE e.p1 IS NULL)
        |SELECT n.p1, n.p2, n.cn,
        |  n.cn::DOUBLE / (d1.deg + d2.deg - n.cn)::DOUBLE AS jaccard
        |FROM nonedge n JOIN deg d1 ON n.p1 = d1.id
        |JOIN deg d2 ON n.p2 = d2.id""".stripMargin,
    "q119_power_iteration" -> powerIterationSql(4),
    // exact integral day ids (// floor-division of positive micros);
    // retention is the one int/int double division
    "q120_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS dy FROM events),
        |f AS (SELECT user_id, min(dy) AS cohort_day FROM e GROUP BY 1),
        |act AS (SELECT DISTINCT e.user_id, cohort_day,
        |               dy - cohort_day AS offset_day
        |        FROM e JOIN f USING (user_id)),
        |ret AS (SELECT cohort_day, offset_day, count(*)::BIGINT AS n_users
        |        FROM act GROUP BY 1, 2),
        |sz AS (SELECT cohort_day, count(*)::BIGINT AS cohort_size
        |       FROM f GROUP BY 1)
        |SELECT r.cohort_day, r.offset_day, r.n_users, s.cohort_size,
        |  r.n_users::DOUBLE / s.cohort_size::DOUBLE AS retention
        |FROM ret r JOIN sz s USING (cohort_day)""".stripMargin,
    // rank-picked per-source medians (the one-or-two middle ranks by
    // exact integer-division arithmetic, mean of exact ints → exact
    // half-integer doubles), MAD the same trick over the deviations —
    // no percentile_approx, no engine interpolation anywhere
    "q121_robust_stats" ->
      """WITH x AS (SELECT source, doc_id, n_chars AS x FROM documents),
        |n AS (SELECT source, count(*)::BIGINT AS n FROM x GROUP BY 1),
        |r1 AS (SELECT source, doc_id, x, row_number() OVER (
        |         PARTITION BY source ORDER BY x, doc_id)::BIGINT AS rn FROM x),
        |med AS (SELECT r1.source, sum(x)::DOUBLE / count(*) AS median_chars
        |        FROM r1 JOIN n USING (source)
        |        WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1),
        |dev AS (SELECT x.source, x.doc_id,
        |          abs(x.x::DOUBLE - m.median_chars) AS dev
        |        FROM x JOIN med m USING (source)),
        |r2 AS (SELECT source, doc_id, dev, row_number() OVER (
        |         PARTITION BY source ORDER BY dev, doc_id)::BIGINT AS rn FROM dev),
        |mad AS (SELECT r2.source, sum(dev)::DOUBLE / count(*) AS mad_chars
        |        FROM r2 JOIN n USING (source)
        |        WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1)
        |SELECT d.source, count(*)::BIGINT AS n_docs,
        |  max(m.median_chars) AS median_chars, max(md.mad_chars) AS mad_chars,
        |  sum((d.dev > 3 * md.mad_chars)::BIGINT)::BIGINT AS n_outliers
        |FROM dev d JOIN med m USING (source) JOIN mad md USING (source)
        |GROUP BY 1""".stripMargin,
    // PMI over the q73 bigram table: marginals are exact integer sums,
    // the association ratio is one identical-shape double expression per
    // engine quantized to 1e6 (the q77/q107 discipline); top-k under a
    // total (pmi_q, w1, w2) order
    "q122_pmi_collocations" ->
      """WITH toks AS (SELECT regexp_split_to_array(lower(text), '\s+') AS w
        |              FROM documents),
        |bg AS (SELECT w[i] AS w1, w[i+1] AS w2
        |       FROM toks, unnest(range(1, len(w))) AS t(i) WHERE len(w) >= 2),
        |c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY 1),
        |c2 AS (SELECT w2, sum(c12)::BIGINT AS c2 FROM c12 GROUP BY 1),
        |tt AS (SELECT sum(c12)::BIGINT AS t FROM c12)
        |SELECT c12.w1, c12.w2, c12.c12,
        |  round(log2((c12.c12::DOUBLE * tt.t::DOUBLE)
        |      / (c1.c1::DOUBLE * c2.c2::DOUBLE)) * 1000000.0)::BIGINT AS pmi_q
        |FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), tt
        |WHERE c12.c12 >= 5
        |ORDER BY pmi_q DESC, c12.w1, c12.w2 LIMIT 50""".stripMargin,
    // BFS as a recursive CTE: UNION-dedup level expansion from the min
    // vertex, min(hops) collapses the revisit rows; the hops < 20 guard
    // bounds the recursion (BfsSpec pins the fixture eccentricity well
    // below it, so the truncation is never load-bearing)
    "q123_bfs_hops" ->
      """WITH RECURSIVE e AS MATERIALIZED (
        |  WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |  SELECT p1, p2 FROM (
        |    SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS cnt
        |    FROM pp a JOIN pp b
        |      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |    GROUP BY 1, 2) WHERE cnt >= 2),
        |nb AS MATERIALIZED (
        |  SELECT p1 AS z, p2 AS x FROM e UNION ALL SELECT p2, p1 FROM e),
        |walk AS (
        |  SELECT min(p1) AS id, 0::BIGINT AS hops FROM e
        |  UNION
        |  SELECT nb.x AS id, walk.hops + 1 AS hops
        |  FROM walk JOIN nb ON walk.id = nb.z WHERE walk.hops < 20)
        |SELECT id AS partkey, min(hops)::BIGINT AS hops FROM walk GROUP BY 1""".stripMargin,
    // Gopher repetition rules: max n-gram multiplicity per doc (the
    // relational max-count form here; the Spark side computes the same
    // multiplicity map-only as the longest equal-adjacent run of the
    // sorted shingle array) + within-doc duplicate-5-gram positional
    // coverage via the q88 gaps-and-islands window
    "q124_top_ngram" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
        |              FROM documents),
        |g2 AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS s
        |       FROM toks, unnest(range(1, len(w))) AS t(i) WHERE len(w) >= 2),
        |m2 AS (SELECT doc_id, max(c) AS top2 FROM (
        |         SELECT doc_id, s, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1),
        |g3 AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |       FROM toks, unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3),
        |m3 AS (SELECT doc_id, max(c) AS top3 FROM (
        |         SELECT doc_id, s, count(*) AS c FROM g3 GROUP BY 1, 2) GROUP BY 1),
        |g4 AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS s
        |       FROM toks, unnest(range(1, len(w)-2)) AS t(i) WHERE len(w) >= 4),
        |m4 AS (SELECT doc_id, max(c) AS top4 FROM (
        |         SELECT doc_id, s, count(*) AS c FROM g4 GROUP BY 1, 2) GROUP BY 1),
        |g3p AS (SELECT doc_id, i AS p, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |        FROM toks, unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3),
        |dup AS (SELECT doc_id, s FROM (
        |          SELECT doc_id, s, count(*) AS c FROM g3p GROUP BY 1, 2) WHERE c >= 2),
        |occ AS (SELECT g3p.doc_id, g3p.p FROM g3p
        |        JOIN dup ON g3p.doc_id = dup.doc_id AND g3p.s = dup.s),
        |sw AS (SELECT doc_id, p, max(p + 2) OVER (PARTITION BY doc_id
        |         ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |       FROM occ),
        |cov AS (SELECT doc_id, sum(greatest(0, (p + 2)
        |          - greatest(coalesce(prev_end, 0), p - 1))) AS dup3_cov
        |        FROM sw GROUP BY 1)
        |SELECT t.doc_id, len(t.w)::BIGINT AS n_tokens,
        |  coalesce(m2.top2, 0)::BIGINT AS top2,
        |  (coalesce(m2.top2, 0) * 2)::DOUBLE / len(t.w) AS top2_frac,
        |  coalesce(m3.top3, 0)::BIGINT AS top3,
        |  (coalesce(m3.top3, 0) * 3)::DOUBLE / len(t.w) AS top3_frac,
        |  coalesce(m4.top4, 0)::BIGINT AS top4,
        |  (coalesce(m4.top4, 0) * 4)::DOUBLE / len(t.w) AS top4_frac,
        |  coalesce(cov.dup3_cov, 0)::BIGINT AS dup3_cov,
        |  coalesce(cov.dup3_cov, 0)::DOUBLE / len(t.w) AS dup3_frac
        |FROM toks t LEFT JOIN m2 USING (doc_id) LEFT JOIN m3 USING (doc_id)
        |LEFT JOIN m4 USING (doc_id) LEFT JOIN cov USING (doc_id)""".stripMargin,
    // RRF fusion of the q116 BM25 ranking (top-20 cut) and the IVF-probed
    // dense ranking (Lloyd (8,2) quantizer — the q55/q67 CTEs — 1-list
    // corpus assignment, 4-probe eval queries, exact quantized rescore)
    // over the same eval queries. Contributions are ⌊1e12/(60+rank)⌋ —
    // DuckDB `//` and Spark `div` are the same positive integer division
    // — so fused scores are exact integer sums
    "q125_rrf_fusion" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |    t -> regexp_full_match(t, '[a-z]+') AND NOT list_contains($stopList, t))) AS t
         |  FROM documents),
         |ev AS (SELECT doc_id,
         |  ${md5Bits32Sql("'eval:' || doc_id::VARCHAR", 1)} % 100 < 5 AS ev
         |  FROM documents),
         |tf AS (SELECT toks.doc_id, t, count(*)::BIGINT AS tf
         |       FROM toks JOIN ev USING (doc_id) WHERE NOT ev GROUP BY 1, 2),
         |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
         |st AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sumdl FROM dl),
         |dfT AS (SELECT t, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |q AS (SELECT DISTINCT toks.doc_id AS query_id, t
         |      FROM toks JOIN ev USING (doc_id) WHERE ev),
         |sq AS (SELECT q.query_id, tf.doc_id,
         |  round(log2(((n - df + 0.5) / (df + 0.5)) + 1.0)
         |    * (tf * 2.2)
         |    / (tf + 1.2 * (0.25 + 0.75 * ((dl * n)::DOUBLE / sumdl::DOUBLE)))
         |    * 1000000.0)::BIGINT AS sq
         |  FROM q JOIN tf USING (t) JOIN dfT USING (t)
         |  JOIN dl ON tf.doc_id = dl.doc_id, st),
         |sc AS (SELECT query_id, doc_id, sum(sq)::BIGINT AS score_q
         |       FROM sq GROUP BY 1, 2),
         |btop AS (SELECT query_id, doc_id, rank FROM (
         |  SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_q DESC, doc_id)::BIGINT AS rank FROM sc)
         |  WHERE rank <= 20),
         |$embedCtes,
         |${kmeansCentroidCtes(8, 2)},
         |evv AS (SELECT vec_id,
         |  ${md5Bits32Sql("'eval:' || vec_id::VARCHAR", 1)} % 100 < 5 AS ev
         |  FROM embeddings),
         |ad AS (SELECT x.vec_id, c.cid, sum((x.e - c.cq) * (x.e - c.cq))::BIGINT AS dist
         |       FROM ex x JOIN c2 c ON x.i = c.i GROUP BY 1, 2),
         |adr AS (SELECT vec_id, cid,
         |          row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |        FROM ad),
         |asg AS (SELECT adr.vec_id, adr.cid FROM adr
         |        JOIN evv ON adr.vec_id = evv.vec_id
         |        WHERE rn = 1 AND NOT evv.ev),
         |qp AS (SELECT adr.vec_id AS query_id, adr.cid FROM adr
         |       JOIN evv ON adr.vec_id = evv.vec_id
         |       WHERE rn <= 4 AND evv.ev),
         |ddots AS (SELECT qp.query_id, asg.vec_id AS doc_id,
         |    sum(a.e * b.e)::DOUBLE AS dot
         |  FROM qp JOIN asg ON qp.cid = asg.cid
         |  JOIN ex a ON a.vec_id = qp.query_id
         |  JOIN ex b ON b.vec_id = asg.vec_id AND b.i = a.i
         |  GROUP BY 1, 2),
         |dcos AS (SELECT query_id, doc_id, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cos
         |  FROM ddots JOIN n2 na ON query_id = na.vec_id
         |  JOIN n2 nb ON doc_id = nb.vec_id),
         |dtop AS (SELECT query_id, doc_id, rank FROM (
         |  SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, doc_id)::BIGINT AS rank FROM dcos)
         |  WHERE rank <= 20),
         |fused AS (SELECT query_id, doc_id,
         |    sum(1000000000000 // (60 + rank))::BIGINT AS rrf
         |  FROM (SELECT * FROM btop UNION ALL SELECT * FROM dtop)
         |  GROUP BY 1, 2)
         |SELECT query_id, doc_id, rrf, rank FROM (
         |  SELECT query_id, doc_id, rrf,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY rrf DESC, doc_id)::BIGINT AS rank FROM fused)
         |WHERE rank <= 10""".stripMargin,
    // synchronous LPA, 4 sweeps unrolled as MATERIALIZED stages (the
    // q112/q123 discipline); argmax = (count DESC, label ASC) row_number
    "q126_label_prop" -> labelPropagationSql(4),
    // per-community modularity over the SAME unrolled label trajectory
    "q204_modularity" -> modularitySql(4),
    // per-sweep churn over the SAME trajectory: diff l_{t-1} vs l_t
    "q220_labelprop_churn" ->
      s"""WITH ${labelPropagationCtes(4)},
         |nv AS (SELECT count(*)::BIGINT AS n FROM l0),
         |ch AS (${(1 to 4).map { t =>
             s"""SELECT $t::BIGINT AS round, count(*)::BIGINT AS n_changed
                |  FROM l$t a JOIN l${t - 1} b ON a.v = b.v
                |  WHERE a.lbl <> b.lbl""".stripMargin
           }.mkString("\n|UNION ALL\n|")})
         |SELECT round, n_changed, n AS n_vertices,
         |  round(n_changed::DOUBLE / n::DOUBLE * 1000000.0)::BIGINT AS churn_q6
         |FROM ch, nv""".stripMargin,
    // per-source dup rate over the SAME label chain
    "q221_source_dup_rate" -> (dedupLabelCtes(5) +
      s""",
         |st AS (SELECT label, count(*)::BIGINT AS sz,
         |    min(doc_id) AS keep FROM l5 GROUP BY 1),
         |j AS (SELECT l5.doc_id, d.source, st.sz, st.keep
         |  FROM l5 JOIN st USING (label)
         |    JOIN documents d ON l5.doc_id = d.doc_id)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(CASE WHEN sz >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_in_clusters,
         |  sum(CASE WHEN sz >= 2 AND doc_id <> keep THEN 1 ELSE 0 END)::BIGINT
         |    AS n_noncanonical,
         |  round(sum(CASE WHEN sz >= 2 AND doc_id <> keep THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE * 1000000.0)::BIGINT AS dup_rate_q6
         |FROM j GROUP BY 1""".stripMargin),
    // integer-only decay: cnt << (H - min(age,H)) summed as BIGINT,
    // one final division by 2^H; ranks over the |types|-row table
    "q227_decayed_rank" ->
      """WITH grid AS (SELECT event_type, ts::DATE AS day,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT max(day) AS max_day FROM grid),
        |per AS (SELECT event_type,
        |    sum(cnt)::BIGINT AS raw_cnt,
        |    sum(cnt * (CAST(1 AS BIGINT) << (32 - least(
        |      date_diff('day', day, max_day), 32))))::BIGINT AS dec_num
        |  FROM grid, mx GROUP BY 1)
        |SELECT event_type, raw_cnt,
        |  round(dec_num::DOUBLE / 4294967296.0 * 1000.0)::BIGINT AS decayed_q3,
        |  row_number() OVER (ORDER BY raw_cnt DESC, event_type)::BIGINT
        |    AS rank_raw,
        |  row_number() OVER (ORDER BY dec_num DESC, event_type)::BIGINT
        |    AS rank_decayed
        |FROM per""".stripMargin,
    // same flags CTEs as q222 (global, no source key); unique = fails
    // the rule AND passes the other four; the unpivot is 5 literal rows
    "q228_rule_ablation" ->
      s"""WITH w AS (SELECT
         |  list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |    t -> strlen(t) > 0) AS w
         |  FROM documents),
         |c AS (SELECT
         |  len(w)::BIGINT AS n_words,
         |  coalesce(list_sum(list_transform(w, t -> strlen(t))), 0)::BIGINT AS n_wchars,
         |  len(list_filter(w, t -> regexp_matches(t, '[a-z]')))::BIGINT AS n_alpha,
         |  len(list_filter(w, t -> contains(t, '#') OR contains(t, '...')))::BIGINT AS n_sym,
         |  len(list_intersect(list_distinct(w), $stopList))::BIGINT AS n_req
         |  FROM w),
         |f AS (SELECT
         |  (n_words >= 50 AND n_words <= 100000) AS pass_words,
         |  (n_wchars >= n_words * 3 AND n_wchars <= n_words * 10) AS pass_mean,
         |  (n_alpha * 10 >= n_words * 8) AS pass_alpha,
         |  (n_sym * 10 < n_words) AS pass_sym,
         |  (n_req >= 2) AS pass_req
         |  FROM c),
         |g AS (SELECT count(*)::BIGINT AS n_docs,
         |  sum(CASE WHEN NOT pass_words THEN 1 ELSE 0 END)::BIGINT AS fail_words,
         |  sum(CASE WHEN NOT pass_words AND pass_mean AND pass_alpha AND pass_sym AND pass_req THEN 1 ELSE 0 END)::BIGINT AS uniq_words,
         |  sum(CASE WHEN NOT pass_mean THEN 1 ELSE 0 END)::BIGINT AS fail_mean,
         |  sum(CASE WHEN NOT pass_mean AND pass_words AND pass_alpha AND pass_sym AND pass_req THEN 1 ELSE 0 END)::BIGINT AS uniq_mean,
         |  sum(CASE WHEN NOT pass_alpha THEN 1 ELSE 0 END)::BIGINT AS fail_alpha,
         |  sum(CASE WHEN NOT pass_alpha AND pass_words AND pass_mean AND pass_sym AND pass_req THEN 1 ELSE 0 END)::BIGINT AS uniq_alpha,
         |  sum(CASE WHEN NOT pass_sym THEN 1 ELSE 0 END)::BIGINT AS fail_sym,
         |  sum(CASE WHEN NOT pass_sym AND pass_words AND pass_mean AND pass_alpha AND pass_req THEN 1 ELSE 0 END)::BIGINT AS uniq_sym,
         |  sum(CASE WHEN NOT pass_req THEN 1 ELSE 0 END)::BIGINT AS fail_req,
         |  sum(CASE WHEN NOT pass_req AND pass_words AND pass_mean AND pass_alpha AND pass_sym THEN 1 ELSE 0 END)::BIGINT AS uniq_req
         |  FROM f),
         |u AS (
         |  SELECT 'words' AS rule, fail_words AS fail_total, uniq_words AS fail_unique, n_docs FROM g
         |  UNION ALL SELECT 'mean', fail_mean, uniq_mean, n_docs FROM g
         |  UNION ALL SELECT 'alpha', fail_alpha, uniq_alpha, n_docs FROM g
         |  UNION ALL SELECT 'sym', fail_sym, uniq_sym, n_docs FROM g
         |  UNION ALL SELECT 'req', fail_req, uniq_req, n_docs FROM g)
         |SELECT rule, fail_total, fail_unique,
         |  (fail_total - fail_unique)::BIGINT AS fail_shared,
         |  round(fail_unique::DOUBLE / n_docs::DOUBLE * 1000000.0)::BIGINT AS regain_q6
         |FROM u""".stripMargin,
    // exact quantized squared-L2 two-NN (d² = n2a + n2b − 2·dot, all
    // BIGINT); per-point ln μ quantized to 1e6 BEFORE the global sum so
    // the estimator folds exact integers in any order
    "q229_twonn_dim" ->
      """WITH ex AS (SELECT vec_id, round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS v,
        |                   unnest(range(len(embedding))) AS i FROM embeddings),
        |n2 AS (SELECT vec_id, sum(v*v)::BIGINT AS n2 FROM ex GROUP BY 1),
        |dots AS (SELECT a.vec_id AS x, b.vec_id AS y, sum(a.v*b.v)::BIGINT AS dot
        |         FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id <> b.vec_id
        |         GROUP BY 1, 2),
        |dsq AS (SELECT x, y, (na.n2 + nb.n2 - 2*dot)::BIGINT AS dsq
        |        FROM dots JOIN n2 na ON x = na.vec_id
        |                  JOIN n2 nb ON y = nb.vec_id),
        |r AS (SELECT x, dsq,
        |        row_number() OVER (PARTITION BY x ORDER BY dsq ASC, y ASC) AS rk
        |      FROM dsq),
        |tw AS (SELECT x, max(CASE WHEN rk = 1 THEN dsq END) AS d1,
        |         max(CASE WHEN rk = 2 THEN dsq END) AS d2
        |       FROM r WHERE rk <= 2 GROUP BY 1),
        |pt AS (SELECT CASE WHEN d1 > 0
        |         THEN round(0.5 * ln(d2::DOUBLE / d1::DOUBLE) * 1000000.0)::BIGINT
        |         ELSE NULL END AS lnmu_q6 FROM tw)
        |SELECT count(*)::BIGINT AS n_pts,
        |  sum(CASE WHEN lnmu_q6 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_used,
        |  coalesce(sum(lnmu_q6), 0)::BIGINT AS sum_lnmu_q6,
        |  CASE WHEN coalesce(sum(lnmu_q6), 0) > 0
        |    THEN round(sum(CASE WHEN lnmu_q6 IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
        |      * 1000000.0 / sum(lnmu_q6)::DOUBLE * 1000.0)::BIGINT
        |    ELSE 0 END AS id_q3
        |FROM pt""".stripMargin,
    // star-label chain + the canonical's source absorbing every other
    // member's source; diagonal = within-source redundancy baseline
    "q247_survivorship" -> (dedupLabelCtes(5) +
      s""",
         |dd AS (SELECT doc_id, source, n_chars FROM documents),
         |wl AS (SELECT l5.doc_id, l5.label, dd.source, dd.n_chars
         |       FROM l5 JOIN dd USING (doc_id)),
         |cn AS (SELECT label, min(doc_id) AS canon_id
         |       FROM wl GROUP BY 1 HAVING count(*) >= 2),
         |cs AS (SELECT cn.label, cn.canon_id, dd.source AS canon_source
         |       FROM cn JOIN dd ON cn.canon_id = dd.doc_id)
         |SELECT cs.canon_source, wl.source AS member_source,
         |  count(*)::BIGINT AS n_absorbed,
         |  sum(wl.n_chars)::BIGINT AS chars_absorbed
         |FROM wl JOIN cs USING (label)
         |WHERE wl.doc_id <> cs.canon_id
         |GROUP BY 1, 2""".stripMargin),
    // star-label chain + per-cluster canonical (min doc_id) vs mean
    // length, ratios quantized BEFORE the bucket mean
    "q243_canonical_bias" -> (dedupLabelCtes(5) +
      s""",
         |wl AS (SELECT l5.doc_id, l5.label, d.n_chars
         |       FROM l5 JOIN documents d USING (doc_id)),
         |per AS (SELECT label, count(*)::BIGINT AS sz, min(doc_id) AS canon_id,
         |        sum(n_chars)::BIGINT AS sum_len
         |        FROM wl GROUP BY 1 HAVING count(*) >= 2),
         |cl AS (SELECT per.sz, per.sum_len, d.n_chars AS canon_len
         |       FROM per JOIN documents d ON per.canon_id = d.doc_id),
         |bb AS (SELECT CASE WHEN sz = 2 THEN 1 WHEN sz <= 4 THEN 2
         |         WHEN sz <= 8 THEN 3 ELSE 4 END AS size_bucket,
         |  round(canon_len::DOUBLE * sz::DOUBLE / sum_len::DOUBLE
         |    * 1000000.0)::BIGINT AS rq,
         |  (canon_len * sz < sum_len) AS shorter FROM cl)
         |SELECT size_bucket, count(*)::BIGINT AS n_clusters,
         |  round(sum(rq)::DOUBLE / count(*)::DOUBLE)::BIGINT AS mean_ratio_q6,
         |  sum(CASE WHEN shorter THEN 1 ELSE 0 END)::BIGINT AS n_shorter
         |FROM bb GROUP BY 1""".stripMargin),
    // q60's exact regex counters keyed by source; exposure = any-match
    // share per source
    "q244_pii_by_source" -> {
      import graft.functions.TextFunctions.PiiPatterns
      val counts = PiiPatterns.map { case (k, p) =>
        s"len(regexp_extract_all(text, '$p'))::BIGINT AS n_$k"
      }.mkString(",\n|  ")
      val sums = PiiPatterns.map { case (k, _) =>
        s"sum(n_$k)::BIGINT AS sum_$k"
      }.mkString(",\n|  ")
      val anyHit = PiiPatterns.map { case (k, _) => s"n_$k > 0" }
        .mkString(" OR ")
      s"""WITH c AS (SELECT source,
         |  $counts
         |  FROM documents)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(CASE WHEN $anyHit THEN 1 ELSE 0 END)::BIGINT AS n_flagged,
         |  $sums,
         |  round(sum(CASE WHEN $anyHit THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE * 1000000.0)::BIGINT AS exposure_q6
         |FROM c GROUP BY 1""".stripMargin
    },
    // cross-multiplied |S_k·n − k·S_n| (the q232 discipline on the time
    // axis): supremum and argmax value-exact, ties to the earliest day
    "q246_cusum" ->
      """WITH grid AS (SELECT event_type, ts::DATE AS day,
        |    count(*)::BIGINT AS cnt FROM events GROUP BY 1, 2),
        |cum AS (SELECT event_type, day,
        |    (sum(cnt) OVER w)::BIGINT AS sk,
        |    (count(*) OVER w)::BIGINT AS k
        |  FROM grid WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT event_type, sum(cnt)::BIGINT AS sn,
        |    count(*)::BIGINT AS n_days FROM grid GROUP BY 1),
        |sc AS (SELECT c.event_type, c.day, c.sk, c.k, t.sn, t.n_days,
        |    abs(c.sk::HUGEINT * t.n_days - c.k::HUGEINT * t.sn) AS dev
        |  FROM cum c JOIN tot t USING (event_type)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY dev DESC, day ASC) AS rk FROM sc)
        |SELECT event_type, n_days, sn AS n_events, day AS break_day,
        |  dev::BIGINT AS cusum_dev,
        |  round(sk::DOUBLE / k::DOUBLE * 1000.0)::BIGINT AS rate_before_q3,
        |  CASE WHEN n_days > k
        |    THEN round((sn - sk)::DOUBLE / (n_days - k)::DOUBLE
        |      * 1000.0)::BIGINT
        |    ELSE 0 END AS rate_after_q3
        |FROM r WHERE rk = 1""".stripMargin,
    // one gap scan scores every threshold: n_sessions(tau) =
    // n_active_users + |gaps > tau| (q28's strict-> convention)
    "q245_session_sweep" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |  FROM events),
        |g AS (SELECT user_id, ts_us - lag(ts_us) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id) AS gap FROM e),
        |tot AS (SELECT count(*)::BIGINT AS n_events,
        |  count(DISTINCT user_id)::BIGINT AS n_users FROM e),
        |ks AS (SELECT unnest([5, 15, 30, 60]::BIGINT[]) AS gap_min),
        |br AS (SELECT gap_min,
        |  sum(CASE WHEN gap > gap_min * 60000000 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_breaks
        |  FROM g, ks WHERE gap IS NOT NULL GROUP BY 1)
        |SELECT gap_min, n_users, (n_users + n_breaks)::BIGINT AS n_sessions,
        |  round(n_events::DOUBLE / (n_users + n_breaks)::DOUBLE
        |    * 1000.0)::BIGINT AS mean_events_q3
        |FROM br, tot""".stripMargin,
    // the q164 zone-map chain + an integer predicate sweep: skip iff
    // max < lo or min > hi, the parquet min/max prune test verbatim
    "q242_skip_rate" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |    epoch_us(o_orderdate) // 86400000000 AS dy FROM orders),
        |b AS (SELECT min(o_custkey) AS clo, max(o_custkey) AS chi,
        |        min(dy) AS dlo, max(dy) AS dhi FROM o),
        |n AS (SELECT o_orderkey,
        |    (o_custkey - clo) * 65535 // greatest(1, chi - clo) AS c16,
        |    (dy - dlo) * 65535 // greatest(1, dhi - dlo) AS d16 FROM o, b),
        |z AS (SELECT *, list_sum(list_transform(range(0, 16), i ->
        |    ((c16 >> i::INT) & 1) * (1::BIGINT << (2 * i)::INT) +
        |    ((d16 >> i::INT) & 1) * (1::BIGINT << (2 * i + 1)::INT)))::BIGINT
        |    AS zv FROM n),
        |blk AS (SELECT 'zorder' AS layout, zv // 536870912 AS block, c16, d16
        |        FROM z
        |        UNION ALL
        |        SELECT 'linear', d16 // 8192, c16, d16 FROM z),
        |stats AS (SELECT layout, block,
        |    min(c16) AS min_c, max(c16) AS max_c,
        |    min(d16) AS min_d, max(d16) AS max_d
        |  FROM blk GROUP BY 1, 2),
        |pr AS (SELECT unnest(range(8)) AS p),
        |chk AS (
        |  SELECT layout, 'c' AS dim,
        |    (max_c < p * 8192 OR min_c > p * 8192 + 8191) AS skip
        |  FROM stats, pr
        |  UNION ALL
        |  SELECT layout, 'd',
        |    (max_d < p * 8192 OR min_d > p * 8192 + 8191)
        |  FROM stats, pr)
        |SELECT layout, dim, count(*)::BIGINT AS n_checks,
        |  sum(CASE WHEN skip THEN 1 ELSE 0 END)::BIGINT AS n_skipped,
        |  round(sum(CASE WHEN skip THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*)::DOUBLE * 1000000.0)::BIGINT AS skip_rate_q6
        |FROM chk GROUP BY 1, 2""".stripMargin,
    // the full Lloyd (8,2) re-derivation → per-member √dist² quantized
    // BEFORE the scatter mean; centroid gaps from exact integer coords;
    // one quantized division per (i, j), ties to the lower-id neighbor
    "q252_davies_bouldin" -> {
      s"""WITH ex AS (SELECT vec_id,
         |    round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS e,
         |    unnest(range(len(embedding))) AS i FROM embeddings),
         |${kmeansCentroidCtes(8, 2)},
         |fd AS (SELECT x.vec_id, c.cid,
         |    sum((x.e - c.cq) * (x.e - c.cq))::BIGINT AS dist
         |  FROM ex x JOIN c2 c ON x.i = c.i GROUP BY 1, 2),
         |fa AS (SELECT vec_id, cid, dist FROM (
         |    SELECT vec_id, cid, dist,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY dist, cid) AS rn FROM fd) WHERE rn = 1),
         |sct AS (SELECT cid, count(*)::BIGINT AS n_members,
         |    round(sum(round(sqrt(dist::DOUBLE))::BIGINT)::DOUBLE
         |      / count(*)::DOUBLE)::BIGINT AS scatter
         |  FROM fa GROUP BY 1),
         |gp AS (SELECT a.cid AS cluster, b.cid AS j,
         |    round(sqrt(sum((a.cq - b.cq) * (a.cq - b.cq))::DOUBLE))::BIGINT
         |      AS dij
         |  FROM c2 a JOIN c2 b ON a.i = b.i AND a.cid <> b.cid
         |  GROUP BY 1, 2),
         |rt AS (SELECT s.cid AS cluster, s.n_members, s.scatter, g.j,
         |    round((s.scatter + t.scatter)::DOUBLE / g.dij::DOUBLE
         |      * 1000000.0)::BIGINT AS ratio
         |  FROM sct s JOIN gp g ON s.cid = g.cluster AND g.dij > 0
         |  JOIN sct t ON g.j = t.cid),
         |wr AS (SELECT cluster, n_members, scatter, j, ratio,
         |    row_number() OVER (PARTITION BY cluster
         |      ORDER BY ratio DESC, j ASC) AS rk FROM rt)
         |SELECT cluster::BIGINT AS cluster, n_members, scatter,
         |  j::BIGINT AS worst_neighbor, ratio AS db_q6
         |FROM wr WHERE rk = 1""".stripMargin
    },
    // q249's calibrated means × q57's BPE masses; greedy walk under the
    // total (quality DESC, source) order, integer budget comparisons
    "q251_knapsack" ->
      s"""WITH qm AS (SELECT d.source,
         |    round(sum(round(qr.pr * 1000000.0)::BIGINT)::DOUBLE
         |      / count(*)::DOUBLE)::BIGINT AS mean_pr_q6
         |  FROM ($qualityRankSql) qr JOIN documents d USING (doc_id)
         |  GROUP BY 1),
         |mm AS (SELECT source,
         |    sum(list_sum(list_transform(
         |      regexp_split_to_array(lower(text), '\\s+'),
         |      w -> floor((strlen(w)+3)/4)::BIGINT)))::BIGINT AS m_toks
         |  FROM documents GROUP BY 1),
         |base AS (SELECT qm.source, qm.mean_pr_q6, mm.m_toks
         |  FROM qm JOIN mm USING (source)),
         |tot AS (SELECT sum(m_toks)::BIGINT AS tot FROM base),
         |r AS (SELECT source, mean_pr_q6, m_toks,
         |    row_number() OVER (ORDER BY mean_pr_q6 DESC, source)::BIGINT
         |      AS rank,
         |    ((sum(m_toks) OVER (ORDER BY mean_pr_q6 DESC, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |      - m_toks)::BIGINT AS cum_before
         |  FROM base)
         |SELECT source, rank, mean_pr_q6, m_toks,
         |  (tot // 2)::BIGINT AS budget,
         |  CASE WHEN cum_before + m_toks <= tot // 2 THEN 1000000
         |       WHEN cum_before >= tot // 2 THEN 0
         |       ELSE round((tot // 2 - cum_before)::DOUBLE
         |         / m_toks::DOUBLE * 1000000.0)::BIGINT
         |  END AS take_q6
         |FROM r, tot""".stripMargin,
    // exact variance numerators; Neyman weights N·σ quantized BEFORE
    // the normalizing sum so allocations are order-independent
    "q250_neyman_alloc" ->
      """WITH g AS (SELECT source, count(*)::BIGINT AS n_docs,
        |    sum(n_chars::HUGEINT) AS sx,
        |    sum(n_chars::HUGEINT * n_chars::HUGEINT) AS sxx
        |  FROM documents GROUP BY 1),
        |w AS (SELECT source, n_docs,
        |    CASE WHEN n_docs > 1 THEN
        |      sqrt((n_docs::HUGEINT * sxx - sx * sx)::DOUBLE
        |        / (n_docs::DOUBLE * (n_docs - 1)::DOUBLE))
        |    ELSE 0.0 END AS sd
        |  FROM g),
        |wq AS (SELECT source, n_docs, sd,
        |    round(n_docs::DOUBLE * sd)::BIGINT AS wq FROM w),
        |tot AS (SELECT sum(n_docs)::BIGINT AS nn, sum(wq)::BIGINT AS sw
        |  FROM wq)
        |SELECT source, n_docs,
        |  round(sd * 1000.0)::BIGINT AS sd_q3,
        |  round(1000.0 * n_docs::DOUBLE / nn::DOUBLE)::BIGINT AS alloc_prop,
        |  CASE WHEN sw > 0
        |    THEN round(1000.0 * wq::DOUBLE / sw::DOUBLE)::BIGINT
        |    ELSE 0 END AS alloc_neyman,
        |  (CASE WHEN sw > 0
        |    THEN round(1000.0 * wq::DOUBLE / sw::DOUBLE)::BIGINT
        |    ELSE 0 END
        |   - round(1000.0 * n_docs::DOUBLE / nn::DOUBLE)::BIGINT) AS delta
        |FROM wq, tot""".stripMargin,
    // HHI from exact Σm²/M²; coverage ranks compare exact integers
    // (cum·2 ≥ M, cum·10 ≥ 9M) under the total (mass desc, source) order
    "q241_source_hhi" ->
      """WITH m AS (SELECT source, sum(n_chars)::BIGINT AS m
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT AS n_sources, sum(m)::BIGINT AS mm,
        |  sum(m::HUGEINT * m::HUGEINT) AS sq FROM m),
        |r AS (SELECT source, m,
        |  row_number() OVER (ORDER BY m DESC, source)::BIGINT AS rk,
        |  (sum(m) OVER (ORDER BY m DESC, source
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::HUGEINT AS cum
        |  FROM m)
        |SELECT tot.n_sources, tot.mm AS total_chars,
        |  round(tot.sq::DOUBLE / (tot.mm::DOUBLE * tot.mm::DOUBLE)
        |    * 1000000000.0)::BIGINT AS hhi_q9,
        |  (SELECT min(rk) FROM r, tot WHERE cum * 2 >= tot.mm::HUGEINT)
        |    AS k50,
        |  (SELECT min(rk) FROM r, tot
        |   WHERE cum * 10 >= tot.mm::HUGEINT * 9) AS k90,
        |  (SELECT source FROM r WHERE rk = 1) AS top_source,
        |  round((SELECT m FROM r WHERE rk = 1)::DOUBLE / tot.mm::DOUBLE
        |    * 1000000.0)::BIGINT AS top_share_q6
        |FROM tot""".stripMargin,
    // exact per-dim variance numerators; shares quantized to 1e9 BEFORE
    // the PR fold so Σ sq² is an exact integer (v² would overflow)
    "q240_axis_isotropy" ->
      """WITH ex AS (SELECT vec_id,
        |    round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS v,
        |    unnest(range(len(embedding))) AS i FROM embeddings),
        |st AS (SELECT i, count(*)::HUGEINT AS n, sum(v)::HUGEINT AS sx,
        |       sum(v::HUGEINT * v::HUGEINT) AS sxx FROM ex GROUP BY 1),
        |vr AS (SELECT i, n, (n * sxx - sx * sx) AS vnum FROM st),
        |tot AS (SELECT sum(vnum) AS sv, count(*)::BIGINT AS dims FROM vr),
        |sh AS (SELECT i, vnum,
        |    round(vnum::DOUBLE / sv::DOUBLE * 1000000000.0)::BIGINT AS sq
        |  FROM vr, tot),
        |top AS (SELECT i AS top_dim, sq AS top_share_q9 FROM sh
        |        ORDER BY vnum DESC, i ASC LIMIT 1),
        |pr AS (SELECT sum(sq::HUGEINT * sq::HUGEINT) AS ssq FROM sh)
        |SELECT (SELECT max(n) FROM st)::BIGINT AS n_vecs,
        |  (SELECT dims FROM tot) AS dims,
        |  top.top_dim::BIGINT AS top_dim, top.top_share_q9,
        |  round(1000000000000000000.0 / (SELECT ssq FROM pr)::DOUBLE
        |    * 1000.0)::BIGINT AS pr_q3
        |FROM top""".stripMargin,
    // pairwise slopes quantized to 1e9 (one exact-int division each);
    // LOWER median at rank (n+1)//2 under a fully deterministic order
    "q239_theil_sen" ->
      """WITH grid AS (SELECT event_type, ts::DATE AS day,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |nd AS (SELECT event_type, count(*)::BIGINT AS n_days
        |       FROM grid GROUP BY 1),
        |pairs AS (SELECT a.event_type, a.day AS da, b.day AS db,
        |    round((b.cnt - a.cnt)::DOUBLE
        |      / date_diff('day', a.day, b.day)::DOUBLE
        |      * 1000000000.0)::BIGINT AS slope_q9
        |  FROM grid a JOIN grid b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |rk AS (SELECT event_type, slope_q9,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY slope_q9, da, db)::BIGINT AS rk,
        |    count(*) OVER (PARTITION BY event_type)::BIGINT AS np
        |  FROM pairs)
        |SELECT rk.event_type, nd.n_days, rk.np AS n_pairs,
        |  rk.slope_q9 AS sen_slope_q9
        |FROM rk JOIN nd USING (event_type)
        |WHERE rk.rk = (rk.np + 1) // 2""".stripMargin,
    // the q23 sketch re-derivation's bit lists, unnested per position;
    // bias = |2·ones − n| on exact integers
    "q238_simhash_bits" ->
      s"""WITH $cleanToksCte,
         |tok AS (SELECT doc_id, unnest(ws) AS t FROM toks),
         |th AS (SELECT doc_id,
         |  ${md5Bits32Sql("t", 1)} AS hi,
         |  ${md5Bits32Sql("t", 9)} AS lo
         |  FROM tok),
         |votes AS (SELECT doc_id, k,
         |  sum(CASE WHEN (CASE WHEN k < 32 THEN (lo >> k::INT) & 1
         |                      ELSE (hi >> (k - 32)::INT) & 1 END) = 1
         |      THEN 1 ELSE -1 END) AS vote
         |  FROM th, range(64) kk(k) GROUP BY 1, 2),
         |skv AS (SELECT doc_id,
         |  list(CASE WHEN vote > 0 THEN 1 ELSE 0 END ORDER BY k) AS bl
         |  FROM votes GROUP BY 1),
         |sk AS (SELECT d.doc_id, coalesce(s.bl, list_transform(range(64), z -> 0)) AS bl
         |       FROM documents d LEFT JOIN skv s USING (doc_id)),
         |bits AS (SELECT k AS bit, bl[(k + 1)::INT] AS one
         |         FROM sk, range(64) kk(k))
         |SELECT bit::BIGINT AS bit, count(*)::BIGINT AS n_docs,
         |  sum(one)::BIGINT AS n_ones,
         |  round(sum(one)::DOUBLE / count(*)::DOUBLE * 1000000.0)::BIGINT
         |    AS ones_frac_q6,
         |  round(abs(sum(one) * 2 - count(*))::DOUBLE / count(*)::DOUBLE
         |    * 1000000.0)::BIGINT AS bias_q6
         |FROM bits GROUP BY 1""".stripMargin,
    // the q136 calibration CTEs keyed by source; per-doc pr quantized
    // BEFORE the mean so the fold is an exact integer sum
    "q249_source_quality" ->
      s"""WITH j AS (SELECT qr.doc_id,
         |    round(qr.pr * 1000000.0)::BIGINT AS prq,
         |    (qr.decile = 9) AS top, d.source
         |  FROM ($qualityRankSql) qr JOIN documents d USING (doc_id))
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  round(sum(prq)::DOUBLE / count(*)::DOUBLE)::BIGINT AS mean_pr_q6,
         |  sum(CASE WHEN top THEN 1 ELSE 0 END)::BIGINT AS n_top_decile,
         |  round(sum(CASE WHEN top THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE * 1000000.0)::BIGINT AS top_share_q6
         |FROM j GROUP BY 1""".stripMargin,
    // the q116 BM25 rank chain × the exact dense cosine rank chain;
    // overlaps are integer set intersections, one division per k
    "q248_arm_agreement" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |    t -> regexp_full_match(t, '[a-z]+') AND NOT list_contains($stopList, t))) AS t
         |  FROM documents),
         |ev AS (SELECT doc_id,
         |  ${md5Bits32Sql("'eval:' || doc_id::VARCHAR", 1)} % 100 < 5 AS ev
         |  FROM documents),
         |tf AS (SELECT toks.doc_id, t, count(*)::BIGINT AS tf
         |       FROM toks JOIN ev USING (doc_id) WHERE NOT ev GROUP BY 1, 2),
         |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
         |st AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sumdl FROM dl),
         |dfT AS (SELECT t, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |q AS (SELECT DISTINCT toks.doc_id AS query_id, t
         |      FROM toks JOIN ev USING (doc_id) WHERE ev),
         |sq AS (SELECT q.query_id, tf.doc_id,
         |  round(log2(((n - df + 0.5) / (df + 0.5)) + 1.0)
         |    * (tf * 2.2)
         |    / (tf + 1.2 * (0.25 + 0.75 * ((dl * n)::DOUBLE / sumdl::DOUBLE)))
         |    * 1000000.0)::BIGINT AS sq
         |  FROM q JOIN tf USING (t) JOIN dfT USING (t)
         |  JOIN dl ON tf.doc_id = dl.doc_id, st),
         |sc AS (SELECT query_id, doc_id, sum(sq)::BIGINT AS score_q
         |       FROM sq GROUP BY 1, 2),
         |lrk AS (SELECT query_id, doc_id,
         |       row_number() OVER (PARTITION BY query_id
         |         ORDER BY score_q DESC, doc_id)::BIGINT AS lrank FROM sc),
         |emq AS (SELECT vec_id,
         |    round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS v,
         |    unnest(range(len(embedding))) AS i FROM embeddings),
         |n2e AS (SELECT vec_id, sum(v*v)::BIGINT AS n2 FROM emq GROUP BY 1),
         |dot AS (SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
         |    sum(a.v * b.v)::BIGINT AS dot
         |  FROM emq a JOIN ev ea ON a.vec_id = ea.doc_id AND ea.ev
         |  JOIN emq b ON a.i = b.i
         |  JOIN ev eb ON b.vec_id = eb.doc_id AND NOT eb.ev
         |  GROUP BY 1, 2),
         |drk AS (SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY
         |      dot::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)) DESC,
         |      doc_id ASC)::BIGINT AS drank
         |  FROM dot JOIN n2e na ON query_id = na.vec_id
         |           JOIN n2e nb ON doc_id = nb.vec_id),
         |base AS (SELECT DISTINCT query_id FROM q),
         |ks AS (SELECT unnest([5, 10, 20]::BIGINT[]) AS k),
         |bo AS (SELECT l.query_id, l.lrank, dr.drank
         |  FROM (SELECT * FROM lrk WHERE lrank <= 20) l
         |  JOIN (SELECT * FROM drk WHERE drank <= 20) dr
         |    USING (query_id, doc_id)),
         |ov AS (SELECT base.query_id, ks.k,
         |    sum(CASE WHEN bo.lrank IS NOT NULL
         |      AND bo.lrank <= ks.k AND bo.drank <= ks.k
         |      THEN 1 ELSE 0 END)::BIGINT AS ov
         |  FROM base CROSS JOIN ks
         |  LEFT JOIN bo ON base.query_id = bo.query_id
         |  GROUP BY 1, 2)
         |SELECT k, count(*)::BIGINT AS n_queries,
         |  sum(CASE WHEN ov = 0 THEN 1 ELSE 0 END)::BIGINT AS n_disjoint,
         |  sum(ov)::BIGINT AS sum_overlap,
         |  round(sum(ov)::DOUBLE / (count(*) * k)::DOUBLE
         |    * 1000000.0)::BIGINT AS mean_overlap_q6
         |FROM ov GROUP BY 1""".stripMargin,
    // the q116 BM25 chain (rank table) × the q16 Jaccard truth pairs;
    // reciprocal ranks are exact integer floor-divs, misses are 0
    "q237_retrieval_eval" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |    t -> regexp_full_match(t, '[a-z]+') AND NOT list_contains($stopList, t))) AS t
         |  FROM documents),
         |ev AS (SELECT doc_id,
         |  ${md5Bits32Sql("'eval:' || doc_id::VARCHAR", 1)} % 100 < 5 AS ev
         |  FROM documents),
         |tf AS (SELECT toks.doc_id, t, count(*)::BIGINT AS tf
         |       FROM toks JOIN ev USING (doc_id) WHERE NOT ev GROUP BY 1, 2),
         |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
         |st AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sumdl FROM dl),
         |dfT AS (SELECT t, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |q AS (SELECT DISTINCT toks.doc_id AS query_id, t
         |      FROM toks JOIN ev USING (doc_id) WHERE ev),
         |sq AS (SELECT q.query_id, tf.doc_id,
         |  round(log2(((n - df + 0.5) / (df + 0.5)) + 1.0)
         |    * (tf * 2.2)
         |    / (tf + 1.2 * (0.25 + 0.75 * ((dl * n)::DOUBLE / sumdl::DOUBLE)))
         |    * 1000000.0)::BIGINT AS sq
         |  FROM q JOIN tf USING (t) JOIN dfT USING (t)
         |  JOIN dl ON tf.doc_id = dl.doc_id, st),
         |sc AS (SELECT query_id, doc_id, sum(sq)::BIGINT AS score_q
         |       FROM sq GROUP BY 1, 2),
         |rk AS (SELECT query_id, doc_id,
         |       row_number() OVER (PARTITION BY query_id
         |         ORDER BY score_q DESC, doc_id)::BIGINT AS rank FROM sc),
         |wtk AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
         |        FROM documents),
         |sh3 AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM wtk, unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3)),
         |szs AS (SELECT doc_id, count(*) AS sz FROM sh3 GROUP BY 1),
         |itr AS (SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS inter
         |        FROM sh3 a JOIN sh3 b ON a.s = b.s AND a.doc_id < b.doc_id
         |        GROUP BY 1, 2),
         |prs AS (SELECT x, y FROM itr
         |  JOIN szs sa ON x = sa.doc_id JOIN szs sb ON y = sb.doc_id
         |  WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.5),
         |tr AS (SELECT CASE WHEN ea.ev THEN p.x ELSE p.y END AS query_id,
         |              CASE WHEN ea.ev THEN p.y ELSE p.x END AS doc_id
         |       FROM prs p JOIN ev ea ON p.x = ea.doc_id
         |                  JOIN ev eb ON p.y = eb.doc_id
         |       WHERE ea.ev <> eb.ev),
         |fr AS (SELECT tr.query_id, min(rk.rank) AS r
         |       FROM tr JOIN rk ON tr.query_id = rk.query_id
         |                      AND tr.doc_id = rk.doc_id
         |       WHERE rk.rank <= 20 GROUP BY 1),
         |pq AS (SELECT DISTINCT query_id FROM tr),
         |pj AS (SELECT pq.query_id, fr.r FROM pq LEFT JOIN fr USING (query_id)),
         |ks AS (SELECT unnest([1, 5, 10, 20]::BIGINT[]) AS k)
         |SELECT k, count(*)::BIGINT AS n_queries,
         |  sum(CASE WHEN r IS NOT NULL AND r <= k THEN 1 ELSE 0 END)::BIGINT
         |    AS n_hit,
         |  round(sum(CASE WHEN r IS NOT NULL AND r <= k THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE * 1000000.0)::BIGINT AS recall_q6,
         |  round(sum(CASE WHEN r IS NOT NULL AND r <= k
         |      THEN 1000000 // r ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE)::BIGINT AS mrr_q6
         |FROM pj, ks GROUP BY 1""".stripMargin,
    // waste2(b) from histogram prefix sums — one value-domain window
    // pass scores every candidate boundary; ties to the smallest b
    "q236_pad_split" ->
      """WITH hist AS (SELECT n_chars AS len, count(*)::BIGINT AS cnt
        |  FROM documents GROUP BY 1),
        |cum AS (SELECT len, cnt,
        |  (sum(cnt) OVER w)::HUGEINT AS cn,
        |  (sum(len::HUGEINT * cnt::HUGEINT) OVER w)::HUGEINT AS cs
        |  FROM hist WINDOW w AS (ORDER BY len
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT sum(cnt)::HUGEINT AS n_docs,
        |  sum(len::HUGEINT * cnt::HUGEINT) AS s_chars,
        |  max(len)::HUGEINT AS max_len FROM hist),
        |wst AS (SELECT len, (len::HUGEINT * cn - cs)
        |    + (max_len * (n_docs - cn) - (s_chars - cs)) AS waste2
        |  FROM cum, tot),
        |best AS (SELECT waste2, len FROM wst
        |  ORDER BY waste2 ASC, len ASC LIMIT 1)
        |SELECT n_docs::BIGINT AS n_docs, max_len::BIGINT AS max_len,
        |  best.len::BIGINT AS boundary_chars,
        |  (max_len * n_docs - s_chars)::BIGINT AS waste_one_bucket,
        |  best.waste2::BIGINT AS waste_two_buckets,
        |  CASE WHEN max_len * n_docs - s_chars > 0 THEN
        |    round(((max_len * n_docs - s_chars) - best.waste2)::DOUBLE
        |      / (max_len * n_docs - s_chars)::DOUBLE * 1000000.0)::BIGINT
        |  ELSE 0 END AS savings_q6
        |FROM tot, best""".stripMargin,
    // exact integer half-centroid sums (the q206 discipline, cosine is
    // scale-free); member cosines quantized to 1e6 BEFORE the per-half
    // mean so the coherence fold is an exact integer sum
    "q235_centroid_drift" ->
      """WITH ex AS (SELECT vec_id,
        |    round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS v,
        |    unnest(range(len(embedding))) AS i FROM embeddings),
        |mm AS (SELECT min(vec_id) AS mn, max(vec_id) AS mx FROM embeddings),
        |h AS (SELECT ex.vec_id, (vec_id <= (mn + mx) // 2) AS early, i, v
        |      FROM ex, mm),
        |sli AS (SELECT early, i, sum(v)::BIGINT AS s, count(*)::BIGINT AS cnt
        |        FROM h GROUP BY 1, 2),
        |n2h AS (SELECT early, sum(s::HUGEINT * s::HUGEINT) AS n2s,
        |        max(cnt) AS n_vecs FROM sli GROUP BY 1),
        |n2v AS (SELECT vec_id, sum(v*v)::BIGINT AS n2 FROM ex GROUP BY 1),
        |cc AS (SELECT sum(a.s::HUGEINT * b.s::HUGEINT) AS dot
        |  FROM sli a JOIN sli b ON a.i = b.i AND a.early AND NOT b.early),
        |md AS (SELECT h.vec_id, h.early,
        |    sum(h.v::HUGEINT * sli.s::HUGEINT) AS dot
        |  FROM h JOIN sli ON h.early = sli.early AND h.i = sli.i
        |  GROUP BY 1, 2),
        |co AS (SELECT md.early,
        |    round(sum(round(md.dot::DOUBLE
        |      / (sqrt(n2v.n2::DOUBLE) * sqrt(n2h.n2s::DOUBLE))
        |      * 1000000.0)::BIGINT)::DOUBLE / count(*)::DOUBLE)::BIGINT AS coh
        |  FROM md JOIN n2v USING (vec_id) JOIN n2h ON md.early = n2h.early
        |  GROUP BY 1)
        |SELECT (SELECT n_vecs FROM n2h WHERE early) AS n_early,
        |  (SELECT n_vecs FROM n2h WHERE NOT early) AS n_late,
        |  round((SELECT dot FROM cc)::DOUBLE
        |    / (sqrt((SELECT n2s FROM n2h WHERE early)::DOUBLE)
        |       * sqrt((SELECT n2s FROM n2h WHERE NOT early)::DOUBLE))
        |    * 1000000.0)::BIGINT AS centroid_cos_q6,
        |  (SELECT coh FROM co WHERE early) AS coherence_early_q6,
        |  (SELECT coh FROM co WHERE NOT early) AS coherence_late_q6""".stripMargin,
    // B = (√D − Σg)/(√D + Σg) with D = n·Σg² − (Σg)² exact HUGEINT —
    // one sqrt + one division is the whole FP tail, mirrored exactly
    "q234_burstiness" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |  epoch_us(ts) AS ts_us FROM events),
        |g AS (SELECT user_id, event_type,
        |  ts_us - lag(ts_us) OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts_us, event_id) AS gap
        |  FROM e),
        |f AS (SELECT * FROM g WHERE gap IS NOT NULL),
        |a AS (SELECT event_type, count(*)::BIGINT AS n_gaps,
        |  count(DISTINCT user_id)::BIGINT AS n_users,
        |  sum(gap::HUGEINT) AS sg, sum(gap::HUGEINT * gap::HUGEINT) AS sgg
        |  FROM f GROUP BY 1)
        |SELECT event_type, n_users, n_gaps,
        |  sg::DOUBLE / n_gaps::DOUBLE AS mean_gap_us,
        |  CASE WHEN n_gaps > 1 AND sg > 0 THEN
        |    (sqrt((n_gaps::HUGEINT * sgg - sg * sg)::DOUBLE) - sg::DOUBLE)
        |    / (sqrt((n_gaps::HUGEINT * sgg - sg * sg)::DOUBLE) + sg::DOUBLE)
        |  ELSE 0.0 END AS burstiness
        |FROM a""".stripMargin,
    // q140's quantized-term entropy discipline per POSITION; modal token
    // via ORDER BY c DESC, tok DESC mirroring the engine's struct-max
    "q233_pos_entropy" ->
      """WITH toks AS (SELECT regexp_split_to_array(lower(text), '\s+') AS w
        |  FROM documents),
        |tc AS (SELECT i AS pos, w[i] AS tok, count(*)::BIGINT AS c
        |  FROM toks, unnest(range(1, least(len(w), 16) + 1)) AS t(i)
        |  GROUP BY 1, 2),
        |n AS (SELECT pos, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_types
        |  FROM tc GROUP BY 1),
        |top AS (SELECT pos, c AS top_count, tok AS top_token FROM (
        |  SELECT pos, c, tok,
        |    row_number() OVER (PARTITION BY pos ORDER BY c DESC, tok DESC)
        |      AS rk FROM tc) WHERE rk = 1)
        |SELECT tc.pos::BIGINT AS pos, max(n.n) AS n_docs,
        |  max(n.n_types) AS n_types,
        |  sum(round((c::DOUBLE / n.n::DOUBLE)
        |    * log2(n.n::DOUBLE / c::DOUBLE) * 1000000.0)::BIGINT)::BIGINT
        |    AS entropy_q6,
        |  max(top.top_token) AS top_token, max(top.top_count) AS top_count,
        |  round(max(top.top_count)::DOUBLE / max(n.n)::DOUBLE
        |    * 1000000.0)::BIGINT AS top_frac_q6
        |FROM tc JOIN n USING (pos) JOIN top USING (pos)
        |GROUP BY 1""".stripMargin,
    // exact cross-multiplied KS numerators (HUGEINT) so the supremum and
    // its argmax (smallest length on ties) are value-exact; the single
    // division by n_t*n_split is the only FP op
    "q232_ks_split" ->
      s"""WITH s AS (SELECT n_chars,
         |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'validation'
         |       ELSE 'test' END AS split
         |  FROM (SELECT n_chars,
         |    ${md5Bits32Sql("'split:' || doc_id::VARCHAR", 1)} % 100 AS b
         |    FROM documents)),
         |g AS (SELECT n_chars,
         |  sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)::BIGINT AS c_t,
         |  sum(CASE WHEN split = 'validation' THEN 1 ELSE 0 END)::BIGINT AS c_v,
         |  sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END)::BIGINT AS c_s
         |  FROM s GROUP BY 1),
         |c AS (SELECT n_chars,
         |  (sum(c_t) OVER w)::HUGEINT AS a_t,
         |  (sum(c_v) OVER w)::HUGEINT AS a_v,
         |  (sum(c_s) OVER w)::HUGEINT AS a_s
         |  FROM g WINDOW w AS (ORDER BY n_chars
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |t AS (SELECT sum(c_t)::HUGEINT AS n_t, sum(c_v)::HUGEINT AS n_v,
         |  sum(c_s)::HUGEINT AS n_s FROM g),
         |nv AS (SELECT abs(a_t * n_v - a_v * n_t) AS num, n_chars FROM c, t),
         |ns AS (SELECT abs(a_t * n_s - a_s * n_t) AS num, n_chars FROM c, t),
         |u AS (
         |  SELECT 'validation' AS split, (SELECT n_v FROM t) AS n_split,
         |    (SELECT max(num) FROM nv) AS num,
         |    (SELECT min(n_chars) FROM nv
         |     WHERE num = (SELECT max(num) FROM nv)) AS at_chars
         |  UNION ALL
         |  SELECT 'test', (SELECT n_s FROM t),
         |    (SELECT max(num) FROM ns),
         |    (SELECT min(n_chars) FROM ns
         |     WHERE num = (SELECT max(num) FROM ns)))
         |SELECT split, (SELECT n_t FROM t)::BIGINT AS n_train,
         |  n_split::BIGINT AS n_split, at_chars::BIGINT AS at_chars,
         |  round(num::DOUBLE
         |    / ((SELECT n_t FROM t)::DOUBLE * n_split::DOUBLE)
         |    * 1000000.0)::BIGINT AS ks_q6
         |FROM u""".stripMargin,
    // full Bloom re-derivation: the filter's realized bit positions are
    // the distinct md5-window probes of the eval grams; occupancy-
    // predicted FPR = (bits/m)³ on exact integers (bits³ < 2^53)
    "q231_bloom_fpr" ->
      s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w,
         |  ${md5Bits32Sql("'eval:' || doc_id::VARCHAR", 1)} % 100 AS b FROM documents),
         |sh AS (SELECT DISTINCT doc_id, b, s FROM (
         |  SELECT doc_id, b,
         |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS s
         |  FROM toks, unnest(range(1, len(w)-3)) AS t(i) WHERE len(w) >= 5)),
         |ev AS (SELECT DISTINCT s FROM sh WHERE b < 5),
         |evp AS (SELECT DISTINCT p FROM (
         |  SELECT (${md5Bits32Sql("s", 1)} % 131072) AS p FROM ev
         |  UNION ALL SELECT (${md5Bits32Sql("s", 9)} % 131072) FROM ev
         |  UNION ALL SELECT (${md5Bits32Sql("s", 17)} % 131072) FROM ev)),
         |bits AS (SELECT count(*)::BIGINT AS nb FROM evp),
         |tg AS (SELECT DISTINCT s FROM sh WHERE b >= 5),
         |pos AS (SELECT
         |    ((${md5Bits32Sql("s", 1)} % 131072) IN (SELECT p FROM evp)
         |     AND (${md5Bits32Sql("s", 9)} % 131072) IN (SELECT p FROM evp)
         |     AND (${md5Bits32Sql("s", 17)} % 131072) IN (SELECT p FROM evp))
         |      AS bloom_pos,
         |    s IN (SELECT s FROM ev) AS member
         |  FROM tg),
         |g AS (SELECT count(*)::BIGINT AS n_probes,
         |  sum(CASE WHEN member THEN 1 ELSE 0 END)::BIGINT AS n_members,
         |  sum(CASE WHEN bloom_pos AND NOT member THEN 1 ELSE 0 END)::BIGINT AS n_fp,
         |  sum(CASE WHEN member AND NOT bloom_pos THEN 1 ELSE 0 END)::BIGINT AS n_fn
         |  FROM pos)
         |SELECT 131072::BIGINT AS m_bits, 3::BIGINT AS k_probes,
         |  nb AS n_bits_set, n_probes, n_members, n_fp, n_fn,
         |  CASE WHEN n_probes > n_members
         |    THEN round(n_fp::DOUBLE / (n_probes - n_members)::DOUBLE
         |      * 1000000000.0)::BIGINT
         |    ELSE 0 END AS fpr_emp_q9,
         |  round((nb * nb * nb)::DOUBLE
         |    / (131072::BIGINT * 131072 * 131072)::DOUBLE
         |    * 1000000000.0)::BIGINT AS fpr_pred_q9
         |FROM g, bits""".stripMargin,
    // both stub orientations make the marginals identical, so Pearson r
    // needs three HUGEINT sums; the division is the only FP op
    "q230_assortativity" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
        |      FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |nb AS (SELECT p1 AS z, p2 AS x FROM e
        |       UNION ALL SELECT p2, p1 FROM e),
        |deg AS (SELECT x AS id, count(*)::BIGINT AS deg FROM nb GROUP BY 1),
        |st AS (SELECT da.deg AS du, db.deg AS dv
        |       FROM nb JOIN deg da ON nb.z = da.id
        |               JOIN deg db ON nb.x = db.id),
        |g AS (SELECT count(*)::HUGEINT AS n, sum(du::HUGEINT) AS sx,
        |        sum(du::HUGEINT * dv::HUGEINT) AS sxy,
        |        sum(du::HUGEINT * du::HUGEINT) AS sxx FROM st)
        |SELECT (n // 2)::BIGINT AS n_edges,
        |  round(sx::DOUBLE / n::DOUBLE * 1000000.0)::BIGINT AS mean_deg_q6,
        |  CASE WHEN n * sxx - sx * sx > 0
        |    THEN (n * sxy - sx * sx)::DOUBLE / (n * sxx - sx * sx)::DOUBLE
        |    ELSE 0.0 END AS assortativity
        |FROM g""".stripMargin,
    // star-label chain reuses its own `pairs` CTE for per-label edge
    // counts; clique test and density on exact integers
    "q226_cluster_cohesion" -> (dedupLabelCtes(5) +
      s""",
         |st AS (SELECT label, count(*)::BIGINT AS sz FROM l5
         |       GROUP BY 1 HAVING count(*) >= 2),
         |pe AS (SELECT l.label, count(*)::BIGINT AS n_edges
         |       FROM pairs p JOIN l5 l ON p.x = l.doc_id GROUP BY 1),
         |cl AS (SELECT st.label, sz,
         |         coalesce(n_edges, 0)::BIGINT AS n_edges,
         |         (sz * (sz - 1) // 2)::BIGINT AS poss
         |       FROM st LEFT JOIN pe USING (label)),
         |b AS (SELECT CASE WHEN sz = 2 THEN 1 WHEN sz <= 4 THEN 2
         |        WHEN sz <= 8 THEN 3 ELSE 4 END AS size_bucket,
         |        n_edges, poss FROM cl)
         |SELECT size_bucket, count(*)::BIGINT AS n_clusters,
         |  sum(CASE WHEN n_edges = poss THEN 1 ELSE 0 END)::BIGINT AS n_cliques,
         |  sum(CASE WHEN n_edges < poss THEN 1 ELSE 0 END)::BIGINT AS n_chains,
         |  sum(n_edges)::BIGINT AS sum_edges,
         |  sum(poss)::BIGINT AS sum_possible,
         |  round(sum(n_edges)::DOUBLE / sum(poss)::DOUBLE
         |    * 1000000.0)::BIGINT AS density_q6
         |FROM b GROUP BY 1""".stripMargin),
    // lang-pair grid from exact populations; observed vs possible pair
    // mass, identical double chain for share/expected/lift
    "q225_cross_lang_dups" ->
      s"""WITH pairs AS (
         |$jaccardPairsSql),
         |lg AS (SELECT doc_id, lang FROM documents),
         |nn AS (SELECT count(*)::BIGINT AS n FROM documents),
         |tp AS (SELECT count(*)::BIGINT AS t FROM pairs),
         |cnt AS (SELECT lang, count(*)::BIGINT AS c FROM lg GROUP BY 1),
         |grid AS (SELECT a.lang AS lang_a, b.lang AS lang_b,
         |    (CASE WHEN a.lang = b.lang THEN a.c * (a.c - 1) // 2
         |          ELSE a.c * b.c END)::BIGINT AS poss
         |  FROM cnt a JOIN cnt b ON a.lang <= b.lang),
         |lab AS (SELECT least(la.lang, lb.lang) AS lang_a,
         |               greatest(la.lang, lb.lang) AS lang_b
         |  FROM pairs JOIN lg la ON pairs.x = la.doc_id
         |             JOIN lg lb ON pairs.y = lb.doc_id),
         |obs AS (SELECT lang_a, lang_b, count(*)::BIGINT AS n_obs
         |        FROM lab GROUP BY 1, 2)
         |SELECT g.lang_a, g.lang_b,
         |  coalesce(n_obs, 0)::BIGINT AS n_pairs, g.poss,
         |  round(coalesce(n_obs, 0)::DOUBLE / t::DOUBLE
         |    * 1000000.0)::BIGINT AS share_q6,
         |  round(poss::DOUBLE / (n * (n - 1) // 2)::DOUBLE
         |    * 1000000.0)::BIGINT AS expected_q6,
         |  round((coalesce(n_obs, 0)::DOUBLE / t::DOUBLE)
         |    / (poss::DOUBLE / (n * (n - 1) // 2)::DOUBLE)
         |    * 1000.0)::BIGINT AS lift_q3
         |FROM grid g LEFT JOIN obs USING (lang_a, lang_b), nn, tp
         |WHERE g.poss >= 1""".stripMargin,
    // star-label chain + q18 counters; pooled exact-integer ratios, one
    // final double division per rate, explicit CASE buckets
    "q224_dup_quality" -> (dedupLabelCtes(5) +
      s""",
         |st AS (SELECT label, count(*)::BIGINT AS sz FROM l5 GROUP BY 1),
         |qc AS (SELECT doc_id, len(ws)::BIGINT AS n_tokens,
         |  len(list_filter(ws, x -> list_contains($stopList, x)))::BIGINT AS n_stop,
         |  len(list_filter(ws, x -> regexp_full_match(x, '[a-z]+')))::BIGINT AS n_alpha
         |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws
         |        FROM documents)),
         |j AS (SELECT CASE WHEN sz = 1 THEN 0 WHEN sz = 2 THEN 1
         |        WHEN sz <= 4 THEN 2 WHEN sz <= 8 THEN 3 ELSE 4 END AS size_bucket,
         |      l5.label, qc.n_tokens, qc.n_stop, qc.n_alpha
         |      FROM l5 JOIN st USING (label) JOIN qc USING (doc_id))
         |SELECT size_bucket,
         |  count(DISTINCT label)::BIGINT AS n_clusters,
         |  count(*)::BIGINT AS n_docs,
         |  sum(n_tokens)::BIGINT AS sum_tokens,
         |  round(sum(n_stop)::DOUBLE / sum(n_tokens)::DOUBLE
         |    * 1000000.0)::BIGINT AS stop_q6,
         |  round(sum(n_alpha)::DOUBLE / sum(n_tokens)::DOUBLE
         |    * 1000000.0)::BIGINT AS alpha_q6
         |FROM j GROUP BY 1""".stripMargin),
    // the exact pair table fanned out against the k list; md5 shard per
    // side, intra/cross counts, and the (k-1)/k random expectation
    "q223_shard_dedup_miss" ->
      s"""WITH pairs AS (
         |$jaccardPairsSql),
         |ks AS (SELECT unnest([2,4,8,16,32]::BIGINT[]) AS n_shards),
         |t AS (SELECT n_shards,
         |  (${md5Bits32Sql("'shard:' || x::VARCHAR", 1)} % n_shards =
         |   ${md5Bits32Sql("'shard:' || y::VARCHAR", 1)} % n_shards) AS intra
         |  FROM pairs, ks)
         |SELECT n_shards, count(*)::BIGINT AS n_pairs,
         |  sum(CASE WHEN intra THEN 1 ELSE 0 END)::BIGINT AS n_intra,
         |  sum(CASE WHEN NOT intra THEN 1 ELSE 0 END)::BIGINT AS n_cross,
         |  round(sum(CASE WHEN NOT intra THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE * 1000000.0)::BIGINT AS miss_rate_q6,
         |  round((n_shards - 1)::DOUBLE / n_shards::DOUBLE
         |    * 1000000.0)::BIGINT AS random_miss_q6
         |FROM t GROUP BY 1""".stripMargin,
    // q117's rule CTE keyed by source instead of doc_id, one GROUP BY —
    // all counters exact integers, the one double is the final rate
    "q222_rule_matrix" ->
      s"""WITH w AS (SELECT source,
         |  list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |    t -> strlen(t) > 0) AS w
         |  FROM documents),
         |c AS (SELECT source,
         |  len(w)::BIGINT AS n_words,
         |  coalesce(list_sum(list_transform(w, t -> strlen(t))), 0)::BIGINT AS n_wchars,
         |  len(list_filter(w, t -> regexp_matches(t, '[a-z]')))::BIGINT AS n_alpha,
         |  len(list_filter(w, t -> contains(t, '#') OR contains(t, '...')))::BIGINT AS n_sym,
         |  len(list_intersect(list_distinct(w), $stopList))::BIGINT AS n_req
         |  FROM w),
         |f AS (SELECT source,
         |  (n_words >= 50 AND n_words <= 100000) AS pass_words,
         |  (n_wchars >= n_words * 3 AND n_wchars <= n_words * 10) AS pass_mean,
         |  (n_alpha * 10 >= n_words * 8) AS pass_alpha,
         |  (n_sym * 10 < n_words) AS pass_sym,
         |  (n_req >= 2) AS pass_req
         |  FROM c)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(CASE WHEN NOT pass_words THEN 1 ELSE 0 END)::BIGINT AS fail_words,
         |  sum(CASE WHEN NOT pass_mean THEN 1 ELSE 0 END)::BIGINT AS fail_mean,
         |  sum(CASE WHEN NOT pass_alpha THEN 1 ELSE 0 END)::BIGINT AS fail_alpha,
         |  sum(CASE WHEN NOT pass_sym THEN 1 ELSE 0 END)::BIGINT AS fail_sym,
         |  sum(CASE WHEN NOT pass_req THEN 1 ELSE 0 END)::BIGINT AS fail_req,
         |  sum(CASE WHEN pass_words AND pass_mean AND pass_alpha AND pass_sym
         |      AND pass_req THEN 1 ELSE 0 END)::BIGINT AS n_pass,
         |  round(sum(CASE WHEN pass_words AND pass_mean AND pass_alpha
         |      AND pass_sym AND pass_req THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE * 1000000.0)::BIGINT AS pass_rate_q6
         |FROM f GROUP BY 1""".stripMargin,
    // threshold sweep over the exact pair table: τ/100.0 is a single
    // exact division — the identical IEEE double in both engines
    "q205_threshold_sweep" ->
      s"""WITH pairs AS (
         |$jaccardPairsSql),
         |taus AS (SELECT unnest([50,55,60,65,70,75,80,85,90]::BIGINT[]) AS tau_pct),
         |hits AS (SELECT tau_pct, x, y FROM pairs, taus
         |         WHERE jac >= tau_pct::DOUBLE / 100.0),
         |per AS (SELECT tau_pct, count(*)::BIGINT AS n_pairs,
         |        count(DISTINCT y)::BIGINT AS n_dominated FROM hits GROUP BY 1),
         |docs AS (SELECT tau_pct, count(DISTINCT dd)::BIGINT AS n_docs FROM (
         |  SELECT tau_pct, x AS dd FROM hits
         |  UNION ALL SELECT tau_pct, y AS dd FROM hits) GROUP BY 1)
         |SELECT taus.tau_pct AS tau_pct,
         |  coalesce(n_pairs, 0)::BIGINT AS n_pairs,
         |  coalesce(n_dominated, 0)::BIGINT AS n_dominated,
         |  coalesce(n_docs, 0)::BIGINT AS n_docs
         |FROM taus LEFT JOIN per USING (tau_pct)
         |  LEFT JOIN docs USING (tau_pct)""".stripMargin,
    // centroid cosine via the sum-vector identity: exact (label, dim)
    // integer sums, HUGEINT dots/norms, then the canonical
    // dot/(sqrt·sqrt) chain
    "q206_centroid_sim" ->
      """WITH ex AS (SELECT label,
        |    round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS v,
        |    unnest(range(len(embedding))) AS i FROM embeddings),
        |sli AS (SELECT label, i, sum(v)::BIGINT AS s FROM ex GROUP BY 1, 2),
        |n2 AS (SELECT label, sum(s::HUGEINT * s::HUGEINT) AS n2
        |       FROM sli GROUP BY 1),
        |dots AS (SELECT a.label AS label_a, b.label AS label_b,
        |    sum(a.s::HUGEINT * b.s::HUGEINT) AS dot
        |  FROM sli a JOIN sli b ON a.i = b.i AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT label_a, label_b,
        |  round((dot::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)))
        |    * 1000000.0)::BIGINT AS cos_q6
        |FROM dots JOIN n2 na ON label_a = na.label
        |  JOIN n2 nb ON label_b = nb.label""".stripMargin,
    // aspect-bucket batch packing: the q170 metadata derivation,
    // log2 via length(bin(x))-1, row_number batching, integer pad sums
    "q207_aspect_batching" ->
      """WITH a AS (SELECT doc_id, strlen(text)::BIGINT AS n_bytes,
        |    (n_chars % 64 + 1)::BIGINT AS w FROM documents),
        |b AS (SELECT doc_id, w,
        |    greatest((n_bytes + w - 1) // w, 1) AS h FROM a),
        |c AS (SELECT doc_id, w, h,
        |    (length(bin(greatest((w * 16) // h, 1))) - 1)::BIGINT AS bucket
        |  FROM b),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY bucket ORDER BY doc_id) AS rn FROM c),
        |pb AS (SELECT bucket, (rn - 1) // 32 AS batch_id,
        |    max(w) AS mw, max(h) AS mh, count(*)::BIGINT AS cnt,
        |    sum(w * h)::BIGINT AS px
        |  FROM r GROUP BY 1, 2),
        |pk AS (SELECT bucket, sum(cnt)::BIGINT AS n_assets,
        |    count(*)::BIGINT AS n_batches,
        |    sum(mw * mh * cnt)::BIGINT AS batch_px,
        |    sum(px)::BIGINT AS asset_px FROM pb GROUP BY 1)
        |SELECT bucket, n_assets, n_batches,
        |  (batch_px - asset_px)::BIGINT AS pad_px,
        |  round((batch_px - asset_px)::DOUBLE / batch_px::DOUBLE
        |    * 1000000.0)::BIGINT AS pad_ratio_q6
        |FROM pk""".stripMargin,
    // Heaps fit over shingle types: first-prefix trick for cumulative
    // distincts, then the q95 quantized-OLS chain over 16 points
    "q208_heaps_fit" ->
      """WITH toksw AS (SELECT doc_id,
         |    regexp_split_to_array(lower(text), '\s+') AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, s FROM (
         |    SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |    FROM toksw, unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3)),
         |nd AS (SELECT count(*)::BIGINT AS n FROM documents),
         |rk AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY doc_id)::BIGINT AS r FROM documents),
         |pd AS (SELECT doc_id, (r - 1) * 16 // n + 1 AS p FROM rk, nd),
         |shp AS (SELECT s, p FROM sh JOIN pd USING (doc_id)),
         |ptc AS (SELECT p, count(*)::BIGINT AS tc FROM shp GROUP BY 1),
         |fw AS (SELECT s, min(p) AS p FROM shp GROUP BY 1),
         |pv AS (SELECT p, count(*)::BIGINT AS nv FROM fw GROUP BY 1),
         |allp AS (SELECT unnest(range(1, 17))::BIGINT AS p),
         |cur AS (SELECT allp.p AS p,
         |    sum(coalesce(tc, 0)) OVER (ORDER BY allp.p)::BIGINT AS cum_tokens,
         |    sum(coalesce(nv, 0)) OVER (ORDER BY allp.p)::BIGINT AS vocab
         |  FROM allp LEFT JOIN ptc ON allp.p = ptc.p
         |    LEFT JOIN pv ON allp.p = pv.p),
         |q AS (SELECT
         |    round(log2(cum_tokens::DOUBLE) * 1000000.0)::BIGINT AS xq,
         |    round(log2(vocab::DOUBLE) * 1000000.0)::BIGINT AS yq
         |  FROM cur WHERE cum_tokens > 0 AND vocab > 0),
         |s AS (SELECT count(*)::BIGINT AS n, sum(xq)::BIGINT AS sx,
         |    sum(yq)::BIGINT AS sy, sum(xq * yq)::BIGINT AS sxy,
         |    sum(xq * xq)::BIGINT AS sxx FROM q),
         |tot AS (SELECT max(cum_tokens)::BIGINT AS n_tokens,
         |    max(vocab)::BIGINT AS n_vocab FROM cur)
         |SELECT n AS n_points, n_tokens, n_vocab,
         |  (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
         |    / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) AS beta,
         |  (sy::DOUBLE - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
         |      / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))
         |    * sx::DOUBLE) / (n::DOUBLE * 1000000.0) AS log2k
         |FROM s, tot""".stripMargin,
    // canonical-policy audit: the CC label chain + keep/best picks as
    // window row_number=1 (the oracle may window; the engine argmaxes)
    "q209_canonical_policy" -> (dedupLabelCtes(5) +
      s""",
         |srq AS (SELECT doc_id,
         |    len(list_filter(w, x -> list_contains($stopList, x)))::DOUBLE
         |      / len(w) AS sr FROM toks),
         |j AS (SELECT l5.doc_id, label, sr FROM l5 JOIN srq USING (doc_id)),
         |g AS (SELECT label, count(*)::BIGINT AS size FROM j GROUP BY 1),
         |k AS (SELECT label, doc_id AS keep_doc, sr AS keep_sr FROM (
         |    SELECT *, row_number() OVER (PARTITION BY label
         |      ORDER BY doc_id) AS rn FROM j) WHERE rn = 1),
         |b AS (SELECT label, doc_id AS best_doc, sr AS best_sr FROM (
         |    SELECT *, row_number() OVER (PARTITION BY label
         |      ORDER BY sr DESC, doc_id) AS rn FROM j) WHERE rn = 1)
         |SELECT g.label, size, keep_doc, best_doc,
         |  (CASE WHEN best_sr > keep_sr THEN 1 ELSE 0 END)::BIGINT AS upgraded,
         |  round((best_sr - keep_sr) * 1000000.0)::BIGINT AS gain_q6
         |FROM g JOIN k USING (label) JOIN b USING (label)
         |WHERE size >= 2""".stripMargin),
    // 1-NN label purity: the q14 exact-cosine chain, argmax per query
    // (ties -> smallest id), label join both sides, per-label rate
    "q210_knn_purity" ->
      """WITH ex AS (SELECT vec_id, label,
        |    round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS v,
        |    unnest(range(len(embedding))) AS i FROM embeddings),
        |n2 AS (SELECT vec_id, label, sum(v::HUGEINT * v::HUGEINT) AS n2
        |       FROM ex GROUP BY 1, 2),
        |dots AS (SELECT a.vec_id AS x, b.vec_id AS y,
        |    sum(a.v::HUGEINT * b.v::HUGEINT) AS dot
        |  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2),
        |sc AS (SELECT x, y,
        |    dot::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)) AS cos
        |  FROM dots JOIN n2 na ON x = na.vec_id JOIN n2 nb ON y = nb.vec_id),
        |nn AS (SELECT x, y AS nn_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY x
        |      ORDER BY cos DESC, y) AS rn FROM sc) WHERE rn = 1)
        |SELECT la.label, count(*)::BIGINT AS n_vecs,
        |  sum(CASE WHEN lb.label = la.label THEN 1 ELSE 0 END)::BIGINT AS nn_same,
        |  round(sum(CASE WHEN lb.label = la.label THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*)::DOUBLE * 1000000.0)::BIGINT AS purity_q6
        |FROM nn JOIN n2 la ON nn.x = la.vec_id JOIN n2 lb ON nn.nn_id = lb.vec_id
        |GROUP BY 1""".stripMargin,
    // cross-source dup matrix over the exact pair table
    "q211_cross_source_dups" ->
      s"""WITH pairs AS (
         |$jaccardPairsSql),
         |lab AS (SELECT least(sx.source, sy.source) AS source_a,
         |    greatest(sx.source, sy.source) AS source_b
         |  FROM pairs JOIN documents sx ON pairs.x = sx.doc_id
         |    JOIN documents sy ON pairs.y = sy.doc_id),
         |tot AS (SELECT count(*)::BIGINT AS t FROM lab)
         |SELECT source_a, source_b, count(*)::BIGINT AS n_pairs,
         |  round(count(*)::DOUBLE / t::DOUBLE * 1000000.0)::BIGINT AS share_q6
         |FROM lab, tot GROUP BY 1, 2, t""".stripMargin,
    // per-source Zipf: the q95 quantized-OLS chain grouped by source
    "q212_source_zipf" ->
      """WITH u AS (SELECT source, w, count(*) AS c FROM (
        |        SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |        FROM documents) GROUP BY 1, 2),
        |r AS (SELECT source, c, row_number() OVER (PARTITION BY source
        |        ORDER BY c DESC, w) AS rank FROM u),
        |q AS (SELECT source,
        |        round(log2(rank::DOUBLE) * 1000000.0)::BIGINT AS xq,
        |        round(log2(c::DOUBLE) * 1000000.0)::BIGINT AS yq FROM r),
        |s AS (SELECT source, count(*)::BIGINT AS n,
        |        sum(xq::HUGEINT) AS sx, sum(yq::HUGEINT) AS sy,
        |        sum((xq * yq)::HUGEINT) AS sxy,
        |        sum((xq * xq)::HUGEINT) AS sxx FROM q GROUP BY 1)
        |SELECT source, n AS n_vocab,
        |  (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |    / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) AS slope,
        |  (sy::DOUBLE - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |      / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))
        |    * sx::DOUBLE) / (n::DOUBLE * 1000000.0) AS intercept
        |FROM s""".stripMargin,
    // shard source-mix entropy: per-cell -p*log2(p) quantized to 1e12
    // longs (the q96 discipline), exact integer sums per shard
    "q213_shard_diversity" ->
      s"""WITH pl AS (SELECT
         |    ${md5Bits32Sql("'shard:' || doc_id::VARCHAR", 1)} % 8 AS shard,
         |    source FROM documents),
         |cells AS (SELECT shard, source, count(*)::BIGINT AS c
         |          FROM pl GROUP BY 1, 2),
         |tot AS (SELECT shard, sum(c)::BIGINT AS n_docs,
         |    count(*)::BIGINT AS n_sources FROM cells GROUP BY 1)
         |SELECT shard, n_docs, n_sources,
         |  sum(round(-((c::DOUBLE / n_docs::DOUBLE)
         |      * log2(c::DOUBLE / n_docs::DOUBLE))
         |    * 1000000000000.0)::BIGINT)::BIGINT AS entropy_q12
         |FROM cells JOIN tot USING (shard) GROUP BY 1, 2, 3""".stripMargin,
    // hourly trending: the bounded-heap top-k mirrored as row_number
    "q214_trending" ->
      """SELECT hour, event_type, cnt, rnk FROM (
        |  SELECT hour, event_type, cnt, row_number() OVER (
        |      PARTITION BY hour ORDER BY cnt DESC, event_type) AS rnk
        |  FROM (SELECT date_trunc('hour', ts) AS hour, event_type,
        |        count(*)::BIGINT AS cnt FROM events GROUP BY 1, 2))
        |WHERE rnk <= 3""".stripMargin,
    // detector agreement: scalar counts over the two pair derivations
    "q215_dup_agreement" ->
      s"""WITH lex AS (
         |$jaccardPairsSql),
         |ex AS (SELECT vec_id, round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS v,
         |       unnest(range(len(embedding))) AS i FROM embeddings),
         |n2 AS (SELECT vec_id, sum(v*v)::DOUBLE AS n2 FROM ex GROUP BY 1),
         |dots AS (SELECT a.vec_id AS x, b.vec_id AS y, sum(a.v*b.v)::DOUBLE AS dot
         |         FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
         |         GROUP BY 1, 2),
         |embp AS (SELECT x, y
         |  FROM dots JOIN n2 na ON x = na.vec_id JOIN n2 nb ON y = nb.vec_id
         |  WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.4),
         |c AS (SELECT
         |    (SELECT count(*)::BIGINT FROM lex) AS n_lex,
         |    (SELECT count(*)::BIGINT FROM embp) AS n_emb,
         |    (SELECT count(*)::BIGINT
         |     FROM lex JOIN embp USING (x, y)) AS n_both)
         |SELECT n_lex, n_emb, n_both,
         |  (n_lex + n_emb - n_both)::BIGINT AS n_union,
         |  round(n_both::DOUBLE / (n_lex + n_emb - n_both)::DOUBLE
         |    * 1000000.0)::BIGINT AS agreement_q6
         |FROM c""".stripMargin,
    // per-source Gini from the exact rank-weighted form; HUGEINT sums
    "q216_length_gini" ->
      """WITH r AS (SELECT source, n_chars, row_number() OVER (
        |    PARTITION BY source ORDER BY n_chars, doc_id) AS i
        |  FROM documents),
        |s AS (SELECT source, count(*)::BIGINT AS n,
        |    sum(n_chars::HUGEINT) AS s0, sum(i::HUGEINT * n_chars) AS s1
        |  FROM r GROUP BY 1)
        |SELECT source, n, s0::BIGINT AS total_chars,
        |  round((2 * s1 - (n + 1) * s0)::DOUBLE
        |    / (n::HUGEINT * s0)::DOUBLE * 1000000.0)::BIGINT AS gini_q6
        |FROM s""".stripMargin,
    // Hill tail index over the top-k order statistics (quantized lns)
    "q217_hill_tail" ->
      """WITH c AS (SELECT user_id, count(*)::BIGINT AS x
        |           FROM events GROUP BY 1),
        |ke AS (SELECT least(100, count(*) - 1)::BIGINT AS k FROM c),
        |t AS (SELECT x, row_number() OVER (ORDER BY x DESC, user_id) AS rnk
        |      FROM c),
        |s AS (SELECT sum(round(ln(x::DOUBLE) * 1000000.0)::BIGINT)::BIGINT
        |        AS sum_lnq FROM t, ke WHERE rnk <= ke.k),
        |tl AS (SELECT x AS x_k1,
        |    round(ln(x::DOUBLE) * 1000000.0)::BIGINT AS lnq_k1
        |  FROM t, ke WHERE rnk = ke.k + 1)
        |SELECT ke.k, x_k1,
        |  (sum_lnq - ke.k * lnq_k1)::BIGINT AS denom_q6,
        |  ke.k::DOUBLE * 1000000.0
        |    / (sum_lnq - ke.k * lnq_k1)::DOUBLE AS alpha
        |FROM s, tl, ke""".stripMargin,
    // pairwise Pearson over the quantized quality panel: one wide
    // aggregate, six assembled rows
    "q218_signal_corr" -> signalCorrSql,
    // the q207 geometry fanned out over B in {8,16,32,64}
    "q219_batch_sweep" ->
      """WITH a AS (SELECT doc_id, strlen(text)::BIGINT AS n_bytes,
        |    (n_chars % 64 + 1)::BIGINT AS w FROM documents),
        |b2 AS (SELECT doc_id, w,
        |    greatest((n_bytes + w - 1) // w, 1) AS h FROM a),
        |c AS (SELECT doc_id, w, h,
        |    (length(bin(greatest((w * 16) // h, 1))) - 1)::BIGINT AS bucket
        |  FROM b2),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY bucket ORDER BY doc_id) AS rn FROM c),
        |bs AS (SELECT unnest([8,16,32,64]::BIGINT[]) AS b),
        |pb AS (SELECT b, bucket, (rn - 1) // b AS batch_id,
        |    max(w) AS mw, max(h) AS mh, count(*)::BIGINT AS cnt,
        |    sum(w * h)::BIGINT AS px
        |  FROM r, bs GROUP BY 1, 2, 3),
        |pk AS (SELECT b, sum(cnt)::BIGINT AS n_assets,
        |    count(*)::BIGINT AS n_batches,
        |    sum(mw * mh * cnt)::BIGINT AS batch_px,
        |    sum(px)::BIGINT AS asset_px FROM pb GROUP BY 1)
        |SELECT b, n_assets, n_batches,
        |  (batch_px - asset_px)::BIGINT AS pad_px,
        |  round((batch_px - asset_px)::DOUBLE / batch_px::DOUBLE
        |    * 1000000.0)::BIGINT AS pad_ratio_q6
        |FROM pk""".stripMargin,
    // hash-driven walks unrolled: per step, one join onto the ranked
    // adjacency at the md5-chosen neighbor index
    "q145_random_walks" -> randomWalksSql(4),
    // the capstone manifest: split ⋈ quality decile ⋈ dedup cluster ⋈
    // embedding label, each sub-derivation shared with its own oracle
    "q146_manifest" -> manifestSql,
    // the incremental manifest: the last build's manifest as STATE, the
    // 10% "arrived since" md5 bucket taking the arrival-time fallbacks
    // (own-hash split, NULL decile/emb_label, singleton cluster)
    "q149_incr_manifest" ->
      s"""WITH m AS ($manifestSql),
         |ib AS (SELECT doc_id,
         |  ${md5Bits32Sql("'incr:' || doc_id::VARCHAR", 1)} % 100 AS bk
         |  FROM documents),
         |sb AS (SELECT doc_id,
         |  ${md5Bits32Sql("'split:' || doc_id::VARCHAR", 1)} % 100 AS sbk
         |  FROM documents)
         |SELECT m.doc_id, m.lang, m.source, m.n_chars,
         |  CASE WHEN ib.bk < 90 THEN m.split
         |       WHEN sb.sbk < 80 THEN 'train'
         |       WHEN sb.sbk < 90 THEN 'validation'
         |       ELSE 'test' END AS split,
         |  CASE WHEN ib.bk < 90 THEN m.decile END AS decile,
         |  CASE WHEN ib.bk < 90 THEN m.cluster_id ELSE m.doc_id END AS cluster_id,
         |  CASE WHEN ib.bk < 90 THEN m.emb_label END AS emb_label,
         |  ib.bk >= 90 AS is_new
         |FROM m JOIN ib USING (doc_id) JOIN sb USING (doc_id)""".stripMargin,
    // per-shard doc/token balance; shares as 1e6-quantized divisions of
    // exact integers over the nShards-row window
    "q147_shard_balance" ->
      s"""WITH s AS (SELECT
         |  ${md5Bits32Sql("'shard:' || doc_id::VARCHAR", 1)} % 8 AS shard,
         |  len(regexp_split_to_array(lower(text), '\\s+'))::BIGINT AS ntok
         |  FROM documents),
         |p AS (SELECT shard, count(*)::BIGINT AS n_docs,
         |        sum(ntok)::BIGINT AS n_tokens FROM s GROUP BY 1)
         |SELECT shard, n_docs, n_tokens,
         |  round(n_docs::DOUBLE / (sum(n_docs) OVER ())::DOUBLE
         |    * 1000000.0)::BIGINT AS doc_share_q,
         |  round(n_tokens::DOUBLE / (sum(n_tokens) OVER ())::DOUBLE
         |    * 1000000.0)::BIGINT AS token_share_q
         |FROM p""".stripMargin,
    // Pareto contribution: exact-decimal revenue, cast-then-divide shares
    "q148_rev_contrib" ->
      """WITH rev AS (SELECT n_name,
        |  sum(o_totalprice::DECIMAL(18,2)) AS rev_d
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1)
        |SELECT n_name, rev_d::DOUBLE AS revenue,
        |  round(rev_d::DOUBLE / (sum(rev_d) OVER ())::DOUBLE
        |    * 1000000.0)::BIGINT AS share_q,
        |  round((sum(rev_d) OVER (ORDER BY rev_d DESC, n_name
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
        |    / (sum(rev_d) OVER ())::DOUBLE * 1000000.0)::BIGINT AS cum_share_q
        |FROM rev""".stripMargin,
    // md5-register HyperLogLog: rank via bin-string length (no log2),
    // Σ2^(−M) is an exact ≤33-bit double sum, α written token-identically
    "q127_hll_sketch" ->
      s"""WITH h AS (SELECT event_type,
         |  ${md5Bits32Sql("'hll:' || user_id::VARCHAR", 1)} AS h
         |  FROM events),
         |r AS (SELECT event_type, h & 255 AS b,
         |  CASE WHEN (h >> 8) = 0 THEN 25
         |       ELSE 25 - length(bin(h >> 8)) END AS rank FROM h),
         |m AS (SELECT event_type, b, max(rank) AS m_j FROM r GROUP BY 1, 2),
         |s AS (SELECT event_type, count(*) AS nz,
         |        sum(power(2.0, -m_j)) AS snz FROM m GROUP BY 1),
         |x AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact
         |      FROM events GROUP BY 1),
         |est AS (SELECT event_type, (256 - nz)::BIGINT AS v_zero,
         |  floor(0.7213 / (1.0 + 1.079 / 256.0)
         |    * 65536.0 / ((256 - nz)::DOUBLE + snz))::BIGINT AS hll_raw
         |  FROM s)
         |SELECT x.event_type, x.n_exact, est.v_zero, est.hll_raw,
         |  CASE WHEN est.v_zero > 0 AND est.hll_raw <= 640
         |       THEN ${sqlLongList(graft.operators.Relational.HllLcTable)}[est.v_zero + 1]::BIGINT
         |       ELSE est.hll_raw END AS hll_est
         |FROM x JOIN est USING (event_type)""".stripMargin,
    // first-order Markov transitions: lag over the (ts, event_id) total
    // order per user; probability = one double division of exact counts
    "q128_markov" ->
      """WITH tr AS (SELECT event_type,
        |  lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT prev AS from_type, event_type AS to_type,
        |        count(*)::BIGINT AS cnt
        |      FROM tr WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, cnt,
        |  cnt::DOUBLE / (sum(cnt) OVER (PARTITION BY from_type))::DOUBLE AS prob
        |FROM c""".stripMargin,
    // equi-width histogram quantiles: bin edges from exact min/max, exact
    // counts, rank = (pct·n+99)//100, in-bin linear interpolation written
    // operation-for-operation like the Spark expression
    "q129_hist_quantiles" ->
      """WITH s AS (SELECT event_type, min(value) AS mn, max(value) AS mx,
        |             count(*)::BIGINT AS n FROM events GROUP BY 1),
        |b AS (SELECT e.event_type,
        |        CASE WHEN s.mx = s.mn THEN 0
        |             ELSE least(floor((e.value - s.mn) / (s.mx - s.mn) * 64),
        |                        63::DOUBLE)::BIGINT END AS b
        |      FROM events e JOIN s USING (event_type)),
        |c AS (SELECT event_type, b, count(*)::BIGINT AS cnt
        |      FROM b GROUP BY 1, 2),
        |cum AS (SELECT event_type, b, cnt,
        |          sum(cnt) OVER (PARTITION BY event_type ORDER BY b) AS cum
        |        FROM c),
        |r AS (SELECT event_type, mn, mx, n, pct, (pct * n + 99) // 100 AS r
        |      FROM s, unnest([50, 90, 99]) AS t(pct)),
        |hit AS (SELECT event_type, pct, mn, mx, n, r, b, cnt, cum,
        |          row_number() OVER (PARTITION BY event_type, pct
        |            ORDER BY b) AS rn
        |        FROM r JOIN cum USING (event_type) WHERE cum >= r)
        |SELECT event_type, pct::BIGINT AS pct, n, b, cnt,
        |  CASE WHEN mx = mn THEN mn
        |       ELSE mn + (b::DOUBLE
        |         + (r - (cum - cnt))::DOUBLE / cnt::DOUBLE)
        |         * ((mx - mn) / 64) END AS est
        |FROM hit WHERE rn = 1""".stripMargin,
    // schema-on-read over the JSON props column; exact integer stats.
    // k is extracted with SPARK's from_json coercion contract exactly
    // (round-9 advice): only a true JSON integer parses — string-encoded
    // numbers, fractional values, and malformed payloads are NULL in
    // both engines (json_type gates on BIGINT/UBIGINT; json_valid guards
    // malformed rows the way PERMISSIVE mode does) — so schema drift in
    // the payload can never diverge the two sides
    "q130_json_props" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |  count(DISTINCT k)::BIGINT AS n_k, sum(k)::BIGINT AS sum_k,
        |  min(k)::BIGINT AS min_k, max(k)::BIGINT AS max_k
        |FROM (SELECT event_type,
        |        TRY_CAST(CASE WHEN json_valid(props)
        |            AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
        |          THEN json_extract(props, '$.k')::VARCHAR END AS BIGINT) AS k
        |        FROM events)
        |GROUP BY 1""".stripMargin,
    // 3-step paths: both leads on one per-user window; (cnt DESC, path)
    // total order makes the top-k cut deterministic
    "q131_event_paths" ->
      """WITH t AS (SELECT event_type,
        |  lead(event_type, 1) OVER w AS e2,
        |  lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type AS s1, e2 AS s2, e3 AS s3, count(*)::BIGINT AS cnt
        |FROM t WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY cnt DESC, s1, s2, s3 LIMIT 20""".stripMargin,
    // leakage-safe split: the label CTE chain, split decided by the
    // CLUSTER label's hash bucket. The engine runs the CONVERGED
    // propagation; the oracle unrolls 5 supersteps — equal whenever
    // component diameters are <= 5, the same fixture-conditional
    // contract q86 documents (DedupSimilaritySpec's 21-deep chain covers
    // the divergence case engine-side)
    "q132_cluster_split" -> (dedupLabelCtes(5) +
      s"""
         |SELECT doc_id, label AS cluster_id,
         |  ${md5Bits32Sql("'csplit:' || label::VARCHAR", 1)} % 100 AS bucket,
         |  CASE WHEN ${md5Bits32Sql("'csplit:' || label::VARCHAR", 1)} % 100 < 80 THEN 'train'
         |       WHEN ${md5Bits32Sql("'csplit:' || label::VARCHAR", 1)} % 100 < 90 THEN 'validation'
         |       ELSE 'test' END AS split
         |FROM l5""".stripMargin),
    // TPC-H Q5 shape: revenue via the q01 DECIMAL product-sum discipline
    "q133_local_volume" ->
      """SELECT n_name,
        |  sum(l_extendedprice::DECIMAL(18,2)
        |      * (1.0 - l_discount)::DECIMAL(18,2))::DOUBLE AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    // association rules off the q111 pair derivation: confidence and
    // lift as single double divisions of exact integers, 1e6-quantized
    "q134_assoc_rules" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT p1, p2, cnt FROM (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS cnt
        |  FROM pp a JOIN pp b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2) WHERE cnt >= 2),
        |sup AS (SELECT l_partkey AS pk, count(*)::BIGINT AS sup FROM pp GROUP BY 1),
        |n AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n FROM pp),
        |rules AS (SELECT p1 AS antecedent, p2 AS consequent, cnt FROM e
        |          UNION ALL SELECT p2, p1, cnt FROM e)
        |SELECT antecedent, consequent, cnt::BIGINT AS cnt,
        |  round(cnt::DOUBLE / sa.sup::DOUBLE * 1000000.0)::BIGINT AS conf_q,
        |  round((cnt * n.n)::DOUBLE / (sa.sup * sb.sup)::DOUBLE
        |    * 1000000.0)::BIGINT AS lift_q
        |FROM rules JOIN sup sa ON antecedent = sa.pk
        |JOIN sup sb ON consequent = sb.pk, n""".stripMargin,
    // dwell times: exact unix-micros gaps; median by the q121 middle-rank
    // arithmetic; mean as one division of exact integers
    "q135_dwell_times" ->
      """WITH g AS (SELECT event_type, user_id, event_id,
        |  epoch_us(ts) - epoch_us(lag(ts) OVER (
        |    PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap
        |  FROM events),
        |gaps AS (SELECT * FROM g WHERE gap IS NOT NULL),
        |med AS (SELECT event_type,
        |  sum(gap)::DOUBLE / count(*) AS median_gap_us FROM (
        |    SELECT event_type, gap,
        |      row_number() OVER (PARTITION BY event_type
        |        ORDER BY gap, user_id, event_id) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM gaps)
        |  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1),
        |st AS (SELECT event_type, count(*)::BIGINT AS n_gaps,
        |         sum(gap)::DOUBLE / count(*) AS mean_gap_us,
        |         max(gap)::BIGINT AS max_gap_us
        |       FROM gaps GROUP BY 1)
        |SELECT st.event_type, st.n_gaps, st.mean_gap_us, st.max_gap_us,
        |       med.median_gap_us
        |FROM st JOIN med USING (event_type)""".stripMargin,
    // within-language percent-rank of the q18 stop-word ratio; rank()
    // tie semantics, (rank-1)/(n-1), decile bucket
    "q136_quality_rank" -> qualityRankSql,
    // cents-quantized exact two-moment variance: integer numerator, one
    // identical double division chain, sqrt of the identical double.
    // Squares/products go through HUGEINT (round-9 advice) — the exact
    // mirror of Spark's DECIMAL(38,0) sums, so |vc| beyond ~3e9 cannot
    // overflow the BIGINT square that raw vc*vc would; n = 1 groups are
    // NULL on both sides (sample variance undefined), never 0/0
    "q137_exact_variance" ->
      """WITH v AS (SELECT event_type,
        |  round(value * 100)::BIGINT AS vc FROM events),
        |m AS (SELECT event_type, count(*)::BIGINT AS n,
        |        sum(vc::HUGEINT) AS sx, sum(vc::HUGEINT * vc::HUGEINT) AS sxx
        |      FROM v GROUP BY 1)
        |SELECT event_type, n,
        |  sx::DOUBLE / n::DOUBLE / 100.0 AS mean,
        |  CASE WHEN n >= 2 THEN
        |    (n::HUGEINT * sxx - sx * sx)::DOUBLE / (n * (n - 1))::DOUBLE / 10000.0
        |  END AS var_samp,
        |  CASE WHEN n >= 2 THEN
        |    sqrt((n::HUGEINT * sxx - sx * sx)::DOUBLE / (n * (n - 1))::DOUBLE / 10000.0)
        |  END AS std_samp
        |FROM m""".stripMargin,
    // q136's calibration driving the keep/drop decision + budget report
    "q138_quality_filter" ->
      s"""WITH qr AS ($qualityRankSql),
         |d AS (SELECT doc_id, lang, source,
         |  len(regexp_split_to_array(lower(text), '\\s+'))::BIGINT AS ntok
         |  FROM documents)
         |SELECT d.lang, d.source,
         |  sum((qr.decile >= 2)::BIGINT)::BIGINT AS n_kept,
         |  sum((qr.decile < 2)::BIGINT)::BIGINT AS n_dropped,
         |  sum(CASE WHEN qr.decile >= 2 THEN d.ntok ELSE 0 END)::BIGINT
         |    AS kept_tokens
         |FROM d JOIN qr USING (doc_id)
         |GROUP BY 1, 2""".stripMargin,
    // dow/hour via pure integer unix-seconds arithmetic (engine calendar
    // functions number weekdays differently); value sums exact DECIMAL
    "q139_activity_grid" ->
      """SELECT event_type,
        |  (((epoch_us(ts) // 1000000) // 86400) + 4) % 7 AS dow,
        |  ((epoch_us(ts) // 1000000) // 3600) % 24 AS hour,
        |  count(*)::BIGINT AS cnt,
        |  sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    // Shannon entropy over per-doc token types; per-type terms quantized
    // to 1e6 after the identical double expression, summed exactly
    "q140_token_entropy" ->
      """WITH tc AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |  FROM documents) GROUP BY 1, 2),
        |n AS (SELECT doc_id, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_types
        |      FROM tc GROUP BY 1)
        |SELECT tc.doc_id, max(n.n) AS n_tokens, max(n.n_types) AS n_types,
        |  sum(round((c::DOUBLE / n.n::DOUBLE)
        |    * log2(n.n::DOUBLE / c::DOUBLE) * 1000000.0)::BIGINT)::BIGINT
        |    AS entropy_q
        |FROM tc JOIN n USING (doc_id) GROUP BY 1""".stripMargin,
    // exact quantized norms → integer min/max/degeneracy counts
    "q141_embedding_audit" ->
      """WITH ex AS (SELECT vec_id,
        |  round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS v
        |  FROM embeddings),
        |n2 AS (SELECT vec_id, sum(v*v)::BIGINT AS n2 FROM ex GROUP BY 1),
        |dims AS (SELECT vec_id, len(embedding)::BIGINT AS dim, label
        |         FROM embeddings)
        |SELECT label, count(*)::BIGINT AS n_vecs,
        |  min(dim)::BIGINT AS min_dim, max(dim)::BIGINT AS max_dim,
        |  min(n2)::BIGINT AS min_n2, max(n2)::BIGINT AS max_n2,
        |  sum((n2 = 0)::BIGINT)::BIGINT AS n_zero,
        |  sum((n2 < 10000000000)::BIGINT)::BIGINT AS n_near_zero
        |FROM dims JOIN n2 USING (vec_id) GROUP BY 1""".stripMargin,
    // per-column completeness/cardinality audit
    "q142_column_profile" ->
      """SELECT 'event_id' AS column_name, count(*)::BIGINT AS n_rows,
        |  (count(*) - count(event_id))::BIGINT AS n_null,
        |  count(DISTINCT event_id)::BIGINT AS n_distinct FROM events
        |UNION ALL SELECT 'ts', count(*)::BIGINT,
        |  (count(*) - count(ts))::BIGINT, count(DISTINCT ts)::BIGINT FROM events
        |UNION ALL SELECT 'user_id', count(*)::BIGINT,
        |  (count(*) - count(user_id))::BIGINT, count(DISTINCT user_id)::BIGINT FROM events
        |UNION ALL SELECT 'event_type', count(*)::BIGINT,
        |  (count(*) - count(event_type))::BIGINT, count(DISTINCT event_type)::BIGINT FROM events
        |UNION ALL SELECT 'value', count(*)::BIGINT,
        |  (count(*) - count(value))::BIGINT, count(DISTINCT value)::BIGINT FROM events
        |UNION ALL SELECT 'props', count(*)::BIGINT,
        |  (count(*) - count(props))::BIGINT, count(DISTINCT props)::BIGINT FROM events""".stripMargin,
    // SCD-1 compaction: one survivor per key under a total order
    "q143_latest_per_key" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1""".stripMargin,
    // one GNN aggregation layer: degree propagation over the q111 edges
    "q144_nbr_degrees" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT p1, p2 FROM (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS cnt
        |  FROM pp a JOIN pp b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2) WHERE cnt >= 2),
        |nb AS (SELECT p1 AS v, p2 AS u FROM e UNION ALL SELECT p2, p1 FROM e),
        |deg AS (SELECT v, count(*)::BIGINT AS deg FROM nb GROUP BY 1)
        |SELECT nb.v AS partkey, count(*)::BIGINT AS deg,
        |  min(du.deg)::BIGINT AS min_nbr_deg,
        |  sum(du.deg)::DOUBLE / count(*) AS mean_nbr_deg,
        |  max(du.deg)::BIGINT AS max_nbr_deg
        |FROM nb JOIN deg du ON nb.u = du.v
        |GROUP BY 1""".stripMargin,
    // range/interval join: the BETWEEN predicate written directly — the
    // oracle-side luxury the Spark side earns back with the hour-cell
    // bucketization (same rows, hash-join plan)
    "q150_session_overlap" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events),
        |g AS (SELECT *, CASE WHEN tsu - lag(tsu) OVER
        |        (PARTITION BY user_id ORDER BY tsu, event_id) > 1800000000
        |        THEN 1 ELSE 0 END AS gap FROM e),
        |s AS (SELECT *, sum(gap) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |        ROWS UNBOUNDED PRECEDING) AS session_seq FROM g),
        |sess AS (SELECT user_id, session_seq::BIGINT AS session_seq,
        |         min(tsu) AS session_start_us, max(tsu) AS session_end_us
        |         FROM s GROUP BY 1, 2),
        |p AS (SELECT user_id AS p_user, epoch_us(ts) AS p_tsu, value
        |      FROM events WHERE event_type = 'purchase'),
        |hits AS (SELECT sess.user_id, sess.session_seq,
        |         count(*)::BIGINT AS n_concurrent,
        |         sum(p.value::DECIMAL(18,2))::DOUBLE AS concurrent_value
        |         FROM sess JOIN p
        |           ON p.p_tsu BETWEEN sess.session_start_us AND sess.session_end_us
        |           AND p.p_user <> sess.user_id
        |         GROUP BY 1, 2)
        |SELECT sess.user_id, sess.session_seq, sess.session_start_us,
        |  sess.session_end_us,
        |  coalesce(hits.n_concurrent, 0)::BIGINT AS n_concurrent,
        |  coalesce(hits.concurrent_value, 0.0)::DOUBLE AS concurrent_value
        |FROM sess LEFT JOIN hits USING (user_id, session_seq)""".stripMargin,
    // SCD-2: validity intervals from the changelog under the
    // (ts, event_id) total order; -1 sentinel on the open version
    "q151_scd2_history" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |             epoch_us(ts) AS tsu FROM events),
        |v AS (SELECT user_id, event_id, event_type, value, tsu,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY tsu, event_id)::BIGINT AS version,
        |  lead(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS nxt
        |  FROM e)
        |SELECT user_id, version, event_id, event_type, value,
        |  tsu AS valid_from_us, coalesce(nxt, -1)::BIGINT AS valid_to_us,
        |  nxt IS NULL AS is_current
        |FROM v""".stripMargin,
    // int8 quantization audit: per-dim min/max calibration over the
    // shared 1e7 quantization, floor-chain codes/reconstruction, exact
    // integer error mass (HUGEINT squares ≙ Spark's DECIMAL(38,0))
    "q152_int8_audit" ->
      """WITH ex AS (SELECT vec_id, label,
        |  round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS e,
        |  unnest(range(len(embedding))) AS i FROM embeddings),
        |dims AS (SELECT i, min(e) AS mn, max(e) AS mx,
        |         max(e) - min(e) AS rng FROM ex GROUP BY 1),
        |c AS (SELECT label, e, mn, rng,
        |        CASE WHEN rng = 0 THEN 0
        |             ELSE ((e - mn) * 255) // rng END AS code
        |      FROM ex JOIN dims USING (i)),
        |r AS (SELECT label, e - (mn + (code * rng) // 255) AS err FROM c)
        |SELECT label::BIGINT AS label, count(*)::BIGINT AS n_vals,
        |  sum(err)::BIGINT AS sum_err, max(err)::BIGINT AS max_err,
        |  sum(err::HUGEINT * err)::DOUBLE AS sum_sq_err_d,
        |  sum(err)::DOUBLE / count(*)::DOUBLE AS mean_err,
        |  sqrt(sum(err::HUGEINT * err)::DOUBLE / count(*)::DOUBLE) AS rmse
        |FROM r GROUP BY 1""".stripMargin,
    // daily anomaly: trailing-7-OBSERVED-day two-moment window, z as one
    // identical-shape double chain; warm-up/degenerate rows NULL z
    "q153_daily_anomaly" ->
      """WITH dcounts AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS dy, count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, dy, cnt,
        |    count(cnt) OVER tw AS n_prev,
        |    sum(cnt) OVER tw AS s1,
        |    sum(cnt * cnt) OVER tw AS s2
        |  FROM dcounts WINDOW tw AS (PARTITION BY event_type ORDER BY dy
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |zs AS (SELECT event_type, dy, cnt, n_prev::BIGINT AS n_prev,
        |    CASE WHEN n_prev >= 1 THEN s1::DOUBLE / n_prev::DOUBLE END AS mean_prev,
        |    CASE WHEN n_prev = 7 AND n_prev * s2 - s1 * s1 > 0
        |         THEN (cnt::DOUBLE - s1::DOUBLE / n_prev::DOUBLE)
        |              / sqrt((n_prev * s2 - s1 * s1)::DOUBLE
        |                     / (n_prev * (n_prev - 1))::DOUBLE) END AS z
        |  FROM w)
        |SELECT event_type, dy, cnt, n_prev, mean_prev, z,
        |  coalesce(abs(z) >= 2.0, false) AS is_anomaly
        |FROM zs""".stripMargin,
    // hard negatives: the IVF default mirrored end to end (the q125
    // dense-side CTEs), label-mismatch filter before the per-anchor
    // top-k
    "q155_hard_negatives" ->
      s"""WITH $embedCtes,
         |${kmeansCentroidCtes(8, 2)},
         |evv AS (SELECT vec_id,
         |  ${md5Bits32Sql("'eval:' || vec_id::VARCHAR", 1)} % 100 < 5 AS ev
         |  FROM embeddings),
         |ad AS (SELECT x.vec_id, c.cid, sum((x.e - c.cq) * (x.e - c.cq))::BIGINT AS dist
         |       FROM ex x JOIN c2 c ON x.i = c.i GROUP BY 1, 2),
         |adr AS (SELECT vec_id, cid,
         |          row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |        FROM ad),
         |asg AS (SELECT adr.vec_id, adr.cid FROM adr
         |        JOIN evv ON adr.vec_id = evv.vec_id
         |        WHERE rn = 1 AND NOT evv.ev),
         |qp AS (SELECT adr.vec_id AS anchor_id, adr.cid FROM adr
         |       JOIN evv ON adr.vec_id = evv.vec_id
         |       WHERE rn <= 4 AND evv.ev),
         |cand AS (SELECT qp.anchor_id, asg.vec_id AS neg_id
         |         FROM qp JOIN asg ON qp.cid = asg.cid),
         |dots AS (SELECT anchor_id, neg_id, sum(a.e * b.e)::DOUBLE AS dot
         |  FROM cand JOIN ex a ON a.vec_id = cand.anchor_id
         |  JOIN ex b ON b.vec_id = cand.neg_id AND b.i = a.i
         |  GROUP BY 1, 2),
         |cs AS (SELECT anchor_id, neg_id, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cos
         |  FROM dots JOIN n2 na ON anchor_id = na.vec_id
         |  JOIN n2 nb ON neg_id = nb.vec_id),
         |fl AS (SELECT cs.anchor_id, la.label AS anchor_label,
         |         cs.neg_id, lb.label AS neg_label, cs.cos
         |       FROM cs
         |       JOIN embeddings la ON cs.anchor_id = la.vec_id
         |       JOIN embeddings lb ON cs.neg_id = lb.vec_id
         |       WHERE la.label <> lb.label)
         |SELECT anchor_id, anchor_label, neg_id, neg_label, cos, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY anchor_id
         |    ORDER BY cos DESC, neg_id)::BIGINT AS rank FROM fl)
         |WHERE rank <= 5""".stripMargin,
    // per-language fertility under the trained BPE (the q79/q94 chain)
    "q154_fertility" -> fertilitySql(3),
    // zone-map manifest for both shard layouts; the range layout's block
    // width mirrors the Spark scalar ((hi-lo) div n + 1)
    "q157_zone_map" ->
      s"""WITH ids AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi
         |            FROM documents),
         |h AS (SELECT doc_id, n_chars,
         |        ${md5Bits32Sql("'shard:' || doc_id::VARCHAR", 1)} % 8 AS shard
         |      FROM documents),
         |r AS (SELECT doc_id, n_chars,
         |        (doc_id - lo) // ((hi - lo) // 8 + 1) AS shard
         |      FROM documents, ids),
         |z AS (SELECT 'hash' AS layout, shard, count(*)::BIGINT AS n_docs,
         |        min(doc_id) AS min_id, max(doc_id) AS max_id,
         |        min(n_chars) AS min_chars, max(n_chars) AS max_chars
         |      FROM h GROUP BY 1, 2
         |      UNION ALL
         |      SELECT 'range', shard, count(*)::BIGINT,
         |        min(doc_id), max(doc_id), min(n_chars), max(n_chars)
         |      FROM r GROUP BY 1, 2)
         |SELECT layout, shard, n_docs, min_id, max_id,
         |  max_id - min_id AS id_range, min_chars, max_chars
         |FROM z""".stripMargin,
    // curriculum order: the (decile DESC, md5 shuffle, doc_id) global
    // rank — the oracle gets the single-window luxury, the Spark side
    // the two-phase distributed rank; same total order, same positions
    "q156_curriculum" ->
      s"""WITH qr AS ($qualityRankSql),
         |k AS (SELECT doc_id, decile,
         |  ${md5Bits32Sql("'curr:' || doc_id::VARCHAR", 1)} AS shuf
         |  FROM qr)
         |SELECT doc_id, decile, shuf,
         |  row_number() OVER (ORDER BY decile DESC, shuf, doc_id)::BIGINT
         |    AS position
         |FROM k""".stripMargin,
    // cross-source vocabulary overlap: distinct (source, type) self-join,
    // exact-integer Jaccard / OOV ratios (1e6 floor-quantized)
    "q158_vocab_overlap" ->
      s"""WITH toks AS (
         |  SELECT source, list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |    t -> regexp_full_match(t, '[a-z]+') AND NOT list_contains($stopList, t)) AS ws
         |  FROM documents),
         |v AS (SELECT DISTINCT source, unnest(ws) AS w FROM toks),
         |sz AS (SELECT source, count(*)::BIGINT AS vsz FROM v GROUP BY 1),
         |i AS (SELECT a.source AS src_a, b.source AS src_b,
         |        count(*)::BIGINT AS common
         |      FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
         |      GROUP BY 1, 2)
         |SELECT src_a, src_b, common, sa.vsz AS vocab_a, sb.vsz AS vocab_b,
         |  common * 1000000 // (sa.vsz + sb.vsz - common) AS jaccard_q6,
         |  (sb.vsz - common) * 1000000 // sb.vsz AS oov_b_q6
         |FROM i JOIN sz sa ON src_a = sa.source
         |       JOIN sz sb ON src_b = sb.source""".stripMargin,
    // week-over-week growth vs previous OBSERVED week; integer count
    // ratio, double chain over the exact DECIMAL value sums
    "q159_growth" ->
      """WITH wk AS (
        |  SELECT event_type, ((epoch_us(ts) // 1000000) // 604800) AS week_id,
        |    count(*)::BIGINT AS cnt,
        |    sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT *,
        |  lag(cnt) OVER (PARTITION BY event_type ORDER BY week_id) AS prev_cnt,
        |  lag(sum_value) OVER (PARTITION BY event_type ORDER BY week_id)
        |    AS prev_value
        |  FROM wk)
        |SELECT event_type, week_id, cnt, sum_value, prev_cnt,
        |  (cnt - prev_cnt) * 1000000 // prev_cnt AS cnt_wow_q6,
        |  (sum_value - prev_value) / nullif(prev_value, 0.0) AS value_wow
        |FROM g""".stripMargin,
    // linear multi-touch attribution: exact 1e-6-unit shares, remainder
    // to the last touch, 'direct' bucket for touchless purchases
    "q160_attribution" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |              epoch_us(ts) AS tsu, value FROM events),
        |p AS (SELECT event_id AS p_id, user_id, tsu AS p_tsu,
        |        (value::DECIMAL(18,2) * 100)::BIGINT AS cents
        |      FROM ev WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS t_id, event_type AS touch_type,
        |        tsu AS t_tsu
        |      FROM ev WHERE event_type IN ('view', 'click')),
        |j AS (SELECT * FROM p JOIN t USING (user_id)
        |      WHERE t_tsu < p_tsu AND t_tsu >= p_tsu - 86400000000),
        |r AS (SELECT *, count(*) OVER (PARTITION BY p_id) AS n_touch,
        |        row_number() OVER (PARTITION BY p_id
        |          ORDER BY t_tsu DESC, t_id DESC) AS rk,
        |        cents * 10000 AS unit
        |      FROM j),
        |s AS (SELECT touch_type, unit // n_touch +
        |        CASE WHEN rk = 1 THEN unit % n_touch ELSE 0 END AS share
        |      FROM r
        |      UNION ALL
        |      SELECT 'direct', cents * 10000 FROM p
        |      WHERE p_id NOT IN (SELECT p_id FROM j))
        |SELECT touch_type, count(*)::BIGINT AS n_contribs,
        |  sum(share)::BIGINT AS attributed_q6,
        |  sum(share)::BIGINT / 1000000.0 AS attributed
        |FROM s GROUP BY 1""".stripMargin,
    // quality committee: three per-lang signal ranks summed (exact
    // integers), percent-ranked into a decile — the q136 calibration
    // generalized to an ensemble
    "q161_committee" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |    regexp_split_to_array(lower(text), '\\s+') AS ws FROM documents),
         |s AS (SELECT doc_id, lang, len(ws)::BIGINT AS n_tokens,
         |  len(list_filter(ws, x -> list_contains($stopList, x)))::BIGINT AS n_stop,
         |  len(list_filter(ws, x -> regexp_full_match(x, '[a-z]+')))::BIGINT AS n_alpha
         |  FROM t),
         |tc AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM (
         |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
         |  FROM documents) GROUP BY 1, 2),
         |nn AS (SELECT doc_id, sum(c)::BIGINT AS n FROM tc GROUP BY 1),
         |ent AS (SELECT tc.doc_id,
         |  sum(round((c::DOUBLE / nn.n::DOUBLE)
         |    * log2(nn.n::DOUBLE / c::DOUBLE) * 1000000.0)::BIGINT)::BIGINT
         |    AS entropy_q
         |  FROM tc JOIN nn USING (doc_id) GROUP BY 1),
         |sig AS (SELECT s.doc_id, s.lang,
         |  n_stop::DOUBLE / n_tokens AS stop_ratio,
         |  n_alpha::DOUBLE / n_tokens AS alpha_ratio, ent.entropy_q
         |  FROM s JOIN ent ON s.doc_id = ent.doc_id),
         |rk AS (SELECT doc_id, lang,
         |  rank() OVER (PARTITION BY lang ORDER BY stop_ratio)::BIGINT AS r_stop,
         |  rank() OVER (PARTITION BY lang ORDER BY alpha_ratio)::BIGINT AS r_alpha,
         |  rank() OVER (PARTITION BY lang ORDER BY entropy_q)::BIGINT AS r_ent
         |  FROM sig),
         |cm AS (SELECT *, r_stop + r_alpha + r_ent AS committee FROM rk)
         |SELECT doc_id, lang, r_stop, r_alpha, r_ent, committee,
         |  rank() OVER (PARTITION BY lang ORDER BY committee)::BIGINT AS c_rnk,
         |  least(floor(CASE WHEN count(*) OVER (PARTITION BY lang) = 1 THEN 0.0
         |    ELSE (rank() OVER (PARTITION BY lang ORDER BY committee) - 1)::DOUBLE
         |         / (count(*) OVER (PARTITION BY lang) - 1)::DOUBLE END * 10),
         |    9)::BIGINT AS decile
         |FROM cm""".stripMargin,
    // Count-Min sketch: d=4 md5 rows × w=256 buckets over per-user
    // counts; point estimate = min over rows (one-sided overestimate)
    "q162_cms_counts" ->
      s"""WITH uc AS (SELECT user_id AS k, count(*)::BIGINT AS cnt
         |            FROM events GROUP BY 1),
         |fan AS (SELECT k, cnt, r,
         |    (${md5Bits32Sql("'cms:' || r::VARCHAR || ':' || k::VARCHAR", 1)})
         |      % 256 AS b
         |  FROM uc CROSS JOIN (SELECT unnest([0, 1, 2, 3]::BIGINT[]) AS r) t),
         |reg AS (SELECT r, b, sum(cnt)::BIGINT AS c FROM fan GROUP BY 1, 2),
         |top AS (SELECT k, cnt AS exact_cnt FROM uc
         |        ORDER BY cnt DESC, k LIMIT 20)
         |SELECT t.k AS user_id, t.exact_cnt, min(g.c)::BIGINT AS est_cnt,
         |  (min(g.c) - t.exact_cnt)::BIGINT AS over_cnt
         |FROM top t JOIN fan f ON t.k = f.k
         |     JOIN reg g ON f.r = g.r AND f.b = g.b
         |GROUP BY 1, 2""".stripMargin,
    // AMS/CMS self-join-size (F2) estimate vs the exact key histogram;
    // HUGEINT squares ≙ the Spark DECIMAL(38,0) accumulation
    "q163_join_size" ->
      s"""WITH pc AS (SELECT l_partkey AS k, count(*)::BIGINT AS cnt
         |            FROM lineitem GROUP BY 1),
         |fan AS (SELECT k, cnt, r,
         |    (${md5Bits32Sql("'cms:' || r::VARCHAR || ':' || k::VARCHAR", 1)})
         |      % 256 AS b
         |  FROM pc CROSS JOIN (SELECT unnest([0, 1, 2, 3]::BIGINT[]) AS r) t),
         |reg AS (SELECT r, b, sum(cnt)::BIGINT AS c FROM fan GROUP BY 1, 2),
         |est AS (SELECT min(f2r)::BIGINT AS est_sz FROM (
         |  SELECT r, sum(c::HUGEINT * c) AS f2r FROM reg GROUP BY 1)),
         |ex AS (SELECT sum(cnt::HUGEINT * cnt)::BIGINT AS exact_sz FROM pc)
         |SELECT exact_sz, est_sz,
         |  (est_sz - exact_sz) * 1000000 // exact_sz AS over_q6
         |FROM ex, est""".stripMargin,
    // z-order vs linear layout zone maps: 16+16-bit Morton interleave,
    // fixed-width z blocks vs day-sorted blocks
    "q164_zorder" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |    epoch_us(o_orderdate) // 86400000000 AS dy FROM orders),
        |b AS (SELECT min(o_custkey) AS clo, max(o_custkey) AS chi,
        |        min(dy) AS dlo, max(dy) AS dhi FROM o),
        |n AS (SELECT o_orderkey,
        |    (o_custkey - clo) * 65535 // greatest(1, chi - clo) AS c16,
        |    (dy - dlo) * 65535 // greatest(1, dhi - dlo) AS d16 FROM o, b),
        |z AS (SELECT *, list_sum(list_transform(range(0, 16), i ->
        |    ((c16 >> i::INT) & 1) * (1::BIGINT << (2 * i)::INT) +
        |    ((d16 >> i::INT) & 1) * (1::BIGINT << (2 * i + 1)::INT)))::BIGINT
        |    AS zv FROM n),
        |blk AS (SELECT 'zorder' AS layout, zv // 536870912 AS block, c16, d16
        |        FROM z
        |        UNION ALL
        |        SELECT 'linear', d16 // 8192, c16, d16 FROM z)
        |SELECT layout, block, count(*)::BIGINT AS n_rows,
        |  min(c16) AS min_c, max(c16) AS max_c,
        |  min(d16) AS min_d, max(d16) AS max_d,
        |  (max(c16) - min(c16)) * 1000000 // 65535 AS c_span_q6,
        |  (max(d16) - min(d16)) * 1000000 // 65535 AS d_span_q6
        |FROM blk GROUP BY 1, 2""".stripMargin,
    // RFM quartile segmentation under the (metric, user_id) total order
    "q165_rfm" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) // 86400000000 AS dy,
        |    (value::DECIMAL(18,2) * 100)::BIGINT AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |u AS (SELECT user_id, max(dy) AS last_dy, count(*)::BIGINT AS frequency,
        |        sum(cents)::BIGINT AS monetary_c
        |      FROM p GROUP BY 1),
        |m AS (SELECT max(dy) AS mx FROM p),
        |base AS (SELECT user_id, mx - last_dy AS recency_days,
        |           frequency, monetary_c FROM u, m),
        |r AS (SELECT *,
        |  ((row_number() OVER (ORDER BY recency_days, user_id) - 1) * 4)
        |    // (count(*) OVER ()) AS r_q,
        |  ((row_number() OVER (ORDER BY frequency, user_id) - 1) * 4)
        |    // (count(*) OVER ()) AS f_q,
        |  ((row_number() OVER (ORDER BY monetary_c, user_id) - 1) * 4)
        |    // (count(*) OVER ()) AS m_q
        |  FROM base)
        |SELECT user_id, recency_days, frequency, monetary_c,
        |  r_q::BIGINT AS r_q, f_q::BIGINT AS f_q, m_q::BIGINT AS m_q,
        |  'R' || r_q::VARCHAR || 'F' || f_q::VARCHAR || 'M' || m_q::VARCHAR
        |    AS segment
        |FROM r""".stripMargin,
    // per-dimension embedding health: exact quantized two-moment stats,
    // HUGEINT variance numerator ≙ the Spark DECIMAL(38,0)
    "q166_dim_health" ->
      """WITH ex AS (SELECT vec_id,
        |    round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS q,
        |    unnest(range(len(embedding))) AS i FROM embeddings)
        |SELECT i::BIGINT AS dim, count(*)::BIGINT AS n, sum(q)::BIGINT AS sum_q,
        |  min(q) AS min_q, max(q) AS max_q,
        |  sum((q = 0)::BIGINT)::BIGINT AS n_zero,
        |  sum(q)::DOUBLE / count(*)::DOUBLE / 1e7 AS mean,
        |  CASE WHEN count(*) >= 2 THEN
        |    (count(*)::HUGEINT * sum(q::HUGEINT * q)
        |      - sum(q)::HUGEINT * sum(q)::HUGEINT)::DOUBLE
        |    / (count(*) * (count(*) - 1))::DOUBLE / 1e14 END AS var_samp
        |FROM ex GROUP BY 1""".stripMargin,
    // join-skew advisor: exact df histogram shape + ceil(max/avg) salt
    "q167_skew_advisor" ->
      """WITH keys AS (
        |  SELECT 'lineitem.l_partkey' AS relation, l_partkey::BIGINT AS k,
        |    count(*)::BIGINT AS df FROM lineitem GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'events.user_id', user_id::BIGINT, count(*)::BIGINT
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY relation
        |        ORDER BY df, k) AS rn,
        |        count(*) OVER (PARTITION BY relation) AS n_keys
        |      FROM keys),
        |a AS (SELECT relation, sum(df)::BIGINT AS n_rows,
        |        count(*)::BIGINT AS n_keys, max(df) AS max_df
        |      FROM keys GROUP BY 1),
        |p50 AS (SELECT relation, df AS p50_df FROM r
        |        WHERE rn = (50 * n_keys + 99) // 100),
        |p99 AS (SELECT relation, df AS p99_df FROM r
        |        WHERE rn = (99 * n_keys + 99) // 100)
        |SELECT relation, n_rows, n_keys, max_df, p50_df, p99_df,
        |  max_df * n_keys * 1000000 // n_rows AS skew_q6,
        |  greatest(1, (max_df * n_keys + n_rows - 1) // n_rows) AS salt_factor
        |FROM a JOIN p50 USING (relation) JOIN p99 USING (relation)""".stripMargin,
    // right-to-be-forgotten propagation: the md5 1% customer set probed
    // through every derived table
    "q168_deletion_audit" ->
      s"""WITH del AS (SELECT c_custkey AS k FROM customer
         |  WHERE ${md5Bits32Sql("'del:' || c_custkey::VARCHAR", 1)} % 100 < 1),
         |dord AS (SELECT o_orderkey, o_custkey FROM orders
         |         WHERE o_custkey IN (SELECT k FROM del))
         |SELECT 'customer' AS relation, count(*)::BIGINT AS n_rows,
         |  count(DISTINCT k)::BIGINT AS n_keys FROM del
         |UNION ALL
         |SELECT 'orders', count(*)::BIGINT, count(DISTINCT o_custkey)::BIGINT
         |FROM dord
         |UNION ALL
         |SELECT 'lineitem', count(*)::BIGINT, count(DISTINCT l_orderkey)::BIGINT
         |FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM dord)
         |UNION ALL
         |SELECT 'events', count(*)::BIGINT, count(DISTINCT user_id)::BIGINT
         |FROM events WHERE user_id IN (SELECT k FROM del)""".stripMargin,
    // FK orphan audit over every star-schema edge
    "q169_ref_integrity" ->
      """SELECT 'lineitem->orders' AS fk_edge, count(*)::BIGINT AS n_total,
        |  sum((l_orderkey NOT IN (SELECT o_orderkey FROM orders))::BIGINT)::BIGINT
        |    AS n_orphans FROM lineitem
        |UNION ALL
        |SELECT 'lineitem->part', count(*)::BIGINT,
        |  sum((l_partkey NOT IN (SELECT p_partkey FROM part))::BIGINT)::BIGINT
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem->supplier', count(*)::BIGINT,
        |  sum((l_suppkey NOT IN (SELECT s_suppkey FROM supplier))::BIGINT)::BIGINT
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders->customer', count(*)::BIGINT,
        |  sum((o_custkey NOT IN (SELECT c_custkey FROM customer))::BIGINT)::BIGINT
        |FROM orders
        |UNION ALL
        |SELECT 'customer->nation', count(*)::BIGINT,
        |  sum((c_nationkey NOT IN (SELECT n_nationkey FROM nation))::BIGINT)::BIGINT
        |FROM customer
        |UNION ALL
        |SELECT 'supplier->nation', count(*)::BIGINT,
        |  sum((s_nationkey NOT IN (SELECT n_nationkey FROM nation))::BIGINT)::BIGINT
        |FROM supplier
        |UNION ALL
        |SELECT 'nation->region', count(*)::BIGINT,
        |  sum((n_regionkey NOT IN (SELECT r_regionkey FROM region))::BIGINT)::BIGINT
        |FROM nation""".stripMargin,
    // frame-sampling manifest: closed-form ceil-division frame math
    // (short last frame) mirrors the flatMap demux
    "q170_frame_manifest" ->
      """WITH f AS (SELECT doc_id, strlen(text)::BIGINT AS n_bytes,
        |    (n_chars % 64 + 1)::BIGINT AS width FROM documents),
        |g AS (SELECT *, (n_bytes + width - 1) // width AS n_frames FROM f)
        |SELECT doc_id, n_bytes, width, n_frames,
        |  (n_frames + 3) // 4 AS n_sampled,
        |  CASE WHEN n_frames = 0 THEN 0
        |    ELSE ((n_frames + 3) // 4) * width -
        |      CASE WHEN (n_frames - 1) % 4 = 0
        |        THEN n_frames * width - n_bytes ELSE 0 END
        |  END AS sampled_bytes
        |FROM g""".stripMargin,
    // stub-decode audit: zero-padded height×width mean as one double
    // division over the exact ASCII byte sum
    "q171_decode_audit" ->
      """WITH f AS (SELECT doc_id, text, strlen(text)::BIGINT AS n_bytes,
        |    (n_chars % 64 + 1)::BIGINT AS width FROM documents),
        |s AS (SELECT doc_id, n_bytes, width,
        |    (n_bytes + width - 1) // width AS height,
        |    list_sum(list_transform(range(1, strlen(text)::INT + 1),
        |      i -> ascii(substr(text, i::INT, 1))))::BIGINT AS px_sum
        |  FROM f)
        |SELECT doc_id, n_bytes, width, height,
        |  CASE WHEN height = 0 THEN 0.0
        |    ELSE px_sum::DOUBLE / (height * width)::DOUBLE END AS mean_px
        |FROM s""".stripMargin,
    // cumulative HLL reach: per-day registers bucket-max-merged through
    // each day of the grid; exact curve from first-occurrence days
    "q172_reach_curve" ->
      s"""WITH base AS (SELECT event_type,
         |    epoch_us(ts) // 86400000000 AS dy, user_id,
         |    ${md5Bits32Sql("'hll:' || user_id::VARCHAR", 1)} AS h
         |  FROM events),
         |r AS (SELECT event_type, dy, h & 255 AS b,
         |  CASE WHEN (h >> 8) = 0 THEN 25
         |       ELSE 25 - length(bin(h >> 8)) END AS rank FROM base),
         |m AS (SELECT event_type, dy, b, max(rank) AS m_j
         |      FROM r GROUP BY 1, 2, 3),
         |grid AS (SELECT DISTINCT event_type AS g_type, dy AS g_dy FROM base),
         |cum AS (SELECT g_type, g_dy, b, max(m_j) AS m_j
         |        FROM grid JOIN m ON g_type = event_type AND dy <= g_dy
         |        GROUP BY 1, 2, 3),
         |s AS (SELECT g_type, g_dy, count(*) AS nz,
         |        sum(power(2.0, -m_j)) AS snz FROM cum GROUP BY 1, 2),
         |est AS (SELECT g_type, g_dy, (256 - nz)::BIGINT AS v_zero,
         |  floor(0.7213 / (1.0 + 1.079 / 256.0)
         |    * 65536.0 / ((256 - nz)::DOUBLE + snz))::BIGINT AS hll_raw
         |  FROM s),
         |fo AS (SELECT event_type, fod, count(*)::BIGINT AS nf FROM (
         |  SELECT event_type, user_id, min(dy) AS fod FROM base GROUP BY 1, 2)
         |  GROUP BY 1, 2),
         |x AS (SELECT g_type, g_dy, sum(nf)::BIGINT AS n_exact_cum
         |      FROM grid JOIN fo ON g_type = event_type AND fod <= g_dy
         |      GROUP BY 1, 2)
         |SELECT x.g_type AS event_type, x.g_dy AS dy, x.n_exact_cum,
         |  est.v_zero, est.hll_raw,
         |  CASE WHEN est.v_zero > 0 AND est.hll_raw <= 640
         |       THEN ${sqlLongList(graft.operators.Relational.HllLcTable)}[est.v_zero + 1]::BIGINT
         |       ELSE est.hll_raw END AS hll_est
         |FROM x JOIN est USING (g_type, g_dy)""".stripMargin,
    // funnel latency: q113's chain restricted to stage-3 users, unpivoted
    // into three duration metrics with exact middle-rank p50/p90
    "q173_funnel_latency" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_type FROM events),
        |f1 AS (SELECT user_id, min(tsu) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |f2 AS (SELECT e.user_id, min(tsu) AS t2 FROM e JOIN f1 USING (user_id)
        |       WHERE event_type = 'click' AND tsu > t1
        |         AND tsu <= t1 + 86400000000 GROUP BY 1),
        |f3 AS (SELECT e.user_id, min(tsu) AS t3 FROM e JOIN f2 USING (user_id)
        |       WHERE event_type = 'purchase' AND tsu > t2
        |         AND tsu <= t2 + 86400000000 GROUP BY 1),
        |conv AS (SELECT f1.user_id, t1, t2, t3 FROM f1
        |         JOIN f2 ON f1.user_id = f2.user_id
        |         JOIN f3 ON f1.user_id = f3.user_id),
        |durs AS (SELECT user_id, 'view_to_click' AS metric, t2 - t1 AS dur_us
        |         FROM conv
        |         UNION ALL
        |         SELECT user_id, 'click_to_purchase', t3 - t2 FROM conv
        |         UNION ALL
        |         SELECT user_id, 'view_to_purchase', t3 - t1 FROM conv),
        |r AS (SELECT *, row_number() OVER (PARTITION BY metric
        |        ORDER BY dur_us, user_id) AS rn,
        |        count(*) OVER (PARTITION BY metric) AS n FROM durs),
        |p50 AS (SELECT metric, dur_us AS p50_us FROM r
        |        WHERE rn = (50 * n + 99) // 100),
        |p90 AS (SELECT metric, dur_us AS p90_us FROM r
        |        WHERE rn = (90 * n + 99) // 100),
        |a AS (SELECT metric, count(*)::BIGINT AS n_converted,
        |        min(dur_us) AS min_us, max(dur_us) AS max_us,
        |        sum(dur_us)::BIGINT AS sum_us
        |      FROM durs GROUP BY 1)
        |SELECT metric, n_converted, min_us, p50_us, p90_us, max_us,
        |  sum_us::DOUBLE / n_converted::DOUBLE AS mean_us
        |FROM a JOIN p50 USING (metric) JOIN p90 USING (metric)""".stripMargin,
    // session rollup over the q28 sessions: bounce ratio, middle-rank
    // percentiles, single-division means
    "q174_session_stats" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
        |g AS (SELECT *, CASE WHEN tsu - lag(tsu) OVER
        |        (PARTITION BY user_id ORDER BY tsu, event_id) > 1800000000
        |        THEN 1 ELSE 0 END AS gap FROM e),
        |ss AS (SELECT *, sum(gap) OVER (PARTITION BY user_id
        |        ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING)
        |        AS session_seq FROM g),
        |s AS (SELECT user_id, session_seq, count(*)::BIGINT AS n_events,
        |        max(tsu) - min(tsu) AS duration_us
        |      FROM ss GROUP BY 1, 2),
        |r AS (SELECT *,
        |  row_number() OVER (ORDER BY n_events, user_id, session_seq) AS rne,
        |  row_number() OVER (ORDER BY duration_us, user_id, session_seq) AS rnd,
        |  count(*) OVER () AS n FROM s),
        |p50e AS (SELECT n_events AS p50_events FROM r
        |         WHERE rne = (50 * n + 99) // 100),
        |p90e AS (SELECT n_events AS p90_events FROM r
        |         WHERE rne = (90 * n + 99) // 100),
        |p50d AS (SELECT duration_us AS p50_duration_us FROM r
        |         WHERE rnd = (50 * n + 99) // 100),
        |a AS (SELECT count(*)::BIGINT AS n_sessions,
        |        count(DISTINCT user_id)::BIGINT AS n_users,
        |        sum((n_events = 1)::BIGINT)::BIGINT AS bounce_n,
        |        sum(n_events)::BIGINT AS sum_events,
        |        sum(duration_us)::BIGINT AS sum_duration_us
        |      FROM s)
        |SELECT n_sessions, n_users, bounce_n,
        |  bounce_n * 1000000 // n_sessions AS bounce_q6,
        |  p50_events, p90_events, p50_duration_us,
        |  sum_events::DOUBLE / n_sessions::DOUBLE AS mean_events,
        |  sum_duration_us::DOUBLE / n_sessions::DOUBLE AS mean_duration_us
        |FROM a, p50e, p90e, p50d""".stripMargin,
    // dedup detector evaluation: SimHash (q23) vs exact Jaccard truth
    // (q16), exact integer precision/recall/F1
    "q175_dedup_eval" ->
      s"""WITH truth AS (SELECT x, y FROM ($jaccardPairsSql)),
         |pred AS (SELECT x, y FROM ($simhashPairsSql)),
         |tp AS (SELECT count(*)::BIGINT AS n_tp
         |       FROM truth JOIN pred USING (x, y)),
         |a AS (SELECT count(*)::BIGINT AS n_truth FROM truth),
         |b AS (SELECT count(*)::BIGINT AS n_pred FROM pred)
         |SELECT n_truth, n_pred, n_tp,
         |  n_tp * 1000000 // n_pred AS precision_q6,
         |  n_tp * 1000000 // n_truth AS recall_q6,
         |  2 * n_tp * 1000000 // (n_pred + n_truth) AS f1_q6
         |FROM a, b, tp""".stripMargin,
    // dedup-adjusted per-source token budget off the q82 survivorship
    "q176_effective_tokens" -> effectiveTokensSql(5),
    // cluster-size distribution of the near-dup graph
    "q180_dup_topology" ->
      (dedupLabelCtes(5) +
      s""",
         |cs AS (SELECT label, count(*)::BIGINT AS sz FROM l5 GROUP BY 1),
         |tt AS (SELECT sum(sz)::BIGINT AS total FROM cs)
         |SELECT sz, count(*)::BIGINT AS n_clusters,
         |  sz * count(*)::BIGINT AS n_docs,
         |  (sz * count(*) * 1000000 // total)::BIGINT AS doc_share_q6
         |FROM cs, tt GROUP BY sz, total""".stripMargin),
    // next-fit packing waste: identical fold in both engines
    "q181_pack_waste" ->
      """WITH tk AS (SELECT source, doc_id,
        |    list_sum(list_transform(regexp_split_to_array(lower(text), '\s+'),
        |      w -> floor((strlen(w)+3)/4)::BIGINT))::BIGINT AS t
        |  FROM documents),
        |g AS (SELECT source, count(*)::BIGINT AS n_docs,
        |        sum(t)::BIGINT AS total_toks,
        |        sum(greatest(0, t - 2048))::BIGINT AS overflow,
        |        list(t ORDER BY doc_id) AS ts
        |      FROM tk GROUP BY 1),
        |-- fold state rides ONE bigint (p*2^24 + f: fill bounded by the
        |-- largest single doc, far under 2^24 here) — DuckDB 1.0's
        |-- multi-field struct extraction from list_reduce miscompiles the
        |-- lambda, so struct state is off the table; waste then follows
        |-- exactly from the capacity identity p*budget - total + overflow
        |-- (an oversized doc owns one pack whose fill exceeds the budget)
        |-- acc%2^24 = 0 (open pack still empty): an oversized doc FILLS
        |-- the open pack instead of closing it — no phantom pack when a
        |-- source's first doc exceeds the budget (round-10 advice)
        |f AS (SELECT source, n_docs, total_toks, overflow,
        |  list_reduce(list_prepend(16777216::BIGINT, ts),
        |    (acc, t) -> CASE WHEN (acc % 16777216) = 0
        |        OR (acc % 16777216) + t <= 2048 THEN acc + t
        |      ELSE ((acc // 16777216) + 1) * 16777216 + t END) AS st
        |  FROM g)
        |SELECT source, n_docs, total_toks, (st // 16777216) AS n_packs,
        |  ((st // 16777216) * 2048 - total_toks + overflow)::BIGINT
        |    AS waste_toks,
        |  (((st // 16777216) * 2048 - total_toks + overflow) * 1000000
        |    // ((st // 16777216) * 2048))::BIGINT AS waste_q6,
        |  (total_toks + 2047) // 2048 AS n_packs_contig
        |FROM f""".stripMargin,
    // the maxDf-ceilinged deployment BM25 (q116 with query terms of
    // df > N/10 shed BEFORE the posting join — the integer comparison
    // df*10 <= n mirrors Spark's df <= n div 10 exactly); same exact
    // integer-quantized weights as q116 on the surviving terms
    "q182_bm25_ceiling" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |    t -> regexp_full_match(t, '[a-z]+') AND NOT list_contains($stopList, t))) AS t
         |  FROM documents),
         |ev AS (SELECT doc_id,
         |  ${md5Bits32Sql("'eval:' || doc_id::VARCHAR", 1)} % 100 < 5 AS ev
         |  FROM documents),
         |tf AS (SELECT toks.doc_id, t, count(*)::BIGINT AS tf
         |       FROM toks JOIN ev USING (doc_id) WHERE NOT ev GROUP BY 1, 2),
         |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
         |st AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sumdl FROM dl),
         |dfT AS (SELECT t, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |q AS (SELECT DISTINCT toks.doc_id AS query_id, t
         |      FROM toks JOIN ev USING (doc_id) WHERE ev),
         |qk AS (SELECT query_id, t FROM q JOIN dfT USING (t), st
         |       WHERE df * 10 <= n),
         |sq AS (SELECT qk.query_id, tf.doc_id,
         |  round(log2(((n - df + 0.5) / (df + 0.5)) + 1.0)
         |    * (tf * 2.2)
         |    / (tf + 1.2 * (0.25 + 0.75 * ((dl * n)::DOUBLE / sumdl::DOUBLE)))
         |    * 1000000.0)::BIGINT AS sq
         |  FROM qk JOIN tf USING (t) JOIN dfT USING (t)
         |  JOIN dl ON tf.doc_id = dl.doc_id, st),
         |sc AS (SELECT query_id, doc_id, sum(sq)::BIGINT AS score_q
         |       FROM sq GROUP BY 1, 2),
         |rk AS (SELECT query_id, doc_id, score_q,
         |       row_number() OVER (PARTITION BY query_id
         |         ORDER BY score_q DESC, doc_id)::BIGINT AS rank FROM sc)
         |SELECT query_id, doc_id, rank, score_q FROM rk WHERE rank <= 10""".stripMargin,
    // eval near-dup contamination: the exact-Jaccard pair set (the LSH
    // generator's oracle-gold twin on this corpus) split by the "eval:"
    // md5 bucket, aggregated per train-side source
    "q183_eval_contamination" ->
      s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
         |              FROM documents),
         |sh AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM toks, unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3)),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |pr AS (SELECT x, y FROM inter
         |       JOIN sizes sa ON x = sa.doc_id JOIN sizes sb ON y = sb.doc_id
         |       WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.5),
         |ev AS (SELECT doc_id, source,
         |  ${md5Bits32Sql("'eval:' || doc_id::VARCHAR", 1)} % 100 < 5 AS ev
         |  FROM documents),
         |ed AS (SELECT CASE WHEN ax.ev THEN pr.y ELSE pr.x END AS train_doc,
         |              CASE WHEN ax.ev THEN pr.x ELSE pr.y END AS eval_doc,
         |              CASE WHEN ax.ev THEN ay.source ELSE ax.source END AS source
         |       FROM pr JOIN ev ax ON pr.x = ax.doc_id
         |                JOIN ev ay ON pr.y = ay.doc_id
         |       WHERE ax.ev <> ay.ev),
         |ps AS (SELECT source, count(*)::BIGINT AS n_pairs,
         |         count(DISTINCT train_doc)::BIGINT AS n_train_flagged,
         |         count(DISTINCT eval_doc)::BIGINT AS n_eval_implicated
         |       FROM ed GROUP BY 1),
         |sz AS (SELECT source, count(*)::BIGINT AS n_train_docs
         |       FROM ev WHERE NOT ev GROUP BY 1)
         |SELECT sz.source, n_train_docs,
         |  coalesce(n_pairs, 0)::BIGINT AS n_pairs,
         |  coalesce(n_train_flagged, 0)::BIGINT AS n_train_flagged,
         |  coalesce(n_eval_implicated, 0)::BIGINT AS n_eval_implicated,
         |  coalesce(n_train_flagged, 0) * 1000000 // n_train_docs
         |    AS contamination_q6
         |FROM sz LEFT JOIN ps ON sz.source = ps.source""".stripMargin,
    // surprisal-guided mixture: the q77 LM chain aggregated per source,
    // rational tilt max(1e5, 1e6 + 4*excess), one double division
    "q184_surprisal_mixture" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
        |              FROM documents),
        |bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        |       FROM toks, unnest(range(1, len(w))) AS t(i) WHERE len(w) >= 2),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY 1),
        |s AS (SELECT c12.w1, c12.w2,
        |        round((-log2(c12.c12::DOUBLE / c1.c1::DOUBLE)) * 1000000.0)::BIGINT AS sq
        |      FROM c12 JOIN c1 USING (w1)),
        |pd AS (SELECT bg.doc_id, count(*) AS n_bigrams, sum(s.sq)::BIGINT AS bits_q
        |       FROM bg JOIN s ON bg.w1 = s.w1 AND bg.w2 = s.w2 GROUP BY 1),
        |per AS (SELECT d.source, count(*)::BIGINT AS n_docs,
        |          sum(coalesce(pd.bits_q, 0))::BIGINT AS bits,
        |          sum(coalesce(pd.n_bigrams, 0))::BIGINT AS nb
        |        FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |        GROUP BY 1),
        |tot AS (SELECT sum(bits)::BIGINT AS tbits, sum(nb)::BIGINT AS tnb
        |        FROM per),
        |t AS (SELECT source, n_docs,
        |        coalesce(bits // nullif(nb, 0), tbits // tnb)::BIGINT AS mean_q6,
        |        (coalesce(bits // nullif(nb, 0), tbits // tnb)
        |          - tbits // tnb)::BIGINT AS excess_q6
        |      FROM per, tot),
        |t2 AS (SELECT source, n_docs, mean_q6, excess_q6,
        |         greatest(100000, 1000000 + 4 * excess_q6)::BIGINT AS tilt_q6,
        |         (n_docs * greatest(100000, 1000000 + 4 * excess_q6))::BIGINT AS raw
        |       FROM t),
        |sw AS (SELECT sum(raw)::BIGINT AS sw FROM t2)
        |SELECT source, n_docs, mean_q6, excess_q6, tilt_q6,
        |  raw::DOUBLE / sw::DOUBLE AS weight,
        |  (raw::DOUBLE / sw::DOUBLE) * 100000.0 AS expected_docs
        |FROM t2, sw""".stripMargin,
    // IVF list balance: the q125 oracle's trained-quantizer assignment
    // (exact integer L2, rn = 1 nearest list) aggregated per list
    "q185_ivf_balance" ->
      s"""WITH $embedCtes,
         |${kmeansCentroidCtes(8, 2)},
         |ad AS (SELECT x.vec_id, c.cid, sum((x.e - c.cq) * (x.e - c.cq))::BIGINT AS dist
         |       FROM ex x JOIN c2 c ON x.i = c.i GROUP BY 1, 2),
         |adr AS (SELECT vec_id, cid,
         |          row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |        FROM ad),
         |pl AS (SELECT cid AS list_id, count(*)::BIGINT AS n_vecs
         |       FROM adr WHERE rn = 1 GROUP BY 1),
         |tot AS (SELECT sum(n_vecs)::BIGINT AS n, max(n_vecs)::BIGINT AS mx
         |        FROM pl)
         |SELECT list_id, n_vecs,
         |  n_vecs * 1000000 // n AS share_q6,
         |  mx * 8 * 1000000 // n AS imbalance_q6
         |FROM pl, tot""".stripMargin,
    // the q183 contamination edges applied: flagged train docs dropped,
    // per-source doc/BPE-token manifest of what remains
    "q187_decontam_manifest" ->
      s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
         |              FROM documents),
         |sh AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM toks, unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3)),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |pr AS (SELECT x, y FROM inter
         |       JOIN sizes sa ON x = sa.doc_id JOIN sizes sb ON y = sb.doc_id
         |       WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.5),
         |ev AS (SELECT doc_id, source,
         |  ${md5Bits32Sql("'eval:' || doc_id::VARCHAR", 1)} % 100 < 5 AS ev
         |  FROM documents),
         |fl AS (SELECT DISTINCT CASE WHEN ax.ev THEN pr.y ELSE pr.x END AS doc_id
         |       FROM pr JOIN ev ax ON pr.x = ax.doc_id
         |                JOIN ev ay ON pr.y = ay.doc_id
         |       WHERE ax.ev <> ay.ev),
         |tk AS (SELECT e.doc_id, e.source,
         |  list_sum(list_transform(regexp_split_to_array(lower(d.text), '\\s+'),
         |    w -> floor((strlen(w)+3)/4)::BIGINT))::BIGINT AS n_toks,
         |  (fl.doc_id IS NOT NULL) AS flagged
         |  FROM ev e JOIN documents d ON e.doc_id = d.doc_id
         |  LEFT JOIN fl ON e.doc_id = fl.doc_id
         |  WHERE NOT e.ev)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(n_toks)::BIGINT AS n_tokens,
         |  sum(flagged::BIGINT)::BIGINT AS n_removed,
         |  sum(CASE WHEN flagged THEN n_toks ELSE 0 END)::BIGINT AS tokens_removed,
         |  (count(*) - sum(flagged::BIGINT))::BIGINT AS n_docs_kept,
         |  (sum(n_toks) - sum(CASE WHEN flagged THEN n_toks ELSE 0 END))::BIGINT
         |    AS n_tokens_kept,
         |  (sum(CASE WHEN flagged THEN n_toks ELSE 0 END) * 1000000
         |    // sum(n_toks))::BIGINT AS removed_q6
         |FROM tk GROUP BY 1""".stripMargin,
    // language-ID confusion: the q17 prediction chain joined to the
    // label, aggregated to the (label, predicted) matrix
    "q186_langid_confusion" ->
      s"""WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
         |            FROM documents),
         |m(mlang, w) AS (VALUES $markerValues),
         |scores AS (SELECT doc_id, mlang, count(*) AS c
         |           FROM tok JOIN m USING (w) GROUP BY 1, 2),
         |best AS (SELECT doc_id, mlang, c,
         |                row_number() OVER (PARTITION BY doc_id
         |                                   ORDER BY c DESC, mlang ASC) AS rn
         |         FROM scores),
         |pred AS (SELECT d.doc_id, d.lang AS label,
         |                coalesce(b.mlang, 'und') AS predicted
         |         FROM documents d
         |         LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)),
         |cells AS (SELECT label, predicted, count(*)::BIGINT AS n_docs
         |          FROM pred GROUP BY 1, 2),
         |tot AS (SELECT label, sum(n_docs)::BIGINT AS n_label
         |        FROM cells GROUP BY 1)
         |SELECT cells.label, predicted, n_docs,
         |  n_docs * 1000000 // n_label AS share_q6,
         |  (cells.label = predicted) AS correct
         |FROM cells JOIN tot ON cells.label = tot.label""".stripMargin,
    // watermark advisor: lateness vs the running event-time max over the
    // event_id arrival order, exact middle-rank p50/p99
    "q177_watermark_advisor" ->
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS tsu
        |           FROM events),
        |l AS (SELECT event_type, event_id,
        |        greatest(0, coalesce(max(tsu) OVER (PARTITION BY event_type
        |          ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND 1 PRECEDING), tsu) - tsu) AS late_us
        |      FROM e),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY late_us, event_id) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS n FROM l),
        |p50 AS (SELECT event_type, late_us AS p50_late_us FROM r
        |        WHERE rn = (50 * n + 99) // 100),
        |p99 AS (SELECT event_type, late_us AS p99_late_us FROM r
        |        WHERE rn = (99 * n + 99) // 100),
        |a AS (SELECT event_type, count(*)::BIGINT AS n_events,
        |        sum((late_us > 0)::BIGINT)::BIGINT AS n_out_of_order,
        |        max(late_us) AS max_late_us
        |      FROM l GROUP BY 1)
        |SELECT event_type, n_events, n_out_of_order,
        |  n_out_of_order * 1000000 // n_events AS ooo_q6,
        |  p50_late_us, p99_late_us, max_late_us
        |FROM a JOIN p50 USING (event_type) JOIN p99 USING (event_type)""".stripMargin,
    // PSI drift vs the first week: add-one-smoothed 16-bin distributions,
    // 1e6-quantized terms summed exactly
    "q178_value_drift" ->
      """WITH e AS (SELECT ((epoch_us(ts) // 1000000) // 604800) AS week_id,
        |             value FROM events),
        |b AS (SELECT min(value) AS lo, max(value) AS hi,
        |        min(week_id) AS w0 FROM e),
        |c0 AS (SELECT week_id,
        |    least(15, greatest(0, floor((value - lo) /
        |      (CASE WHEN hi = lo THEN 1.0 ELSE hi - lo END) * 16)::BIGINT))
        |      AS bin, count(*)::BIGINT AS c
        |  FROM e, b GROUP BY 1, 2),
        |grid AS (SELECT week_id, bin
        |  FROM (SELECT DISTINCT week_id FROM c0),
        |       (SELECT unnest(range(16)) AS bin)),
        |f AS (SELECT g.week_id, g.bin, coalesce(c0.c, 0)::BIGINT AS c
        |      FROM grid g LEFT JOIN c0
        |        ON g.week_id = c0.week_id AND g.bin = c0.bin),
        |t AS (SELECT week_id, sum(c)::BIGINT AS n FROM f GROUP BY 1),
        |base AS (SELECT bin, c AS cb FROM f, b WHERE week_id = w0),
        |nbs AS (SELECT n AS nbase FROM t, b WHERE week_id = w0),
        |j AS (SELECT f.week_id, t.n, f.c, base.cb, nbs.nbase
        |      FROM f JOIN t USING (week_id) JOIN base USING (bin), nbs),
        |terms AS (SELECT week_id, n,
        |  round(((c + 1)::DOUBLE / (n + 16)::DOUBLE
        |         - (cb + 1)::DOUBLE / (nbase + 16)::DOUBLE)
        |    * ln((c + 1)::DOUBLE / (n + 16)::DOUBLE
        |         / ((cb + 1)::DOUBLE / (nbase + 16)::DOUBLE))
        |    * 1000000.0)::BIGINT AS termq
        |  FROM j)
        |SELECT week_id, max(n) AS n_events, sum(termq)::BIGINT AS psi_q,
        |  sum(termq)::DOUBLE / 1000000.0 AS psi,
        |  sum(termq)::DOUBLE / 1000000.0 > 0.2 AS is_drifted
        |FROM terms GROUP BY 1""".stripMargin,
    // k-anonymity over the (type, weekday, value-bucket) quasi-identifier
    "q179_k_anonymity" ->
      """WITH qi AS (SELECT event_type,
        |    ((((epoch_us(ts) // 1000000) // 86400) + 4) % 7) AS dow,
        |    floor(value / 100.0)::BIGINT AS value_bin
        |  FROM events),
        |g AS (SELECT event_type, dow, value_bin, count(*)::BIGINT AS sz
        |      FROM qi GROUP BY 1, 2, 3)
        |SELECT sum(sz)::BIGINT AS n_rows, count(*)::BIGINT AS n_groups,
        |  min(sz) AS min_group_size,
        |  sum((sz < 5)::BIGINT)::BIGINT AS n_small_groups,
        |  sum(CASE WHEN sz < 5 THEN sz ELSE 0 END)::BIGINT AS n_rows_at_risk,
        |  (sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) * 1000000
        |    // sum(sz))::BIGINT AS risk_q6
        |FROM g""".stripMargin,
    // aHash perceptual near-dup: the stub-decode (q171 byte arithmetic)
    // 8x8 nearest-neighbor sample, bit = px*(h*w) > px_sum exact integer
    // compare, FULL quadratic pair set (the banded Spark join must
    // reproduce it — pigeonhole completeness at Hamming <= 3)
    "q188_phash_neardup" ->
      """WITH f AS (SELECT doc_id, text, length(text)::BIGINT AS n_px,
        |    (n_chars % 64 + 1)::BIGINT AS w FROM documents),
        |g AS (SELECT doc_id, text, n_px, w, (n_px + w - 1) // w AS h,
        |    coalesce(list_sum(list_transform(range(1, n_px::INT + 1),
        |      i -> ascii(substr(text, i::INT, 1)))), 0)::BIGINT AS px_sum
        |  FROM f),
        |fp AS (SELECT doc_id,
        |    coalesce(list_sum(list_transform(range(0, 64), b ->
        |      CASE WHEN
        |        (CASE WHEN ((b // 8) * h // 8) * w + ((b % 8) * w // 8) < n_px
        |              THEN ascii(substr(text,
        |                (((b // 8) * h // 8) * w + ((b % 8) * w // 8) + 1)::INT, 1))
        |              ELSE 0 END) * (h * w) > px_sum
        |      -- bit 63 as its two's-complement value: DuckDB's checked
        |      -- shift rejects 1 << 63, the engine's long wraps to it
        |      THEN (CASE WHEN b = 63 THEN -9223372036854775807 - 1
        |            ELSE (1::BIGINT << b::INT) END)
        |      ELSE 0::BIGINT END)), 0)::BIGINT AS fp
        |  FROM g)
        |SELECT a.doc_id AS x, b.doc_id AS y,
        |  bit_count(xor(a.fp, b.fp))::BIGINT AS dist
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin,
    // per-source DLT priority sample: q114's exact-integer priority with
    // an independent salt, per-source rank and (k+1)-th threshold
    "q189_source_sample" ->
      s"""WITH pri0 AS (SELECT source, doc_id, n_chars AS w,
         |  (${md5Bits32Sql("'gps:' || doc_id::VARCHAR", 1)} + 1) AS h1
         |  FROM documents),
         |pri AS (SELECT source, doc_id, w,
         |  (w::DOUBLE * 4294967296) / h1::DOUBLE AS pri FROM pri0),
         |r AS (SELECT source, doc_id, w, pri,
         |        row_number() OVER (PARTITION BY source
         |          ORDER BY pri DESC, doc_id)::BIGINT AS rank FROM pri),
         |tau AS (SELECT source, pri AS tau FROM r WHERE rank = 21)
         |SELECT r.source, doc_id, w, pri, rank,
         |  greatest(w::DOUBLE, coalesce(tau.tau, 0.0)) AS est_w
         |FROM r LEFT JOIN tau ON r.source = tau.source
         |WHERE rank <= 20""".stripMargin,
    // snapshot diff: keyed latest-value state at T1 = T2 - 30d vs at
    // T2 = newest event, classified added/changed/unchanged per type
    "q190_snapshot_diff" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |             epoch_us(ts) AS ts_us, value FROM events),
        |cut AS (SELECT max(ts_us) - 2592000000000 AS t1 FROM e),
        |r2 AS (SELECT user_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |           ORDER BY ts_us DESC, event_id DESC) AS rn FROM e),
        |s2 AS (SELECT user_id, event_type, value AS v2 FROM r2 WHERE rn = 1),
        |r1 AS (SELECT user_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |           ORDER BY ts_us DESC, event_id DESC) AS rn
        |       FROM e, cut WHERE ts_us <= t1),
        |s1 AS (SELECT user_id, event_type, value AS v1 FROM r1 WHERE rn = 1),
        |cl AS (SELECT s2.event_type, (s1.user_id IS NULL) AS added,
        |         (s1.user_id IS NOT NULL AND s1.v1 <> s2.v2) AS changed
        |       FROM s2 LEFT JOIN s1 ON s2.user_id = s1.user_id
        |                           AND s2.event_type = s1.event_type)
        |SELECT event_type,
        |  sum(added::BIGINT)::BIGINT AS n_added,
        |  sum(changed::BIGINT)::BIGINT AS n_changed,
        |  sum((NOT added AND NOT changed)::BIGINT)::BIGINT AS n_unchanged,
        |  (count(*) - sum(added::BIGINT))::BIGINT AS n_keys_t1,
        |  count(*)::BIGINT AS n_keys_t2,
        |  0::BIGINT AS n_removed,
        |  (CASE WHEN count(*) - sum(added::BIGINT) = 0 THEN 0
        |    ELSE sum(changed::BIGINT) * 1000000
        |      // (count(*) - sum(added::BIGINT)) END)::BIGINT AS changed_q6
        |FROM cl GROUP BY 1""".stripMargin,
    // equi-depth histogram: exact rank under the total (value, event_id)
    // order, bin = (rn-1)*8 div n, per-bin count + exact value bounds
    "q191_equidepth_hist" ->
      """WITH r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type, ((rn - 1) * 8 // n)::BIGINT AS bin,
        |  count(*)::BIGINT AS n_rows, min(value) AS lo, max(value) AS hi
        |FROM r GROUP BY 1, 2""".stripMargin,
    // IVF probe sweep: the q67 trained-quantizer probe path at budgets
    // 1/2/4/8 vs the exact brute top-10 (sentinel budget 0), shared
    // rank tail, per-budget candidate volume and recall@10
    "q192_ivf_probe_sweep" ->
      s"""WITH $embedCtes,
         |${kmeansCentroidCtes(8, 2)},
         |ad AS (SELECT x.vec_id, c.cid, sum((x.e - c.cq) * (x.e - c.cq))::BIGINT AS dist
         |       FROM ex x JOIN c2 c ON x.i = c.i GROUP BY 1, 2),
         |adr AS (SELECT vec_id, cid,
         |          row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |        FROM ad),
         |asg AS (SELECT vec_id, cid FROM adr WHERE rn = 1),
         |qp AS (SELECT vec_id AS q_id, cid, rn::BIGINT AS p_rn
         |       FROM adr WHERE vec_id < 10 AND rn <= 8),
         |cd AS (SELECT qp.q_id, a.vec_id AS n_id, qp.p_rn
         |       FROM qp JOIN asg a ON qp.cid = a.cid AND a.vec_id <> qp.q_id),
         |dots AS (SELECT c.q_id, c.n_id, min(c.p_rn) AS p_rn,
         |           sum(a.e * b.e)::DOUBLE AS dot
         |         FROM cd c JOIN ex a ON a.vec_id = c.q_id
         |                   JOIN ex b ON b.vec_id = c.n_id AND b.i = a.i
         |         GROUP BY 1, 2),
         |bd AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
         |         sum(a.e * b.e)::DOUBLE AS dot
         |       FROM ex a JOIN ex b ON a.i = b.i
         |         AND a.vec_id < 10 AND b.vec_id <> a.vec_id
         |       GROUP BY 1, 2),
         |lv(n_probe) AS (VALUES (1), (2), (4), (8)),
         |allx AS (SELECT 0::BIGINT AS n_probe, q_id, n_id, dot FROM bd
         |         UNION ALL
         |         SELECT lv.n_probe::BIGINT, d.q_id, d.n_id, d.dot
         |         FROM dots d JOIN lv ON d.p_rn <= lv.n_probe),
         |cosx AS (SELECT n_probe, q_id, n_id,
         |           dot / (sqrt(qa.n2) * sqrt(qb.n2)) AS cos
         |         FROM allx JOIN n2 qa ON q_id = qa.vec_id
         |                   JOIN n2 qb ON n_id = qb.vec_id),
         |rk AS (SELECT n_probe, q_id, n_id,
         |         row_number() OVER (PARTITION BY n_probe, q_id
         |           ORDER BY cos DESC, n_id) AS rnk FROM cosx),
         |tk AS (SELECT n_probe, q_id, n_id FROM rk WHERE rnk <= 10),
         |tr AS (SELECT q_id, n_id FROM tk WHERE n_probe = 0),
         |h AS (SELECT tk.n_probe, count(*)::BIGINT AS n_hits
         |      FROM tk JOIN tr ON tk.q_id = tr.q_id AND tk.n_id = tr.n_id
         |      GROUP BY 1),
         |cn AS (SELECT n_probe, count(*)::BIGINT AS n_candidates
         |       FROM allx GROUP BY 1),
         |sc AS (SELECT count(*)::BIGINT AS nv,
         |         sum((vec_id < 10)::BIGINT)::BIGINT AS nq FROM embeddings)
         |SELECT cn.n_probe, n_candidates,
         |  coalesce(n_hits, 0)::BIGINT AS n_hits,
         |  (coalesce(n_hits, 0) * 1000000 // (nq * 10))::BIGINT AS recall_q6,
         |  (n_candidates * 1000000 // (nq * (nv - 1)))::BIGINT AS cand_q6
         |FROM cn LEFT JOIN h ON cn.n_probe = h.n_probe, sc""".stripMargin,
    // compaction plan: the per-type next-fit fold replayed per prefix
    // with a single-BIGINT (file * 2^32 + load) state
    "q193_compaction_plan" ->
      """WITH p AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |             count(*)::BIGINT AS n_rows FROM events GROUP BY 1, 2),
        |a AS (SELECT event_type,
        |        list(day ORDER BY day) AS days,
        |        list(n_rows ORDER BY day) AS arr
        |      FROM p GROUP BY 1),
        |x AS (SELECT event_type, days[i::INT] AS day, arr[i::INT] AS n_rows,
        |        (list_reduce(list_prepend(0::BIGINT, list_slice(arr, 1, i::INT)),
        |          (s, n) -> CASE WHEN (s % 4294967296) + n > 1000
        |                          AND (s % 4294967296) > 0
        |                     THEN ((s // 4294967296) + 1) * 4294967296 + n
        |                     ELSE s + n END) // 4294967296)::BIGINT AS out_file
        |      FROM a, unnest(range(1, len(arr) + 1)) AS t(i)),
        |f AS (SELECT event_type, out_file, count(*)::BIGINT AS file_parts,
        |        sum(n_rows)::BIGINT AS file_rows
        |      FROM x GROUP BY 1, 2)
        |SELECT x.event_type, day, n_rows, x.out_file, file_parts, file_rows
        |FROM x JOIN f ON x.event_type = f.event_type
        |            AND x.out_file = f.out_file""".stripMargin,
    // negative sampling: md5-drawn candidate ranks resolved through the
    // dense vertex rank table, self/edge rejection, first k by draw
    "q194_negative_samples" ->
      s"""WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
         |      FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
         |                         AND a.l_partkey < b.l_partkey
         |      GROUP BY 1, 2 HAVING count(*) >= 2),
         |v AS (SELECT DISTINCT v FROM
         |        (SELECT p1 AS v FROM e UNION ALL SELECT p2 FROM e)),
         |rk AS (SELECT v, row_number() OVER (ORDER BY v)::BIGINT AS r FROM v),
         |n AS (SELECT count(*)::BIGINT AS n FROM v),
         |c AS (SELECT v.v, i AS draw,
         |        (${md5Bits32Sql("'neg:' || v::VARCHAR || ':' || i::VARCHAR", 1)}
         |          % n.n) + 1 AS cr
         |      FROM v, unnest(range(0, 16)) AS t(i), n),
         |cm AS (SELECT c.v, c.draw, rk.v AS neg FROM c JOIN rk ON c.cr = rk.r
         |       WHERE rk.v <> c.v),
         |ne AS (SELECT cm.v, cm.draw, cm.neg FROM cm
         |       WHERE NOT EXISTS (SELECT 1 FROM e
         |         WHERE e.p1 = least(cm.v, cm.neg)
         |           AND e.p2 = greatest(cm.v, cm.neg))),
         |p AS (SELECT v, draw, neg,
         |        row_number() OVER (PARTITION BY v ORDER BY draw)::BIGINT AS rn
         |      FROM ne)
         |SELECT v AS part_id, neg AS neg_id, draw::BIGINT AS draw, rn
         |FROM p WHERE rn <= 5""".stripMargin,
    // epoch plan: q101's sqrt-temperature weights over q176's
    // dedup-adjusted token mass; epochs = weight*budget / effective
    "q195_epoch_plan" ->
      s"""WITH eff AS (SELECT source, effective_tokens
         |             FROM (${effectiveTokensSql(5)})),
         |t AS (SELECT sum(effective_tokens)::BIGINT AS tot FROM eff),
         |w AS (SELECT source, effective_tokens,
         |        round(sqrt(effective_tokens::DOUBLE / tot::DOUBLE)
         |          * 1000000000000.0)::BIGINT AS wq
         |      FROM eff, t),
         |s AS (SELECT sum(wq)::BIGINT AS sw FROM w)
         |SELECT source, effective_tokens,
         |  wq::DOUBLE / sw::DOUBLE AS weight,
         |  (wq::DOUBLE / sw::DOUBLE) * 1000000.0 AS target_tokens,
         |  ((wq::DOUBLE / sw::DOUBLE) * 1000000.0)
         |    / effective_tokens::DOUBLE AS epochs,
         |  (((wq::DOUBLE / sw::DOUBLE) * 1000000.0)
         |    / effective_tokens::DOUBLE > 4.0) AS over_repeated
         |FROM w, s""".stripMargin,
    // HLL set algebra: per-pair union registers (bucket max), the q127
    // estimator on both, inclusion-exclusion intersection, exact audit
    "q196_hll_overlap" -> {
      val lc = sqlLongList(graft.operators.Relational.HllLcTable)
      val estChain = "floor(0.7213 / (1.0 + 1.079 / 256.0) " +
        "* 65536.0 / ((256 - nz)::DOUBLE + snz))::BIGINT"
      s"""WITH h AS (SELECT event_type,
         |  ${md5Bits32Sql("'hll:' || user_id::VARCHAR", 1)} AS h
         |  FROM events),
         |r AS (SELECT event_type, h & 255 AS b,
         |  CASE WHEN (h >> 8) = 0 THEN 25
         |       ELSE 25 - length(bin(h >> 8)) END AS rank FROM h),
         |m AS (SELECT event_type, b, max(rank) AS m_j FROM r GROUP BY 1, 2),
         |tp AS (SELECT DISTINCT event_type FROM events),
         |prs AS (SELECT a.event_type AS ta, b.event_type AS tb
         |        FROM tp a JOIN tp b ON a.event_type < b.event_type),
         |um AS (SELECT ta, tb, b, max(m_j) AS m_j
         |       FROM prs JOIN m ON m.event_type = ta OR m.event_type = tb
         |       GROUP BY 1, 2, 3),
         |us AS (SELECT ta, tb, count(*) AS nz, sum(power(2.0, -m_j)) AS snz
         |       FROM um GROUP BY 1, 2),
         |uu AS (SELECT ta, tb, (256 - nz)::BIGINT AS vz, $estChain AS raw
         |       FROM us),
         |ue AS (SELECT ta, tb, CASE WHEN vz > 0 AND raw <= 640
         |         THEN $lc[vz + 1]::BIGINT ELSE raw END AS est_union FROM uu),
         |s1 AS (SELECT event_type, count(*) AS nz, sum(power(2.0, -m_j)) AS snz
         |       FROM m GROUP BY 1),
         |u1 AS (SELECT event_type, (256 - nz)::BIGINT AS vz, $estChain AS raw
         |       FROM s1),
         |e1 AS (SELECT event_type, CASE WHEN vz > 0 AND raw <= 640
         |         THEN $lc[vz + 1]::BIGINT ELSE raw END AS est FROM u1),
         |du AS (SELECT DISTINCT event_type, user_id FROM events),
         |xi AS (SELECT a.event_type AS ta, b.event_type AS tb,
         |         count(*)::BIGINT AS exact_inter
         |       FROM du a JOIN du b ON a.user_id = b.user_id
         |                          AND a.event_type < b.event_type
         |       GROUP BY 1, 2),
         |xn AS (SELECT event_type, count(*)::BIGINT AS nx FROM du GROUP BY 1)
         |SELECT ue.ta AS type_a, ue.tb AS type_b,
         |  coalesce(xi.exact_inter, 0)::BIGINT AS exact_inter,
         |  (xa.nx + xb.nx - coalesce(xi.exact_inter, 0))::BIGINT AS exact_union,
         |  ea.est AS est_a, eb.est AS est_b, ue.est_union,
         |  greatest(0, ea.est + eb.est - ue.est_union)::BIGINT AS est_inter,
         |  (CASE WHEN ue.est_union > 0
         |    THEN greatest(0, ea.est + eb.est - ue.est_union) * 1000000
         |           // ue.est_union
         |    ELSE 0 END)::BIGINT AS jaccard_q6
         |FROM ue JOIN e1 ea ON ue.ta = ea.event_type
         |        JOIN e1 eb ON ue.tb = eb.event_type
         |        JOIN xn xa ON ue.ta = xa.event_type
         |        JOIN xn xb ON ue.tb = xb.event_type
         |        LEFT JOIN xi ON ue.ta = xi.ta AND ue.tb = xi.tb""".stripMargin
    },
    // split drift: exact per-split length stats with middle-rank picks,
    // 1e6-quantized drift vs the train slice (both engines truncate
    // integer division toward zero, so negative drift matches)
    "q197_split_drift" ->
      s"""WITH sp AS (SELECT doc_id, n_chars,
         |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'validation'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id, n_chars,
         |    ${md5Bits32Sql("'split:' || doc_id::VARCHAR", 1)} % 100 AS b
         |    FROM documents)),
         |c AS (SELECT split, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS tot
         |      FROM sp GROUP BY 1),
         |r AS (SELECT split, n_chars,
         |        row_number() OVER (PARTITION BY split
         |          ORDER BY n_chars, doc_id) AS rn FROM sp),
         |p AS (SELECT r.split,
         |        max(CASE WHEN rn = (50 * n + 99) // 100 THEN n_chars END)::BIGINT
         |          AS p50_chars,
         |        max(CASE WHEN rn = (90 * n + 99) // 100 THEN n_chars END)::BIGINT
         |          AS p90_chars
         |      FROM r JOIN c ON r.split = c.split GROUP BY 1),
         |s AS (SELECT c.split, n AS n_docs, tot::DOUBLE / n::DOUBLE AS mean_chars,
         |        p50_chars, p90_chars
         |      FROM c JOIN p ON c.split = p.split),
         |t AS (SELECT p50_chars AS t_p50, p90_chars AS t_p90 FROM s
         |      WHERE split = 'train')
         |SELECT split, n_docs, mean_chars, p50_chars, p90_chars,
         |  ((p50_chars - t_p50) * 1000000 // t_p50)::BIGINT AS p50_drift_q6,
         |  ((p90_chars - t_p90) * 1000000 // t_p90)::BIGINT AS p90_drift_q6
         |FROM s, t""".stripMargin,
    // span-corruption plan: seed iff md5("span:doc:p") % 8 = 0, spans of
    // 3, overlaps merge; mask geometry is a pure function of (doc, p)
    "q198_span_corruption" -> spanCorruptionSql(8, 3),
    // cluster-size spectrum over the SAME converged labels the q132
    // family replays (star ≡ converged, spec-pinned)
    "q199_cluster_spectrum" -> (dedupLabelCtes(5) +
      s""",
         |sz AS (SELECT label, count(*) AS sz FROM l5 GROUP BY 1)
         |SELECT (length(bin(sz)) - 1)::BIGINT AS bucket,
         |  count(*)::BIGINT AS n_clusters, sum(sz)::BIGINT AS n_docs,
         |  max(sz)::BIGINT AS max_size
         |FROM sz GROUP BY 1""".stripMargin),
    // vocabulary coverage: global top-1000 under (count desc, word) —
    // the q72 rank order — then per-source occurrence/type coverage
    "q200_vocab_coverage" ->
      """WITH tk AS (SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |            FROM documents),
        |wc AS (SELECT w, count(*) AS c FROM tk GROUP BY 1),
        |v AS (SELECT w, row_number() OVER (ORDER BY c DESC, w) AS token_id FROM wc),
        |top AS (SELECT w FROM v WHERE token_id <= 1000)
        |SELECT source, count(*)::BIGINT AS n_occ,
        |  sum(CASE WHEN top.w IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_covered,
        |  count(DISTINCT tk.w)::BIGINT AS n_types,
        |  count(DISTINCT CASE WHEN top.w IS NULL THEN tk.w END)::BIGINT AS n_oov_types,
        |  (sum(CASE WHEN top.w IS NOT NULL THEN 1 ELSE 0 END) * 1000000
        |     // count(*))::BIGINT AS covered_q6,
        |  ((count(*) - sum(CASE WHEN top.w IS NOT NULL THEN 1 ELSE 0 END)) * 1000000
        |     // count(*))::BIGINT AS oov_q6
        |FROM tk LEFT JOIN top ON tk.w = top.w
        |GROUP BY 1""".stripMargin,
    // 7-day sliding actives: the q172 register algebra with a BETWEEN
    // window instead of the cumulative prefix; exact audit beside it
    "q201_sliding_actives" ->
      s"""WITH base AS (SELECT epoch_us(ts) // 86400000000 AS dy, user_id,
         |    ${md5Bits32Sql("'hll:' || user_id::VARCHAR", 1)} AS h
         |  FROM events),
         |r AS (SELECT dy, h & 255 AS b,
         |  CASE WHEN (h >> 8) = 0 THEN 25
         |       ELSE 25 - length(bin(h >> 8)) END AS rank FROM base),
         |m AS (SELECT dy, b, max(rank) AS m_j FROM r GROUP BY 1, 2),
         |days AS (SELECT DISTINCT dy FROM base),
         |w AS (SELECT d.dy AS g_dy, m.b, max(m.m_j) AS m_j
         |      FROM days d JOIN m ON m.dy BETWEEN d.dy - 6 AND d.dy
         |      GROUP BY 1, 2),
         |nd AS (SELECT d.dy AS g_dy, count(DISTINCT m.dy) AS n_days
         |       FROM days d JOIN m ON m.dy BETWEEN d.dy - 6 AND d.dy
         |       GROUP BY 1),
         |s AS (SELECT g_dy, count(*) AS nz, sum(power(2.0, -m_j)) AS snz
         |      FROM w GROUP BY 1),
         |est AS (SELECT g_dy, (256 - nz)::BIGINT AS v_zero,
         |  floor(0.7213 / (1.0 + 1.079 / 256.0)
         |    * 65536.0 / ((256 - nz)::DOUBLE + snz))::BIGINT AS hll_raw
         |  FROM s),
         |du AS (SELECT DISTINCT dy, user_id FROM base),
         |x AS (SELECT d.dy AS g_dy,
         |        count(DISTINCT du.user_id)::BIGINT AS exact_active
         |      FROM days d JOIN du ON du.dy BETWEEN d.dy - 6 AND d.dy
         |      GROUP BY 1)
         |SELECT est.g_dy AS dy, nd.n_days::BIGINT AS n_days, est.v_zero,
         |  est.hll_raw,
         |  CASE WHEN est.v_zero > 0 AND est.hll_raw <= 640
         |       THEN ${sqlLongList(graft.operators.Relational.HllLcTable)}[est.v_zero + 1]::BIGINT
         |       ELSE est.hll_raw END AS hll_est,
         |  x.exact_active
         |FROM est JOIN nd ON est.g_dy = nd.g_dy
         |JOIN x ON est.g_dy = x.g_dy""".stripMargin,
    // deterministic multiplier bootstrap: w = md5("boot:b:doc") mod 3,
    // replicate means as exact integer ratios, min/max spread
    "q202_bootstrap_ci" ->
      s"""WITH reps AS (SELECT source, rep, n_chars,
         |    (${md5Bits32Sql("'boot:' || rep::VARCHAR || ':' || doc_id::VARCHAR", 1)} % 3) AS w
         |  FROM documents, unnest(range(0, 16)) AS t(rep)),
         |agg AS (SELECT source, rep, sum(w * n_chars) AS swx, sum(w) AS sw
         |        FROM reps GROUP BY 1, 2),
         |rm AS (SELECT source, rep,
         |        CASE WHEN sw > 0 THEN (swx * 1000000) // sw END AS rep_mean_q6
         |      FROM agg),
         |base AS (SELECT source, count(*)::BIGINT AS n_docs,
         |        (sum(n_chars) * 1000000 // count(*))::BIGINT AS mean_q6
         |      FROM documents GROUP BY 1)
         |SELECT rm.source, base.n_docs, base.mean_q6,
         |  count(rep_mean_q6)::BIGINT AS n_reps,
         |  min(rep_mean_q6)::BIGINT AS boot_lo_q6,
         |  max(rep_mean_q6)::BIGINT AS boot_hi_q6,
         |  (max(rep_mean_q6) - min(rep_mean_q6))::BIGINT AS boot_spread_q6
         |FROM rm JOIN base USING (source)
         |GROUP BY 1, 2, 3""".stripMargin,
    // Fisher separation: exact integer sums/squares, then the identical
    // short double chain (single divisions) in both engines
    "q203_fisher_separation" ->
      """WITH ex AS (SELECT vec_id, label,
        |    round(unnest(embedding)::DOUBLE * 10000000)::BIGINT AS v,
        |    unnest(range(len(embedding))) AS i FROM embeddings),
        |nn AS (SELECT count(*) AS n FROM embeddings),
        |nl AS (SELECT label, count(DISTINCT vec_id) AS n_l FROM ex GROUP BY 1),
        |sli AS (SELECT label, i, sum(v)::BIGINT AS s_li FROM ex GROUP BY 1, 2),
        |si AS (SELECT i, sum(s_li)::BIGINT AS s_i FROM sli GROUP BY 1),
        |dotl AS (SELECT label, sum(v::HUGEINT * v::HUGEINT) AS sumdot_l
        |         FROM ex GROUP BY 1),
        |agg AS (SELECT label, nl.n_l,
        |    sum(((s_li * nn.n - s_i * nl.n_l)::HUGEINT)
        |        * ((s_li * nn.n - s_i * nl.n_l)::HUGEINT)) AS b_num,
        |    sum(s_li::HUGEINT * s_li::HUGEINT) AS ssq_l
        |  FROM sli JOIN si USING (i) JOIN nl USING (label), nn
        |  GROUP BY 1, 2),
        |fin AS (SELECT agg.label, agg.n_l AS n,
        |    b_num::DOUBLE / (agg.n_l * nn.n * nn.n)::DOUBLE AS between_ms,
        |    (sumdot_l::DOUBLE - (ssq_l::DOUBLE / agg.n_l::DOUBLE)) AS within_ss
        |  FROM agg JOIN dotl USING (label), nn)
        |SELECT label, n::BIGINT AS n, between_ms, within_ss,
        |  CASE WHEN within_ss > 0.0
        |       THEN round(((between_ms / within_ss) * n::DOUBLE) * 1000000.0)::BIGINT
        |       ELSE 0 END AS fisher_q6
        |FROM fin""".stripMargin,
  )

  /** q198's oracle: the identical seed/mask/island derivation over
    * DuckDB list lambdas — seed array, bounded-lookback mask array,
    * island starts; mirrors Text.spanCorruptionPlan exactly.
    */
  private def spanCorruptionSql(density: Int, spanLen: Int): String = {
    val lookback = (0 until spanLen).map { k =>
      if (k == 0) "seed[p]"
      else s"CASE WHEN p > $k THEN seed[p - $k] ELSE 0 END"
    }.mkString("greatest(", ", ", ")")
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws
       |           FROM documents),
       |b AS (SELECT doc_id, len(ws) AS n,
       |  list_transform(range(1, len(ws) + 1), p ->
       |    CASE WHEN (${md5Bits32Sql("'span:' || doc_id::VARCHAR || ':' || p::VARCHAR", 1)})
       |           % $density = 0 THEN 1 ELSE 0 END) AS seed
       |  FROM t),
       |m AS (SELECT doc_id, n,
       |  list_transform(range(1, n + 1), p -> $lookback) AS mk
       |  FROM b)
       |SELECT doc_id, n::BIGINT AS n_tokens,
       |  list_sum(list_transform(range(1, n + 1), p ->
       |    CASE WHEN mk[p] = 1 AND (p = 1 OR mk[p - 1] = 0)
       |         THEN 1 ELSE 0 END))::BIGINT AS n_spans,
       |  list_sum(mk)::BIGINT AS n_masked,
       |  (list_sum(mk) * 1000000 // n)::BIGINT AS mask_q6
       |FROM m""".stripMargin
  }

  /** q126's oracle: the deterministic sync-LPA trajectory unrolled —
    * per sweep, neighbor-label counts then the (c DESC, lbl ASC) argmax,
    * mirroring Graph.labelPropagation sweep for sweep.
    */
  /** Shared CTE chain for the label-propagation trajectory: the edge
    * list `e`, the symmetric neighbor list `nb`, and labels l0..l{rounds}
    * — reused verbatim by the q126 oracle and the q204 modularity oracle
    * so the two replays can never diverge.
    */
  private def labelPropagationCtes(rounds: Int): String = {
    val stages = (1 to rounds).map { t =>
      s""",
         |l$t AS MATERIALIZED (SELECT v, lbl FROM (
         |  SELECT v, lbl, c, row_number() OVER (PARTITION BY v
         |    ORDER BY c DESC, lbl) AS rn
         |  FROM (SELECT nb.v, l${t - 1}.lbl, count(*) AS c
         |        FROM nb JOIN l${t - 1} ON nb.u = l${t - 1}.v GROUP BY 1, 2))
         |  WHERE rn = 1)""".stripMargin
    }.mkString
    s"""e AS MATERIALIZED (
       |  WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
       |  SELECT p1, p2 FROM (
       |    SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS cnt
       |    FROM pp a JOIN pp b
       |      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |    GROUP BY 1, 2) WHERE cnt >= 2),
       |nb AS MATERIALIZED (
       |  SELECT p1 AS v, p2 AS u FROM e UNION ALL SELECT p2, p1 FROM e),
       |l0 AS (SELECT DISTINCT v, v AS lbl FROM nb)$stages""".stripMargin
  }

  /** q218's oracle: the q18 feature CTE quantized to 1e6 integers, one
    * wide HUGEINT-sum aggregate, six UNION ALL rows assembled from it
    * (generated per pair so the Spark/SQL pair lists can never drift).
    */
  private lazy val signalCorrSql: String = {
    val feats = Seq("alpha", "len", "mtl", "stop")
    val featSums = feats.flatMap(f => Seq(
      s"sum(q_$f::HUGEINT) AS s_$f",
      s"sum((q_$f * q_$f)::HUGEINT) AS ss_$f")).mkString(",\n|  ")
    val pairSums = (for { a <- feats; b <- feats if a < b }
      yield s"sum((q_$a * q_$b)::HUGEINT) AS sp_${a}_$b").mkString(",\n|  ")
    val blocks = (for { a <- feats; b <- feats if a < b } yield
      s"""SELECT '$a' AS feat_a, '$b' AS feat_b, n::BIGINT AS n,
         |  CASE WHEN (n * ss_$a - s_$a * s_$a) > 0
         |        AND (n * ss_$b - s_$b * s_$b) > 0
         |    THEN (n * sp_${a}_$b - s_$a * s_$b)::DOUBLE
         |      / (sqrt((n * ss_$a - s_$a * s_$a)::DOUBLE)
         |         * sqrt((n * ss_$b - s_$b * s_$b)::DOUBLE))
         |    ELSE 0.0 END AS corr
         |FROM g""").mkString("\n|UNION ALL\n|")
    s"""WITH t AS (SELECT doc_id, n_chars,
       |    regexp_split_to_array(lower(text), '\\s+') AS ws FROM documents),
       |s AS (SELECT doc_id, n_chars, len(ws)::BIGINT AS n_tokens,
       |  len(list_filter(ws, x -> list_contains($stopList, x)))::BIGINT AS n_stop,
       |  len(list_filter(ws, x -> regexp_full_match(x, '[a-z]+')))::BIGINT AS n_alpha,
       |  list_sum(list_transform(ws, x -> strlen(x)))::BIGINT AS sum_tok_len
       |  FROM t),
       |q AS (SELECT
       |  round(n_alpha::DOUBLE / n_tokens * 1000000.0)::BIGINT AS q_alpha,
       |  n_chars::BIGINT AS q_len,
       |  round(sum_tok_len::DOUBLE / n_tokens * 1000000.0)::BIGINT AS q_mtl,
       |  round(n_stop::DOUBLE / n_tokens * 1000000.0)::BIGINT AS q_stop
       |  FROM s),
       |g AS (SELECT count(*)::HUGEINT AS n,
       |  $featSums,
       |  $pairSums
       |  FROM q)
       |$blocks""".stripMargin
  }

  private def labelPropagationSql(rounds: Int): String =
    s"""WITH ${labelPropagationCtes(rounds)}
       |SELECT v AS partkey, lbl AS community FROM l$rounds""".stripMargin

  /** q204's oracle: the identical label trajectory, then per community
    * exact member/degree/intra-edge counts and the same two-division
    * double chain for the modularity contribution.
    */
  private def modularitySql(rounds: Int): String =
    s"""WITH ${labelPropagationCtes(rounds)},
       |lbl AS (SELECT v, lbl AS community FROM l$rounds),
       |m AS (SELECT count(*)::BIGINT AS m FROM e),
       |deg AS (SELECT v, count(*)::BIGINT AS deg FROM nb GROUP BY 1),
       |perc AS (SELECT community, count(*)::BIGINT AS n_vertices,
       |    sum(deg)::BIGINT AS degree_sum
       |  FROM deg JOIN lbl USING (v) GROUP BY 1),
       |intra AS (SELECT c1.community, count(*)::BIGINT AS intra_edges
       |  FROM e JOIN lbl c1 ON e.p1 = c1.v JOIN lbl c2 ON e.p2 = c2.v
       |  WHERE c1.community = c2.community GROUP BY 1)
       |SELECT perc.community, n_vertices, degree_sum,
       |  coalesce(intra_edges, 0)::BIGINT AS intra_edges,
       |  round((coalesce(intra_edges, 0)::DOUBLE / m::DOUBLE
       |    - (degree_sum::DOUBLE / (2 * m)::DOUBLE)
       |      * (degree_sum::DOUBLE / (2 * m)::DOUBLE))
       |    * 1000000.0)::BIGINT AS contrib_q6
       |FROM perc LEFT JOIN intra ON perc.community = intra.community, m""".stripMargin

  /** q119's oracle: the power-iteration trajectory unrolled — per step,
    * the projection Xv as exact BIGINT dots, the backprojection XᵀXv as
    * exact HUGEINT sums (mirroring Spark's DECIMAL(38,0)), then the one
    * FP step (norm + rescale of the d-vector) as an ORDER BY i left fold
    * — `list_reduce` is a sequential fold, matching the Scala
    * `reduceLeft` — and HALF_UP rounding back to 1e6 longs.
    */
  private def powerIterationSql(iters: Int): String = {
    val v0 = "v0 AS (SELECT DISTINCT i, 1000000::BIGINT AS vq FROM ex)"
    val steps = (1 to iters).map { t =>
      s""",
         |dv$t AS (SELECT vec_id, sum(e * vq)::BIGINT AS dv
         |         FROM ex JOIN v${t - 1} USING (i) GROUP BY 1),
         |u$t AS (SELECT i, sum(e::HUGEINT * dv) AS u
         |        FROM ex JOIN dv$t USING (vec_id) GROUP BY 1),
         |nr$t AS (SELECT sqrt(list_reduce(list_transform(
         |           list(u::DOUBLE ORDER BY i), x -> x * x),
         |           (a, b) -> a + b)) AS nrm FROM u$t),
         |v$t AS (SELECT i, round(u::DOUBLE / nrm * 1000000.0)::BIGINT AS vq
         |        FROM u$t, nr$t)""".stripMargin
    }.mkString
    s"""WITH $embedCtes,
       |$v0$steps
       |SELECT i::BIGINT AS dim, vq, vq::DOUBLE / 1000000.0 AS v
       |FROM v$iters""".stripMargin
  }

  /** q112's oracle: the degree peel unrolled to a fixed `stages` chain of
    * MATERIALIZED CTEs (DuckDB inlines plain CTEs at every use site, so
    * an unmaterialized 16-deep chain re-expands the lineitem scan
    * exponentially — "too many open files"). KCoreSpec pins that the
    * sf0.01 fixture reaches its fixpoint in 11 rounds < 16, so the
    * truncated unroll equals the converged result the Spark side emits.
    */
  private def kCoreSql(k: Int, stages: Int): String = {
    val base =
      """e0 AS MATERIALIZED (
        |  WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |  SELECT p1, p2 FROM (
        |    SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS cnt
        |    FROM pp a JOIN pp b
        |      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |    GROUP BY 1, 2) WHERE cnt >= 2)""".stripMargin
    val stageCtes = (0 until stages).flatMap { i =>
      Seq(
        s"""k$i AS MATERIALIZED (SELECT id FROM (
           |  SELECT id, count(*) AS deg FROM (
           |    SELECT p1 AS id FROM e$i UNION ALL SELECT p2 FROM e$i) GROUP BY 1)
           |  WHERE deg >= $k)""".stripMargin,
        s"""e${i + 1} AS MATERIALIZED (SELECT p1, p2 FROM e$i
           |  WHERE p1 IN (SELECT id FROM k$i) AND p2 IN (SELECT id FROM k$i))""".stripMargin)
    }
    (base +: stageCtes).mkString("WITH ", ",\n", "") +
      s"""
         |SELECT id AS partkey, count(*)::BIGINT AS core_deg FROM (
         |  SELECT p1 AS id FROM e$stages UNION ALL SELECT p2 FROM e$stages)
         |GROUP BY 1""".stripMargin
  }
}
