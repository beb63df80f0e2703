package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory
  * each entry corresponds to. Column names in `queries` results and
  * `oracleSql` are aliased identically (the driver sorts columns by
  * name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> Relational.q1Agg _,
    "q3_join" -> Relational.q3Join _,
    "q_window_running" -> Relational.windowRunning _,
    "etl_split_explode" -> Analytics.etlSplitExplode _,
    "etl_dim_tokens" -> Analytics.etlDimTokens _,
    "etl_bridge" -> Analytics.etlBridge _,
    "etl_nsplit" -> Analytics.etlNsplit _,
    "etl_gender" -> Analytics.etlGender _,
    "validate_orphan_orders" -> Analytics.validateOrphanOrders _,
    "validate_orphan_customers" -> Analytics.validateOrphanCustomers _,
    "analytics_top_token" -> ((s, d) => Analytics.topToken(s, d, "female")),
    "analytics_top_token_male" -> ((s, d) => Analytics.topToken(s, d, "male")),
    "analytics_top_token_unknown" -> ((s, d) => Analytics.topToken(s, d, "unknown")),
    "analytics_longest_gap" -> Analytics.longestGap _,
    "analytics_month_histogram" -> Analytics.monthHistogram _,
    "analytics_yoy_growth" -> Analytics.yoyGrowth _,
    "analytics_cooccurrence" -> Analytics.cooccurrence _,
    "events_json_extract" -> Events.jsonExtract _,
    "events_sessionize" -> Events.sessionize _,
    "events_session_window" -> Events.sessionWindows _,
    "events_hourly_rollup" -> Events.hourlyRollup _,
    "events_asof_signup" -> AsOfJoin.eventsAsOfSignup _,
    "events_range_follow" -> RangeJoin.errorsAfterSignup _,
    "dedup_exact" -> Dedup.exact _,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardPairs _,
    "dedup_ngram_containment" -> ((s, d) => Dedup.containmentPairs(s, d)),
    "dedup_ngram_prefix" -> ((s, d) => Dedup.ngramJaccardPairsPrefix(s, d)),
    "dedup_minhash" -> ((s, d) => MinHashLSH.nearDuplicates(s, d)),
    "dedup_simhash" -> ((s, d) => SimHash.nearDuplicates(s, d)),
    "dedup_embedding_cosine" -> ((s, d) => Similarity.embeddingDedup(s, d)),
    "dedup_embedding_lsh" -> ((s, d) => Similarity.embeddingDedupLsh(s, d)),
    "sim_bruteforce_topk" -> ((s, d) => Similarity.bruteforceTopK(s, d)),
    "sim_lsh_topk" -> ((s, d) => Similarity.lshTopK(s, d)),
    "text_langid" -> TextAnalysis.langId _,
    "text_quality" -> TextAnalysis.quality _,
    "text_clean" -> TextAnalysis.clean _,
    "text_repetition" -> TextAnalysis.repetition _,
    "text_tokens" -> TextAnalysis.tokenCounts _,
    "text_fingerprint" -> TextAnalysis.fingerprint _,
    "text_rolling_fingerprint" -> TextAnalysis.rollingFingerprint _,
    "multimodal_features" -> Multimodal.features _,
    "multimodal_frames" -> ((s, d) => Multimodal.frameSample(s, d)),
    "dedup_ngram_clusters" -> Dedup.ngramJaccardClusters _,
    "sim_ivf_topk" -> ((s, d) => Similarity.ivfTopK(s, d)),
    "sim_pq_topk" -> ((s, d) => Similarity.pqTopK(s, d, rerank = 50)),
    "sim_ivfpq_topk" -> ((s, d) => Similarity.ivfPqTopK(s, d)),
    "sql_passthrough" -> SqlInterface.passthrough _,
    "olap_rollup" -> Olap.rollupOrders _,
    "olap_pivot" -> Olap.pivotEvents _,
    "olap_window_ranks" -> Olap.supplierRanks _,
    "olap_stats_summary" -> Olap.statsSummary _,
    "profile_documents" -> Profile.profileDocuments _,
    "sample_hash_docs" -> Sampling.sampleDocs _,
    "sample_stratified_docs" -> Sampling.sampleStratified _,
    "pack_sequences" -> ((s, d) => Packing.packSequences(s, d)),
    "text_chunks" -> ((s, d) => Chunking.chunkGate(s, d)),
    "decontaminate" -> ((s, d) => Decontaminate.contaminated(s, d)),
    "decontaminate_clean" -> ((s, d) => Decontaminate.cleaned(s, d)),
    "text_pii" -> Pii.piiRedact _,
    "text_gopher_filter" -> Curation.gopherFilter _,
    "text_quality_model" -> QualityModel.scoreDocuments _,
    "text_vocabulary" -> ((s, d) => Search.vocabulary(s, d)),
    "search_bm25" -> ((s, d) => Search.bm25TopK(s, d)),
    "search_keywords" -> ((s, d) => Search.docKeywords(s, d)),
    "sample_mixture" -> ((s, d) => Sampling.sampleMixture(s, d)),
    "sample_token_budget" -> ((s, d) => Sampling.sampleTokenBudget(s, d)),
    "sample_token_budget_rate" -> ((s, d) => Sampling.sampleTokenBudgetRate(s, d)),
    "sample_quota_docs" -> ((s, d) => Sampling.sampleQuotaDocs(s, d)),
    "dedup_semantic" -> ((s, d) => SemDedup.semanticDedup(s, d)),
    "dedup_minhash_incremental" -> MinHashLSH.incrementalGate _,
    "dedup_spans" -> Spans.spanDedup _,
    "overlap_sources" -> Spans.sourceOverlap _,
    "text_quantile_cut" -> Curation.quantileCut _,
    "text_quantile_cut_lang" -> Curation.quantileCutByLang _,
    "lake_zorder_read" -> ((s, d) => Lake.zorderRead(s, d)),
    "lake_time_travel" -> ((s, d) => Lake.timeTravelRead(s, d)),
    "source_jsonl" -> ((s, d) => Interchange.jsonlRead(s, d)),
    "source_orc" -> ((s, d) => Interchange.orcRead(s, d)),
    "lake_delete" -> ((s, d) => Lake.deleteRead(s, d)),
    "lake_incremental" -> ((s, d) => Lake.incrementalRead(s, d)),
  )

  /** DuckDB-equivalent ANSI SQL per query (same parquet tables,
    * registered as views by the driver). Omitted keys get a weaker
    * rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1AggSql,
    "q3_join" -> Relational.q3JoinSql,
    "q_window_running" -> Relational.windowRunningSql,
    "etl_split_explode" -> Analytics.etlSplitExplodeSql,
    "etl_dim_tokens" -> Analytics.etlDimTokensSql,
    "etl_bridge" -> Analytics.etlBridgeSql,
    "etl_nsplit" -> Analytics.etlNsplitSql,
    "etl_gender" -> Analytics.etlGenderSql,
    "validate_orphan_orders" -> Analytics.validateOrphanOrdersSql,
    "validate_orphan_customers" -> Analytics.validateOrphanCustomersSql,
    "analytics_top_token" -> Analytics.topTokenSql("female"),
    "analytics_top_token_male" -> Analytics.topTokenSql("male"),
    "analytics_top_token_unknown" -> Analytics.topTokenSql("unknown"),
    "analytics_longest_gap" -> Analytics.longestGapSql,
    "analytics_month_histogram" -> Analytics.monthHistogramSql,
    "analytics_yoy_growth" -> Analytics.yoyGrowthSql,
    "analytics_cooccurrence" -> Analytics.cooccurrenceSql,
    "events_json_extract" -> Events.jsonExtractSql,
    "events_sessionize" -> Events.sessionizeSql,
    "events_session_window" -> Events.sessionWindowsSql,
    "events_hourly_rollup" -> Events.hourlyRollupSql,
    "events_asof_signup" -> AsOfJoin.eventsAsOfSignupSql,
    "events_range_follow" -> RangeJoin.errorsAfterSignupSql,
    "dedup_exact" -> Dedup.exactSql,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardPairsSql,
    "dedup_ngram_containment" -> Dedup.containmentPairsSql,
    // prefix filter is lossless, so it shares the unfiltered oracle
    "dedup_ngram_prefix" -> Dedup.ngramJaccardPairsSql,
    // the LSH/hash-family gates are exact: the hash families are
    // md5-derived (minhash/simhash) or literal hyperplanes with
    // IEEE-identical fold semantics (embedding LSH / IVF), so DuckDB
    // re-derives each full pipeline value-for-value.
    "dedup_minhash" -> MinHashLSH.nearDuplicatesSql,
    "dedup_simhash" -> SimHash.nearDuplicatesSql,
    "dedup_embedding_cosine" -> Similarity.embeddingDedupSql(),
    "dedup_embedding_lsh" -> Similarity.embeddingDedupLshSql(),
    "sim_bruteforce_topk" -> Similarity.bruteforceTopKSql(),
    "sim_lsh_topk" -> Similarity.lshTopKSql(),
    "sim_ivf_topk" -> Similarity.ivfTopKSql(),
    "sim_pq_topk" -> Similarity.pqTopKSql(rerank = 50),
    "sim_ivfpq_topk" -> Similarity.ivfPqTopKSql(),
    "text_langid" -> TextAnalysis.langIdSql,
    "text_quality" -> TextAnalysis.qualitySql,
    "text_clean" -> TextAnalysis.cleanSql,
    "text_repetition" -> TextAnalysis.repetitionSql,
    "text_tokens" -> TextAnalysis.tokenCountsSql,
    "text_fingerprint" -> TextAnalysis.fingerprintSql,
    "text_rolling_fingerprint" -> TextAnalysis.rollingFingerprintSql,
    "multimodal_features" -> Multimodal.featuresSql,
    "multimodal_frames" -> Multimodal.frameSampleSql(),
    "dedup_ngram_clusters" -> Dedup.ngramJaccardClustersSql,
    // sql_passthrough: the SAME SQL string runs on both engines.
    "sql_passthrough" -> SqlInterface.passthroughSql,
    "olap_rollup" -> Olap.rollupOrdersSql,
    "olap_pivot" -> Olap.pivotEventsSql,
    "olap_window_ranks" -> Olap.supplierRanksSql,
    "olap_stats_summary" -> Olap.statsSummarySql,
    "profile_documents" -> Profile.profileDocumentsSql,
    "sample_hash_docs" -> Sampling.sampleDocsSql,
    "sample_stratified_docs" -> Sampling.sampleStratifiedSql,
    "pack_sequences" -> Packing.packSequencesSql,
    "text_chunks" -> Chunking.chunkGateSql(),
    "decontaminate" -> Decontaminate.contaminatedSql(),
    "decontaminate_clean" -> Decontaminate.cleanedSql(),
    "text_pii" -> Pii.piiRedactSql,
    "text_gopher_filter" -> Curation.gopherFilterSql,
    "text_quality_model" -> QualityModel.scoreDocumentsSql,
    "text_vocabulary" -> Search.vocabularySql(),
    "search_bm25" -> Search.bm25TopKSql(),
    "search_keywords" -> Search.docKeywordsSql(),
    "sample_mixture" -> Sampling.sampleMixtureSql(),
    "sample_token_budget" -> Sampling.sampleTokenBudgetSql(),
    "sample_token_budget_rate" -> Sampling.sampleTokenBudgetRateSql(),
    "sample_quota_docs" -> Sampling.sampleQuotaDocsSql(),
    "dedup_semantic" -> SemDedup.semanticDedupSql(),
    "dedup_minhash_incremental" -> MinHashLSH.incrementalGateSql,
    "dedup_spans" -> Spans.spanDedupSql,
    "overlap_sources" -> Spans.sourceOverlapSql,
    "text_quantile_cut" -> Curation.quantileCutSql,
    "text_quantile_cut_lang" -> Curation.quantileCutByLangSql,
    // layout-independent result: the clustered write + zone-map
    // skipping read must return exactly what a plain filter does
    "lake_zorder_read" -> Lake.zorderReadSql(),
    // a version snapshot is definitionally the filter that built it;
    // the gate pins that later appends don't leak into old versions
    "lake_time_travel" -> Lake.timeTravelReadSql(),
    // format round trips: the result is format-independent, so a
    // plain filter oracle gates write -> schema'd read -> filter
    "source_jsonl" -> Interchange.jsonlReadSql(),
    "source_orc" -> Interchange.orcReadSql(),
    // copy-on-write delete and append-chain incremental read are
    // layout-independent: complement / band filters gate them
    "lake_delete" -> Lake.deleteReadSql(),
    "lake_incremental" -> Lake.incrementalReadSql,
  )
}
