package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.LakeQueries
import graft.ingest.{IngestQueries, SchemaDiscovery}
import graft.ops.{Decontaminate, DedupQueries, ExactSubstr, Multimodal, Skew, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Parity rules (SURVEY §4): every computed column aliased identically in
  * Spark and oracle SQL; double aggregates rounded in both; integer sums
  * cast back to BIGINT in DuckDB (whose SUM(BIGINT) widens to HUGEINT);
  * timestamps only ever output as formatted strings.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    LakeQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.A lake analytics core
    "q1_pricing_summary" -> (LakeQueries.q1PricingSummary _),
    "q2_revenue_filter" -> (LakeQueries.q2RevenueFilter _),
    "q3_shipping_priority" -> (LakeQueries.q3ShippingPriority _),
    "q4_order_priority" -> (LakeQueries.q4OrderPriority _),
    "q5_region_volume" -> (LakeQueries.q5RegionVolume _),
    "q6_top_customers" -> (LakeQueries.q6TopCustomers _),
    "q7_rollup_sales" -> (LakeQueries.q7RollupSales _),
    "q8_distinct_stats" -> (LakeQueries.q8DistinctStats _),
    // rows-only: HLL sketch estimates are engine-specific
    "q8_distinct_approx" -> (LakeQueries.q8DistinctApprox _),
    "q9_cust_no_orders" -> (LakeQueries.q9CustNoOrders _),
    "q10_event_gaps" -> (LakeQueries.q10EventGaps _),
    "q11_json_props" -> (LakeQueries.q11JsonProps _),
    // Tukey-fence value-anomaly card per event type (IRREGULAR for values)
    "q38_event_anomaly" -> (LakeQueries.q38EventAnomaly _),
    // rows-only: GK-sketch face of the anomaly card (AnomalyApproxSpec bounds drift)
    "q38_event_anomaly_approx" -> (LakeQueries.q38EventAnomalyApprox _),
    // day-over-trailing-median volume monitor (the VOLUME companion to A39)
    "q39_volume_spike" -> (LakeQueries.q39VolumeSpike _),
    "q12_promo_revenue" -> (LakeQueries.q12PromoRevenue _),
    "q13_event_pivot" -> (LakeQueries.q13EventPivot _),
    "q14_top_supplier" -> (LakeQueries.q14TopSupplier _),
    "q15_part_supplier_counts" -> (LakeQueries.q15PartSupplierCounts _),
    "q16_large_orders" -> (LakeQueries.q16LargeOrders _),
    "q17_funnel" -> (LakeQueries.q17Funnel _),
    "q18_revenue_deciles" -> (LakeQueries.q18RevenueDeciles _),
    // rows-only: GK-sketch cutpoints are engine-specific (the scale face)
    "q18_revenue_deciles_approx" -> (LakeQueries.q18RevenueDecilesApprox _),
    "q19_retention" -> (LakeQueries.q19Retention _),
    "q20_prospects" -> (LakeQueries.q20Prospects _),
    "q21_waiting_supplier" -> (LakeQueries.q21WaitingSupplier _),
    "q22_dominant_supplier" -> (LakeQueries.q22DominantSupplier _),
    "q23_small_order_revenue" -> (LakeQueries.q23SmallOrderRevenue _),
    // rows-only: DataSketches HLL binaries/estimates are engine-specific
    "sketch_uniques_rollup" -> (LakeQueries.sketchUniquesRollup _),
    "q24_trailing_revenue" -> (LakeQueries.q24TrailingRevenue _),
    "q25_cube_revenue" -> (LakeQueries.q25CubeRevenue _),
    // TPC-H Q19 shape: disjunctive predicate groups, per-branch revenue
    "q26_disjunctive_revenue" -> (LakeQueries.q26DisjunctiveRevenue _),
    // TPC-H Q7 shape: one dim joined in two roles, cross-border predicate
    "q27_trade_volume" -> (LakeQueries.q27TradeVolume _),
    // TPC-H Q8 shape: part-pruned two-role join, share-of-market window
    "q28_market_share" -> (LakeQueries.q28MarketShare _),
    // TPC-H Q9 shape: two-money-term profit arithmetic per nation/year
    "q29_product_profit" -> (LakeQueries.q29ProductProfit _),
    // TPC-H Q10 shape: returned-item revenue top-20
    "q30_returned_revenue" -> (LakeQueries.q30ReturnedRevenue _),
    // TPC-H Q13 shape: customer order-count distribution (left join, 0 bucket)
    "q31_cust_distribution" -> (LakeQueries.q31CustDistribution _),
    // TPC-H Q11 shape: HAVING against a scalar subquery over the same agg
    "q32_value_share" -> (LakeQueries.q32ValueShare _),
    // TPC-H Q2 shape: correlated-min offer selection per part
    "q33_min_cost_supplier" -> (LakeQueries.q33MinCostSupplier _),
    // user-acquisition curve: first-seen day + cumulative new users
    "q34_new_users" -> (LakeQueries.q34NewUsers _),
    // 30-min-gap batch sessionization: per-day session card
    "q35_sessions" -> (LakeQueries.q35Sessions _),
    // TPC-H Q12 shape: late shipments split urgent/other per ship year
    "q36_late_shipments" -> (LakeQueries.q36LateShipments _),
    // mixed-granularity GROUPING SETS: nation x yr + region x yr, one pass
    "q37_grouping_sets" -> (LakeQueries.q37GroupingSets _),
    // §2.B ingestion semantics
    "ingest_typecast" -> (IngestQueries.ingestTypecast _),
    "ingest_filename_route" -> (IngestQueries.ingestFilenameRoute _),
    "ingest_ledger_diff" -> (IngestQueries.ingestLedgerDiff _),
    "ingest_watermark_append" -> (IngestQueries.ingestWatermarkAppend _),
    "ingest_failure_classify" -> (IngestQueries.ingestFailureClassify _),
    "ingest_failure_ledger" -> (IngestQueries.ingestFailureLedger _),
    "ingest_schema_merge" -> (IngestQueries.ingestSchemaMerge _),
    "ingest_partition_derive" -> (IngestQueries.ingestPartitionDerive _),
    "sync_zone_diff" -> (IngestQueries.syncZoneDiff _),
    // data expectations: pk/fk/domain checks over a planted landed batch
    "meta_expectations" -> (IngestQueries.metaExpectations _),
    // CDC upsert: MERGE INTO as keyed window + one full-outer equi-join
    "ingest_upsert" -> (IngestQueries.ingestUpsert _),
    "meta_schema_discovery" -> (SchemaDiscovery.metaSchemaDiscovery _),
    "meta_ddl_export" -> (SchemaDiscovery.metaDdlExport _),
    // B14: schema drift vs a re-crawl with planted contract breaks;
    // hash-checked (type_old from DuckDB's own introspection) and
    // SchemaDiscoverySpec proves real two-zone evolution diffs
    "meta_schema_drift" -> (SchemaDiscovery.metaSchemaDrift _),
    // B15: per-partition file-health report over a planted fragmented
    // zone (the measure-then-compact card) — SQL-checked since round 11:
    // the planted layout is a deterministic function of the events day
    // counts, so DuckDB replays files/bytes/avg/flag exactly
    "meta_partition_health" -> (graft.ingest.PartitionHealth.metaPartitionHealth _),
    // one-scan multi-distinct profile unpivoted via stack
    "meta_profile" -> (graft.ingest.Profile.metaProfile _),
    // §2.C LLM-training-data pipeline
    "dedup_exact" -> (TextQueries.dedupExact _),
    "text_langid" -> (TextQueries.textLangid _),
    "text_quality" -> (TextQueries.textQuality _),
    "quality_percentile" -> (TextQueries.qualityPercentile _),
    "text_tfidf" -> (TextQueries.textTfidf _),
    "ngram_counts" -> (TextQueries.ngramCounts _),
    "text_contamination" -> (TextQueries.textContamination _),
    "text_containment" -> (TextQueries.textContainment _),
    // per-benchmark-item leakage rollup (the eval owner's report)
    "contamination_items" -> (TextQueries.contaminationItems _),
    // GK sketch in its exact regime at gate SF (= quantile_disc oracle)
    "quality_percentile_approx" -> (TextQueries.qualityPercentileApprox _),
    "text_tokens" -> (TextQueries.textTokens _),
    "text_repetition" -> (TextQueries.textRepetition _),
    "text_redact" -> (TextQueries.textRedact _),
    // C101: explicit-wordlist gate (fraction-based blocklist share)
    "text_blocklist" -> ((s: SparkSession, d: String) =>
      TextQueries.textBlocklist(s, d)),
    // C102: unigram-LM (SentencePiece-family) tokenizer fit —
    // SQL-checked since round 11: the learned segmentation exported as
    // data (SegsPath); the oracle replays the histogram, the join
    // totality, and the integer-bp card (UnigramLmSpec additionally
    // proves the fit equal to a driver reference, piece for piece)
    "text_unigram_lm" -> (graft.ops.UnigramLm.textUnigramLm _),
    "text_fingerprint" -> (TextQueries.textFingerprint _),
    // sliding token windows + chunk-level (paragraph) dedup over them
    "text_chunk" -> (TextQueries.textChunk _),
    "dedup_chunk" -> (TextQueries.dedupChunk _),
    // C82: who-copies-whom at training-window granularity (C78's flow
    // matrix over C30/C31's chunks; keeper-rule-aligned with C31)
    "dedup_chunk_origin" -> (TextQueries.chunkOriginCard _),
    // cumulative filter-funnel survivor report over the documents corpus
    "quality_funnel" -> (TextQueries.qualityFunnel _),
    "quality_gopher" -> (TextQueries.qualityGopher _),
    // MG-sketch candidates + exact rescore: hash-checked top-20 counts
    "token_topk_sketch" -> (TextQueries.tokenTopkSketch _),
    // SQL-checked: the greedy trainer unrolled as 20 DuckDB CTE stages
    // (bpeMergesOracle); BpeSpec additionally proves driver/distributed
    // equality of the published algorithm
    "text_bpe_merges" -> (graft.ops.Bpe.textBpeMerges _),
    // SQL-checked: encode with the learned merges, top-30 piece
    // histogram — oracle continues the same CTE chain past the trainer
    "text_bpe_encode" -> (graft.ops.Bpe.textBpeEncode _),
    // C57a: encode against the persisted merge table (recurring cost face)
    "text_bpe_encode_cached" -> (graft.ops.Bpe.textBpeEncodeCached _),
    // CCNet head/middle/tail perplexity terciles per source; each engine
    // buckets its own xent against its own cuts, so the card hash-checks
    "quality_ccnet" -> (TextQueries.qualityCcnet _),
    // C56a: CCNet bucketing against the persisted LM + cuts
    "quality_ccnet_cached" -> (TextQueries.qualityCcnetCached _),
    // SQL-checked: all-integer anneal plan (oracle replays the ln
    // scoring + quantile_disc cut; MixtureAnnealSpec reconciles too)
    "mixture_anneal" -> (TextQueries.mixtureAnneal _),
    // rows-only: learned quality gate (spark.ml LR; AUC/determinism spec-bounded)
    "quality_classifier" -> (graft.ops.QualityModel.qualityClassifier _),
    // (source × lang) dataset card at every rollup level
    "corpus_stats" -> (TextQueries.corpusStats _),
    // canonicalization audit with a cross-engine md5 witness
    "text_normalize" -> (TextQueries.textNormalize _),
    // per-source token-distribution drift vs the corpus (integer bp)
    "corpus_divergence" -> (TextQueries.corpusDivergence _),
    // C84: intake-batch drift vs the standing corpus (quality/length/
    // novel-vocabulary per source — the text-side D21)
    "corpus_batch_drift" -> (TextQueries.corpusBatchDrift _),
    // top-50 vocabulary coverage curve (integer bp)
    "text_vocab" -> (TextQueries.textVocab _),
    // C93: Zipf decay at rank doublings (integer ratio — no logarithms)
    "corpus_zipf" -> (TextQueries.corpusZipf _),
    // C94: per-language tokenizer economics (fertility, chars/token)
    "token_fertility" -> (TextQueries.tokenFertility _),
    // C95: CCNet-style prefix-hash cheap dedup pass vs the exact pass
    "dedup_prefix" -> (TextQueries.dedupPrefix _),
    // per-source document-length histogram (100-char buckets)
    "corpus_lengths" -> (TextQueries.corpusLengths _),
    // unigram cross-entropy card (round-4 absorbs ln ULP; hash-checked)
    "text_perplexity" -> (TextQueries.textPerplexity _),
    // bigram LM + stupid backoff, trained on the even-doc slice
    "text_perplexity_bigram" -> (TextQueries.textPerplexityBigram _),
    // rows-only: 8-bit KenLM-style quantized LM face (QuantLmSpec pins drift)
    "text_perplexity_quantized" -> (TextQueries.textPerplexityQuantized _),
    // C42c: scoring against the persisted 8-bit LM tables
    "text_perplexity_quantized_cached" -> (TextQueries.textPerplexityQuantizedCached _),
    // span-level dedup: recurring L-token windows merged to maximal spans
    "text_dup_spans" -> (TextQueries.textDupSpans _),
    // ExactSubstr: maximal duplicated substrings + exact coverage card
    "dedup_exact_substr" -> (ExactSubstr.exactSubstrCard _),
    // C86: duplicated-window mass vs window length (the L ablation)
    "dedup_curve" -> ((s: SparkSession, d: String) =>
      ExactSubstr.dedupCurve(s, d)),
    // C88: the same ablation at maximal-SPAN granularity (the cut mass
    // the ExactSubstr pipeline actually sweeps when choosing L)
    "dedup_curve_spans" -> ((s: SparkSession, d: String) =>
      ExactSubstr.dedupCurveSpans(s, d)),
    // keep-one removal of duplicated spans, measured on cleaned tokens
    "text_remove_dup_spans" -> (ExactSubstr.removeDupSpansCard _),
    // span-level incremental dedup: new batch vs standing window index
    "dedup_incremental_spans" -> (ExactSubstr.incrementalSpansCard _),
    // source-pair provenance matrix of duplicated span content
    "dedup_span_provenance" -> (ExactSubstr.spanProvenanceCard _),
    // directional origin→adopter attribution of duplicated spans
    "dedup_span_origin" -> (ExactSubstr.spanOriginCard _),
    // per-source effective token mass after cross-source adoption
    "mixture_effective" -> (ExactSubstr.mixtureEffectiveCard _),
    // Bloom-gated benchmark decontamination, result-equal to C23
    "text_contamination_bloom" -> (Decontaminate.contaminationBloom _),
    // rows-only: KMV-ranked (source × benchmark) triage ahead of the
    // exact pass (spec pins triage-invariance + C23 agreement)
    "text_contamination_triage" ->
      ((s: SparkSession, d: String) => Decontaminate.contaminationTriage(s, d)),
    "dedup_ngram_jaccard" -> (DedupQueries.dedupNgramJaccard _),
    // incremental new-batch-vs-standing-corpus dedup (3 probe faces)
    "dedup_incremental" -> (DedupQueries.dedupIncremental _),
    // Bloom-sketch membership pre-filter ahead of the exact confirm join
    "dedup_bloom" -> (DedupQueries.dedupBloom _),
    // inter-source duplication matrix over the MinHash candidate pairs
    "dedup_source_matrix" -> (DedupQueries.dedupSourceMatrix _),
    // winnowing-family fingerprints (local-min selection) + pair overlap
    "dedup_winnow" -> (DedupQueries.dedupWinnow _),
    // rows-only: KMV-sketch cross-source overlap estimates (KmvSpec bounds error)
    "corpus_overlap_kmv" -> (DedupQueries.corpusOverlapKmv _),
    // content-level corpus version diff (added/removed/modified/unchanged card)
    "corpus_diff" -> (graft.ingest.CorpusDiff.corpusDiffQuery _),
    "dedup_minhash" -> (DedupQueries.dedupMinhash _),
    // C99: the banding ablation — the same 16 minhashes re-banded 16x1 ..
    // 2x8, precision/recall vs the C2 truth (the LSH operating curve)
    "dedup_minhash_tuning" -> ((s: SparkSession, d: String) =>
      DedupQueries.dedupMinhashTuning(s, d)),
    // edit-distance confirmation of the MinHash candidates (two-stage fuzzy dedup)
    "dedup_edit" -> (DedupQueries.dedupEdit _),
    "dedup_simhash" -> (DedupQueries.dedupSimhash _),
    "dedup_cluster" -> (DedupQueries.dedupCluster _),
    // C106: train/test split-leakage audit — cross-fold exact/near-dup
    // pairs under the naive doc-keyed coin vs the cluster-keyed fix
    // (clusters land whole; zeros computed, not assumed); SQL-checked
    "dedup_split_leakage" -> (DedupQueries.dedupSplitLeakage _),
    // quality-aware keeper per dup cluster (argmax C9 score, not min-id)
    "dedup_keeper_quality" -> (DedupQueries.dedupKeeperQuality _),
    "dedup_embedding" -> ((s: SparkSession, d: String) => VectorQueries.dedupEmbedding(s, d)),
    // rows-only: LSH-blocked scale face of C5 (recall spec-bounded)
    "dedup_embedding_lsh" -> ((s: SparkSession, d: String) => VectorQueries.dedupEmbeddingLsh(s, d)),
    // C5b: knee-routed hand-over — exact LSH face below DedupLshKnee
    // (all gate SFs), cluster-blocked linear candidates past it
    "dedup_embedding_auto" -> ((s: SparkSession, d: String) => VectorQueries.dedupEmbeddingAuto(s, d)),
    "sim_search_topk" -> (VectorQueries.simSearchTopk _),
    // C83: embedding-space eval-leakage gate (catches paraphrased leaks
    // the n-gram decontamination family structurally cannot)
    "contamination_semantic" -> ((s: SparkSession, d: String) =>
      VectorQueries.contaminationSemantic(s, d)),
    // SQL-checked since round 11: learned cell centroids exported as data;
    // the oracle replays multi-assign/pairs/top-3 (KnnGraphSpec bounds recall)
    "knn_graph" -> (VectorQueries.knnGraph _),
    "sim_search_lsh" -> (VectorQueries.simSearchLsh _),
    "sim_search_lsh_cached" -> (VectorQueries.simSearchLshCached _),
    // C7b: knee-routed hand-over — the artifact-backed LSH serve below
    // LshServeKnee (all gate SFs), the exact scan past it (measured
    // cheaper AND recall-1.0 at 4M; BASELINE r13 envelope)
    "sim_search_lsh_auto" -> ((s: SparkSession, d: String) =>
      VectorQueries.simSearchLshAuto(s, d)),
    // SQL-checked since round 11: the centroid table exported as data; the
    // oracle replays assignment/probes/rescore/rank from it
    "sim_search_ivf" -> (VectorQueries.simSearchIvf _),
    // SQL-checked since round 11: learned centroids exported as data (same
    // oracle machinery as sim_search_ivf); recall stays spec-bounded
    "sim_search_ivf_learned" -> (VectorQueries.simSearchIvfLearned _),
    // rows-only: PQ-ADC search over learned codebooks (recall spec-bounded)
    "sim_search_pq" -> (graft.ops.ProductQuant.simSearchPq _),
    // rows-only: composed IVF-PQ (residual-coded posting lists, IVFADC)
    "sim_search_ivfpq" -> (graft.ops.IvfPq.simSearchIvfPq _),
    // C44a: search against the persisted IVF-PQ index
    "sim_search_ivfpq_cached" -> (graft.ops.IvfPq.simSearchIvfPqCached _),
    // rows-only: PQ with balanced-permutation subspace allocation (OPQ family)
    "sim_search_opq" -> (graft.ops.ProductQuant.simSearchOpq _),
    // rows-only: full-rotation OPQ (PCA eigenvalue-allocation init +
    // Procrustes refinement; descent + recall spec-bounded)
    "sim_search_opq_rot" -> (graft.ops.Opq.simSearchOpqRot _),
    // C38c: OPQ search against the persisted rotation + codebook
    "sim_search_opq_cached" -> (graft.ops.Opq.simSearchOpqCached _),
    // SQL-checked since round 11 with NO export: SQ8's min/max fit is
    // order-independent, so the whole pipeline replays from the corpus
    "sim_search_sq8" -> (graft.ops.ScalarQuant.simSearchSq8 _),
    // C89: graph-traversal ANN (DiskANN-style beam search over a
    // degree-8 kNN graph; serve cost independent of corpus size)
    "sim_search_graph" -> (graft.ops.GraphAnn.simSearchGraph _),
    // C89a: beam search against the persisted graph + entry artifacts
    "sim_search_graph_cached" -> (graft.ops.GraphAnn.simSearchGraphCached _),
    // C89b: knee-routed graph serve — the cached beam serve below
    // GraphServeKnee (all gate SFs; the C89a oracle replays
    // bit-identically), the exact scan past it (measured cheaper AND
    // recall-1.0 at every decade from 8k up, both geometries)
    "sim_search_graph_auto" -> (graft.ops.GraphAnn.simSearchGraphAuto(_, _)),
    // C97: lexical BM25 top-10 per benchmark item — the exact term-match
    // search family beside the ANN ladder (retrieval-based decontamination)
    "search_bm25" -> (graft.ops.Retrieval.searchBm25 _),
    // C97a: BM25 against the PERSISTED postings + query model (the
    // recurring serve cost); result-identical to search_bm25 by
    // contract — same oracle
    "search_bm25_cached" -> (graft.ops.Retrieval.searchBm25Cached _),
    // C98: hybrid retrieval — RRF (k=60) fusion of the BM25 and cosine
    // top-10 lists per item; ranks are round-before-rank integers, so the
    // fused score is engine-exact
    "search_hybrid" -> (graft.ops.Retrieval.searchHybrid _),
    // C103: hard-negative mining — BM25 ranks 11–50 per item (the
    // DPR/SBERT negative pool a contrastive-training pipeline exports)
    "retrieval_negatives" -> ((s: SparkSession, d: String) =>
      graft.ops.Retrieval.retrievalNegatives(s, d)),
    // C100: dimension-truncation recall audit (the Matryoshka question:
    // how many dims does the index need) — SQL-checked prefix cosines
    "ann_dim_audit" -> (VectorQueries.annDimAudit _),
    // C104: the serving pattern C100 informs — d=16 prefix shortlist,
    // exact full-dim rescore (adaptive/funnel retrieval)
    "sim_search_adaptive" -> ((s: SparkSession, d: String) =>
      VectorQueries.simSearchAdaptive(s, d)),
    // C87, SQL-checked since round 11: measured recall@10 of the ANN
    // ladder vs exact ground truth (method lists exported as data; the
    // exact side + overlay arithmetic replayed)
    "ann_recall_audit" -> (VectorQueries.annRecallAudit _),
    // C87a: the audit run against the PERSISTED serve indexes (the
    // batch companion to the D21 drift monitor)
    "ann_recall_audit_cached" -> (VectorQueries.annRecallAuditCached _),
    // SQL-checked since round 11: learned centroids exported as data; the
    // oracle re-derives the argmax assignment + the tau-pair stage
    "dedup_semantic" -> ((s: SparkSession, d: String) => VectorQueries.dedupSemantic(s, d)),
    // rows-only: SemDeDup over PQ codes — the memory-bounded face
    // (spec pins card equality with dedup_semantic)
    "dedup_semantic_pq" -> (graft.ops.SemanticPq.dedupSemanticPq _),
    // rows-only: batch-vs-standing semantic dedup (spec recounts the
    // same-cluster cos>=tau contract through the stored index cycle)
    "dedup_semantic_incremental" ->
      ((s: SparkSession, d: String) => graft.ops.SemanticPq.dedupSemanticIncremental(s, d)),
    // serve faces: same results against the persisted model/index
    "dedup_semantic_pq_cached" ->
      ((s: SparkSession, d: String) => graft.ops.SemanticPq.dedupSemanticPqCached(s, d)),
    "dedup_semantic_incremental_cached" ->
      (graft.ops.SemanticPq.dedupSemanticIncrementalCached _),
    "embed_stats" -> (VectorQueries.embedStats _),
    "embed_centroids" -> (VectorQueries.embedCentroids _),
    // C90: embedding-space source-divergence card (diagonal Fréchet)
    "embed_divergence" -> (VectorQueries.embedDivergence _),
    // C91, SQL-checked since round 11: D4-style prototype pruning — frozen
    // assignment + centroids exported as data, scoring/cut/card replayed
    "sample_diverse" -> ((s: SparkSession, d: String) =>
      VectorQueries.sampleDiverse(s, d)),
    // cross-table (documents x embeddings) dataset card per (source, label)
    "corpus_label_card" -> (VectorQueries.corpusLabelCard _),
    // SQL-checked since round 11: assignment + centroids exported as data,
    // the tightness card replayed from them
    "embed_kmeans" -> (graft.ops.KMeans.embedKmeans _),
    // rows-only: PCA variance-explained curve (eigensolve; spec-recounted)
    "embed_pca" -> (graft.ops.Pca.embedPca _),
    // SQL-checked since round 11: learned clusters exported as data
    // (TopicsAssignPath); the oracle replays df/lift/top-5 from the corpus
    "corpus_topics" -> (graft.ops.KMeans.corpusTopics _),
    "mm_metadata" -> (Multimodal.mmMetadata _),
    "mm_features" -> (Multimodal.mmFeatures _),
    // §2.E library surface demo: salted join over a synthetically hot key
    "skew_salted_join" -> (Skew.skewSaltedJoin _),
    // as-of join: single-shuffle union+window point-in-time attribution
    "asof_join" -> (graft.ops.AsofJoin.asofClickAttribution _),
    // deterministic content-keyed mixture sampling with epoch repetition
    "sample_mixture" -> (graft.ops.Sample.sampleMixtureQuery _),
    "sample_split" -> (graft.ops.Sample.sampleSplitQuery _),
    "sample_stratified" -> (graft.ops.Sample.sampleStratifiedQuery _),
    "sample_cap_source" -> (graft.ops.Sample.sampleCapSourceQuery _),
    // E-S weighted sampling without replacement, token-count weights
    "sample_weighted" -> (graft.ops.Sample.sampleWeightedQuery _),
    // rows-only: DSIR importance resampling (DsirSpec recounts weights + selection)
    "dsir_select" -> (graft.ops.Sample.dsirSelectQuery _),
    // mixture/epoch planner: natural vs target share, factor in bp
    "mixture_plan" -> (graft.ops.Sample.mixturePlan _),
    // C92: temperature ladder (α ∈ {1,½,¼}) via engine-exact integer sqrt
    "mixture_temperature" -> (graft.ops.Sample.mixtureTemperature _),
    // C96: the C55 plan APPLIED — achieved vs target mix, all-integer coin
    "mixture_apply" -> (graft.ops.Sample.mixtureApply _),
    "mixture_tokens" -> (graft.ops.Sample.mixtureTokensQuery _),
    // sharded sequence packing into fixed token budgets
    "sample_pack" -> (graft.ops.Sample.samplePackQuery _),
    // C85: context-length sweep — exact truncation/padding economics per
    // candidate max_seq_len (the sizing card ahead of sample_pack)
    "pack_efficiency" -> ((s: SparkSession, d: String) =>
      graft.ops.Sample.packEfficiency(s, d)),
    "sample_curriculum" -> (graft.ops.Sample.sampleCurriculum _),
    // C105: the reproducibility manifest of the full training export —
    // clean → mixture → folds composed end-to-end, SQL-checked (the
    // oracle replays the whole pipeline: quality formula, exact keeper,
    // MinHash bands + recursive connected components, copy/fold coins,
    // XOR content fingerprints)
    "export_manifest" -> (graft.ops.Pipeline.exportManifest _),
    "export_manifest_delta" -> (graft.ops.Pipeline.exportManifestDelta _),
    // bucketed interval join: range turned into (key, time-bucket) equi-join
    "range_join" -> (graft.ops.RangeJoin.rangeJoinErrors _),
    // §2.D streaming (batch faces of the streaming transforms)
    "stream_events_window" -> (graft.streaming.EventsPipeline.streamEventsWindow _),
    "stream_sessionize" -> (graft.streaming.Sessionize.streamSessionize _)
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_revenue_filter" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue, count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate,'%Y-%m-%d') AS orderdate, o_orderpriority,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q5_region_volume" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q6_top_customers" ->
      """WITH rev AS (
        |  SELECT o_custkey, round(sum(o_totalprice),2) AS rev, count(*) AS n_orders
        |  FROM orders GROUP BY o_custkey),
        |j AS (
        |  SELECT c_mktsegment, c_custkey, rev, n_orders
        |  FROM rev JOIN customer ON o_custkey = c_custkey),
        |r AS (
        |  SELECT *, rank() OVER (PARTITION BY c_mktsegment
        |                         ORDER BY rev DESC, c_custkey) AS rnk
        |  FROM j)
        |SELECT c_mktsegment, rnk, c_custkey, rev, cast(n_orders AS BIGINT) AS n_orders
        |FROM r WHERE rnk <= 5
        |ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin,
    "q7_rollup_sales" ->
      """SELECT coalesce(l_returnflag,'ALL') AS flag,
        |       coalesce(l_linestatus,'ALL') AS status,
        |       round(sum(l_extendedprice),2) AS sales, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q8_distinct_stats" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS parts,
        |       count(DISTINCT l_orderkey) AS orders_n, count(*) AS lines
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q9_cust_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "q10_event_gaps" ->
      """WITH e AS (
        |  SELECT event_id, event_type, user_id,
        |         cast(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events),
        |g AS (
        |  SELECT event_type,
        |         sec - lag(sec) OVER (PARTITION BY user_id
        |                              ORDER BY sec, event_id) AS gap
        |  FROM e)
        |SELECT event_type, count(*) AS n_gaps,
        |       round(avg(gap),2) AS avg_gap_s,
        |       cast(max(gap) AS BIGINT) AS max_gap_s
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q11_json_props" ->
      """WITH e AS (
        |  SELECT event_type, value,
        |         cast(regexp_extract(props,'([0-9]+)',1) AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n, cast(sum(k) AS BIGINT) AS k_sum,
        |       round(avg(k),4) AS k_avg, round(sum(value),2) AS value_sum
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q38_event_anomaly" ->
      """WITH q AS (
        |  SELECT event_type, count(*) AS events,
        |         quantile_cont(value, 0.25) AS q25,
        |         quantile_cont(value, 0.75) AS q75,
        |         quantile_cont(value, 0.75)
        |           + (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)) * 3 AS fence
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, q.events, round(q.q25, 4) AS q25,
        |       round(q.q75, 4) AS q75, round(q.fence, 4) AS fence,
        |       cast(sum(CASE WHEN e.value > q.fence THEN 1 ELSE 0 END) AS BIGINT)
        |         AS anomalies,
        |       cast(sum(CASE WHEN e.value > q.fence THEN 1 ELSE 0 END) * 10000
        |         // q.events AS BIGINT) AS anomaly_bp
        |FROM events e JOIN q USING (event_type)
        |GROUP BY e.event_type, q.events, q.q25, q.q75, q.fence
        |ORDER BY e.event_type""".stripMargin,
    "q39_volume_spike" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT a.event_type, a.day, a.n,
        |         count(*) AS trail_days,
        |         quantile_cont(b.n, 0.5) AS med
        |  FROM d a JOIN d b
        |    ON a.event_type = b.event_type
        |   AND b.day >= a.day - INTERVAL 7 DAY AND b.day < a.day
        |  GROUP BY 1, 2, 3 HAVING count(*) >= 4)
        |SELECT event_type, day, n AS events, trail_days,
        |       CAST(med * 2 AS BIGINT) AS trail_med_x2,
        |       n * 20000 // CAST(med * 2 AS BIGINT) AS ratio_bp,
        |       CAST(n * 20000 // CAST(med * 2 AS BIGINT) >= 20000 AS INT)
        |         AS is_spike
        |FROM t ORDER BY event_type, day""".stripMargin,
    "q12_promo_revenue" ->
      """WITH j AS (
        |  SELECT p_type,
        |         sum(l_extendedprice * (1 - l_discount)) AS rev,
        |         count(*) AS lines
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY p_type)
        |SELECT p_type, round(rev, 2) AS revenue, lines,
        |       round(100.0 * rev / sum(rev) OVER (), 4) AS pct
        |FROM j ORDER BY p_type""".stripMargin,
    "q13_event_pivot" ->
      ("""SELECT strftime(ts, '%Y-%m-%d') AS day,""" + "\n" +
        Seq("click", "error", "purchase", "signup", "view").map { ty =>
          s"""  cast(count(CASE WHEN event_type = '$ty' THEN 1 END) AS BIGINT) AS ${ty}_n,
             |  round(coalesce(sum(CASE WHEN event_type = '$ty' THEN value END), 0), 2) AS ${ty}_v""".stripMargin
        }.mkString(",\n") +
        "\nFROM events GROUP BY day ORDER BY day"),
    "q14_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey),
        |m AS (SELECT max(total_rev) AS mx FROM rev)
        |SELECT s_suppkey, s_name, total_rev
        |FROM rev CROSS JOIN m
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = mx
        |ORDER BY s_suppkey""".stripMargin,
    "q15_part_supplier_counts" ->
      """WITH rel AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        |  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                          WHERE s_suppkey % 13 = 0))
        |SELECT p_type,
        |       count(DISTINCT l_suppkey) AS supplier_cnt,
        |       count(DISTINCT l_partkey) AS part_cnt
        |FROM rel JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type ORDER BY p_type""".stripMargin,
    "q16_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS qty
        |  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 250)
        |SELECT c_custkey, c_name, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |       round(o_totalprice, 2) AS totalprice, qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY qty DESC, o_orderkey LIMIT 10""".stripMargin,
    "q17_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, cast(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events),
        |v AS (SELECT user_id, min(sec) AS v_sec
        |      FROM ev WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.sec) AS c_sec, min(v.v_sec) AS v_sec
        |      FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.sec > v.v_sec GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.sec) AS p_sec, min(c.c_sec) AS c_sec
        |      FROM ev e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.sec > c.c_sec GROUP BY 1)
        |SELECT '1_viewed' AS stage, count(*) AS n, CAST(NULL AS DOUBLE) AS avg_gap_s FROM v
        |UNION ALL
        |SELECT '2_clicked', count(*), round(avg(c_sec - v_sec), 2) FROM c
        |UNION ALL
        |SELECT '3_purchased', count(*), round(avg(p_sec - c_sec), 2) FROM p
        |ORDER BY stage""".stripMargin,
    "q18_revenue_deciles" ->
      ("""WITH rev AS (
         |  SELECT o_custkey, round(sum(o_totalprice), 2) AS rev
         |  FROM orders GROUP BY 1),
         |cut AS (SELECT [""".stripMargin +
        (1 to 9).map(i => s"round(quantile_cont(rev, 0.$i), 4)").mkString(", ") +
        """] AS cuts FROM rev),
         |d AS (
         |  SELECT rev, 1""".stripMargin +
        (1 to 9).map(i => s" + (CASE WHEN rev > cuts[$i] THEN 1 ELSE 0 END)").mkString +
        """ AS decile
         |  FROM rev CROSS JOIN cut)
         |SELECT decile, count(*) AS customers, round(sum(rev), 2) AS revenue,
         |       round(min(rev), 2) AS floor_rev
         |FROM d GROUP BY decile ORDER BY decile""".stripMargin),
    "q27_trade_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       year(o_orderdate) AS yr, count(*) AS line_items,
        |       cast(sum(cast(floor(l_extendedprice*(1-l_discount)*100 + 0.5)
        |                     AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE sn.n_name <> cn.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q29_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS yr,
        |       count(*) AS line_items,
        |       cast(sum(cast(floor(l_extendedprice*(1-l_discount)*100 + 0.5)
        |                     AS BIGINT)
        |               - cast(floor(p_retailprice*l_quantity*100 + 0.5)
        |                      AS BIGINT)) AS BIGINT) AS profit_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |         string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')),' ') AS ts
        |  FROM documents
        |), tot AS (
        |  SELECT source, cast(sum(len(ts)) AS BIGINT) AS total_tokens
        |  FROM toks GROUP BY source
        |), grams AS (
        |  SELECT doc_id, source, i AS pos,
        |         md5(array_to_string(ts[i:i+7], ' ')) AS h
        |  FROM toks, unnest(generate_series(1, len(ts) - 7)) u(i)
        |), dup AS (
        |  SELECT doc_id, source, pos,
        |         count(*) OVER (PARTITION BY h) AS c
        |  FROM grams
        |), isl AS (
        |  SELECT doc_id, source, pos,
        |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM dup WHERE c > 1
        |), spans AS (
        |  SELECT doc_id, source, min(pos) AS s, max(pos) AS e
        |  FROM isl GROUP BY doc_id, source, grp
        |)
        |SELECT t.source,
        |       cast(count(DISTINCT sp.doc_id) AS BIGINT) AS docs_with_dups,
        |       cast(count(sp.doc_id) AS BIGINT) AS dup_spans,
        |       cast(coalesce(sum(sp.e - sp.s + 8), 0) AS BIGINT) AS dup_token_mass,
        |       cast(cast(coalesce(sum(sp.e - sp.s + 8), 0) AS BIGINT) * 10000
        |            // t.total_tokens AS BIGINT) AS share_bp
        |FROM tot t LEFT JOIN spans sp ON t.source = sp.source
        |GROUP BY t.source, t.total_tokens
        |ORDER BY t.source""".stripMargin,
    "q30_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name AS nation,
        |       cast(sum(cast(floor(l_extendedprice*(1-l_discount)*100 + 0.5)
        |                     AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       count(*) AS line_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= DATE '1996-01-01'
        |  AND o_orderdate <  DATE '1996-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin,
    "q31_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) cc
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q32_value_share" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |         cast(sum(cast(floor(l_extendedprice*(1-l_discount)*100 + 0.5)
        |                       AS BIGINT)) AS BIGINT) AS value_cents,
        |         count(*) AS line_items
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT cast(sum(value_cents) AS BIGINT) AS t,
        |               count(*) AS np FROM v)
        |SELECT l_partkey AS partkey, value_cents, line_items,
        |       cast((value_cents * 10000) // t AS BIGINT) AS share_bp
        |FROM v, tot
        |WHERE value_cents * np * 10 > t * 13
        |ORDER BY value_cents DESC, partkey""".stripMargin,
    "q33_min_cost_supplier" ->
      """WITH offers AS (
        |  SELECT l_partkey, l_suppkey,
        |         cast(min(cast(floor(l_extendedprice / l_quantity * 100 + 0.5)
        |                       AS BIGINT)) AS BIGINT) AS cost_cents
        |  FROM lineitem GROUP BY 1, 2),
        |best AS (
        |  SELECT *, min(cost_cents) OVER (PARTITION BY l_partkey) AS b
        |  FROM offers)
        |SELECT p_partkey AS partkey, p_brand, s_name, n_name AS nation,
        |       cost_cents
        |FROM best
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE cost_cents = b
        |ORDER BY cost_cents DESC, partkey, s_name LIMIT 100""".stripMargin,
    "q28_market_share" ->
      """WITH vol AS (
        |  SELECT r_name AS region, year(o_orderdate) AS yr,
        |         sn.n_name AS supp_nation,
        |         cast(sum(cast(floor(l_extendedprice*(1-l_discount)*100 + 0.5)
        |                       AS BIGINT)) AS BIGINT) AS volume_cents,
        |         count(*) AS line_items
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE p_type = 'ECONOMY'
        |  GROUP BY 1, 2, 3)
        |SELECT region, yr, supp_nation, volume_cents,
        |       cast((volume_cents * 10000)
        |            // (sum(volume_cents) OVER (PARTITION BY region, yr))
        |            AS BIGINT) AS share_bp,
        |       line_items
        |FROM vol ORDER BY region, yr, supp_nation""".stripMargin,
    "q26_disjunctive_revenue" ->
      """WITH j AS (
        |  SELECT CASE
        |           WHEN p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |                AND l_quantity BETWEEN 1 AND 11 THEN 'B1'
        |           WHEN p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |                AND l_quantity BETWEEN 10 AND 20 THEN 'B2'
        |           ELSE 'B3' END AS bucket,
        |         cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |              AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |         AND l_quantity BETWEEN 1 AND 11)
        |     OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |         AND l_quantity BETWEEN 10 AND 20)
        |     OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        |         AND l_quantity BETWEEN 20 AND 30))
        |SELECT bucket, count(*) AS line_items,
        |       cast(sum(cents) AS BIGINT) AS revenue_cents
        |FROM j GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q25_cube_revenue" ->
      """WITH base AS (
        |  SELECT n_name, year(o_orderdate) AS yr,
        |         cast(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey)
        |SELECT coalesce(n_name, 'ALL') AS nation,
        |       coalesce(cast(yr AS STRING), 'ALL') AS order_year,
        |       count(*) AS orders,
        |       cast(sum(cents) AS BIGINT) AS revenue_cents
        |FROM base
        |GROUP BY CUBE (n_name, yr)
        |ORDER BY nation, order_year""".stripMargin,
    "q24_trailing_revenue" ->
      """WITH daily AS (
        |  SELECT cast(o_orderdate AS DATE) AS day,
        |         cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |              AS BIGINT) AS rev_c,
        |         count(*) AS orders
        |  FROM orders GROUP BY 1),
        |win AS (
        |  SELECT day, orders, rev_c,
        |         cast(sum(rev_c) OVER w AS BIGINT) AS rev7_c,
        |         count(*) OVER w AS days_in_frame
        |  FROM daily
        |  WINDOW w AS (ORDER BY datediff('day', DATE '1970-01-01', day)
        |               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT strftime(day, '%Y-%m-%d') AS day, orders,
        |       rev_c AS revenue_cents,
        |       rev7_c AS revenue_7d_cents,
        |       rev7_c // days_in_frame AS avg_daily_7d_cents
        |FROM win ORDER BY day""".stripMargin,
    "q23_small_order_revenue" ->
      """WITH l AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice, p_brand,
        |         avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_q
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size <= 5)
        |SELECT p_brand, count(*) AS small_lines,
        |       round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM l WHERE l_quantity < avg_q * 0.2
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q22_dominant_supplier" ->
      """WITH per_supp AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')
        |  GROUP BY 1, 2),
        |per_part AS (
        |  SELECT l_partkey, sum(q) AS tq FROM per_supp GROUP BY 1),
        |dom AS (
        |  SELECT l_suppkey, count(*) AS parts_dominated,
        |         round(sum(q), 2) AS qty_dominated
        |  FROM per_supp JOIN per_part USING (l_partkey)
        |  WHERE q > tq * 0.5
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, parts_dominated, qty_dominated
        |FROM dom JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting_supplier" ->
      """WITH l AS (
        |  SELECT l_orderkey, l_suppkey,
        |         l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT s_name, n_name, count(*) AS numwait
        |FROM l l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE l1.is_late
        |  AND EXISTS (SELECT 1 FROM l l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM l l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.is_late)
        |GROUP BY s_name, n_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q20_prospects" ->
      """SELECT c_nationkey, count(*) AS numcust,
        |       round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= DATE '2000-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q19_retention" ->
      """WITH ev AS (SELECT user_id, weekofyear(ts) AS wk FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1),
        |per_user AS (
        |  SELECT ev.user_id, f.cohort_wk,
        |         count(DISTINCT CASE WHEN ev.wk > f.cohort_wk THEN ev.wk END)
        |           AS later_wks
        |  FROM ev JOIN f ON ev.user_id = f.user_id
        |  GROUP BY 1, 2)
        |SELECT cohort_wk, later_wks, count(*) AS users
        |FROM per_user GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ingest_typecast" ->
      """WITH raw AS (
        |  SELECT cast(event_id AS VARCHAR) AS c0, cast(user_id AS VARCHAR) AS c1,
        |         strftime(ts,'%Y-%m-%d') AS c2
        |  FROM events),
        |typed AS (
        |  SELECT cast(c0 AS BIGINT) AS c0, cast(c1 AS BIGINT) AS c1,
        |         cast(c2 AS DATE) AS c2
        |  FROM raw)
        |SELECT strftime(c2,'%Y-%m-%d') AS day, count(*) AS n,
        |       cast(sum(c0) AS BIGINT) AS id_sum,
        |       cast(sum(CASE WHEN c1 % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS even_users
        |FROM typed GROUP BY day ORDER BY day""".stripMargin,
    "ingest_filename_route" ->
      """WITH f AS (
        |  SELECT CASE WHEN event_id % 17 = 0 THEN 'BADFILE.TXT'
        |    ELSE concat(event_type,'_',strftime(ts,'%Y%m%d'),'_',
        |                lpad(cast(event_id % 86400 AS VARCHAR),6,'0'),'.CSV.GZ')
        |    END AS fname
        |  FROM events),
        |r AS (
        |  SELECT fname,
        |    regexp_matches(fname,'^(.+)_([0-9]{8})_[0-9]{6}\.CSV\.GZ$') AS ok,
        |    regexp_extract(fname,'^(.+)_([0-9]{8})_[0-9]{6}\.CSV\.GZ$',1) AS tn,
        |    regexp_extract(fname,'^(.+)_([0-9]{8})_[0-9]{6}\.CSV\.GZ$',2) AS dt
        |  FROM f)
        |SELECT CASE WHEN ok THEN tn ELSE '(irregular)' END AS table_name,
        |       CASE WHEN ok THEN 'OK' ELSE 'IRREGULAR' END AS route_status,
        |       count(*) AS files,
        |       count(DISTINCT CASE WHEN ok THEN dt END) AS days
        |FROM r GROUP BY table_name, route_status
        |ORDER BY table_name, route_status""".stripMargin,
    "ingest_ledger_diff" ->
      """SELECT event_type, count(*) AS to_process,
        |       cast(min(event_id) AS BIGINT) AS min_id,
        |       cast(max(event_id) AS BIGINT) AS max_id
        |FROM events
        |WHERE event_id NOT IN (SELECT event_id FROM events WHERE event_id % 10 < 3)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ingest_watermark_append" ->
      """SELECT o_orderstatus, count(*) AS n,
        |       round(sum(o_totalprice),2) AS total,
        |       strftime(min(o_orderdate),'%Y-%m-%d') AS min_day,
        |       strftime(max(o_orderdate),'%Y-%m-%d') AS max_day
        |FROM orders
        |WHERE (SELECT max(o_orderdate) FROM orders
        |       WHERE o_orderkey % 5 = 0) IS NULL
        |   OR o_orderdate > (SELECT max(o_orderdate) FROM orders
        |                     WHERE o_orderkey % 5 = 0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "ingest_failure_classify" ->
      """WITH config(cfg_type, expected_cnt) AS (
        |  VALUES ('click',3),('view',3),('signup',5),('purchase',6)),
        |files AS (
        |  SELECT event_type, (event_id % 7) + 1 AS header_cnt,
        |         (event_id % 13 = 0) AS irregular
        |  FROM events)
        |SELECT event_type,
        |  CASE WHEN irregular THEN 'IRREGULAR'
        |       WHEN expected_cnt IS NULL THEN 'OUTOFCONFIG'
        |       WHEN header_cnt <> expected_cnt THEN 'UNMATCH'
        |       ELSE 'OK' END AS status,
        |  count(*) AS n
        |FROM files LEFT JOIN config ON event_type = cfg_type
        |GROUP BY event_type, status ORDER BY event_type, status""".stripMargin,
    "ingest_failure_ledger" ->
      """WITH config(cfg_type, meta_list) AS (
        |  VALUES ('click','ev_id,ev_type,ts'),('view','ev_id,ev_type,ts'),
        |         ('signup','ev_id,ev_type,ts,props,val'),
        |         ('purchase','ev_id,ev_type,ts,props,val,qty')),
        |cfg AS (
        |  SELECT cfg_type, meta_list,
        |         len(string_split(meta_list, ',')) AS expected_cnt
        |  FROM config),
        |files AS (
        |  SELECT concat(event_type, '_', cast(event_id AS VARCHAR)) AS fname,
        |         event_type, (event_id % 7) + 1 AS header_cnt,
        |         (event_id % 13 = 0) AS irregular
        |  FROM events),
        |cls AS (
        |  SELECT fname, header_cnt, meta_list, expected_cnt,
        |    CASE WHEN irregular THEN 'IRREGULAR'
        |         WHEN expected_cnt IS NULL THEN 'OUTOFCONFIG'
        |         WHEN header_cnt <> expected_cnt THEN 'UNMATCH'
        |         ELSE 'OK' END AS status
        |  FROM files LEFT JOIN cfg ON event_type = cfg_type),
        |led AS (
        |  SELECT fname,
        |    CASE WHEN status = 'UNMATCH' THEN header_cnt END AS header_cnt,
        |    CASE WHEN status = 'UNMATCH' THEN meta_list ELSE '' END AS meta_header_list,
        |    CASE WHEN status = 'UNMATCH' THEN expected_cnt END AS meta_header_cnt,
        |    status
        |  FROM cls WHERE status <> 'OK')
        |SELECT status, meta_header_list, count(*) AS n_files,
        |       count(DISTINCT header_cnt) AS widths,
        |       cast(sum(header_cnt) AS BIGINT) AS found_cnt_sum,
        |       cast(sum(meta_header_cnt) AS BIGINT) AS meta_cnt_sum,
        |       min(fname) AS first_file, max(fname) AS last_file
        |FROM led GROUP BY status, meta_header_list
        |ORDER BY status, meta_header_list""".stripMargin,
    "ingest_schema_merge" ->
      """WITH merged AS (
        |  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT coalesce(o_orderpriority,'(missing)') AS priority,
        |       count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM merged GROUP BY priority ORDER BY priority""".stripMargin,
    "ingest_partition_derive" ->
      """SELECT strftime(ts,'%Y-%m-%d') AS TRANSFERRED_DATE,
        |       count(*) AS rows_n, count(DISTINCT user_id) AS users,
        |       round(sum(value),2) AS value_sum
        |FROM events GROUP BY TRANSFERRED_DATE ORDER BY TRANSFERRED_DATE""".stripMargin,
    "ingest_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 10 <> 0),
        |ch AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         o_totalprice * 1.1 AS o_totalprice,
        |         CASE WHEN o_orderkey % 9 = 0 THEN 'D' ELSE 'U' END AS op
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |merged AS (
        |  SELECT coalesce(c.o_orderkey, b.o_orderkey) AS k,
        |         coalesce(c.o_orderstatus, b.o_orderstatus) AS st,
        |         coalesce(c.o_totalprice, b.o_totalprice) AS price
        |  FROM base b FULL OUTER JOIN ch c ON b.o_orderkey = c.o_orderkey
        |  WHERE c.op IS NULL OR c.op <> 'D')
        |SELECT st AS o_orderstatus, count(*) AS n,
        |       cast(sum(cast(floor(price * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS total_cents,
        |       cast(min(k) AS BIGINT) AS min_key,
        |       cast(max(k) AS BIGINT) AS max_key
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    "sync_zone_diff" ->
      """WITH storing AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 <> 0),
        |userzone AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 89 <> 0),
        |c AS (SELECT count(*) AS n, cast(min(o_orderkey) AS BIGINT) AS min_key,
        |             cast(max(o_orderkey) AS BIGINT) AS max_key
        |      FROM storing WHERE o_orderkey NOT IN (SELECT o_orderkey FROM userzone)),
        |d AS (SELECT count(*) AS n, cast(min(o_orderkey) AS BIGINT) AS min_key,
        |             cast(max(o_orderkey) AS BIGINT) AS max_key
        |      FROM userzone WHERE o_orderkey NOT IN (SELECT o_orderkey FROM storing))
        |SELECT 'COPY' AS action, n, min_key, max_key FROM c
        |UNION ALL
        |SELECT 'DELETE' AS action, n, min_key, max_key FROM d
        |ORDER BY action""".stripMargin,
    "dedup_exact" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |         md5(trim(regexp_replace(lower(text),'\s+',' ','g'))) AS h
        |  FROM documents),
        |k AS (SELECT *, min(doc_id) OVER (PARTITION BY h) AS keeper FROM h)
        |SELECT source, count(*) AS docs, count(DISTINCT h) AS uniq_docs,
        |       cast(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
        |       min(h) AS min_h, max(h) AS max_h
        |FROM k GROUP BY source ORDER BY source""".stripMargin,
    "text_langid" ->
      """WITH toks AS (
        |  SELECT lang,
        |         string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ') AS w
        |  FROM documents),
        |s AS (
        |  SELECT lang,
        |    len(list_filter(w, x -> x IN ('the','a','of','and'))) AS en,
        |    len(list_filter(w, x -> x IN ('el','la','de','los'))) AS es,
        |    len(list_filter(w, x -> x IN ('der','die','das','und'))) AS de,
        |    len(list_filter(w, x -> x IN ('le','les','des','une'))) AS fr
        |  FROM toks),
        |p AS (
        |  SELECT lang, CASE
        |    WHEN en=0 AND es=0 AND de=0 AND fr=0 THEN 'und'
        |    WHEN en>=es AND en>=de AND en>=fr THEN 'en'
        |    WHEN es>=de AND es>=fr THEN 'es'
        |    WHEN de>=fr THEN 'de'
        |    ELSE 'fr' END AS predicted
        |  FROM s)
        |SELECT lang, predicted, count(*) AS n
        |FROM p GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,
    "corpus_label_card" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, source,
        |    cast(len(string_split(norm,' ')) AS DOUBLE) AS n_tok,
        |    cast(len(list_filter(string_split(norm,' '),
        |         x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE) AS n_stop,
        |    cast(length(replace(norm,' ','')) AS DOUBLE) AS n_alpha
        |  FROM d),
        |q AS (
        |  SELECT doc_id, source,
        |    0.4*least(n_tok/100.0,1.0) + 0.3*least((n_stop/n_tok)*10.0,1.0)
        |      + 0.3*(CASE WHEN n_alpha/n_tok >= 3.0 AND n_alpha/n_tok <= 8.0
        |                  THEN 1.0 ELSE 0.0 END) AS q
        |  FROM m),
        |e AS (
        |  SELECT vec_id, label, sqrt(list_dot_product(ed, ed)) AS nrm
        |  FROM (SELECT vec_id, label,
        |               list_transform(embedding, x -> x::DOUBLE) AS ed
        |        FROM embeddings))
        |SELECT source, label, count(*) AS docs,
        |       cast(sum(cast(floor(q*10000 + 0.5) AS BIGINT)) // count(*)
        |            AS BIGINT) AS avg_quality_bp,
        |       cast(sum(cast(floor(nrm*10000 + 0.5) AS BIGINT)) // count(*)
        |            AS BIGINT) AS avg_norm_bp
        |FROM q JOIN e ON q.doc_id = e.vec_id
        |GROUP BY source, label ORDER BY source, label""".stripMargin,
    "text_quality" ->
      """WITH d AS (
        |  SELECT source, trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
        |  FROM documents),
        |m AS (
        |  SELECT source,
        |    cast(len(string_split(norm,' ')) AS DOUBLE) AS n_tok,
        |    cast(len(list_filter(string_split(norm,' '),
        |         x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE) AS n_stop,
        |    cast(length(replace(norm,' ','')) AS DOUBLE) AS n_alpha
        |  FROM d),
        |q AS (
        |  SELECT source, n_tok, n_stop/n_tok AS stop_ratio,
        |    0.4*least(n_tok/100.0,1.0) + 0.3*least((n_stop/n_tok)*10.0,1.0)
        |      + 0.3*(CASE WHEN n_alpha/n_tok >= 3.0 AND n_alpha/n_tok <= 8.0
        |                  THEN 1.0 ELSE 0.0 END) AS q
        |  FROM m)
        |SELECT source, count(*) AS docs,
        |       round(avg(n_tok),4) AS avg_tokens,
        |       round(avg(stop_ratio),4) AS avg_stop_ratio,
        |       round(avg(q),4) AS avg_quality,
        |       cast(sum(CASE WHEN q >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_good
        |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "meta_profile" -> graft.ingest.Profile.profileOracle,
    "text_containment" ->
      """WITH d AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
        |  FROM documents),
        |toks AS (SELECT doc_id, string_split(norm,' ') AS w FROM d),
        |bg AS (
        |  SELECT DISTINCT doc_id, w[i]||' '||w[i+1] AS ngram
        |  FROM toks, unnest(generate_series(1, len(w)-1)) AS t(i)
        |  WHERE len(w) >= 2),
        |bench AS (SELECT doc_id AS item_id, ngram FROM bg WHERE doc_id < 5),
        |sz AS (SELECT item_id, count(*) AS item_size FROM bench GROUP BY 1),
        |hits AS (
        |  SELECT bg.doc_id, bench.item_id, count(*) AS common
        |  FROM bg JOIN bench USING (ngram)
        |  WHERE bg.doc_id >= 5
        |  GROUP BY 1, 2)
        |SELECT doc_id, item_id, cast(common AS BIGINT) AS common,
        |       cast(item_size AS BIGINT) AS item_size,
        |       common * 10000 // item_size AS containment_bp
        |FROM hits JOIN sz USING (item_id)
        |WHERE common * 10000 // item_size >= 1000
        |ORDER BY doc_id, item_id""".stripMargin,
    "contamination_items" ->
      """WITH d AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
        |  FROM documents),
        |toks AS (SELECT doc_id, string_split(norm,' ') AS w FROM d),
        |bg AS (
        |  SELECT DISTINCT doc_id, w[i]||' '||w[i+1] AS ngram
        |  FROM toks, unnest(generate_series(1, len(w)-1)) AS t(i)
        |  WHERE len(w) >= 2),
        |bench AS (SELECT doc_id AS item_id, ngram FROM bg WHERE doc_id < 5),
        |sz AS (SELECT item_id, CAST(count(*) AS BIGINT) AS item_size
        |       FROM bench GROUP BY 1),
        |hits AS (
        |  SELECT bg.doc_id, bench.item_id, CAST(count(*) AS BIGINT) AS common
        |  FROM bg JOIN bench USING (ngram)
        |  WHERE bg.doc_id >= 5
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT h.doc_id, h.item_id, h.common,
        |         h.common * 10000 // sz.item_size AS cbp,
        |         row_number() OVER (PARTITION BY h.item_id
        |                            ORDER BY h.common * 10000 // sz.item_size DESC,
        |                                     h.doc_id) AS rk
        |  FROM hits h JOIN sz USING (item_id)),
        |agg AS (
        |  SELECT item_id,
        |         CAST(count(CASE WHEN common >= 3 THEN 1 END) AS BIGINT) AS n_docs_hit,
        |         CAST(count(CASE WHEN cbp >= 1000 THEN 1 END) AS BIGINT) AS n_docs_1000bp,
        |         max(common) AS max_common,
        |         CAST(max(cbp) AS BIGINT) AS max_containment_bp,
        |         max(CASE WHEN rk = 1 THEN doc_id END) AS worst_doc
        |  FROM scored GROUP BY item_id)
        |SELECT sz.item_id, sz.item_size,
        |       coalesce(a.n_docs_hit, 0) AS n_docs_hit,
        |       coalesce(a.n_docs_1000bp, 0) AS n_docs_1000bp,
        |       a.max_common, a.max_containment_bp, a.worst_doc
        |FROM sz LEFT JOIN agg a USING (item_id)
        |ORDER BY item_id""".stripMargin,
    "text_contamination" ->
      """WITH d AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
        |  FROM documents),
        |toks AS (SELECT doc_id, string_split(norm,' ') AS w FROM d),
        |bg AS (
        |  SELECT DISTINCT doc_id, w[i]||' '||w[i+1] AS ngram
        |  FROM toks, unnest(generate_series(1, len(w)-1)) AS t(i)
        |  WHERE len(w) >= 2),
        |bench AS (SELECT DISTINCT ngram FROM bg WHERE doc_id < 5)
        |SELECT doc_id, count(*) AS n_hits
        |FROM bg JOIN bench USING (ngram)
        |WHERE doc_id >= 5
        |GROUP BY doc_id HAVING count(*) >= 3
        |ORDER BY doc_id""".stripMargin,
    "ngram_counts" ->
      """WITH d AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
        |  FROM documents),
        |toks AS (SELECT doc_id, string_split(norm,' ') AS w FROM d),
        |bg AS (
        |  SELECT DISTINCT doc_id, w[i]||' '||w[i+1] AS ngram
        |  FROM toks, unnest(generate_series(1, len(w)-1)) AS t(i)
        |  WHERE len(w) >= 2)
        |SELECT ngram, count(*) AS df
        |FROM bg GROUP BY ngram
        |ORDER BY df DESC, ngram LIMIT 20""".stripMargin,
    "text_blocklist" -> TextQueries.blocklistOracle,
    "text_redact" ->
      """WITH planted AS (
        |  SELECT doc_id, source,
        |         text || ' contact user' || doc_id ||
        |         '@example.com or +1-555-' ||
        |         lpad(cast(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        |  FROM documents),
        |red AS (
        |  SELECT source,
        |         len(regexp_extract_all(t,
        |           '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_email,
        |         regexp_replace(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}',
        |           '<EMAIL>', 'g') AS r1
        |  FROM planted),
        |red2 AS (
        |  SELECT source, n_email,
        |         len(regexp_extract_all(r1, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}'))
        |           AS n_phone,
        |         regexp_replace(r1, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}',
        |           '<PHONE>', 'g') AS redacted
        |  FROM red)
        |SELECT source, count(*) AS docs,
        |       cast(sum(n_email) AS BIGINT) AS emails_redacted,
        |       cast(sum(n_phone) AS BIGINT) AS phones_redacted,
        |       min(md5(redacted)) AS sample_hash
        |FROM red2 GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_repetition" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
        |  FROM documents),
        |tok AS (SELECT doc_id, source, unnest(string_split(norm,' ')) AS term
        |        FROM d),
        |tc AS (SELECT doc_id, source, term, count(*) AS n
        |       FROM tok GROUP BY 1, 2, 3),
        |per_doc AS (
        |  SELECT doc_id, source, sum(n) AS total, count(*) AS uniq,
        |         max(n) AS top
        |  FROM tc GROUP BY 1, 2)
        |SELECT source, count(*) AS docs,
        |       round(avg(uniq::DOUBLE / total), 4) AS avg_distinct_ratio,
        |       round(avg(top::DOUBLE / total), 4) AS avg_top_share,
        |       cast(sum(CASE WHEN uniq::DOUBLE / total < 0.5 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_repetitive
        |FROM per_doc GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_tfidf" ->
      """WITH d AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(string_split(norm,' ')) AS term FROM d),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |sc AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |         tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |                               ORDER BY score DESC, term) AS rnk
        |  FROM sc)
        |SELECT doc_id, term, cast(tf AS BIGINT) AS tf, cast(df AS BIGINT) AS df,
        |       round(score, 4) AS score, cast(rnk AS INTEGER) AS rnk
        |FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,
    // same q formula as text_quality; quantile_cont == Spark's exact
    // interpolating percentile (both use pos = p*(n-1))
    "quality_percentile" ->
      """WITH d AS (
        |  SELECT source, trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
        |  FROM documents),
        |m AS (
        |  SELECT source,
        |    cast(len(string_split(norm,' ')) AS DOUBLE) AS n_tok,
        |    cast(len(list_filter(string_split(norm,' '),
        |         x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE) AS n_stop,
        |    cast(length(replace(norm,' ','')) AS DOUBLE) AS n_alpha
        |  FROM d),
        |q AS (
        |  SELECT source,
        |    0.4*least(n_tok/100.0,1.0) + 0.3*least((n_stop/n_tok)*10.0,1.0)
        |      + 0.3*(CASE WHEN n_alpha/n_tok >= 3.0 AND n_alpha/n_tok <= 8.0
        |                  THEN 1.0 ELSE 0.0 END) AS q
        |  FROM m)
        |SELECT source, count(*) AS docs,
        |       round(quantile_cont(q, 0.25), 4) AS q25,
        |       round(quantile_cont(q, 0.50), 4) AS q50,
        |       round(quantile_cont(q, 0.90), 4) AS q90
        |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "text_tokens" ->
      """WITH d AS (
        |  SELECT lang, trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
        |  FROM documents),
        |m AS (
        |  SELECT lang,
        |    cast(len(string_split(norm,' ')) AS BIGINT) AS ws,
        |    cast(len(regexp_extract_all(norm,'[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tok
        |  FROM d)
        |SELECT lang, count(*) AS docs,
        |       cast(sum(ws) AS BIGINT) AS ws_tokens,
        |       cast(sum(re_tok) AS BIGINT) AS re_tokens,
        |       round(avg(ws),4) AS avg_ws,
        |       max(re_tok) AS max_re
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin,
    "text_fingerprint" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_sort(list_distinct(
        |      string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' '))),' ')) AS fp
        |  FROM documents)
        |SELECT fp, count(*) AS n_docs, min(doc_id) AS keeper, max(doc_id) AS max_doc
        |FROM f GROUP BY fp HAVING count(*) > 1 ORDER BY fp""".stripMargin,
    // C30/C31: the chunk rule — windows of 32 tokens at every stride-24
    // offset that begins inside the doc (generate_series is stop-inclusive
    // like Spark's sequence); list_slice is 1-based inclusive, clamped,
    // matching slice(toks, start+1, 32).
    "text_chunk" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ') AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM d),
        |e AS (SELECT doc_id, toks, n,
        |             unnest(generate_series(0, greatest(n-1, 0), 24)) AS start
        |      FROM n)
        |SELECT doc_id, cast(start // 24 AS INTEGER) AS chunk_idx,
        |       cast(least(32, n - start) AS INTEGER) AS chunk_tokens,
        |       md5(array_to_string(list_slice(toks, start+1, start+32), ' ')) AS chunk_hash
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,
    "dedup_chunk" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ') AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, source, toks, len(toks) AS n FROM d),
        |e AS (SELECT doc_id, source, toks, n,
        |             unnest(generate_series(0, greatest(n-1, 0), 24)) AS start
        |      FROM n),
        |ch AS (SELECT doc_id, source,
        |              doc_id * 1048576 + start // 24 AS pos_key,
        |              md5(array_to_string(list_slice(toks, start+1, start+32), ' ')) AS chunk_hash
        |       FROM e),
        |k AS (SELECT source, pos_key,
        |             min(pos_key) OVER (PARTITION BY chunk_hash) AS keeper
        |      FROM ch)
        |SELECT source, count(*) AS n_chunks,
        |       cast(sum(CASE WHEN pos_key <> keeper THEN 1 ELSE 0 END) AS BIGINT)
        |         AS dup_chunks,
        |       cast(sum(CASE WHEN pos_key <> keeper THEN 1 ELSE 0 END) AS BIGINT)
        |         * 10000 // count(*) AS dup_bp
        |FROM k GROUP BY source ORDER BY source""".stripMargin,
    "dedup_chunk_origin" -> TextQueries.chunkOriginOracle,
    "contamination_semantic" -> VectorQueries.contaminationSemanticOracle,
    "corpus_batch_drift" -> TextQueries.corpusBatchDriftOracle,
    "sample_pack" -> graft.ops.Sample.packOracle,
    "pack_efficiency" -> graft.ops.Sample.packEfficiencyOracle,
    "sample_curriculum" -> graft.ops.Sample.curriculumOracle,
    "export_manifest" -> graft.ops.Pipeline.manifestOracle,
    "export_manifest_delta" -> graft.ops.Pipeline.manifestDeltaOracle,
    "meta_partition_health" -> graft.ingest.PartitionHealth.healthOracle,
    "corpus_topics" -> graft.ops.KMeans.topicsOracle,
    // Round-11 learned-state-as-data promotions (the C59 posture over
    // the k-means family): centroids (and where the face consumes the
    // frozen last-round assignment, that too) export as parquet side
    // tables; DuckDB replays the argmax assignment, probe selection,
    // rescoring, ranking, and card arithmetic from them.
    "dedup_semantic" -> VectorQueries.dedupSemanticOracle,
    "sim_search_ivf" -> VectorQueries.simSearchIvfOracle,
    "sim_search_ivf_learned" -> VectorQueries.simSearchIvfLearnedOracle,
    "knn_graph" -> VectorQueries.knnGraphOracle,
    "sample_diverse" -> VectorQueries.sampleDiverseOracle,
    "embed_kmeans" -> graft.ops.KMeans.embedKmeansOracle,
    // C51: NO export needed — SQ8's min/max "training" is
    // order-independent, so the whole pipeline replays from the corpus
    "sim_search_sq8" -> graft.ops.ScalarQuant.sq8Oracle,
    // C38 family: trained codebooks (+ permutation / rotation) exported
    // as data; encode argmin, ADC fold, candidate cut, rescore and rank
    // all replayed (bit-exact: diff-dot l2, ordered ones-dot ADC sum)
    "sim_search_pq" -> graft.ops.ProductQuant.simSearchPqOracle,
    "sim_search_opq" -> graft.ops.ProductQuant.simSearchOpqOracle,
    "sim_search_opq_rot" -> graft.ops.Opq.simSearchOpqRotOracle,
    "sim_search_opq_cached" -> graft.ops.Opq.simSearchOpqCachedOracle,
    // C44/C44a: coarse centroids + residual codebook as data; the
    // oracle re-derives the posting lists AND the serve path
    "sim_search_ivfpq" -> graft.ops.IvfPq.simSearchIvfPqOracle,
    "sim_search_ivfpq_cached" -> graft.ops.IvfPq.simSearchIvfPqCachedOracle,
    // C76/C76a: centroids + residual codebook as data; assignment,
    // residual encode, code-pair SDC gate (IEEE cut expression), exact
    // confirm, and the card all replayed
    "dedup_semantic_pq" -> graft.ops.SemanticPq.dedupSemanticPqOracle,
    "dedup_semantic_pq_cached" -> graft.ops.SemanticPq.dedupSemanticPqCachedOracle,
    // C89/C89a: edge-inline adjacency + entry medoids as data; the
    // whole batched beam search replayed as unrolled hop CTEs
    "sim_search_graph" -> graft.ops.GraphAnn.simSearchGraphOracle,
    "sim_search_graph_cached" -> graft.ops.GraphAnn.simSearchGraphCachedOracle,
    // C89b: gate SFs sit below GraphServeKnee, where the auto face IS
    // the cached beam serve — its oracle replays unchanged (Verify
    // asserts the route)
    "sim_search_graph_auto" -> graft.ops.GraphAnn.simSearchGraphCachedOracle,
    // C79/C79a: the frozen standing-corpus model as data; both sides'
    // encode, the wider-margin SDC probe gate, exact confirm, and the
    // per-label card replayed
    "dedup_semantic_incremental" ->
      graft.ops.SemanticPq.dedupSemanticIncrementalOracle,
    "dedup_semantic_incremental_cached" ->
      graft.ops.SemanticPq.dedupSemanticIncrementalCachedOracle,
    // C42b/C42c: the 8-bit LM tables as data (their ln log-probs and
    // sketch-cut codebooks are the learned state); scoring + drift
    // card replayed, round-4 absorbing sum-order ulp (C42 posture)
    "text_perplexity_quantized" ->
      TextQueries.textPerplexityQuantizedOracle,
    "text_perplexity_quantized_cached" ->
      TextQueries.textPerplexityQuantizedCachedOracle,
    // C87/C87a: method top-k lists exported as data (the C102
    // export-the-learned-half posture); exact ground truth + the
    // overlay arithmetic replayed from the corpus
    "ann_recall_audit" -> VectorQueries.annRecallAuditOracle,
    "ann_recall_audit_cached" -> VectorQueries.annRecallAuditCachedOracle,
    "text_unigram_lm" -> graft.ops.UnigramLm.unigramOracle,
    // C33: cumulative funnel — flags from one normalized projection, the
    // keeper from the dedup hash-window, stages unpivoted from one agg row
    "quality_gopher" ->
      """WITH d AS (
        |  SELECT source, trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
        |  FROM documents),
        |t AS (SELECT source, string_split(norm,' ') AS w, len(norm) AS chars
        |      FROM d),
        |r AS (SELECT source, len(w) AS n, chars,
        |        len(list_distinct(w)) AS u,
        |        len(list_filter(w,
        |          x -> x IN ('the','a','of','and','to','in'))) AS stop
        |      FROM t),
        |f AS (SELECT source,
        |        CASE WHEN n >= 25 AND n <= 100000 THEN 1 ELSE 0 END AS f_len,
        |        CASE WHEN 3*n <= chars-n+1 AND 2*(chars-n+1) <= 9*n
        |             THEN 1 ELSE 0 END AS f_wordlen,
        |        CASE WHEN stop >= 4 THEN 1 ELSE 0 END AS f_stop,
        |        CASE WHEN 20*u >= 9*n THEN 1 ELSE 0 END AS f_uniq
        |      FROM r)
        |SELECT source, count(*) AS docs,
        |       cast(sum(f_len) AS BIGINT) AS p_len,
        |       cast(sum(f_wordlen) AS BIGINT) AS p_wordlen,
        |       cast(sum(f_stop) AS BIGINT) AS p_stop,
        |       cast(sum(f_uniq) AS BIGINT) AS p_uniq,
        |       cast(sum(f_len*f_wordlen*f_stop*f_uniq) AS BIGINT) AS p_all
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    "sample_cap_source" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         cast(len(string_split(trim(regexp_replace(lower(text),
        |           '\s+',' ','g')),' ')) AS BIGINT) AS tok,
        |         substring(md5('cap|' || cast(doc_id AS VARCHAR)), 1, 6)
        |           AS coin
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |                                   ORDER BY coin, doc_id) AS rk
        |      FROM d)
        |SELECT source, count(*) AS docs,
        |       cast(sum(CASE WHEN rk <= 15 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS kept,
        |       cast(sum(CASE WHEN rk > 15 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS dropped,
        |       cast(sum(CASE WHEN rk <= 15 THEN tok ELSE 0 END) AS BIGINT)
        |         AS kept_tokens,
        |       cast(sum(CASE WHEN rk <= 15 THEN tok ELSE 0 END) * 10000
        |            // sum(tok) AS BIGINT) AS kept_share_bp
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "sample_weighted" -> graft.ops.Sample.weightedOracle,
    "quality_funnel" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |         trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, n_chars, md5(norm) AS h,
        |    cast(len(string_split(norm,' ')) AS DOUBLE) AS n_tok,
        |    cast(len(list_filter(string_split(norm,' '),
        |         x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE) AS n_stop,
        |    cast(length(replace(norm,' ','')) AS DOUBLE) AS n_alpha,
        |    cast(len(list_distinct(string_split(norm,' '))) AS DOUBLE) AS uniq
        |  FROM d),
        |f AS (
        |  SELECT
        |    CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END AS f_len,
        |    CASE WHEN 0.4*least(n_tok/100.0,1.0)
        |            + 0.3*least((n_stop/n_tok)*10.0,1.0)
        |            + 0.3*(CASE WHEN n_alpha/n_tok >= 3.0 AND n_alpha/n_tok <= 8.0
        |                        THEN 1.0 ELSE 0.0 END) >= 0.5
        |         THEN 1 ELSE 0 END AS f_q,
        |    CASE WHEN uniq/n_tok >= 0.5 THEN 1 ELSE 0 END AS f_div,
        |    CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY h)
        |         THEN 1 ELSE 0 END AS f_uniq
        |  FROM m),
        |a AS (
        |  SELECT count(*) AS total, sum(f_len) AS s1, sum(f_len*f_q) AS s2,
        |         sum(f_len*f_q*f_div) AS s3, sum(f_len*f_q*f_div*f_uniq) AS s4
        |  FROM f)
        |SELECT stage, cast(survivors AS BIGINT) AS survivors,
        |       cast(dropped AS BIGINT) AS dropped
        |FROM (
        |  SELECT '0_all' AS stage, total AS survivors, 0 AS dropped FROM a
        |  UNION ALL SELECT '1_length', s1, total - s1 FROM a
        |  UNION ALL SELECT '2_quality', s2, s1 - s2 FROM a
        |  UNION ALL SELECT '3_diversity', s3, s2 - s3 FROM a
        |  UNION ALL SELECT '4_unique', s4, s3 - s4 FROM a)
        |ORDER BY stage""".stripMargin,
    // C34: dataset card — ROLLUP over (source, lang)
    "corpus_stats" ->
      """WITH d AS (
        |  SELECT source, lang, n_chars,
        |    cast(len(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' '))
        |         AS BIGINT) AS ws
        |  FROM documents)
        |SELECT coalesce(source,'ALL') AS source, coalesce(lang,'ALL') AS lang,
        |       count(*) AS docs, cast(sum(n_chars) AS BIGINT) AS chars,
        |       cast(sum(ws) AS BIGINT) AS tokens,
        |       round(avg(ws),4) AS avg_tokens
        |FROM d GROUP BY ROLLUP(source, lang) ORDER BY source, lang""".stripMargin,
    // C35: canonicalization audit — planted deterministic mess (the corpus
    // is already canonical), md5 witness over the recovered canonical text
    "text_vocab" ->
      """WITH toks AS (
        |  SELECT string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ') AS w
        |  FROM documents),
        |tc AS (SELECT term, count(*) AS n
        |       FROM (SELECT unnest(w) AS term FROM toks) GROUP BY term),
        |tot AS (SELECT sum(n) AS t FROM tc),
        |top AS (SELECT term, cast(n AS BIGINT) AS n,
        |               cast(n * 10000 // t AS BIGINT) AS share_bp,
        |               cast(row_number() OVER (ORDER BY n DESC, term) AS INT) AS rank
        |        FROM tc, tot ORDER BY n DESC, term LIMIT 50)
        |SELECT rank, term, n, share_bp,
        |       cast(sum(share_bp) OVER (ORDER BY rank) AS BIGINT) AS cum_share_bp
        |FROM top ORDER BY rank""".stripMargin,
    "corpus_lengths" ->
      """WITH b AS (SELECT source, n_chars // 100 AS bucket FROM documents),
        |g AS (SELECT source, bucket, count(*) AS docs FROM b
        |      GROUP BY source, bucket),
        |t AS (SELECT source, bucket, docs,
        |             sum(docs) OVER (PARTITION BY source) AS src_docs FROM g)
        |SELECT source, cast(bucket AS BIGINT) AS bucket,
        |       cast(bucket * 100 AS BIGINT) AS lo_chars,
        |       cast(docs AS BIGINT) AS docs,
        |       cast(docs * 10000 // src_docs AS BIGINT) AS share_bp
        |FROM t ORDER BY source, bucket""".stripMargin,
    "corpus_divergence" ->
      """WITH toks AS (
        |  SELECT source,
        |         string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ') AS w
        |  FROM documents),
        |st AS (SELECT source, term, count(*) AS n
        |       FROM (SELECT source, unnest(w) AS term FROM toks)
        |       GROUP BY source, term),
        |srct AS (SELECT source, cast(sum(n) AS BIGINT) AS src_tokens
        |         FROM st GROUP BY source),
        |corpus AS (SELECT term, sum(n) AS cn FROM st GROUP BY term),
        |ct AS (SELECT sum(cn) AS ct FROM corpus),
        |top AS (SELECT term, cast(cn * 10000 // ct AS BIGINT) AS corpus_bp
        |        FROM corpus, ct ORDER BY cn DESC, term LIMIT 30),
        |grid AS (SELECT s.source, s.src_tokens, t.term, t.corpus_bp
        |         FROM srct s, top t),
        |probe AS (SELECT g.source, g.src_tokens, g.corpus_bp,
        |                 coalesce(st.n, 0) * 10000 // g.src_tokens AS src_bp
        |          FROM grid g
        |          LEFT JOIN st ON st.source = g.source AND st.term = g.term)
        |SELECT source, src_tokens,
        |       cast(sum(src_bp) AS BIGINT) AS top_coverage_bp,
        |       cast(sum(abs(src_bp - corpus_bp)) AS BIGINT) AS divergence_bp
        |FROM probe GROUP BY source, src_tokens ORDER BY source""".stripMargin,
    "text_normalize" ->
      """WITH d AS (
        |  SELECT source, text,
        |         CASE WHEN doc_id % 3 = 0 THEN '  ' || upper(text)
        |              WHEN doc_id % 3 = 1 THEN replace(text, ' ', '  ')
        |              ELSE text END AS t
        |  FROM documents),
        |n AS (
        |  SELECT source, text, t,
        |         trim(regexp_replace(lower(t),'\s+',' ','g')) AS norm
        |  FROM d)
        |SELECT source, count(*) AS docs,
        |       cast(sum(CASE WHEN norm <> t THEN 1 ELSE 0 END) AS BIGINT) AS changed,
        |       cast(sum(length(t) - length(norm)) AS BIGINT) AS chars_removed,
        |       cast(sum(CASE WHEN norm = trim(regexp_replace(lower(text),'\s+',' ','g'))
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS recovered,
        |       min(md5(norm)) AS sample_hash
        |FROM n GROUP BY source ORDER BY source""".stripMargin,
    "dedup_ngram_jaccard" -> DedupQueries.jaccardOracle,
    "dedup_minhash" -> DedupQueries.minhashOracle,
    "dedup_minhash_tuning" -> DedupQueries.minhashTuningOracle,
    // C64: the estimator algebra replays in SQL because the sketch is
    // DATA — identical md5-60 hashes build identical sketches
    "corpus_overlap_kmv" -> DedupQueries.kmvOracle,
    // C77: same argument, plus the bloom-free exact confirm (C72 gate
    // exactness) and NULL-for-untried semantics
    "text_contamination_triage" -> graft.ops.Decontaminate.triageOracle,
    "dedup_edit" -> DedupQueries.editOracle,
    "corpus_diff" -> graft.ingest.CorpusDiff.oracle,
    "dedup_exact_substr" -> ExactSubstr.oracle,
    "dedup_curve" -> ExactSubstr.dedupCurveOracle,
    "dedup_curve_spans" -> ExactSubstr.dedupCurveSpansOracle,
    "text_remove_dup_spans" -> ExactSubstr.removeOracle,
    "dedup_incremental_spans" -> ExactSubstr.incrementalOracle,
    "dedup_span_provenance" -> ExactSubstr.provenanceOracle,
    "dedup_span_origin" -> ExactSubstr.originOracle,
    "mixture_effective" -> ExactSubstr.mixtureEffectiveOracle,
    "text_contamination_bloom" -> Decontaminate.oracle,
    "dedup_keeper_quality" -> DedupQueries.keeperQualityOracle,
    "dedup_incremental" -> DedupQueries.incrementalOracle,
    "dedup_bloom" -> DedupQueries.bloomOracle,
    "dedup_source_matrix" -> DedupQueries.sourceMatrixOracle,
    "dedup_winnow" -> DedupQueries.winnowOracle,
    "q37_grouping_sets" ->
      """WITH base AS (
        |  SELECT n_name, r_name, year(o_orderdate) AS yr,
        |         cast(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey)
        |SELECT CASE WHEN GROUPING(n_name) = 0 THEN 'nation'
        |            ELSE 'region' END AS level,
        |       coalesce(n_name, r_name) AS name, yr,
        |       count(*) AS orders,
        |       cast(sum(cents) AS BIGINT) AS revenue_cents
        |FROM base
        |GROUP BY GROUPING SETS ((n_name, yr), (r_name, yr))
        |ORDER BY level, name, yr""".stripMargin,
    "q34_new_users" ->
      """WITH f AS (
        |  SELECT user_id,
        |         min(cast(floor(epoch(ts)) AS BIGINT) // 86400) AS day
        |  FROM events GROUP BY 1),
        |n AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1)
        |SELECT day, new_users,
        |       cast(sum(new_users) OVER (ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS cum_users
        |FROM n ORDER BY day""".stripMargin,
    "dedup_cluster" -> DedupQueries.clusterOracle,
    "dedup_split_leakage" -> DedupQueries.splitLeakageOracle,
    "mixture_plan" -> graft.ops.Sample.mixturePlanOracle,
    "mixture_temperature" -> graft.ops.Sample.mixtureTemperatureOracle,
    "mixture_apply" -> graft.ops.Sample.mixtureApplyOracle,
    "corpus_zipf" -> TextQueries.corpusZipfOracle,
    "token_fertility" -> TextQueries.tokenFertilityOracle,
    "dedup_prefix" -> TextQueries.dedupPrefixOracle,
    "meta_expectations" ->
      """WITH lo AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 103 = 0 THEN o_custkey + 1000000000
        |              ELSE o_custkey END AS o_custkey
        |  FROM (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 107 <> 0
        |        UNION ALL
        |        SELECT o_orderkey, o_custkey FROM orders
        |        WHERE o_orderkey % 107 <> 0 AND o_orderkey % 101 = 0)),
        |ll AS (
        |  SELECT l_orderkey,
        |         CASE WHEN l_orderkey % 97 = 0 THEN -l_quantity
        |              ELSE l_quantity END AS l_quantity,
        |         CASE WHEN l_orderkey % 95 = 0 THEN l_discount + 2.0
        |              ELSE l_discount END AS l_discount
        |  FROM lineitem),
        |lc AS (
        |  SELECT c_custkey,
        |         CASE WHEN c_custkey % 89 = 0 THEN '' ELSE c_name END AS c_name
        |  FROM customer)
        |SELECT 'pk_orders_unique' AS check_name,
        |  cast((SELECT count(*) FROM (SELECT o_orderkey FROM lo
        |        GROUP BY 1 HAVING count(*) > 1) q) AS BIGINT) AS violations,
        |  cast((SELECT count(*) FROM lo) AS BIGINT) AS total
        |UNION ALL SELECT 'fk_lineitem_orders',
        |  cast((SELECT count(*) FROM ll
        |        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM lo)) AS BIGINT),
        |  cast((SELECT count(*) FROM ll) AS BIGINT)
        |UNION ALL SELECT 'fk_orders_customer',
        |  cast((SELECT count(*) FROM lo
        |        WHERE o_custkey NOT IN (SELECT c_custkey FROM lc)) AS BIGINT),
        |  cast((SELECT count(*) FROM lo) AS BIGINT)
        |UNION ALL SELECT 'dom_discount_range',
        |  cast((SELECT count(*) FROM ll
        |        WHERE l_discount < 0 OR l_discount > 1) AS BIGINT),
        |  cast((SELECT count(*) FROM ll) AS BIGINT)
        |UNION ALL SELECT 'dom_quantity_positive',
        |  cast((SELECT count(*) FROM ll WHERE l_quantity <= 0) AS BIGINT),
        |  cast((SELECT count(*) FROM ll) AS BIGINT)
        |UNION ALL SELECT 'dom_customer_name',
        |  cast((SELECT count(*) FROM lc
        |        WHERE c_name IS NULL OR c_name = '') AS BIGINT),
        |  cast((SELECT count(*) FROM lc) AS BIGINT)
        |ORDER BY check_name""".stripMargin,
    "q36_late_shipments" ->
      """SELECT year(l_shipdate) AS ship_year,
        |  cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS urgent_lines,
        |  cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS other_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE cast(floor(epoch(l_shipdate)) AS BIGINT)
        |    - cast(floor(epoch(o_orderdate)) AS BIGINT) > 365 * 86400
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q35_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |         cast(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events),
        |f AS (
        |  SELECT user_id, sec, event_id,
        |         CASE WHEN sec - lag(sec) OVER w > 1800
        |              OR lag(sec) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |g AS (
        |  SELECT user_id, sec,
        |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM f),
        |s AS (
        |  SELECT user_id, sess, min(sec) AS start_sec, max(sec) AS end_sec,
        |         count(*) AS n_events
        |  FROM g GROUP BY 1, 2)
        |SELECT start_sec // 86400 AS day,
        |       count(*) AS sessions,
        |       cast(sum(n_events) AS BIGINT) AS events,
        |       cast(sum(end_sec - start_sec) AS BIGINT) AS total_duration_s,
        |       cast(max(n_events) AS BIGINT) AS max_events
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_simhash" -> DedupQueries.simhashOracle,
    "dedup_embedding" ->
      """WITH v AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS e
        |  FROM embeddings),
        |n AS (SELECT vec_id, label, e,
        |             sqrt(list_dot_product(e, e)) AS nrm FROM v)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
        |       round(list_dot_product(a.e, b.e)/(a.nrm*b.nrm), 4) AS cosine
        |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_dot_product(a.e, b.e)/(a.nrm*b.nrm) >= 0.35
        |ORDER BY vec_a, vec_b""".stripMargin,
    "sim_search_topk" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
        |  FROM embeddings),
        |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM n WHERE vec_id < 5),
        |c AS (SELECT query_id, vec_id,
        |             round(list_dot_product(qe, e)/(qn*nrm), 4) AS cosine
        |      FROM q, n WHERE vec_id <> query_id),
        |r AS (SELECT *, rank() OVER (PARTITION BY query_id
        |                             ORDER BY cosine DESC, vec_id) AS rnk
        |      FROM c)
        |SELECT query_id, rnk, vec_id, cosine FROM r WHERE rnk <= 10
        |ORDER BY query_id, rnk, vec_id""".stripMargin,
    "ann_dim_audit" -> VectorQueries.annDimAuditOracle,
    "sim_search_adaptive" -> VectorQueries.simSearchAdaptiveOracle,
    "search_bm25" -> graft.ops.Retrieval.bm25Oracle,
    // C97a: result-identical to search_bm25 by contract (same serve
    // half over the persisted frames) — the C56a same-oracle posture
    "search_bm25_cached" -> graft.ops.Retrieval.bm25Oracle,
    "retrieval_negatives" -> graft.ops.Retrieval.negativesOracle,
    "search_hybrid" -> graft.ops.Retrieval.hybridOracle,
    // C7/C5a: the seeded plane sets are INLINED into generated SQL, so
    // the LSH faces hash-check end to end (bucket sign tests are
    // engine-exact — the same left-to-right dot parity the cosine
    // oracles rest on)
    "sim_search_lsh" -> VectorQueries.simSearchLshOracle,
    // serve face: same oracle by contract — the persisted banding is
    // deterministic data, so warm results equal the inline build's
    "sim_search_lsh_cached" -> VectorQueries.simSearchLshOracle,
    // gate SFs sit below LshServeKnee, where the auto face IS the
    // cached serve (Verify asserts the route)
    "sim_search_lsh_auto" -> VectorQueries.simSearchLshOracle,
    "dedup_embedding_lsh" -> VectorQueries.dedupEmbeddingLshOracle,
    // gate SFs sit below the knee, where the auto face IS the exact face
    "dedup_embedding_auto" -> VectorQueries.dedupEmbeddingLshOracle,
    "embed_centroids" ->
      """WITH v AS (
        |  SELECT label, list_transform(embedding, x -> x::DOUBLE) AS e
        |  FROM embeddings),
        |c AS (
        |  SELECT label, i AS dim, avg(e[i]) AS m, count(*) AS n
        |  FROM v, unnest(generate_series(1, len(e))) AS t(i)
        |  GROUP BY label, i)
        |SELECT label, cast(max(n) AS BIGINT) AS n_vecs,
        |       round(sqrt(sum(m*m)), 4) AS centroid_norm,
        |       round(max(m), 4) AS max_comp,
        |       round(min(m), 4) AS min_comp
        |FROM c GROUP BY label ORDER BY label""".stripMargin,
    "embed_divergence" -> VectorQueries.embedDivergenceOracle,
    "embed_stats" ->
      """WITH v AS (
        |  SELECT label, list_transform(embedding, x -> x::DOUBLE) AS e
        |  FROM embeddings),
        |m AS (SELECT label, sqrt(list_dot_product(e, e)) AS nrm,
        |             list_sum(e)/len(e) AS mean_c FROM v),
        |f AS (SELECT label, nrm, mean_c,
        |             (nrm IS NULL OR nrm <= 0) AS deg FROM m)
        |SELECT label, count(*) AS n,
        |       count(*) FILTER (WHERE deg) AS n_degenerate,
        |       round(avg(nrm) FILTER (WHERE NOT deg), 4) AS avg_norm,
        |       round(min(nrm) FILTER (WHERE NOT deg), 4) AS min_norm,
        |       round(max(nrm) FILTER (WHERE NOT deg), 4) AS max_norm,
        |       round(avg(mean_c) FILTER (WHERE NOT deg), 4) AS avg_mean_comp
        |FROM f GROUP BY label ORDER BY label""".stripMargin,
    // meta_schema_discovery / meta_ddl_export: DuckDB introspects the
    // same parquet through information_schema.columns (the oracle's own
    // independent schema read), type names mapped to Spark's SQL
    // spellings; the supplemental crawl zone's two tables are
    // schema-deterministic by construction, so their rows are spelled
    // literally.
    "meta_schema_discovery" ->
      """WITH main AS (
        |  SELECT table_name, column_name, (ordinal_position - 1)::INT AS ordinal,
        |    CASE data_type WHEN 'BIGINT' THEN 'bigint' WHEN 'INTEGER' THEN 'int'
        |      WHEN 'DOUBLE' THEN 'double' WHEN 'VARCHAR' THEN 'string'
        |      WHEN 'TIMESTAMP' THEN 'timestamp_ntz' WHEN 'DATE' THEN 'date'
        |      WHEN 'FLOAT[]' THEN 'array<float>' WHEN 'FLOAT' THEN 'float'
        |      ELSE lower(data_type) END AS data_type,
        |    (is_nullable = 'YES') AS nullable, false AS is_partition
        |  FROM information_schema.columns
        |  WHERE table_name IN ('region','nation','customer','supplier','part',
        |                       'orders','lineitem','events','documents','embeddings')),
        |supp AS (
        |  SELECT * FROM (VALUES
        |    ('daily_totals', 'TRANSFERRED_DATE', 0, 'string', true, false),
        |    ('daily_totals', 'n_events', 1, 'bigint', true, false),
        |    ('events_daily', 'n_events', 0, 'bigint', true, false),
        |    ('events_daily', 'TRANSFERRED_DATE', 1, 'date', true, true))
        |    AS t(table_name, column_name, ordinal, data_type, nullable, is_partition))
        |SELECT table_name, column_name, ordinal::INT AS ordinal, data_type, nullable, is_partition
        |FROM (SELECT * FROM main UNION ALL SELECT * FROM supp)
        |ORDER BY table_name, ordinal""".stripMargin,
    "meta_ddl_export" ->
      """WITH main AS (
        |  SELECT table_name,
        |    'CREATE TABLE ' || table_name || ' (' || chr(10) ||
        |    string_agg('  ' || column_name || ' ' ||
        |      CASE data_type WHEN 'BIGINT' THEN 'bigint' WHEN 'INTEGER' THEN 'int'
        |        WHEN 'DOUBLE' THEN 'double' WHEN 'VARCHAR' THEN 'string'
        |        WHEN 'TIMESTAMP' THEN 'timestamp_ntz' WHEN 'DATE' THEN 'date'
        |        WHEN 'FLOAT[]' THEN 'array<float>' WHEN 'FLOAT' THEN 'float'
        |        ELSE lower(data_type) END,
        |      ',' || chr(10) ORDER BY ordinal_position) ||
        |    chr(10) || ')' || chr(10) || 'USING parquet' AS ddl
        |  FROM information_schema.columns
        |  WHERE table_name IN ('region','nation','customer','supplier','part',
        |                       'orders','lineitem','events','documents','embeddings')
        |  GROUP BY table_name),
        |supp AS (
        |  SELECT * FROM (VALUES
        |    ('daily_totals', 'CREATE TABLE daily_totals (' || chr(10) ||
        |      '  TRANSFERRED_DATE string,' || chr(10) || '  n_events bigint' || chr(10) ||
        |      ')' || chr(10) || 'USING parquet'),
        |    ('events_daily', 'CREATE TABLE events_daily (' || chr(10) ||
        |      '  n_events bigint' || chr(10) || ')' || chr(10) ||
        |      'USING parquet' || chr(10) || 'PARTITIONED BY (TRANSFERRED_DATE date)'))
        |    AS t(table_name, ddl))
        |SELECT table_name, ddl FROM (SELECT * FROM main UNION ALL SELECT * FROM supp)
        |ORDER BY table_name""".stripMargin,
    "mm_metadata" ->
      """WITH m AS (
        |  SELECT source,
        |         octet_length(encode(text)) AS byte_len,
        |         sha256(text) AS content_id
        |  FROM documents),
        |d AS (
        |  SELECT source, byte_len, content_id,
        |    CASE byte_len % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
        |         ELSE 'webp' END AS fmt,
        |    64 + byte_len % 960 AS width,
        |    64 + (byte_len * 7) % 960 AS height
        |  FROM m)
        |SELECT source, fmt, count(*) AS n,
        |       cast(sum(byte_len) AS BIGINT) AS total_bytes,
        |       round(avg(width), 4) AS avg_width,
        |       round(avg(height), 4) AS avg_height,
        |       min(content_id) AS min_cid
        |FROM d GROUP BY source, fmt ORDER BY source, fmt""".stripMargin,
    // byte histogram == char-code histogram because the corpus is ASCII
    // (one byte per char); a non-ASCII doc would break this equality and
    // fail the gate loudly.
    "mm_features" ->
      """WITH bins AS (SELECT unnest(generate_series(0, 15)) AS bin),
        |d AS (SELECT doc_id, source, text, length(text) AS len FROM documents),
        |pb AS (
        |  SELECT doc_id, ord(substr(text, i, 1)) // 16 AS bin
        |  FROM d, unnest(generate_series(1, length(text))) AS t(i)),
        |cnt AS (SELECT doc_id, bin, count(*) AS c FROM pb GROUP BY doc_id, bin),
        |grid AS (SELECT d.doc_id, d.source, d.len, bins.bin FROM d CROSS JOIN bins),
        |share AS (
        |  SELECT g.source, g.bin,
        |         coalesce(cnt.c, 0)::DOUBLE / g.len AS share
        |  FROM grid g LEFT JOIN cnt ON g.doc_id = cnt.doc_id AND g.bin = cnt.bin)
        |SELECT source, bin, round(avg(share), 4) AS avg_share, count(*) AS docs
        |FROM share GROUP BY source, bin ORDER BY source, bin""".stripMargin,
    // generated from Sample.DemoWeights — same md5 bucket + thresholds
    "sample_mixture" -> graft.ops.Sample.mixtureOracle,
    "sample_split" -> graft.ops.Sample.splitOracle,
    "sample_stratified" -> graft.ops.Sample.stratifiedOracle,
    "mixture_tokens" -> graft.ops.Sample.mixtureTokensOracle,
    // the buckets are an execution detail — the oracle is the plain
    // inequality join on floor-second epochs
    "range_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |e AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'error')
        |SELECT p.event_id, p.user_id,
        |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |       cast(count(e.ts) AS BIGINT) AS n_errors,
        |       round(coalesce(sum(e.value), 0), 2) AS err_value
        |FROM p LEFT JOIN e
        |  ON p.user_id = e.user_id
        | AND cast(floor(epoch(e.ts)) AS BIGINT) > cast(floor(epoch(p.ts)) AS BIGINT)
        | AND cast(floor(epoch(e.ts)) AS BIGINT) <= cast(floor(epoch(p.ts)) AS BIGINT) + 300
        |GROUP BY 1, 2, 3 ORDER BY event_id""".stripMargin,
    // the oracle is DuckDB's NATIVE ASOF JOIN — an independent engine
    // implementation of the same point-in-time semantics
    "asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, ts AS click_ts0, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |       c.click_id,
        |       strftime(c.click_ts0, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |       cast(floor(epoch(p.ts)) AS BIGINT)
        |         - cast(floor(epoch(c.click_ts0)) AS BIGINT) AS gap_s
        |FROM p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.click_ts0
        |ORDER BY event_id""".stripMargin,
    // the salt is an execution detail — the oracle is the plain join
    "skew_salted_join" ->
      """WITH large AS (
        |  SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 0
        |              ELSE l_partkey % 50 END AS hot_key,
        |         l_extendedprice
        |  FROM lineitem),
        |small AS (
        |  SELECT p_partkey % 50 AS hot_key, min(p_type) AS grp_type
        |  FROM part GROUP BY 1)
        |SELECT grp_type, count(*) AS n,
        |       round(sum(l_extendedprice), 2) AS revenue
        |FROM large JOIN small USING (hot_key)
        |GROUP BY grp_type ORDER BY grp_type""".stripMargin,
    "stream_events_window" ->
      """SELECT strftime(date_trunc('hour', ts),'%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, count(*) AS n, round(sum(value), 2) AS value_sum
        |FROM events
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "stream_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, cast(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events),
        |g AS (
        |  SELECT user_id, sec, event_id,
        |    CASE WHEN lag(sec) OVER w IS NULL
        |           OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS is_start
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |s AS (
        |  SELECT user_id, sec,
        |    sum(is_start) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM g),
        |ses AS (
        |  SELECT user_id, session_idx, count(*) AS n_events,
        |         max(sec) - min(sec) AS dur
        |  FROM s GROUP BY user_id, session_idx)
        |SELECT user_id, count(*) AS n_sessions,
        |       cast(sum(n_events) AS BIGINT) AS n_events,
        |       cast(max(dur) AS BIGINT) AS max_dur_s,
        |       cast(min(dur) AS BIGINT) AS min_dur_s
        |FROM ses GROUP BY user_id ORDER BY user_id""".stripMargin,
    // C65: the anneal plan's only floating point is bucket membership
    // (round-10 compare vs the per-source head cut); every OUTPUT
    // column is an integer, so the face is hash-checkable despite the
    // ln inside. DuckDB's quantile_disc shares Spark
    // percentile_approx's exact-regime rank convention (probed
    // value-identical across n=5..167).
    "mixture_anneal" ->
      """WITH tf AS (
        |  SELECT doc_id, source, term, count(*)::BIGINT AS tf FROM (
        |    SELECT doc_id, source,
        |           unnest(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ')) AS term
        |    FROM documents) t(doc_id, source, term)
        |  WHERE term <> '' GROUP BY 1,2,3),
        |lm AS (SELECT term, sum(tf)::BIGINT AS tn FROM tf GROUP BY term),
        |tot AS (SELECT sum(tn)::BIGINT AS t FROM lm),
        |per AS (
        |  SELECT doc_id, any_value(source) AS source,
        |    -(sum(tf * ln(tn::DOUBLE / t)) / sum(tf)) AS xent
        |  FROM tf JOIN lm USING (term), tot GROUP BY doc_id),
        |toks AS (
        |  SELECT doc_id,
        |         len(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' '))::BIGINT AS tok
        |  FROM documents),
        |cuts AS (SELECT source, quantile_disc(xent, 1.0/3) AS head_cut FROM per GROUP BY source),
        |phased AS (
        |  SELECT source, tok, unnest(CASE WHEN round(xent,10) <= round(head_cut,10)
        |      THEN ['main','anneal'] ELSE ['main'] END) AS phase
        |  FROM per JOIN toks USING (doc_id) JOIN cuts USING (source)),
        |agg AS (SELECT phase, source, count(*)::BIGINT AS docs, sum(tok)::BIGINT AS tokens
        |        FROM phased GROUP BY 1,2)
        |SELECT phase, source, docs, tokens,
        |  (tokens * 10000 // (sum(tokens) OVER (PARTITION BY phase)))::BIGINT AS share_bp
        |FROM agg ORDER BY phase, source""".stripMargin,
    "text_bpe_merges" -> bpeMergesOracle,
    // C57 and its serve face C57a are result-identical by contract
    // (BpeSpec pins it) — the C72 oracle-is-the-exact-face pattern
    "text_bpe_encode" -> bpeEncodeOracle,
    "text_bpe_encode_cached" -> bpeEncodeOracle,
    // C19a: percentile_approx is in its EXACT regime at gate group
    // sizes (n < accuracy=10000) where it returns the element at
    // 1-based rank max(1, ceil(p·n)) — QuantileSummaries.query's rank
    // target, verified against the Spark dump at BOTH n=25 (sf0.01)
    // and n=2500 (sf1); the earlier 1 + ceil(p·(n−1)) spelling
    // coincides at n=25 for these p but picks the next-higher rank
    // whenever p·n is integral (caught by the sf1 gate sweep). NOT
    // quantile_disc, whose floor convention diverges whenever the
    // target is fractional — spelled explicitly.
    // Because the selected element is a RAW data double (no averaging),
    // round() must match Spark's BigDecimal.valueOf exactly: DuckDB's
    // double round() re-multiplies (0.90274999…·1e4 → 9027.5 → 0.9028
    // — wrong), so the oracle rounds through the shortest varchar repr
    // cast to DECIMAL — bit-equal to Java's Double.toString fold.
    "quality_percentile_approx" ->
      """WITH d AS (
        |  SELECT source, trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
        |  FROM documents),
        |m AS (
        |  SELECT source,
        |    cast(len(string_split(norm,' ')) AS DOUBLE) AS n_tok,
        |    cast(len(list_filter(string_split(norm,' '),
        |         x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE) AS n_stop,
        |    cast(length(replace(norm,' ','')) AS DOUBLE) AS n_alpha
        |  FROM d),
        |q AS (
        |  SELECT source,
        |    0.4*least(n_tok/100.0,1.0) + 0.3*least((n_stop/n_tok)*10.0,1.0)
        |      + 0.3*(CASE WHEN n_alpha/n_tok >= 3.0 AND n_alpha/n_tok <= 8.0
        |                  THEN 1.0 ELSE 0.0 END) AS q
        |  FROM m),
        |r AS (
        |  SELECT source, q,
        |         row_number() OVER (PARTITION BY source ORDER BY q) AS rk,
        |         count(*) OVER (PARTITION BY source) AS n
        |  FROM q)
        |SELECT source, count(*) AS docs,
        |  cast(round(cast(cast(max(CASE WHEN rk = greatest(1, ceil(cast(0.25 AS DOUBLE)*n)) THEN q END) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS q25,
        |  cast(round(cast(cast(max(CASE WHEN rk = greatest(1, ceil(cast(0.5 AS DOUBLE)*n)) THEN q END) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS q50,
        |  cast(round(cast(cast(max(CASE WHEN rk = greatest(1, ceil(cast(0.9 AS DOUBLE)*n)) THEN q END) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS q90
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    // C42: the same unigram-LM arithmetic re-spelled relationally;
    // round-4 aggregates absorb cross-engine ln ULP differences
    "text_perplexity" -> (xentCte +
      """
        |SELECT source, count(*) AS docs, round(avg(xent),4) AS avg_xent,
        |       round(min(xent),4) AS min_xent, round(max(xent),4) AS max_xent
        |FROM x GROUP BY source ORDER BY source""".stripMargin),
    // C56/C56a: tercile cuts ARE data values (a doc's own xent), so
    // each engine buckets self-consistently; C56a is result-identical
    // to C56 by contract (PerplexitySpec pins it)
    "quality_ccnet" -> ccnetOracle,
    "quality_ccnet_cached" -> ccnetOracle,
    // C42a: the full stupid-backoff fold — every probability route is
    // a CASE over the same three count frames the Spark plan joins
    "text_perplexity_bigram" ->
      """WITH d AS (SELECT doc_id, source,
        |    string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ') AS ts
        |  FROM documents),
        |g0 AS (SELECT doc_id, source,
        |    unnest(list_zip(ts[1:len(ts)-1], ts[2:len(ts)])) AS g FROM d),
        |gr AS (SELECT doc_id, source, g[1] AS w1, g[2] AS w2 FROM g0),
        |tf AS (SELECT doc_id, source, w1, w2, cast(count(*) AS BIGINT) AS tf
        |       FROM gr GROUP BY doc_id, source, w1, w2),
        |tr AS (SELECT * FROM tf WHERE doc_id % 2 = 0),
        |c12 AS (SELECT w1, w2, cast(sum(tf) AS BIGINT) AS c12 FROM tr GROUP BY w1, w2),
        |c1 AS (SELECT w1, cast(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
        |c2 AS (SELECT w2, cast(sum(c12) AS BIGINT) AS c2 FROM c12 GROUP BY w2),
        |n AS (SELECT cast(sum(c12) AS BIGINT) AS n FROM c12),
        |sc AS (SELECT f.doc_id, f.source, f.tf,
        |        CASE WHEN b.c12 IS NOT NULL THEN cast(b.c12 AS DOUBLE) / u1.c1
        |             WHEN u2.c2 IS NOT NULL THEN cast(0.4 AS DOUBLE) * u2.c2 / n.n
        |             ELSE cast(0.4 AS DOUBLE) * cast(0.4 AS DOUBLE) / n.n END AS prob,
        |        CASE WHEN b.c12 IS NOT NULL THEN 0 ELSE f.tf END AS backed
        |      FROM tf f
        |      LEFT JOIN c12 b ON b.w1 = f.w1 AND b.w2 = f.w2
        |      LEFT JOIN c1 u1 ON u1.w1 = f.w1
        |      LEFT JOIN c2 u2 ON u2.w2 = f.w2
        |      CROSS JOIN n),
        |x AS (SELECT doc_id, source,
        |        -(sum(tf * ln(prob)) / sum(tf)) AS xent,
        |        cast(sum(backed) AS BIGINT) AS backed,
        |        cast(sum(tf) AS BIGINT) AS mass
        |      FROM sc GROUP BY doc_id, source)
        |SELECT source, count(*) AS docs, round(avg(xent),4) AS avg_xent,
        |       round(min(xent),4) AS min_xent, round(max(xent),4) AS max_xent,
        |       cast(sum(backed) * 10000 // sum(mass) AS BIGINT) AS backoff_bp
        |FROM x GROUP BY source ORDER BY source""".stripMargin,
    // B14: the planted contract breaks are definitional constants, but
    // type_old must reflect the ACTUALLY crawled schema — the oracle
    // reads it from DuckDB's own information_schema (as B9's does)
    "meta_schema_drift" ->
      """WITH cols AS (
        |  SELECT column_name,
        |    CASE data_type WHEN 'BIGINT' THEN 'bigint' WHEN 'INTEGER' THEN 'int'
        |      WHEN 'DOUBLE' THEN 'double' WHEN 'VARCHAR' THEN 'string'
        |      WHEN 'TIMESTAMP' THEN 'timestamp_ntz' WHEN 'DATE' THEN 'date'
        |      WHEN 'FLOAT[]' THEN 'array<float>' WHEN 'FLOAT' THEN 'float'
        |      ELSE lower(data_type) END AS data_type
        |  FROM information_schema.columns WHERE table_name = 'events')
        |SELECT * FROM (
        |  SELECT 'events' AS table_name, 'ingest_ts' AS column_name,
        |         'added' AS change, NULL AS type_old, 'timestamp' AS type_new
        |  UNION ALL
        |  SELECT 'events', 'props', 'removed',
        |         (SELECT data_type FROM cols WHERE column_name = 'props'), NULL
        |  UNION ALL
        |  SELECT 'events', 'user_id', 'type_changed',
        |         (SELECT data_type FROM cols WHERE column_name = 'user_id'), 'string')
        |ORDER BY table_name, column_name""".stripMargin,
    // C48: the rescore pass makes the top-20 EXACT (candidate coverage
    // guaranteed by MG whenever freq(20th) > n/65 — spec-checked), so
    // the oracle is simply the exact top-20 with the same tie-break
    "token_topk_sketch" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ')) AS term
        |  FROM documents),
        |tc AS (SELECT term, count(*) AS n FROM toks GROUP BY term),
        |top AS (SELECT cast(row_number() OVER (ORDER BY n DESC, term) AS INT) AS rank,
        |               term, cast(n AS BIGINT) AS n
        |        FROM tc ORDER BY n DESC, term LIMIT 20)
        |SELECT rank, term, n FROM top ORDER BY rank""".stripMargin
  )

  /** The C50/C57 DuckDB oracle: the greedy BPE trainer UNROLLED as 20
    * materialized CTE stages, each spelling one get_stats → argmax →
    * merge_vocab round relationally. The greedy left-to-right
    * NON-OVERLAPPING rewrite (the reference regex semantics,
    * [[graft.ops.Bpe.mergePair]]) is exact, not approximated:
    * candidate positions where (syms[i], syms[i+1]) equals the round's
    * best pair can only be CONSECUTIVE when the pair is a self-pair
    * (a=b forces a run), so gaps-and-islands chaining + taking each
    * chain's odd row numbers reproduces the sequential fold precisely
    * — including `x x x x` → `xx xx` and `x x x` → `xx x`.
    * MATERIALIZED is load-bearing: inlined, each stage references its
    * predecessor twice and the expansion is 2^20. Cross-validated
    * three ways before adoption: vs the Spark face at sf0.01, and vs
    * an independent sequential Python BPE at sf0.1. */
  private def bpeStageCtes(numMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH w0 AS MATERIALIZED (
  SELECT wd AS wid, n,
    list_append(list_filter(string_split(wd, ''), x -> x <> ''), '</w>') AS syms
  FROM (
    SELECT wd, count(*)::BIGINT AS n
    FROM (SELECT unnest(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ')) AS wd FROM documents)
    WHERE wd <> '' GROUP BY wd))"""
    for (n <- 1 to numMerges) {
      val p = n - 1
      sb ++= s""",
p$n AS (
  SELECT syms[i] AS l, syms[i+1] AS r, sum(n)::BIGINT AS c
  FROM w$p, UNNEST(range(1, len(syms))) AS u(i)
  GROUP BY 1, 2),
b$n AS MATERIALIZED (SELECT l, r, c, $n::INT AS rank FROM p$n ORDER BY c DESC, l, r LIMIT 1),
e$n AS (
  SELECT wid, n, i, syms[i] AS s,
    (i < len(syms) AND syms[i] = (SELECT l FROM b$n) AND syms[i+1] = (SELECT r FROM b$n)) AS cand
  FROM w$p, UNNEST(range(1, len(syms)+1)) AS u(i)),
t$n AS (
  SELECT wid, n, i, s, cand AND (row_number() OVER (PARTITION BY wid, grp ORDER BY i)) % 2 = 1 AS taken
  FROM (SELECT *, CASE WHEN cand THEN i - (row_number() OVER (PARTITION BY wid, cand ORDER BY i)) END AS grp
        FROM e$n)),
w$n AS MATERIALIZED (
  SELECT wid, any_value(n) AS n, list(CASE WHEN taken THEN s || next_s ELSE s END ORDER BY i) AS syms
  FROM (SELECT wid, n, i, s, taken,
          lead(s) OVER (PARTITION BY wid ORDER BY i) AS next_s,
          coalesce(lag(taken) OVER (PARTITION BY wid ORDER BY i), false) AS prev_taken
        FROM t$n)
  WHERE NOT prev_taken
  GROUP BY wid)"""
    }
    sb.toString
  }

  /** The C42/C56 shared per-doc cross-entropy CTE: the corpus-self-
    * trained unigram LM (`-(Σ tf·ln(tn/t))/Σtf`) in DuckDB SQL, ending
    * in a frame `x(doc_id, source, xent)`. */
  private val xentCte: String =
    """WITH d AS (
      |  SELECT doc_id, source, trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
      |  FROM documents),
      |tok AS (SELECT doc_id, source, unnest(string_split(norm,' ')) AS term FROM d),
      |tf AS (SELECT doc_id, source, term, cast(count(*) AS BIGINT) AS tf
      |       FROM tok WHERE term <> '' GROUP BY doc_id, source, term),
      |lm AS (SELECT term, cast(sum(tf) AS BIGINT) AS tn FROM tf GROUP BY term),
      |tot AS (SELECT cast(sum(tn) AS BIGINT) AS t FROM lm),
      |x AS (SELECT doc_id, source,
      |        -(sum(tf * ln(cast(tn AS DOUBLE)/t)) / sum(tf)) AS xent
      |      FROM tf JOIN lm USING (term) CROSS JOIN tot
      |      GROUP BY doc_id, source)""".stripMargin

  /** The C56/C56a oracle: tercile cuts via quantile_disc (=
    * percentile_approx's exact-regime rank convention), then the same
    * round-10-compare bucket fold the Spark card runs. */
  private def ccnetOracle: String = xentCte +
    """,
      |cuts AS (SELECT source, quantile_disc(xent, cast(1 AS DOUBLE)/3) AS c1,
      |                quantile_disc(xent, cast(2 AS DOUBLE)/3) AS c2
      |         FROM x GROUP BY source),
      |b AS (SELECT x.source, x.xent,
      |        CASE WHEN round(x.xent,10) <= round(c.c1,10) THEN 'head'
      |             WHEN round(x.xent,10) <= round(c.c2,10) THEN 'middle'
      |             ELSE 'tail' END AS bucket
      |      FROM x JOIN cuts c USING (source)),
      |g AS (SELECT source, bucket, count(*) AS docs, round(avg(xent),4) AS avg_xent
      |      FROM b GROUP BY source, bucket)
      |SELECT source, bucket, cast(docs AS BIGINT) AS docs,
      |       cast(docs * 10000 // sum(docs) OVER (PARTITION BY source) AS BIGINT) AS share_bp,
      |       avg_xent
      |FROM g ORDER BY source, bucket""".stripMargin

  private val BpeOracleMerges = 20

  private def bpeMergesOracle: String = {
    val union = (1 to BpeOracleMerges)
      .map(n => s"SELECT rank, l, r, c FROM b$n").mkString(" UNION ALL ")
    bpeStageCtes(BpeOracleMerges) + s"""
SELECT rank, l AS "left", r AS "right", l || r AS merged, c AS pair_count
FROM ($union) ORDER BY rank"""
  }

  private def bpeEncodeOracle: String =
    bpeStageCtes(BpeOracleMerges) + s""",
pieces AS (
  SELECT piece, sum(n)::BIGINT AS cnt FROM (SELECT unnest(syms) AS piece, n FROM w$BpeOracleMerges) GROUP BY piece),
tot AS (SELECT sum(cnt)::BIGINT AS t FROM pieces)
SELECT piece, cnt AS count, (cnt * 10000 // t)::BIGINT AS share_bp
FROM pieces, tot ORDER BY cnt DESC, piece LIMIT 30"""

  /** Verify-gate ROUTE assertions for the knee-routed faces (round-13
    * ADVICE): each of these registers the oracle of its BELOW-KNEE
    * branch in [[oracleSql]], valid only while the verified corpus
    * stays below the knee. Verify runs the matching check before
    * dumping the face, so an above-knee gate corpus fails with an
    * explicit routing message instead of an opaque row-diff. */
  def oracleRouteChecks: Map[String, (SparkSession, String) => Unit] = Map(
    "dedup_embedding_auto" -> ((s: SparkSession, d: String) =>
      graft.ops.VectorQueries.requireBelowKnee(s, d,
        graft.ops.VectorQueries.DedupLshKnee,
        "dedup_embedding_auto", "exact LSH-blocked")),
    "sim_search_adaptive" -> ((s: SparkSession, d: String) =>
      graft.ops.VectorQueries.requireBelowKnee(s, d,
        graft.ops.VectorQueries.AdaptiveFunnelKnee,
        "sim_search_adaptive", "prefix-funnel")),
    "sim_search_lsh_auto" -> ((s: SparkSession, d: String) =>
      graft.ops.VectorQueries.requireBelowKnee(s, d,
        graft.ops.VectorQueries.LshServeKnee,
        "sim_search_lsh_auto", "artifact-backed LSH serve")),
    "sim_search_graph_auto" -> ((s: SparkSession, d: String) =>
      graft.ops.VectorQueries.requireBelowKnee(s, d,
        graft.ops.GraphAnn.GraphServeKnee,
        "sim_search_graph_auto", "artifact-backed graph beam serve"))) ++
    // TRAINER-CAP seam (round-14 verdict item 4): the sample-trained
    // oracle-checked faces were adjudicated where trainSample == the
    // corpus itself; an above-cap gate corpus must fail explicitly.
    // (C87/C87a audits exempt: overlay-arithmetic oracles are
    // regime-independent — see requireBelowTrainCap's scaladoc.)
    Seq("sim_search_ivfpq", "sim_search_ivfpq_cached",
      "sim_search_graph", "sim_search_graph_cached",
      "dedup_semantic_pq", "dedup_semantic_pq_cached",
      "dedup_semantic_incremental", "dedup_semantic_incremental_cached")
      .map(f => f -> ((s: SparkSession, d: String) =>
        graft.ops.VectorQueries.requireBelowTrainCap(s, d, f))).toMap
}
