package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._
import graft.oracle.OracleSql

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggGroup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 scans, sources, sinks
    "q_scan_project" -> (Relational.scanProject _),
    "q_source_csv" -> (Sources.sourceCsv _),
    "q_source_jsonl" -> (Sources.sourceJsonl _),
    "q_source_orc" -> (Sources.sourceOrc _),
    "q_sink_kgx" -> (Sources.sinkKgx _),
    "q_sink_neo4j" -> (Neo4jSink.sinkNeo4j _),
    "q_sink_partitioned" -> (Sources.sinkPartitioned _),
    "q_snapshot_diff" -> (Incremental.snapshotDiff _),
    "q_scd2_history" -> (Incremental.scd2History _),
    "q_cdc_apply" -> (Incremental.cdcApply _),
    "q_source_spec" -> (Pipeline.pipelineSpecs _),
    // §2.11 graph / ETL
    "q_norm_remap" -> (GraphOps.normRemap _),
    "q_norm_batch" -> (NodeNorm.normBatch _),
    "q_norm_edges" -> (GraphOps.normEdges _),
    "q_graph_node_merge" -> (GraphOps.nodeMerge _),
    "q_graph_edge_merge" -> (GraphOps.edgeMerge _),
    "q_graph_degree" -> (GraphOps.degree _),
    "q_graph_cc" -> (GraphOps.connectedComponents _),
    "q_graph_label_prop" -> (GraphOps.labelProp _),
    "q_graph_pagerank" -> (GraphOps.pageRank _),
    "q_graph_triangles" -> (GraphOps.triangles _),
    "q_graph_jaccard" -> (GraphOps.jaccard _),
    "q_graph_paths" -> (GraphOps.paths _),
    "q_graph_kcore" -> (GraphOps.kcore _),
    "q_kgx_validate" -> (GraphOps.kgxValidate _),
    "q_pipeline_kgx" -> (Pipeline.pipelineKgx _),
    "q_profile_table" -> (Profile.profileTable _),
    // §2.2 filter/project
    "q_filter_pred" -> (Relational.filterPred _),
    "q_project_expr" -> (Relational.projectExpr _),
    "q_pivot" -> (Relational.pivotTypes _),
    "q_na_funcs" -> (Relational.naFuncs _),
    "q_subquery_scalar" -> (Relational.subqueryScalar _),
    // §2.4 aggregation (flagship)
    "q_agg_group" -> (Relational.aggGroup _),
    "q_agg_global" -> (Aggregates.aggGlobal _),
    "q_agg_having" -> (Aggregates.aggHaving _),
    "q_agg_distinct" -> (Aggregates.aggDistinct _),
    "q_agg_rollup" -> (Aggregates.aggRollup _),
    "q_agg_cube" -> (Aggregates.aggCube _),
    "q_agg_gsets" -> (Aggregates.aggGsets _),
    "q_agg_collect" -> (Aggregates.aggCollect _),
    "q_agg_stats" -> (Aggregates.aggStats _),
    "q_agg_approx" -> (Aggregates.aggApprox _),
    "q_agg_hll_rollup" -> (Aggregates.aggHllRollup _),
    "q_agg_quantile" -> (Aggregates.aggQuantile _),
    "q_udaf_topk" -> (Aggregates.udafTopK _),
    "q_agg_argmax" -> (Aggregates.aggArgmax _),
    "q_agg_histogram" -> (Aggregates.aggHistogram _),
    "q_agg_corr" -> (Aggregates.aggCorr _),
    "q_agg_mode" -> (Aggregates.aggMode _),
    // §2.5 windows
    "q_win_rank" -> (Windows.winRank _),
    "q_win_topk_group" -> (Windows.winTopKGroup _),
    "q_win_running" -> (Windows.winRunning _),
    "q_win_lag_lead" -> (Windows.winLagLead _),
    "q_win_range_time" -> (Windows.winRangeTime _),
    // §2.3 joins
    "q_join_inner" -> (Joins.joinInner _),
    "q_join_broadcast" -> (Joins.joinBroadcast _),
    "q_join_left" -> (Joins.joinLeft _),
    "q_join_full" -> (Joins.joinFull _),
    "q_join_semi" -> (Joins.joinSemi _),
    "q_join_anti" -> (Joins.joinAnti _),
    "q_join_range" -> (Joins.joinRange _),
    "q_join_asof" -> (Joins.joinAsof _),
    "q_join_bucketed" -> (Joins.joinBucketed _),
    "q_join_multi" -> (Joins.joinMulti _),
    "q_join_skew" -> (Joins.joinSkew _),
    // §2.6 sort/topk
    "q_sort_multi" -> (Relational.sortMulti _),
    "q_topk" -> (Relational.topK _),
    // §2.8 scalar functions
    "q_str_funcs" -> (Functions.strFuncs _),
    "q_date_funcs" -> (Functions.dateFuncs _),
    "q_math_funcs" -> (Functions.mathFuncs _),
    "q_json_funcs" -> (Functions.jsonFuncs _),
    "q_array_funcs" -> (Functions.arrayFuncs _),
    "q_map_funcs" -> (Functions.mapFuncs _),
    "q_udf_scalar" -> (Functions.udfScalar _),
    "q_udtf_tokens" -> (Functions.udtfTokens _),
    // §2.9 dedup / similarity / text
    "q_dedup_exact" -> (DedupSim.dedupExact _),
    "q_dedup_near" -> (DedupSim.dedupNear _),
    "q_dedup_simhash" -> (DedupSim.dedupSimhash _),
    "q_dedup_ngram" -> (DedupSim.dedupNgram _),
    "q_dedup_cluster" -> (DedupSim.dedupCluster _),
    "q_dedup_embcos" -> (DedupSim.dedupEmbCos _),
    "q_sim_cosine_topk" -> (DedupSim.simCosineTopK _),
    "q_sim_knn_graph" -> (DedupSim.knnGraph _),
    "q_sim_ann_lsh" -> (DedupSim.simAnnLsh _),
    "q_sim_ann_ivf" -> (DedupSim.simAnnIvf _),
    "q_sim_centroid" -> (DedupSim.simCentroid _),
    "q_emb_quantize" -> (DedupSim.embQuantize _),
    "q_emb_dim_stats" -> (DedupSim.embDimStats _),
    "q_text_wordcount" -> (TextOps.wordCount _),
    "q_text_stats" -> (TextOps.textStats _),
    "q_text_tfidf" -> (TextOps.tfidf _),
    "q_text_ngram_lm" -> (TextOps.ngramLm _),
    "q_text_bpe_pairs" -> (TextOps.bpePairs _),
    "q_text_lm_score" -> (TextOps.lmScore _),
    "q_text_langid" -> (TextOps.langId _),
    "q_text_quality" -> (TextOps.quality _),
    "q_text_classifier" -> (TextOps.textClassifier _),
    "q_text_tokens" -> (TextOps.tokenCounts _),
    "q_text_fingerprint" -> (TextOps.fingerprint _),
    "q_text_winnowing" -> (TextOps.winnowing _),
    "q_text_vocab_encode" -> (TextOps.vocabEncode _),
    "q_text_pii" -> (TextOps.pii _),
    "q_sample_split" -> (TextOps.sampleSplit _),
    "q_sample_mixture" -> (TextOps.sampleMixture _),
    "q_pack_shards" -> (TextOps.packShards _),
    "q_pack_shards_ranged" -> (TextOps.packShardsRanged _),
    "q_text_contamination" -> (TextOps.contamination _),
    "q_text_repetition" -> (TextOps.repetition _),
    "q_sample_stratified" -> (TextOps.sampleStratified _),
    "q_sample_reservoir" -> (TextOps.sampleReservoir _),
    "q_sample_temperature" -> (TextOps.sampleTemperature _),
    "q_curate_pipeline" -> (TextOps.curatePipeline _),
    "q_filter_bloom" -> (TextOps.filterBloom _),
    "q_dedup_url" -> (TextOps.dedupUrl _),
    "q_dedup_lines" -> (TextOps.dedupLines _),
    // §2.10 streaming batch twins
    "q_stream_tumbling" -> (StreamingOps.tumbling _),
    "q_stream_sliding" -> (StreamingOps.sliding _),
    "q_stream_session" -> (StreamingOps.session _),
    "q_stream_dedup" -> (StreamingOps.dedup _),
    "q_stream_join" -> (StreamingOps.streamJoin _),
    "q_events_funnel" -> (EventOps.funnel _),
    "q_events_retention" -> (EventOps.retention _),
    "q_events_anomaly" -> (EventOps.anomaly _),
    "q_events_sessionize" -> (EventOps.sessionize _),
    "q_events_attribution" -> (EventOps.attribution _),
    "q_events_transitions" -> (EventOps.transitions _),
    "q_events_dwell" -> (EventOps.dwell _),
    "q_events_ltv" -> (EventOps.ltv _),
    // §2.12 multimodal (binary media columns; decode step stubbed)
    "q_mm_decode" -> (Multimodal.decode _),
    "q_mm_meta" -> (Multimodal.meta _),
    "q_mm_features" -> (Multimodal.features _),
    "q_mm_frame_sample" -> (Multimodal.frameSample _),
    // §2.7 set ops
    "q_unpivot" -> (Relational.unpivotMetrics _),
    "q_union_all" -> (Relational.unionAll _),
    "q_union_distinct" -> (Relational.unionDistinct _),
    "q_intersect" -> (Relational.intersectYears _),
    "q_except" -> (Relational.exceptYears _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    OracleSql.sql.filter { case (k, _) => queries.contains(k) }
}
