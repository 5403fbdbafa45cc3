package graft

import graft.apps.PageRank
import graft.graphbuild.GraphBuilder
import graft.model.SourceFiles
import graft.oracle.OracleSql
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full north-star pipeline at tiny scale — synthesize the
    * source-file table, derive the repo link graph, run PageRank, return
    * ranks joined back to repo oids with the per-row sha256 invariant
    * carried through. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val files = SourceFiles.generate(spark, nFiles = 2000L, nRepos = 100)
    val rg = GraphBuilder.build(files)
    val ranks = PageRank.run(rg.simple(directed = true), 0.85, 10)
    rg.vertices.join(ranks, "vid")
      .select(col("vid"), col("oid"), col("rank"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Analytical apps (§2.2) on the part co-purchase graph
    "g_degree" -> (Queries.degree(_, _)),
    "g_pagerank" -> (Queries.pagerank(_, _)),
    "g_wcc" -> (Queries.wcc(_, _)),
    "g_wcc_incr_check" -> (Queries.gWccIncrCheck(_, _)),
    "g_tri_incr_check" -> (Queries.gTriIncrCheck(_, _)),
    "g_cdlp" -> (Queries.cdlp(_, _)),
    "g_triangles" -> (Queries.triangles(_, _)),
    "g_clustering" -> (Queries.clustering(_, _)),
    "g_transitivity" -> (Queries.transitivity(_, _)),
    "g_degree_centrality" -> (Queries.degreeCentrality(_, _)),
    "g_bfs" -> (Queries.bfs(_, _)),
    "g_sssp" -> (Queries.sssp(_, _)),
    "g_kcore" -> (Queries.kcore(_, _)),
    "g_kshell" -> (Queries.kshell(_, _)),
    "g_hits" -> (Queries.hits(_, _)),
    "g_eigenvector" -> (Queries.eigenvector(_, _)),
    "g_katz" -> (Queries.katz(_, _)),
    "g_avg_clustering" -> (Queries.avgClustering(_, _)),
    "g_louvain" -> (Queries.louvain(_, _)),
    "g_sssp_path" -> (Queries.ssspPath(_, _)),
    "g_sssp_has_path" -> (Queries.ssspHasPath(_, _)),
    "g_sssp_avg_length" -> (Queries.ssspAvgLength(_, _)),
    "g_bfs_parents" -> (Queries.bfsParents(_, _)),
    "g_lpa_u2i" -> (Queries.lpaU2I(_, _)),
    "g_sampling_path" -> (Queries.samplingPath(_, _)),
    "g_dfs" -> (Queries.dfs(_, _)),
    "g_dfs_check" -> (Queries.dfsCheck(_, _)),
    "g_louvain_check" -> (Queries.louvainCheck(_, _)),
    "g_louvain_q" -> (Queries.louvainQ(_, _)),
    // Interactive operator surface (§2.4)
    "i_filter" -> (Queries.iFilter(_, _)),
    "i_out_join" -> (Queries.iOutJoin(_, _)),
    "i_group_count" -> (Queries.iGroupCount(_, _)),
    "i_order_limit" -> (Queries.iOrderLimit(_, _)),
    "i_range_local" -> (Queries.iRangeLocal(_, _)),
    "i_dedup" -> (Queries.iDedup(_, _)),
    "i_union" -> (Queries.iUnion(_, _)),
    "i_semi_join" -> (Queries.iSemiJoin(_, _)),
    "i_anti_join" -> (Queries.iAntiJoin(_, _)),
    "i_aggs" -> (Queries.iAggs(_, _)),
    "i_math" -> (Queries.iMath(_, _)),
    "i_fold_unfold" -> (Queries.iFoldUnfold(_, _)),
    "i_sample" -> (Queries.iSample(_, _)),
    "i_estimate_count" -> (Queries.iEstimateCount(_, _)),
    "i_predicates" -> (Queries.iPredicates(_, _)),
    "i_case_when" -> (Queries.iCaseWhen(_, _)),
    "i_simple_path" -> (Queries.iSimplePath(_, _)),
    "i_gremlin" -> (Queries.iGremlin(_, _)),
    "i_gremlin_repeat" -> (Queries.iGremlinRepeat(_, _)),
    "i_gremlin_where" -> (Queries.iGremlinWhere(_, _)),
    "i_gremlin_edge" -> (Queries.iGremlinEdge(_, _)),
    // Pregel UDF surface (§2.6): fixed-round, convergence-gated, and
    // array-message programs on the same generic runner
    "g_pregel_pagerank" -> (Queries.pregelPagerank(_, _)),
    "g_pregel_pagerank_agg" -> (Queries.pregelPagerankAgg(_, _)),
    "g_pregel_sssp" -> (Queries.pregelSssp(_, _)),
    "g_pregel_tc" -> (Queries.pregelTc(_, _)),
    // Documents / training-data ops
    "d_exact_dedup" -> (Queries.dExactDedup(_, _)),
    "d_token_count" -> (Queries.dTokenCount(_, _)),
    "d_quality" -> (Queries.dQuality(_, _)),
    "d_langid" -> (Queries.dLangId(_, _)),
    "d_minhash_pairs" -> (Queries.dMinhashPairs(_, _)),
    "d_minhash_check" -> (Queries.dMinhashCheck(_, _)),
    "d_simhash" -> (Queries.dSimhash(_, _)),
    "d_simhash_check" -> (Queries.dSimhashCheck(_, _)),
    "d_ngram_jaccard" -> (Queries.dNgramJaccard(_, _)),
    "d_ngram_check" -> (Queries.dNgramCheck(_, _)),
    "d_fingerprint" -> (Queries.dFingerprint(_, _)),
    "d_fingerprint_check" -> (Queries.dFingerprintCheck(_, _)),
    "d_dedup_cluster_check" -> (Queries.dDedupClusterCheck(_, _)),
    "d_incr_dedup_check" -> (Queries.dIncrDedupCheck(_, _)),
    // Similarity search over embeddings
    "e_ann_topk" -> (Queries.eAnnTopk(_, _)),
    "e_ann_lsh" -> (Queries.eAnnLsh(_, _)),
    "e_ann_ivf" -> (Queries.eAnnIvf(_, _)),
    "e_cos_neardup" -> (Queries.eCosNearDup(_, _)),
    // Multimodal binary-column plumbing (ALL real pure-JVM decodes:
    // imageio for images, javax.sound.sampled WAV for audio, RIFF/AVI +
    // per-frame JPEG for video)
    "m_media_features" -> (Queries.mMediaFeatures(_, _)),
    "m_frame_sample" -> (Queries.mFrameSample(_, _)),
    "m_image_decode_check" -> (Queries.mImageDecodeCheck(_, _)),
    "m_audio_decode_check" -> (Queries.mAudioDecodeCheck(_, _)),
    "m_video_decode_check" -> (Queries.mVideoDecodeCheck(_, _)),
    // Durable sinks (§2.7): snapshot-versioned table (seal-class ops)
    "s_snapshot_sink_check" -> (Queries.sSnapshotSinkCheck(_, _)),
    "s_snapshot_prune_check" -> (Queries.sSnapshotPruneCheck(_, _)),
    "s_snapshot_bloom_check" -> (Queries.sSnapshotBloomCheck(_, _)),
    "s_stream_ingest_check" -> (Queries.sStreamIngestCheck(_, _)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (CTEs forced MATERIALIZED — see
    * OracleSql.materialize). Omitted only where DuckDB cannot replay the
    * computation portably (hash-function-dependent text ops, array-typed
    * outputs, label-set-valued Louvain) — those have in-JVM oracles in
    * ScalaTest instead (see OracleConsistencySpec's exemption test). */
  def oracleSql: Map[String, String] =
    rawOracleSql.view.mapValues(OracleSql.materialize).toMap

  /** The plain-SQL form (Spark-parsable; used by OracleConsistencySpec). */
  def rawOracleSql: Map[String, String] = Map(
    "g_degree" -> OracleSql.degree,
    "g_pagerank" -> OracleSql.pagerank(),
    "g_wcc" -> OracleSql.wcc(),
    "g_wcc_incr_check" -> OracleSql.gWccIncrCheck,
    "g_tri_incr_check" -> OracleSql.gTriIncrCheck,
    "g_cdlp" -> OracleSql.cdlp(),
    "g_triangles" -> OracleSql.triangles,
    "g_clustering" -> OracleSql.clustering,
    "g_transitivity" -> OracleSql.transitivity,
    "g_degree_centrality" -> OracleSql.degreeCentrality,
    "g_bfs" -> OracleSql.bfs(),
    "g_sssp" -> OracleSql.sssp(),
    "g_kcore" -> OracleSql.kcore(),
    "g_kshell" -> OracleSql.kshell(),
    "g_hits" -> OracleSql.hits(),
    "g_eigenvector" -> OracleSql.eigenvector(),
    "g_katz" -> OracleSql.katz(),
    "g_avg_clustering" -> OracleSql.avgClustering,
    "g_sssp_path" -> OracleSql.ssspPath(),
    "g_sssp_has_path" -> OracleSql.ssspHasPath(),
    "g_sssp_avg_length" -> OracleSql.ssspAverageLength(),
    "g_bfs_parents" -> OracleSql.bfsParents(),
    "g_lpa_u2i" -> OracleSql.lpaU2I(),
    "g_sampling_path" -> OracleSql.samplingPath,
    "g_louvain_check" -> OracleSql.louvainCheck,
    "g_louvain_q" -> OracleSql.louvainQ(2),
    "g_dfs_check" -> OracleSql.gDfsCheck,
    "d_fingerprint_check" -> OracleSql.dFingerprintCheck,
    "d_dedup_cluster_check" -> OracleSql.dDedupClusterCheck,
    "d_incr_dedup_check" -> OracleSql.dIncrDedupCheck,
    "m_audio_decode_check" -> OracleSql.mAudioDecodeCheck,
    "m_video_decode_check" -> OracleSql.mVideoDecodeCheck,
    "s_snapshot_sink_check" -> OracleSql.sSnapshotSinkCheck,
    "s_snapshot_prune_check" -> OracleSql.sSnapshotPruneCheck,
    "s_snapshot_bloom_check" -> OracleSql.sSnapshotBloomCheck,
    "s_stream_ingest_check" -> OracleSql.sStreamIngestCheck,
    "g_pregel_pagerank" -> OracleSql.pregelPagerank(),
    // aggregator-based full PageRank == the reference recurrence
    "g_pregel_pagerank_agg" -> OracleSql.pagerank(),
    // same semantics/graph/source as g_sssp and g_triangles respectively
    "g_pregel_sssp" -> OracleSql.sssp(),
    "g_pregel_tc" -> OracleSql.triangles,
    "i_filter" -> OracleSql.iFilter,
    "i_out_join" -> OracleSql.iOutJoin,
    "i_group_count" -> OracleSql.iGroupCount,
    "i_order_limit" -> OracleSql.iOrderLimit,
    "i_range_local" -> OracleSql.iRangeLocal,
    "i_dedup" -> OracleSql.iDedup,
    "i_union" -> OracleSql.iUnion,
    "i_semi_join" -> OracleSql.iSemiJoin,
    "i_anti_join" -> OracleSql.iAntiJoin,
    "i_aggs" -> OracleSql.iAggs,
    "i_math" -> OracleSql.iMath,
    "i_fold_unfold" -> OracleSql.iFoldUnfold,
    "i_sample" -> OracleSql.iSample,
    "i_estimate_count" -> OracleSql.iEstimateCount,
    "i_predicates" -> OracleSql.iPredicates,
    "i_case_when" -> OracleSql.iCaseWhen,
    "i_simple_path" -> OracleSql.iSimplePath,
    "i_gremlin" -> OracleSql.iGremlin,
    "i_gremlin_repeat" -> OracleSql.iGremlinRepeat,
    "i_gremlin_where" -> OracleSql.iGremlinWhere,
    "i_gremlin_edge" -> OracleSql.iGremlinEdge,
    "e_cos_neardup" -> OracleSql.eCosNearDup,
    "e_ann_topk" -> OracleSql.eAnnTopk,
    "e_ann_lsh" -> OracleSql.eAnnLshOk,
    "e_ann_ivf" -> OracleSql.eAnnIvfOk,
    "d_minhash_check" -> OracleSql.dMinhashCheck,
    "d_simhash_check" -> OracleSql.dSimhashCheck,
    "d_ngram_check" -> OracleSql.dNgramCheck,
    "m_image_decode_check" -> OracleSql.mImageDecodeCheck,
    "d_exact_dedup" -> OracleSql.dExactDedup,
    "d_token_count" -> OracleSql.dTokenCount,
    "d_quality" -> OracleSql.dQuality,
    "d_langid" -> OracleSql.dLangId,
    "m_frame_sample" -> OracleSql.mFrameSample,
    "m_media_features" -> OracleSql.mMediaFeatures,
  )
}
