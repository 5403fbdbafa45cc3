package graft

import graft.apps._
import graft.graphbuild.CoPurchase
import graft.oracle.OracleSql
import graft.pregel.Pregel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Local stand-in for the driver's DuckDB comparison, in three layers:
  *
  *  1. every NON-iterative oracle runs through Spark SQL in full and must
  *     match the DataFrame implementation row-for-row;
  *  2. every ITERATIVE oracle's unrolled-CTE template is validated at small
  *     round counts against a round-bounded run of the same app. (The
  *     shipped full-round SQL cannot be executed by Spark SQL: its CTEs are
  *     referenced 2-3x per round and Spark INLINES them — exponential plan
  *     blowup — while DuckDB materializes multi-ref CTEs. The generator is
  *     the same code at 2 rounds or 10, so template validation + layer 3
  *     covers the shipped text.)
  *  3. fixpoint algorithms must converge well inside the shipped unroll
  *     counts (WCC 25, BFS 15, SSSP 30, k-core 20) on the test data.
  *     Set GRAFT_ORACLE_SF to re-run these margins at another scale
  *     (driver gate = sf0.01).
  */
class OracleConsistencySpec extends SparkSpec {

  val dir: String =
    sys.env.getOrElse("GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
  val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  override def beforeAll(): Unit = {
    super.beforeAll()
    tables.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
  }

  // ---- layer 1: full checks for non-iterative oracles ----

  val nonIterative: Seq[String] = Seq(
    "g_degree", "g_triangles", "g_clustering", "g_transitivity",
    "g_degree_centrality", "g_avg_clustering", "g_sampling_path",
    "g_lpa_u2i",
    "i_filter", "i_out_join", "i_group_count", "i_order_limit",
    "i_range_local", "i_dedup", "i_union", "i_semi_join", "i_anti_join",
    "i_aggs", "i_math", "i_fold_unfold",
    "i_sample", "i_estimate_count", "i_predicates", "i_simple_path",
    "i_case_when", "i_gremlin", "i_gremlin_repeat",
    "d_exact_dedup", "d_token_count", "d_quality", "d_langid",
    "e_cos_neardup", "m_frame_sample", "m_media_features",
    // self-check queries vs their constant oracles (the Spark side must
    // actually produce ok=1 on the test data), and the pregel TC variant
    // vs the shared wedge-join triangle oracle
    "e_ann_lsh", "g_louvain_check", "g_pregel_tc",
    "d_minhash_check", "d_simhash_check", "d_ngram_check",
    "d_fingerprint_check", "g_dfs_check",
    "m_image_decode_check", "m_audio_decode_check",
    "m_video_decode_check", "s_snapshot_bloom_check")
  // e_ann_topk's oracle uses DuckDB-only list functions (NOT
  // Spark-parsable) — validated by AnnSpec's in-JVM oracle plus the
  // driver's own DuckDB replay; deliberately absent from layer 1.

  for (name <- nonIterative) {
    test(s"$name: Spark impl == oracle SQL (full)") {
      assertSameRows(SparkEntry.queries(name)(spark, dir),
        spark.sql(SparkEntry.rawOracleSql(name)), name)
    }
  }

  test("shipped oracles = raw oracles + MATERIALIZED CTE heads only") {
    for ((name, sql) <- SparkEntry.oracleSql) {
      assert(sql.replace(" AS MATERIALIZED (", " AS (")
        == SparkEntry.rawOracleSql(name), name)
    }
  }

  // ---- layer 2: iterative templates at small round counts ----

  def g = CoPurchase.graph(spark, dir)
  def minVid: Long = g.vertices.agg(min(col("vid"))).head().getLong(0)

  def vl(c: String) = col(c).cast("long")

  val boundedCases: Seq[(String, Int, () => DataFrame, String)] = Seq(
    ("g_pagerank", 2,
      () => PageRank.run(g, 0.85, 2)
        .select(vl("vid").as("vid"), round(col("rank"), 6).as("pr")),
      OracleSql.pagerank(2)),
    ("g_pregel_pagerank", 2,
      () => Pregel.pagerankPregel(g, 0.85, 2)
        .select(vl("vid").as("vid"), round(col("rank"), 6).as("pr")),
      OracleSql.pregelPagerank(2)),
    // aggregator-based dangling redistribution vs the same recurrence SQL
    ("g_pregel_pagerank_agg", 2,
      () => Pregel.pagerankPregelAggregated(g, 0.85, 2)
        .select(vl("vid").as("vid"), round(col("rank"), 6).as("pr")),
      OracleSql.pagerank(2)),
    ("g_wcc", 3,
      () => WCC.run(g, maxRounds = 3)
        .select(vl("vid").as("vid"), vl("comp").as("comp")),
      OracleSql.wcc(3)),
    ("g_cdlp", 2,
      () => CDLP.run(g, maxRound = 2)
        .select(vl("vid").as("vid"), vl("label").as("label")),
      OracleSql.cdlp(2)),
    // exact-rational modularity of the CDLP assignment: validates BOTH
    // the CDLP chain reuse and the integer modularity CTEs against the
    // JVM Louvain.modularityExact on the same bounded assignment
    ("g_louvain_q", 2,
      () => {
        val assign = CDLP.run(g, maxRound = 2)
          .select(col("vid"), col("label").as("community"))
        val (n, d) = Louvain.modularityExact(g, assign)
        spark.range(1).select(lit(n).as("q_num"), lit(d).as("q_den"))
      },
      OracleSql.louvainQ(2)),
    ("g_bfs", 3,
      () => BFS.run(g, minVid, depthLimit = 3)
        .select(vl("vid").as("vid"), vl("depth").as("depth")),
      OracleSql.bfs(3)),
    ("g_sssp", 3,
      () => SSSP.run(CoPurchase.weighted(g), minVid, maxRounds = 3)
        .select(vl("vid").as("vid"), col("dist")),
      OracleSql.sssp(3)),
    // the pregel variant relaxes from ALL finite vertices each round
    // (no frontier pruning) — per-round states are identical because min
    // is idempotent over already-delivered contributions
    ("g_pregel_sssp", 3,
      () => Pregel.ssspPregel(CoPurchase.weighted(g), minVid,
          maxRounds = 3)
        .select(vl("vid").as("vid"), col("dist")),
      OracleSql.sssp(3)),
    ("g_sssp_path", 3,
      () => SSSP.runWithParents(CoPurchase.weighted(g), minVid,
          maxRounds = 3)
        .select(vl("vid").as("vid"), col("dist"),
          vl("parent").as("parent")),
      OracleSql.ssspPath(3)),
    ("g_bfs_parents", 3,
      () => BFS.runWithParents(g, minVid, depthLimit = 3)
        .select(vl("vid").as("vid"), vl("depth").as("depth"),
          vl("parent").as("parent")),
      OracleSql.bfsParents(3)),
    ("g_sssp_has_path", 3,
      () => {
        val (lo, hi) = {
          val r = g.vertices.agg(min(col("vid")), max(col("vid"))).head()
          (r.getLong(0), r.getLong(1))
        }
        BFS.run(g, lo, depthLimit = 3).where(col("vid") === hi)
          .select(lit(lo).as("src"), lit(hi).as("dst"),
            when(col("depth") >= 0, lit(1L)).otherwise(lit(0L))
              .as("has_path"))
      },
      OracleSql.ssspHasPath(3)),
    ("g_sssp_avg_length", 3,
      () => {
        val wg = CoPurchase.weighted(g)
        val srcs = wg.vertices.orderBy(col("vid")).limit(3)
          .collect().map(_.getLong(0)).toSeq
        SSSP.averageLength(wg, srcs, maxRounds = 3)
          .select(round(col("avg_length"), 6).as("avg_length"))
      },
      OracleSql.ssspAverageLength(3, 3)),
    ("g_kshell", 2,
      () => KShell.coreNumbers(g, maxRounds = 2)
        .select(vl("vid").as("vid"),
          when(col("core") === 3, lit(1L)).otherwise(lit(0L))
            .as("in_shell")),
      OracleSql.kshell(3, 2)),
    ("g_hits", 2,
      () => HITS.run(g, tolerance = 0.0, maxRound = 2)
        .select(vl("vid").as("vid"), round(col("hub"), 6).as("hub"),
          round(col("auth"), 6).as("auth")),
      OracleSql.hits(2)),
    ("g_eigenvector", 2,
      () => Centrality.eigenvector(g, tolerance = 0.0, maxRound = 2)
        .select(vl("vid").as("vid"),
          round(col("centrality"), 6).as("centrality")),
      OracleSql.eigenvector(2)),
    ("g_katz", 2,
      () => Centrality.katz(g, tolerance = 0.0, maxRound = 2)
        .select(vl("vid").as("vid"),
          round(col("centrality"), 6).as("centrality")),
      OracleSql.katz(2)))

  /** The k-core SQL template replays bounded synchronous peeling — checked
    * against the in-JVM peel (the product KCore now derives membership
    * from the h-index core decomposition; the peel stays test-side as the
    * oracle-of-the-oracle). */
  test("g_kcore: unrolled peel template @3 == in-JVM bounded peel") {
    val verts = g.vertices.collect().map(_.getLong(0)).toSeq
    val pairs = g.edges.where(col("src") < col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (want, _) = TestOracles.kcorePeel(verts, pairs, 3, rounds = 3)
    val got = spark.sql(OracleSql.kcore(3, 3)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "kcore peel template vs in-JVM peel")
  }

  for ((name, rounds, impl, sql) <- boundedCases) {
    test(s"$name: unrolled template @$rounds rounds == bounded app run") {
      assertSameRows(impl(), spark.sql(sql), s"$name@$rounds")
    }
  }

  // ---- layer 3: convergence margins inside the shipped unrolls ----

  test("wcc converges well inside the shipped 25-round unroll") {
    val (_, rounds) = WCC.runWithRounds(g)
    assert(rounds <= 20, s"wcc fixpoint after $rounds rounds; unroll is 25")
  }

  test("bfs depth well inside the shipped 15-round unroll") {
    val maxDepth = BFS.run(g, minVid).agg(max(col("depth"))).head()
      .getLong(0)
    assert(maxDepth <= 12, s"bfs max depth $maxDepth; unroll is 15")
  }

  test("sssp converges inside the shipped 30-round unroll") {
    val bounded = SSSP.run(CoPurchase.weighted(g), minVid, maxRounds = 29)
    val fix = SSSP.run(CoPurchase.weighted(g), minVid)
    assertSameRows(bounded, fix, "sssp@29 vs fixpoint")
  }

  test("kcore peeling converges inside the shipped 20-round unroll and " +
      "the h-index product path agrees with the peel fixpoint") {
    val verts = g.vertices.collect().map(_.getLong(0)).toSeq
    val pairs = g.edges.where(col("src") < col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (want, waves) = TestOracles.kcorePeel(verts, pairs, 3)
    assert(waves <= 19, s"peel needs $waves waves; unroll is 20")
    val got = KCore.run(g, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "KCore (h-index) vs peel fixpoint")
  }

  test("kshell h-index fixpoint converges inside the shipped 15-round " +
      "unroll") {
    assertSameRows(KShell.coreNumbers(g, maxRounds = 12),
      KShell.coreNumbers(g), "kshell@12 vs fixpoint")
  }

  test("oracle outputs are never DECIMAL-typed (driver hashes values " +
      "against our DOUBLE parquet columns)") {
    for (name <- nonIterative) {
      val schema = spark.sql(SparkEntry.rawOracleSql(name)).schema
      assert(!schema.exists(_.dataType.typeName.startsWith("decimal")),
        s"$name oracle has decimal column: $schema")
    }
    for ((name, _, _, sql) <- boundedCases) {
      val schema = spark.sql(sql).schema
      assert(!schema.exists(_.dataType.typeName.startsWith("decimal")),
        s"$name bounded oracle has decimal column: $schema")
    }
  }

  test("Verify's cheap-first cost order covers every catalog entry") {
    val missing = SparkEntry.queries.keySet -- Verify.costOrder.toSet
    assert(missing.isEmpty,
      s"catalog entries without an explicit Verify cost-order slot: " +
        s"$missing")
  }

  test("every query key has either an oracle or a documented exemption") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val exempt = Set(
      // label-set-valued result: exact assignment is not SQL-definable;
      // covered by LouvainSpec (planted partitions, modularity,
      // partition-count invariance)
      "g_louvain",
      // serial token-walk preorder: not reasonably SQL-unrollable;
      // covered by DfsSpec's in-JVM recursive oracle
      "g_dfs",
      // hash-function-dependent or array-typed outputs DuckDB can't
      // reproduce portably; covered by in-JVM oracles in ScalaTest
      "d_minhash_pairs", "d_simhash", "d_ngram_jaccard", "d_fingerprint")
    assert(noOracle.subsetOf(exempt),
      s"queries without oracle or exemption: ${noOracle -- exempt}")
  }
}
