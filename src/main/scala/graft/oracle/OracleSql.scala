package graft.oracle

/** ANSI-SQL oracles for every SQL-expressible SparkEntry query, runnable by
  * DuckDB (the driver) and by Spark SQL (our cross-check in
  * OracleConsistencySpec). Iterative graph algorithms are unrolled into
  * chained CTEs — fixed-round algorithms (PageRank 10, CDLP 10) unroll their
  * exact round count; fixpoint algorithms (WCC, BFS, SSSP) unroll past the
  * measured convergence round of the co-purchase graph (asserted in tests).
  *
  * Keep everything dialect-neutral: no backticks, no engine-specific
  * functions — LEAST/COALESCE/CASE/ROW_NUMBER/CAST/ROUND only. Float outputs
  * are rounded to 6 decimals on BOTH sides so ~1e-15 cross-engine
  * aggregation-order noise cannot flip the driver's hash compare.
  */
object OracleSql {

  /** Mark every CTE MATERIALIZED for DuckDB. DuckDB (like Spark) INLINES
    * plain CTEs; the unrolled iterative oracles reference the previous
    * round's CTE 2-3 times per round, so inlining expands the plan
    * exponentially (measured: g_cdlp went from >20s timeout to 0.3s, and
    * WCC/BFS/SSSP/k-core from fd-exhaustion crashes to <0.3s).
    * The only `<ident> AS (` token sequences in this file's SQL are CTE
    * heads (column aliases are never followed by an open paren). */
  def materialize(sql: String): String =
    sql.replaceAll("""(\b\w+ AS) \(""", "$1 MATERIALIZED (")

  /** Shared derivation of the part co-purchase graph (mirrors
    * graft.graphbuild.CoPurchase exactly). */
  val graphCtes: String =
    """pairs AS (
      |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |edges AS (
      |  SELECT src, dst FROM pairs
      |  UNION ALL
      |  SELECT dst AS src, src AS dst FROM pairs),
      |verts AS (SELECT DISTINCT l_partkey AS vid FROM lineitem),
      |degt AS (SELECT src AS vid, COUNT(*) AS deg FROM edges GROUP BY src)
      |""".stripMargin

  val degree: String =
    s"""WITH $graphCtes
       |SELECT CAST(v.vid AS BIGINT) AS vid,
       |       CAST(COALESCE(d.deg, 0) AS BIGINT) AS degree
       |FROM verts v LEFT JOIN degt d ON v.vid = d.vid
       |""".stripMargin

  /** PageRank, reference semantics (see graft.apps.PageRank), 10 rounds
    * unrolled; the dangling-mass scalar recurrence is chained through
    * scalar CTEs s0,b1,s1,b2,... exactly as the driver-side doubles. */
  def pagerank(rounds: Int = 10, delta: Double = 0.85): String = {
    val d = delta.toString
    val sb = new StringBuilder
    sb ++= s"WITH $graphCtes,\n"
    sb ++=
      """v AS (SELECT verts.vid, COALESCE(degt.deg, 0) AS deg
        |      FROM verts LEFT JOIN degt ON verts.vid = degt.vid),
        |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |              CAST(SUM(CASE WHEN deg = 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |                AS ndang FROM v),
        |r0 AS (SELECT vid, deg, (SELECT 1.0 / n FROM nn) AS pr FROM v),
        |s0 AS (SELECT n, ndang, (1.0 / n) * ndang AS ds FROM nn)
        |""".stripMargin
    for (i <- 1 to rounds) {
      val p = i - 1
      sb ++= s""",
        |b$i AS (SELECT n, ndang, (1.0 - $d) / n + $d * ds / n AS base
        |        FROM s$p),
        |r$i AS (SELECT v.vid, v.deg,
        |         CASE WHEN v.deg = 0 THEN (SELECT base FROM b$i)
        |              ELSE $d * COALESCE(m.s, 0.0) + (SELECT base FROM b$i)
        |         END AS pr
        |        FROM v LEFT JOIN (
        |          SELECT e.dst AS vid, SUM(r.pr / r.deg) AS s
        |          FROM edges e JOIN r$p r ON e.src = r.vid AND r.deg > 0
        |          GROUP BY e.dst) m ON v.vid = m.vid),
        |s$i AS (SELECT n, ndang, base * ndang AS ds FROM b$i)
        |""".stripMargin
    }
    sb ++= s"\nSELECT CAST(vid AS BIGINT) AS vid, ROUND(pr, 6) AS pr" +
      s" FROM r$rounds\n"
    sb.toString
  }

  /** Pregel-variant PageRank (apps/pregel/pagerank_pregel.h:43-94):
    * no dangling redistribution, r' = d*Σ msgs + (1-d)/N, fixed rounds. */
  def pregelPagerank(rounds: Int = 10, delta: Double = 0.85): String = {
    val d = delta.toString
    val sb = new StringBuilder
    sb ++= s"WITH $graphCtes,\n"
    sb ++=
      """v AS (SELECT verts.vid, COALESCE(degt.deg, 0) AS deg
        |      FROM verts LEFT JOIN degt ON verts.vid = degt.vid),
        |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
        |r0 AS (SELECT vid, deg, (SELECT 1.0 / n FROM nn) AS pr FROM v)
        |""".stripMargin
    for (i <- 1 to rounds) {
      val p = i - 1
      sb ++= s""",
        |r$i AS (SELECT v.vid, v.deg,
        |         $d * COALESCE(m.s, 0.0)
        |           + (SELECT (1.0 - $d) / n FROM nn) AS pr
        |        FROM v LEFT JOIN (
        |          SELECT e.dst AS vid, SUM(r.pr / r.deg) AS s
        |          FROM edges e JOIN r$p r ON e.src = r.vid AND r.deg > 0
        |          GROUP BY e.dst) m ON v.vid = m.vid)
        |""".stripMargin
    }
    sb ++= s"\nSELECT CAST(vid AS BIGINT) AS vid, ROUND(pr, 6) AS pr" +
      s" FROM r$rounds\n"
    sb.toString
  }

  /** WCC min-label propagation unrolled `rounds` times (>= graph diameter —
    * convergence asserted in OracleConsistencySpec). */
  def wcc(rounds: Int = 25): String = {
    val sb = new StringBuilder
    sb ++= s"WITH $graphCtes,\n"
    sb ++= "l0 AS (SELECT vid, vid AS comp FROM verts)\n"
    for (i <- 1 to rounds) {
      val p = i - 1
      sb ++= s""",
        |l$i AS (SELECT t.vid,
        |         LEAST(t.comp, COALESCE(m.mc, t.comp)) AS comp
        |        FROM l$p t LEFT JOIN (
        |          SELECT e.dst AS vid, MIN(l.comp) AS mc
        |          FROM edges e JOIN l$p l ON e.src = l.vid
        |          GROUP BY e.dst) m ON t.vid = m.vid)
        |""".stripMargin
    }
    sb ++= s"\nSELECT CAST(vid AS BIGINT) AS vid, CAST(comp AS BIGINT)" +
      s" AS comp FROM l$rounds\n"
    sb.toString
  }

  /** CDLP: mode of neighbor labels, min tiebreak, exactly `rounds` rounds
    * (LDBC semantics, see graft.apps.CDLP). */
  /** The unrolled CDLP chain c0..c{rounds} over the co-purchase graph
    * (shared by cdlp and louvainQ). */
  private def cdlpChain(rounds: Int): StringBuilder = {
    val sb = new StringBuilder
    sb ++= s"WITH $graphCtes,\n"
    sb ++= "c0 AS (SELECT vid, vid AS label FROM verts)\n"
    for (i <- 1 to rounds) {
      val p = i - 1
      sb ++= s""",
        |g$i AS (SELECT e.dst AS vid, l.label, COUNT(*) AS cnt
        |        FROM edges e JOIN c$p l ON e.src = l.vid
        |        GROUP BY e.dst, l.label),
        |p$i AS (SELECT vid, label FROM (
        |          SELECT vid, label,
        |            ROW_NUMBER() OVER (PARTITION BY vid
        |              ORDER BY cnt DESC, label ASC) AS rn
        |          FROM g$i) x WHERE rn = 1),
        |c$i AS (SELECT t.vid, COALESCE(p.label, t.label) AS label
        |        FROM c$p t LEFT JOIN p$i p ON t.vid = p.vid)
        |""".stripMargin
    }
    sb
  }

  def cdlp(rounds: Int = 10): String =
    (cdlpChain(rounds) ++=
      s"\nSELECT CAST(vid AS BIGINT) AS vid, CAST(label AS BIGINT)" +
      s" AS label FROM c$rounds\n").toString

  /** g_louvain_q: exact integer-rational modularity of the CDLP-{rounds}
    * assignment (see graft.apps.Louvain.modularityExact and
    * Queries.louvainQ): q_num = i2*m2 - s, q_den = m2^2, with i2 =
    * symmetric intra-community edge rows, m2 = symmetric edge rows,
    * s = Σ_c (Σ_deg(c))^2 — pure BIGINTs, hash-exact across engines. */
  def louvainQ(rounds: Int = 10): String =
    (cdlpChain(rounds) ++=
      s""",
        |asg AS (SELECT vid, label AS c FROM c$rounds),
        |m2t AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM edges),
        |i2t AS (SELECT CAST(COUNT(*) AS BIGINT) AS i2
        |        FROM edges e JOIN asg a ON e.src = a.vid
        |                     JOIN asg b ON e.dst = b.vid
        |        WHERE a.c = b.c),
        |st AS (SELECT CAST(SUM(tot * tot) AS BIGINT) AS s FROM (
        |         SELECT a.c AS cc, SUM(d.deg) AS tot
        |         FROM degt d JOIN asg a ON d.vid = a.vid
        |         GROUP BY a.c) x)
        |SELECT CAST(i2t.i2 * m2t.m2 - st.s AS BIGINT) AS q_num,
        |       CAST(m2t.m2 * m2t.m2 AS BIGINT) AS q_den
        |FROM m2t, i2t, st
        |""".stripMargin).toString

  /** Oriented wedge-join triangle counting (see graft.apps.Triangles). */
  private val triangleCtes: String =
    """orient AS (
      |  SELECT CASE WHEN da.deg <= db.deg THEN u.src ELSE u.dst END AS src,
      |         CASE WHEN da.deg <= db.deg THEN u.dst ELSE u.src END AS dst
      |  FROM pairs u JOIN degt da ON u.src = da.vid
      |               JOIN degt db ON u.dst = db.vid),
      |tri AS (
      |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      |  FROM orient e1
      |  JOIN orient e2 ON e1.src = e2.src AND e1.dst <> e2.dst
      |  JOIN orient e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
      |corners AS (
      |  SELECT a AS vid FROM tri
      |  UNION ALL SELECT b AS vid FROM tri
      |  UNION ALL SELECT c AS vid FROM tri),
      |tcnt AS (SELECT vid, COUNT(*) AS triangles FROM corners GROUP BY vid)
      |""".stripMargin

  val triangles: String =
    s"""WITH $graphCtes, $triangleCtes
       |SELECT CAST(v.vid AS BIGINT) AS vid,
       |       CAST(COALESCE(t.triangles, 0) AS BIGINT) AS triangles
       |FROM verts v LEFT JOIN tcnt t ON v.vid = t.vid
       |""".stripMargin

  /** Local clustering coefficient = 2*tri/(deg*(deg-1)), 0 when deg < 2
    * (reference: apps/clustering/clustering.h, undirected form). */
  val clustering: String =
    s"""WITH $graphCtes, $triangleCtes
       |SELECT CAST(v.vid AS BIGINT) AS vid,
       |       CAST(CASE WHEN COALESCE(d.deg, 0) < 2 THEN 0.0
       |            ELSE 2.0 * CAST(COALESCE(t.triangles, 0) AS DOUBLE)
       |                 / CAST(d.deg * (d.deg - 1) AS DOUBLE) END
       |         AS DOUBLE) AS coeff
       |FROM verts v LEFT JOIN degt d ON v.vid = d.vid
       |            LEFT JOIN tcnt t ON v.vid = t.vid
       |""".stripMargin

  /** Global transitivity = 3*triangles/wedges = sum(per-vertex tri)/wedges
    * (reference: apps/clustering/transitivity.h). */
  val transitivity: String =
    s"""WITH $graphCtes, $triangleCtes,
       |ts AS (SELECT CAST(COALESCE(SUM(triangles), 0) AS DOUBLE) AS tsum
       |       FROM tcnt),
       |ws AS (SELECT CAST(SUM(deg * (deg - 1)) AS DOUBLE) / 2.0 AS wsum
       |       FROM degt)
       |SELECT ts.tsum / ws.wsum AS transitivity
       |FROM ts CROSS JOIN ws
       |""".stripMargin

  /** Degree centrality = deg/(n-1)
    * (reference: apps/centrality/degree/degree_centrality.h, both-degree). */
  val degreeCentrality: String =
    s"""WITH $graphCtes,
       |nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)
       |SELECT CAST(v.vid AS BIGINT) AS vid,
       |       COALESCE(d.deg, 0) / ((SELECT n FROM nv) - 1.0)
       |         AS centrality
       |FROM verts v LEFT JOIN degt d ON v.vid = d.vid
       |""".stripMargin

  /** BFS depth from the smallest vid, unrolled; unreached = -1
    * (reference: apps/bfs/bfs_generic.h level semantics). */
  def bfs(rounds: Int = 15): String = {
    val sb = new StringBuilder
    sb ++= s"WITH $graphCtes,\n"
    sb ++=
      """d0 AS (SELECT vid,
        |        CASE WHEN vid = (SELECT MIN(vid) FROM verts)
        |             THEN 0 ELSE NULL END AS depth
        |       FROM verts)
        |""".stripMargin
    for (i <- 1 to rounds) {
      val p = i - 1
      sb ++= s""",
        |d$i AS (SELECT t.vid,
        |         CASE WHEN t.depth IS NOT NULL THEN t.depth
        |              WHEN m.vid IS NOT NULL THEN $i ELSE NULL END AS depth
        |        FROM d$p t LEFT JOIN (
        |          SELECT DISTINCT e.dst AS vid
        |          FROM edges e JOIN d$p l ON e.src = l.vid
        |          WHERE l.depth IS NOT NULL) m ON t.vid = m.vid)
        |""".stripMargin
    }
    sb ++= s"\nSELECT CAST(vid AS BIGINT) AS vid, " +
      s"CAST(COALESCE(depth, -1) AS BIGINT) AS depth FROM d$rounds\n"
    sb.toString
  }

  /** SSSP (Bellman-Ford) from the smallest vid with deterministic weights
    * w(src,dst) = 1 + (src+dst) mod 7; unreached = NULL -> represented as
    * -1.0 to keep the column non-null for hashing.
    * (reference: apps/projected/sssp_projected.h; unreachable = DBL_MAX,
    * surfaced to Python as inf — we use -1.0 as the portable sentinel). */
  def sssp(rounds: Int = 30): String = {
    val sb = new StringBuilder
    sb ++= s"WITH $graphCtes,\n"
    sb ++=
      """w AS (SELECT src, dst,
        |        1.0 + CAST((src + dst) % 7 AS DOUBLE) AS weight FROM edges),
        |t0 AS (SELECT vid,
        |        CASE WHEN vid = (SELECT MIN(vid) FROM verts)
        |             THEN 0.0 ELSE NULL END AS dist
        |       FROM verts)
        |""".stripMargin
    for (i <- 1 to rounds) {
      val p = i - 1
      sb ++= s""",
        |t$i AS (SELECT t.vid,
        |         CASE WHEN t.dist IS NULL THEN m.md
        |              WHEN m.md IS NULL THEN t.dist
        |              WHEN m.md < t.dist THEN m.md ELSE t.dist END AS dist
        |        FROM t$p t LEFT JOIN (
        |          SELECT e.dst AS vid, MIN(l.dist + e.weight) AS md
        |          FROM w e JOIN t$p l ON e.src = l.vid
        |          WHERE l.dist IS NOT NULL
        |          GROUP BY e.dst) m ON t.vid = m.vid)
        |""".stripMargin
    }
    sb ++= s"\nSELECT CAST(vid AS BIGINT) AS vid, " +
      s"COALESCE(dist, -1.0) AS dist FROM t$rounds\n"
    sb.toString
  }

  /** k-core membership via unrolled peeling (reference:
    * apps/kcore/kcore.h:58-126); `rounds` must exceed the number of
    * cascading removal waves (asserted in OracleConsistencySpec). */
  def kcore(k: Int = 3, rounds: Int = 20): String = {
    val sb = new StringBuilder
    sb ++= s"WITH $graphCtes,\n"
    sb ++= "a0 AS (SELECT vid FROM verts)\n"
    for (i <- 1 to rounds) {
      val p = i - 1
      sb ++= s""",
        |a$i AS (SELECT s.vid FROM a$p s
        |        JOIN edges e ON e.src = s.vid
        |        JOIN a$p t2 ON e.dst = t2.vid
        |        GROUP BY s.vid HAVING COUNT(*) >= $k)
        |""".stripMargin
    }
    sb ++= s"""
      |SELECT CAST(v.vid AS BIGINT) AS vid,
      |       CAST(CASE WHEN a.vid IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
      |         AS in_core
      |FROM verts v LEFT JOIN a$rounds a ON v.vid = a.vid
      |""".stripMargin
    sb.toString
  }

  /** k-shell membership via the h-index fixpoint on core estimates
    * (mirrors graft.apps.KShell.coreNumbers; reference: apps/kshell/
    * kshell.h peeling semantics — identical fixpoint). est_0 = degree;
    * each round est(v) = min(est(v), H-index of neighbor estimates);
    * h-index in SQL: rank neighbor estimates descending, count ranks with
    * est >= rank. `rounds` must exceed the fixpoint round (asserted in
    * OracleConsistencySpec). */
  def kshell(k: Int = 3, rounds: Int = 15): String = {
    val sb = new StringBuilder
    sb ++= s"WITH $graphCtes,\n"
    sb ++=
      """k0 AS (SELECT v.vid, COALESCE(d.deg, 0) AS core
        |       FROM verts v LEFT JOIN degt d ON v.vid = d.vid)
        |""".stripMargin
    for (i <- 1 to rounds) {
      val p = i - 1
      sb ++= s""",
        |hx$i AS (SELECT vid,
        |          MAX(CASE WHEN est >= rn THEN rn ELSE 0 END) AS h
        |         FROM (SELECT e.dst AS vid, l.core AS est,
        |                 ROW_NUMBER() OVER (PARTITION BY e.dst
        |                   ORDER BY l.core DESC) AS rn
        |               FROM edges e JOIN k$p l ON e.src = l.vid) x
        |         GROUP BY vid),
        |k$i AS (SELECT t.vid,
        |         CASE WHEN h.vid IS NULL THEN t.core
        |              WHEN h.h < t.core THEN h.h ELSE t.core END AS core
        |        FROM k$p t LEFT JOIN hx$i h ON t.vid = h.vid)
        |""".stripMargin
    }
    sb ++= s"""
      |SELECT CAST(vid AS BIGINT) AS vid,
      |       CAST(CASE WHEN core = $k THEN 1 ELSE 0 END AS BIGINT)
      |         AS in_shell
      |FROM k$rounds
      |""".stripMargin
    sb.toString
  }

  /** HITS at a FIXED round count (the catalog query pins tolerance = 0 so
    * the app runs exactly `rounds` rounds; reference recurrence
    * apps/hits/hits.h:35-204 — per-round max normalization, final sum
    * normalization). */
  def hits(rounds: Int = 15): String = {
    val sb = new StringBuilder
    sb ++= s"WITH $graphCtes,\n"
    sb ++=
      """nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
        |h0 AS (SELECT vid, (SELECT 1.0 / n FROM nn) AS hub,
        |       CAST(0.0 AS DOUBLE) AS auth FROM verts)
        |""".stripMargin
    for (i <- 1 to rounds) {
      val p = i - 1
      sb ++= s""",
        |ar$i AS (SELECT v.vid, COALESCE(m.s, 0.0) AS auth
        |        FROM verts v LEFT JOIN (
        |          SELECT e.dst AS vid, SUM(h.hub) AS s
        |          FROM edges e JOIN h$p h ON e.src = h.vid
        |          GROUP BY e.dst) m ON v.vid = m.vid),
        |hr$i AS (SELECT v.vid, COALESCE(m.s, 0.0) AS hub
        |        FROM verts v LEFT JOIN (
        |          SELECT e.src AS vid, SUM(a.auth) AS s
        |          FROM edges e JOIN ar$i a ON e.dst = a.vid
        |          GROUP BY e.src) m ON v.vid = m.vid),
        |mx$i AS (SELECT (SELECT MAX(hub) FROM hr$i) AS mh,
        |               (SELECT MAX(auth) FROM ar$i) AS ma),
        |h$i AS (SELECT h.vid, h.hub / (SELECT mh FROM mx$i) AS hub,
        |              a.auth / (SELECT ma FROM mx$i) AS auth
        |        FROM hr$i h JOIN ar$i a ON h.vid = a.vid)
        |""".stripMargin
    }
    sb ++= s""",
      |sm AS (SELECT SUM(hub) AS sh, SUM(auth) AS sa FROM h$rounds)
      |SELECT CAST(vid AS BIGINT) AS vid,
      |       ROUND(hub / (SELECT sh FROM sm), 6) AS hub,
      |       ROUND(auth / (SELECT sa FROM sm), 6) AS auth
      |FROM h$rounds
      |""".stripMargin
    sb.toString
  }

  /** Eigenvector centrality at a FIXED round count (catalog pins
    * tolerance = 0; reference: apps/centrality/eigenvector/
    * eigenvector_centrality.h — self term + in-neighbor sum, L2
    * normalization per round). */
  def eigenvector(rounds: Int = 15): String = {
    val sb = new StringBuilder
    sb ++= s"WITH $graphCtes,\n"
    sb ++=
      """nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
        |x0 AS (SELECT vid, (SELECT 1.0 / n FROM nn) AS x FROM verts)
        |""".stripMargin
    for (i <- 1 to rounds) {
      val p = i - 1
      sb ++= s""",
        |xr$i AS (SELECT v.vid, x.x + COALESCE(m.s, 0.0) AS x
        |        FROM verts v JOIN x$p x ON v.vid = x.vid
        |        LEFT JOIN (
        |          SELECT e.dst AS vid, SUM(l.x) AS s
        |          FROM edges e JOIN x$p l ON e.src = l.vid
        |          GROUP BY e.dst) m ON v.vid = m.vid),
        |nrm$i AS (SELECT SQRT(SUM(x * x)) AS nrm FROM xr$i),
        |x$i AS (SELECT vid, x / (SELECT nrm FROM nrm$i) AS x FROM xr$i)
        |""".stripMargin
    }
    sb ++= s"\nSELECT CAST(vid AS BIGINT) AS vid, ROUND(x, 6)" +
      s" AS centrality FROM x$rounds\n"
    sb.toString
  }

  /** Katz centrality at a FIXED round count (catalog pins tolerance = 0;
    * reference: apps/centrality/katz/katz_centrality.h — x0 = 0,
    * x' = alpha*Σ in-nbr + beta, no per-round normalization, final L2). */
  def katz(rounds: Int = 15, alpha: Double = 0.1, beta: Double = 1.0)
      : String = {
    val sb = new StringBuilder
    sb ++= s"WITH $graphCtes,\n"
    sb ++= "x0 AS (SELECT vid, CAST(0.0 AS DOUBLE) AS x FROM verts)\n"
    for (i <- 1 to rounds) {
      val p = i - 1
      sb ++= s""",
        |x$i AS (SELECT v.vid, $alpha * COALESCE(m.s, 0.0) + $beta AS x
        |        FROM verts v LEFT JOIN (
        |          SELECT e.dst AS vid, SUM(l.x) AS s
        |          FROM edges e JOIN x$p l ON e.src = l.vid
        |          GROUP BY e.dst) m ON v.vid = m.vid)
        |""".stripMargin
    }
    sb ++= s""",
      |nrm AS (SELECT SQRT(SUM(x * x)) AS nrm FROM x$rounds)
      |SELECT CAST(vid AS BIGINT) AS vid,
      |       ROUND(x / (SELECT nrm FROM nrm), 6) AS centrality
      |FROM x$rounds
      |""".stripMargin
    sb.toString
  }

  /** Average local clustering coefficient (reference:
    * apps/clustering/avg_clustering.h — mean over ALL vertices, deg<2
    * contributing 0). */
  val avgClustering: String =
    s"""WITH $graphCtes, $triangleCtes
       |SELECT ROUND(AVG(CASE WHEN COALESCE(d.deg, 0) < 2 THEN 0.0
       |         ELSE 2.0 * CAST(COALESCE(t.triangles, 0) AS DOUBLE)
       |              / CAST(d.deg * (d.deg - 1) AS DOUBLE) END), 6)
       |         AS avg_clustering
       |FROM verts v LEFT JOIN degt d ON v.vid = d.vid
       |            LEFT JOIN tcnt t ON v.vid = t.vid
       |""".stripMargin

  /** LPA-U2I unrolled (reference: apps/lpa/lpa_u2i.h:30-249): bipartite
    * customer->part graph from orders x lineitem, weight = l_quantity,
    * two features as scalar columns; steps 2..maxRound alternate u2i / i2u
    * with the pin / degree-normalization rules (see graft.apps.LPAU2I). */
  def lpaU2I(maxRound: Int = 5): String = {
    val sb = new StringBuilder
    sb ++=
      """WITH uedges AS (
        |  SELECT o.o_custkey AS u, l.l_partkey AS i, l.l_quantity AS w
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |odeg AS (SELECT u, CAST(COUNT(*) AS DOUBLE) AS outdeg
        |         FROM uedges GROUP BY u),
        |ideg AS (SELECT i, CAST(COUNT(*) AS DOUBLE) AS indeg
        |         FROM uedges GROUP BY i),
        |onid AS (SELECT e.u, SUM(d.indeg) AS onids
        |         FROM uedges e JOIN ideg d ON e.i = d.i GROUP BY e.u),
        |u1 AS (SELECT c_custkey AS vid,
        |        CAST(CASE WHEN c_custkey % 4 = 0 THEN 1.0
        |             WHEN c_custkey % 4 = 1 THEN 0.0
        |             ELSE 0.5 END AS DOUBLE) AS f1,
        |        CAST(CASE WHEN c_custkey % 5 = 0 THEN 1.0
        |             ELSE 0.3 END AS DOUBLE) AS f2
        |       FROM customer)
        |""".stripMargin
    for (step <- 2 to maxRound) {
      val p = step - 1
      // latest USER state CTE: u1, then u3, u5, ... (only odd steps write
      // user state; even steps write item state i$step)
      val pu = if (step % 2 == 0) s"u$p"
        else if (step - 2 >= 3) s"u${step - 2}" else "u1"
      if (step % 2 == 0) {
        sb ++= s""",
          |i$step AS (SELECT e.i, SUM(u.f1 * e.w) AS f1,
          |               SUM(u.f2 * e.w) AS f2
          |          FROM uedges e JOIN $pu u ON e.u = u.vid GROUP BY e.i)
          |""".stripMargin
      } else {
        sb ++= s""",
          |t$step AS (SELECT e.u AS vid, SUM(i.f1 * e.w) AS t1,
          |               SUM(i.f2 * e.w) AS t2
          |          FROM uedges e JOIN i$p i ON e.i = i.i GROUP BY e.u),
          |u$step AS (SELECT u.vid,
          |          CASE WHEN u.f1 = 0.0 OR u.f1 = 1.0 THEN u.f1
          |               WHEN COALESCE(o.onids, 0.0)
          |                    - COALESCE(d.outdeg, 0.0) <> 0.0
          |                 THEN (COALESCE(t.t1, 0.0)
          |                       - COALESCE(d.outdeg, 0.0) * u.f1)
          |                      / (o.onids - d.outdeg)
          |               ELSE u.f1 END AS f1,
          |          CASE WHEN u.f2 = 0.0 OR u.f2 = 1.0 THEN u.f2
          |               WHEN COALESCE(o.onids, 0.0)
          |                    - COALESCE(d.outdeg, 0.0) <> 0.0
          |                 THEN (COALESCE(t.t2, 0.0)
          |                       - COALESCE(d.outdeg, 0.0) * u.f2)
          |                      / (o.onids - d.outdeg)
          |               ELSE u.f2 END AS f2
          |         FROM $pu u LEFT JOIN t$step t ON u.vid = t.vid
          |              LEFT JOIN odeg d ON u.vid = d.u
          |              LEFT JOIN onid o ON u.vid = o.u)
          |""".stripMargin
      }
    }
    // Output the latest USER state (the last odd step <= maxRound).
    val lastU = if (maxRound % 2 == 1) maxRound else maxRound - 1
    val last = if (lastU >= 3) s"u$lastU" else "u1"
    sb ++= s"""
      |SELECT CAST(vid AS BIGINT) AS vid, ROUND(f1, 6) AS f1,
      |       ROUND(f2, 6) AS f2
      |FROM $last
      |""".stripMargin
    sb.toString
  }

  /** sampling_path oracle: label pattern customer-placed-order-contains-
    * part as a plain join chain (reference: apps/sampling_path/
    * sampling_path.h:27). */
  val samplingPath: String =
    """SELECT c.c_custkey AS v0, o.o_orderkey AS v1, l.l_partkey AS v2
      |FROM customer c
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_custkey % 100 = 0
      |""".stripMargin

  /** sssp_path: dist + canonical min parent (reference: apps/sssp/
    * sssp_path.h; parent nondeterminism canonicalized — see
    * graft.apps.SSSP.runWithParents; weights are small integers so the
    * dist equality is exact). */
  def ssspPath(rounds: Int = 30): String = {
    val base = sssp(rounds)
    // strip the final SELECT of the sssp oracle, keep its CTE chain
    val cut = base.lastIndexOf("\nSELECT CAST(vid AS BIGINT)")
    base.substring(0, cut) + s"""
      |SELECT CAST(t.vid AS BIGINT) AS vid,
      |       COALESCE(t.dist, -1.0) AS dist,
      |       CAST(CASE WHEN t.vid = (SELECT MIN(vid) FROM verts)
      |                  OR t.dist IS NULL THEN -1
      |                 ELSE COALESCE(p.parent, -1) END AS BIGINT) AS parent
      |FROM t$rounds t LEFT JOIN (
      |  SELECT e.dst AS vid, MIN(e.src) AS parent
      |  FROM w e JOIN t$rounds a ON e.src = a.vid
      |           JOIN t$rounds b ON e.dst = b.vid
      |  WHERE a.dist IS NOT NULL AND b.dist IS NOT NULL
      |    AND a.dist + e.weight = b.dist
      |  GROUP BY e.dst) p ON t.vid = p.vid
      |""".stripMargin
  }

  /** sssp_average_length, sampled form (reference:
    * apps/sssp/sssp_average_length.h, sum / (n*(n-1)) over ordered pairs;
    * here the k smallest vids as sources, denominator k*(n-1), unreachable
    * pairs excluded — mirrors graft.apps.SSSP.averageLength). The unroll
    * is one Bellman-Ford chain over the COMPOSITE (vid, source) state. */
  def ssspAverageLength(k: Int = 3, rounds: Int = 30): String = {
    val sb = new StringBuilder
    sb ++= s"WITH $graphCtes,\n"
    sb ++=
      s"""w AS (SELECT src, dst,
        |        1.0 + CAST((src + dst) % 7 AS DOUBLE) AS weight FROM edges),
        |srcs AS (SELECT vid AS source FROM verts ORDER BY vid LIMIT $k),
        |m0 AS (SELECT v.vid, s.source,
        |        CASE WHEN v.vid = s.source THEN 0.0 ELSE NULL END AS dist
        |       FROM verts v CROSS JOIN srcs s)
        |""".stripMargin
    for (i <- 1 to rounds) {
      val p = i - 1
      sb ++= s""",
        |m$i AS (SELECT t.vid, t.source,
        |         CASE WHEN t.dist IS NULL THEN x.md
        |              WHEN x.md IS NULL THEN t.dist
        |              WHEN x.md < t.dist THEN x.md ELSE t.dist END AS dist
        |        FROM m$p t LEFT JOIN (
        |          SELECT e.dst AS vid, l.source,
        |                 MIN(l.dist + e.weight) AS md
        |          FROM w e JOIN m$p l ON e.src = l.vid
        |          WHERE l.dist IS NOT NULL
        |          GROUP BY e.dst, l.source) x
        |          ON t.vid = x.vid AND t.source = x.source)
        |""".stripMargin
    }
    sb ++= s""",
      |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)
      |SELECT ROUND(SUM(dist) / ($k * ((SELECT n FROM nn) - 1.0)), 6)
      |         AS avg_length
      |FROM m$rounds
      |WHERE dist IS NOT NULL AND vid <> source
      |""".stripMargin
    sb.toString
  }

  /** sssp_has_path: reachability min-vid -> max-vid via the BFS unroll
    * (reference: apps/sssp/sssp_has_path.h). */
  def ssspHasPath(rounds: Int = 15): String = {
    val base = bfs(rounds)
    val cut = base.lastIndexOf("\nSELECT CAST(vid AS BIGINT)")
    base.substring(0, cut) + s"""
      |SELECT CAST((SELECT MIN(vid) FROM verts) AS BIGINT) AS src,
      |       CAST((SELECT MAX(vid) FROM verts) AS BIGINT) AS dst,
      |       CAST(CASE WHEN d.depth IS NOT NULL THEN 1 ELSE 0 END
      |         AS BIGINT) AS has_path
      |FROM d$rounds d WHERE d.vid = (SELECT MAX(vid) FROM verts)
      |""".stripMargin
  }

  /** BFS tree with canonical min parent one level up (reference:
    * apps/bfs/bfs_generic.h:30-33 edges/predecessors formats;
    * see graft.apps.BFS.runWithParents). */
  def bfsParents(rounds: Int = 15): String = {
    val base = bfs(rounds)
    val cut = base.lastIndexOf("\nSELECT CAST(vid AS BIGINT)")
    base.substring(0, cut) + s"""
      |SELECT CAST(t.vid AS BIGINT) AS vid,
      |       CAST(COALESCE(t.depth, -1) AS BIGINT) AS depth,
      |       CAST(CASE WHEN t.vid = (SELECT MIN(vid) FROM verts)
      |                  OR t.depth IS NULL THEN -1
      |                 ELSE COALESCE(p.parent, -1) END AS BIGINT) AS parent
      |FROM d$rounds t LEFT JOIN (
      |  SELECT e.dst AS vid, MIN(e.src) AS parent
      |  FROM edges e JOIN d$rounds a ON e.src = a.vid
      |              JOIN d$rounds b ON e.dst = b.vid
      |  WHERE a.depth IS NOT NULL AND b.depth IS NOT NULL
      |    AND a.depth + 1 = b.depth
      |  GROUP BY e.dst) p ON t.vid = p.vid
      |""".stripMargin
  }

  // ---- Interactive (Gremlin §2.4) operator-surface oracles over TPC-H ----

  val iFilter: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      |  AND c_acctbal > 1000.0 AND c_name LIKE '%1'
      |""".stripMargin

  val iOutJoin: String =
    """SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE o.o_orderpriority = '1-URGENT'
      |""".stripMargin

  val iGroupCount: String =
    """SELECT o_orderpriority AS k, COUNT(*) AS cnt
      |FROM orders GROUP BY o_orderpriority
      |""".stripMargin

  val iOrderLimit: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
      |""".stripMargin

  val iRangeLocal: String =
    """SELECT c_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) t WHERE rn <= 2
      |""".stripMargin

  val iDedup: String =
    "SELECT DISTINCT o_custkey, o_orderstatus FROM orders\n"

  val iUnion: String =
    """SELECT c_custkey FROM customer WHERE c_acctbal < 0.0
      |UNION ALL
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000.0
      |""".stripMargin

  val iSemiJoin: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders)
      |""".stripMargin

  val iAntiJoin: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |""".stripMargin

  /** Deterministic multiplicative-hash Bernoulli sample (~10%); the key is
    * masked to 31 bits before the multiply so the product never overflows
    * BIGINT at any scale factor (keeps Spark-ANSI and DuckDB arithmetic
    * identical). */
  val iSample: String =
    """SELECT o_orderkey, o_custkey FROM orders
      |WHERE MOD(MOD(o_orderkey, 2147483648) * 2654435761, 4294967296)
      |  < 429496729
      |""".stripMargin

  /** Self-checking ESTIMATE_COUNT: DuckDB's own HLL estimate must land
    * within 10% of its exact distinct count (estimates are not
    * cross-engine comparable; the CHECK is). */
  val iEstimateCount: String =
    """SELECT CAST(CASE WHEN
      |  ABS(CAST(approx_count_distinct(o_custkey) AS DOUBLE)
      |      - CAST(COUNT(DISTINCT o_custkey) AS DOUBLE))
      |  <= 0.1 * CAST(COUNT(DISTINCT o_custkey) AS DOUBLE)
      |  THEN 1 ELSE 0 END AS BIGINT) AS ok
      |FROM orders
      |""".stripMargin

  /** Replay of iPredicates: the `[05]$` regex as a LIKE disjunction,
    * CONTAINS/STARTSWITH as LIKE, WITHIN as IN. */
  val iPredicates: String =
    """SELECT c_custkey, c_name, c_nationkey FROM customer
      |WHERE (c_name LIKE '%0' OR c_name LIKE '%5')
      |  AND c_name LIKE '%1%'
      |  AND c_name LIKE 'Customer#%'
      |  AND c_nationkey IN (1, 3, 5, 7, 9, 11)
      |""".stripMargin

  /** Branch/case-when replay (same branch labels, per-branch aggregate). */
  val iCaseWhen: String =
    """SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'hot'
      |            WHEN o_totalprice > 200000.0 THEN 'big'
      |            ELSE 'norm' END AS branch,
      |       COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 4) AS total
      |FROM orders
      |GROUP BY 1
      |""".stripMargin

  /** SQL replay of the i_gremlin traversal text (see Queries.iGremlin):
    * customer-segment filter, placed-hop, price filter, deterministic
    * top-25 by (o_totalprice desc, vid asc) — per-row doubles, exact. */
  val iGremlin: String =
    """SELECT 'orders' AS label, o.o_totalprice AS o_totalprice,
      |       CAST(o.o_orderkey AS BIGINT) AS vid
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      |  AND o.o_totalprice > 50000.0
      |ORDER BY o.o_totalprice DESC, vid ASC
      |LIMIT 25
      |""".stripMargin

  /** SQL replay of i_gremlin_repeat: the 2-hop path count of the
    * co-purchase graph (bag semantics — no dedup). */
  val iGremlinRepeat: String =
    s"""WITH $graphCtes
       |SELECT CAST(COUNT(*) AS BIGINT) AS cnt
       |FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
       |""".stripMargin

  /** SQL replay of i_gremlin_where: where()/not() existence
    * sub-traversals == EXISTS / NOT EXISTS over the placed relation. */
  val iGremlinWhere: String =
    """SELECT 'customer' AS label, c.c_mktsegment AS c_mktsegment,
      |       CAST(c.c_custkey AS BIGINT) AS vid
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 150000.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')
      |ORDER BY vid ASC
      |LIMIT 100
      |""".stripMargin

  /** SQL replay of i_gremlin_edge: outE/has/inV/group ==
    * filtered lineitem-part join with a keyed count. */
  val iGremlinEdge: String =
    """SELECT p.p_brand AS k, COUNT(*) AS value
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE l.l_quantity > 45.0
      |GROUP BY 1
      |""".stripMargin

  /** 2-hop simple paths from the min vertex of the co-purchase graph. */
  val iSimplePath: String =
    s"""WITH $graphCtes
       |SELECT e1.src AS v0, e1.dst AS v1, e2.dst AS v2
       |FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
       |WHERE e1.src = (SELECT MIN(vid) FROM verts)
       |  AND e2.dst <> e1.src AND e2.dst <> e1.dst
       |""".stripMargin

  /** Planted near-duplicate ground truth (see Queries.eCosNearDup: copies
    * are exact positive scalings -> cosine 1.0 after 6-decimal rounding,
    * SRP buckets provably identical -> exact recall; natural pairs max out
    * near 0.51, far under the 0.95 threshold). */
  val eCosNearDup: String =
    """SELECT CAST(vec_id AS BIGINT) AS id_a,
      |       CAST(vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings)
      |         AS BIGINT) AS id_b,
      |       CAST(1.0 AS DOUBLE) AS cos
      |FROM embeddings WHERE vec_id < 50
      |""".stripMargin

  /** Exact brute-force cosine top-10 replay. DuckDB-only list functions
    * (NOT Spark-parsable — excluded from OracleConsistencySpec's layer 1;
    * AnnSpec holds the in-JVM oracle): each product is computed in FLOAT
    * and cast to DOUBLE before summation, replaying Spark's
    * zip_with(float,float)=float + double-accumulator fold bit-for-bit
    * (list_cosine_similarity's internal precision is unspecified, so it is
    * not used). */
  val eAnnTopk: String =
    """WITH q AS (
      |  SELECT vec_id AS q_id, embedding AS qe FROM embeddings
      |  WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.q_id, c.vec_id,
      |    list_sum(list_transform(list_zip(c.embedding, q.qe),
      |      x -> CAST(x[1] * x[2] AS DOUBLE)))
      |    / (SQRT(list_sum(list_transform(c.embedding,
      |         v -> CAST(v * v AS DOUBLE))))
      |       * SQRT(list_sum(list_transform(q.qe,
      |         v -> CAST(v * v AS DOUBLE))))) AS cos
      |  FROM embeddings c CROSS JOIN q
      |  WHERE c.vec_id <> q.q_id),
      |ranked AS (
      |  SELECT q_id, vec_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC,
      |      vec_id ASC) AS rank
      |  FROM scored)
      |SELECT CAST(q_id AS BIGINT) AS q_id, CAST(vec_id AS BIGINT) AS vec_id,
      |  ROUND(cos, 6) AS cos, CAST(rank AS BIGINT) AS rank
      |FROM ranked WHERE rank <= 10
      |""".stripMargin

  /** Self-check constants: the Spark side asserts its own contract and
    * emits ok=1 — the same pattern as iEstimateCount. Contracts: LSH
    * recall ≥ 0.4 of exact top-k; Louvain modularity ≥ 0.02; MinHash
    * estimator error ≤ 0.2 vs exact shingle Jaccard; SimHash planted
    * near-dup avg Hamming ≤ 8 with distinct-doc avg ≥ 12; image decode
    * recovers exact dims + unit histogram from real PNG bytes. */
  val eAnnLshOk: String = "SELECT CAST(1 AS BIGINT) AS ok\n"
  val eAnnIvfOk: String = "SELECT CAST(1 AS BIGINT) AS ok\n"
  val dDedupClusterCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"

  /** Constant oracle for the self-checking incremental-dedup contract
    * (snapshot-table lifecycle + hash-dependent pairs are not SQL). */
  val dIncrDedupCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"

  /** Constant oracle for the self-checking incremental-WCC contract
    * (incremental == full is asserted in-query; the full WCC itself has
    * its own unrolled oracle at g_wcc). */
  val gWccIncrCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"

  /** Constant oracle for the self-checking incremental-triangles
    * contract (incremental == full recount asserted in-query; the full
    * count has its own wedge oracle at g_triangles). */
  val gTriIncrCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"
  val louvainCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"
  val dMinhashCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"
  val dSimhashCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"
  val dNgramCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"
  val mImageDecodeCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"

  val iAggs: String =
    """SELECT o_custkey, COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 4) AS total,
      |  ROUND(MAX(o_totalprice), 4) AS mx, ROUND(MIN(o_totalprice), 4) AS mn
      |FROM orders GROUP BY o_custkey
      |""".stripMargin

  val iMath: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge
      |FROM lineitem
      |""".stripMargin

  /** fold -> unfold roundtrip == identity on the folded columns. */
  val iFoldUnfold: String =
    "SELECT o_custkey, o_orderkey FROM orders\n"

  /** Frame-sampling replay (see Multimodal.frameSample +
    * mediaFromDocuments: kind = video when doc_id % 3 = 2, duration =
    * (doc_id % 10) * 1000 + 1500 ms, frames = max(1, floor(duration/1000))).
    * Portable row multiplication: join a ROW_NUMBER-derived numbers table
    * {0..31} (neither engine has the other's sequence/generate_series).
    * FLOOR before CAST — DuckDB's CAST(double AS BIGINT) rounds while
    * Spark truncates. */
  val mFrameSample: String =
    """WITH nums AS (
      |  SELECT i FROM (
      |    SELECT CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT)
      |      AS i
      |    FROM documents) numbered
      |  WHERE i < 32),
      |vids AS (
      |  SELECT doc_id AS media_id,
      |         (doc_id % 10) * 1000 + 1500 AS duration_ms
      |  FROM documents WHERE doc_id % 3 = 2)
      |SELECT CAST(v.media_id AS BIGINT) AS media_id,
      |       n.i AS frame_idx, n.i * 1000 AS t_ms
      |FROM vids v JOIN nums n
      |  ON n.i < GREATEST(1, CAST(FLOOR(v.duration_ms / 1000.0) AS BIGINT))
      |""".stripMargin

  /** Full-row replay of the media-feature extraction (see
    * Queries.mMediaFeatures): the synthesized payloads are deterministic
    * functions of doc_id (kind by doc_id%3, width/height/duration by
    * modular formulas — mediaFromDocuments), and the REAL decoders
    * provably recover the synthesis parameters (the *_decode_check
    * diagnostics), so the decoded columns are SQL-expressible:
    * image dims == typed dims, audio samples == duration*8 @ 8 kHz,
    * video frames == the muxer's integer-truncated max(1, dur*4/1000)
    * (FLOOR before CAST — DuckDB's CAST rounds, Spark truncates). */
  val mMediaFeatures: String =
    """WITH m AS (
      |  SELECT CAST(doc_id AS BIGINT) AS media_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio'
      |         ELSE 'video' END AS kind,
      |    CAST(doc_id % 64 + 16 AS BIGINT) AS width,
      |    CAST(doc_id % 48 + 16 AS BIGINT) AS height,
      |    CAST((doc_id % 10) * 1000 + 1500 AS BIGINT) AS duration_ms
      |  FROM documents)
      |SELECT media_id, kind, width, height, duration_ms,
      |  CASE WHEN kind = 'video'
      |    THEN GREATEST(CAST(1 AS BIGINT),
      |                  CAST(FLOOR(duration_ms * 4 / 1000.0) AS BIGINT))
      |    ELSE CAST(1 AS BIGINT) END AS frames_sampled,
      |  CASE WHEN kind = 'image' THEN width
      |       WHEN kind = 'audio' THEN duration_ms * 8
      |       ELSE GREATEST(CAST(1 AS BIGINT),
      |                     CAST(FLOOR(duration_ms * 4 / 1000.0) AS BIGINT))
      |  END AS decoded_a,
      |  CASE WHEN kind = 'image' THEN height
      |       WHEN kind = 'audio' THEN CAST(8000 AS BIGINT)
      |       ELSE width END AS decoded_b
      |FROM m
      |""".stripMargin

  // ---- Training-data / documents oracles ----

  val dExactDedup: String =
    """SELECT CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_dups
      |FROM documents GROUP BY text
      |""".stripMargin

  /** Token count = whitespace-separator count + 1 (portable formula; the
    * Spark side uses the identical expression). */
  val dTokenCount: String =
    """SELECT doc_id,
      |  CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT)
      |    AS n_tokens
      |FROM documents
      |""".stripMargin

  /** Mirrors TextStats.qualityFeatures exactly (ONE quality
    * implementation since r4): char/token counts, mean token length, and
    * TRANSLATE-based punctuation/uppercase char-class ratios (TRANSLATE
    * deletes char sets identically in Spark and DuckDB; regexp_replace
    * does not — DuckDB replaces only the first match without a 'g' flag
    * Spark can't parse). Integer `/` is double division in both engines;
    * the counts are exact small integers so the doubles are bit-equal. */
  val dQuality: String =
    """SELECT doc_id,
      |  CAST(LENGTH(text) AS BIGINT) AS n_chars,
      |  CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT)
      |    AS n_tokens,
      |  CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
      |    / CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
      |           AS DOUBLE)
      |    AS avg_token_len,
      |  CAST(LENGTH(text) - LENGTH(TRANSLATE(text, '.,!?;:', ''))
      |       AS DOUBLE) / GREATEST(LENGTH(text), 1) AS punct_ratio,
      |  CAST(LENGTH(text)
      |       - LENGTH(TRANSLATE(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', ''))
      |       AS DOUBLE) / GREATEST(LENGTH(text), 1) AS upper_ratio,
      |  CAST((LENGTH(text) - LENGTH(REPLACE(text, ' the ', ''))) / 5
      |     + (LENGTH(text) - LENGTH(REPLACE(text, ' a ', ''))) / 3
      |       AS DOUBLE)
      |    / CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
      |           AS DOUBLE)
      |    AS stop_ratio
      |FROM documents
      |""".stripMargin

  /** Mirrors TextStats.langId with the default 3-stopword-per-language
    * profiles (ONE language-ID implementation since r4). The CASE chain is
    * the algebraic simplification of "first language in priority order
    * whose score equals the global max": if en is not >= all, the max
    * lives in {de,es,fr}, so de >= es AND de >= fr already implies
    * de > en. */
  val dLangId: String =
    """SELECT doc_id,
      |  CASE
      |    WHEN en >= de AND en >= es AND en >= fr THEN 'en'
      |    WHEN de >= es AND de >= fr THEN 'de'
      |    WHEN es >= fr THEN 'es'
      |    ELSE 'fr' END AS lang_pred
      |FROM (
      |  SELECT doc_id,
      |    (LENGTH(text) - LENGTH(REPLACE(text, ' the ', ''))) / 5
      |      + (LENGTH(text) - LENGTH(REPLACE(text, ' and ', ''))) / 5
      |      + (LENGTH(text) - LENGTH(REPLACE(text, ' of ', ''))) / 4 AS en,
      |    (LENGTH(text) - LENGTH(REPLACE(text, ' der ', ''))) / 5
      |      + (LENGTH(text) - LENGTH(REPLACE(text, ' und ', ''))) / 5
      |      + (LENGTH(text) - LENGTH(REPLACE(text, ' die ', ''))) / 5 AS de,
      |    (LENGTH(text) - LENGTH(REPLACE(text, ' el ', ''))) / 4
      |      + (LENGTH(text) - LENGTH(REPLACE(text, ' los ', ''))) / 5
      |      + (LENGTH(text) - LENGTH(REPLACE(text, ' y ', ''))) / 3 AS es,
      |    (LENGTH(text) - LENGTH(REPLACE(text, ' le ', ''))) / 4
      |      + (LENGTH(text) - LENGTH(REPLACE(text, ' les ', ''))) / 5
      |      + (LENGTH(text) - LENGTH(REPLACE(text, ' et ', ''))) / 4 AS fr
      |  FROM documents) t
      |""".stripMargin

  // --- r4 self-check constants (Spark side asserts its own contract and
  // emits ok=1; see the matching Queries entries) ---
  val gDfsCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"
  val dFingerprintCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"
  val mAudioDecodeCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"
  val mVideoDecodeCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"
  val sSnapshotSinkCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"

  /** Constant oracle for the self-checking snapshot stats-pruning +
    * incremental-read contract (file-planning behavior is not SQL). */
  val sSnapshotPruneCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"

  /** Constant oracle for the self-checking per-file bloom-stat pruning
    * contract (file-planning behavior is not SQL). */
  val sSnapshotBloomCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"

  /** Constant oracle for the self-checking exactly-once streaming-sink
    * ledger contract (commit/replay/high-water behavior is not SQL). */
  val sStreamIngestCheck: String = "SELECT CAST(1 AS BIGINT) AS ok\n"
}
