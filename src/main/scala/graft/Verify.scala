package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Round-2 postmortem (CORRECTNESS_r02.json came back `{}` because this
  * main was timeout-killed mid-loop): the artifact must now land under ANY
  * budget, so
  *   - `oracle_sql.json` is written FIRST — it depends on nothing, and
  *     without it the driver has no SQL to compare even for the queries
  *     whose parquet did land;
  *   - queries run cheapest-first (static cost ranking measured at
  *     sf0.01), so a kill at time T loses only the most expensive tail;
  *   - a wall-clock budget (env SPARK_GRAFT_TIME_BUDGET, seconds, default
  *     780) skips-and-logs remaining queries instead of dying, so the JVM
  *     exits 0 with everything finished so far;
  *   - queries run on a small thread pool (env SPARK_GRAFT_VERIFY_THREADS,
  *     default 4): the iterative apps spend most of their wall time in
  *     per-round scheduling gaps of tiny jobs, so overlapping them fills
  *     the cores — results are pure DataFrame computations, unaffected by
  *     scheduling (worker-count-invariance precedent:
  *     reference python/tests/test_scalability.py:42-56);
  *   - per-query seconds go to stderr, so the next round can re-rank.
  */
object Verify {

  /** Static cheap-first order (measured at sf0.01, local[4..8]); queries
    * missing from this list run in the middle, before the heavy tail
    * (OracleConsistencySpec asserts the list stays complete). */
  private[graft] val costOrder: Seq[String] = Seq(
    // sub-second scans/aggs
    "i_filter", "i_out_join", "i_group_count", "i_order_limit",
    "i_range_local", "i_dedup", "i_union", "i_semi_join", "i_anti_join",
    "i_aggs", "i_math", "i_fold_unfold", "i_sample", "i_estimate_count",
    "i_predicates", "i_case_when", "i_gremlin", "i_gremlin_where",
    "i_gremlin_edge",
    "d_exact_dedup", "d_token_count", "d_quality", "d_langid",
    "d_fingerprint", "d_fingerprint_check", "d_simhash", "d_simhash_check",
    "m_frame_sample", "m_media_features", "m_image_decode_check",
    "m_audio_decode_check", "m_video_decode_check",
    // small joins / bucketed similarity
    "e_ann_topk", "e_ann_lsh", "e_ann_ivf", "e_cos_neardup",
    "d_ngram_jaccard", "d_ngram_check", "d_minhash_pairs",
    "d_minhash_check", "d_dedup_cluster_check", "d_incr_dedup_check",
    "s_snapshot_sink_check", "s_snapshot_prune_check",
    "s_snapshot_bloom_check", "s_stream_ingest_check",
    // graph: first entry builds the shared co-purchase graph
    "g_degree", "g_degree_centrality", "i_simple_path",
    "i_gremlin_repeat", "g_bfs",
    "g_bfs_parents", "g_wcc", "g_wcc_incr_check", "g_pagerank",
    "g_pregel_pagerank",
    "g_pregel_pagerank_agg", "g_pregel_sssp", "g_pregel_tc",
    "g_sampling_path", "g_lpa_u2i", "g_sssp", "g_sssp_has_path",
    "g_sssp_path", "g_dfs", "g_dfs_check",
    "g_triangles", "g_tri_incr_check",
    "g_clustering", "g_transitivity", "g_avg_clustering",
    "g_cdlp", "g_louvain_q", "g_kcore", "g_kshell",
    "g_hits", "g_eigenvector", "g_katz",
    // heavy tail: multi-round fixpoints / multi-source supersteps
    "g_louvain", "g_louvain_check", "g_sssp_avg_length")

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9
    val Array(sfDir, outDir) = args
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_TIME_BUDGET", "780").toDouble
    val nThreads =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4").toInt

    new java.io.File(outDir).mkdirs()
    // FIRST: the oracle SQL — it depends on nothing and gates every
    // comparison the driver can make.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    System.err.println(f"[verify] oracle_sql.json written (${elapsed}%.1fs)")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // concurrent query threads share the session fairly
      .config("spark.scheduler.mode", "FAIR")
      // headroom under full-thread load (r2 tail showed a 10s RpcTimeout)
      .config("spark.rpc.askTimeout", "120s")
      .config("spark.network.timeout", "240s")
      // AQE re-plans cached relations and drops their partitioning,
      // reinstating a per-superstep exchange (see SimpleGraph
      // .preparedEdges); the iterative plans are fixed-shape anyway.
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rank = costOrder.zipWithIndex.toMap
    val ordered = SparkEntry.queries.toSeq.sortBy { case (name, _) =>
      rank.getOrElse(name, costOrder.size / 2)
    }
    val done = new AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(nThreads)
    ordered.foreach { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit = {
          if (elapsed > budgetSec) {
            System.err.println(s"[verify] SKIP $name (budget " +
              f"${budgetSec}%.0fs exceeded at ${elapsed}%.1fs)")
            return
          }
          val qt0 = System.nanoTime()
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            val dt = (System.nanoTime() - qt0) / 1e9
            System.err.println(f"[verify] $name ok ${dt}%.1fs " +
              f"(${done.incrementAndGet()}/${ordered.size}, " +
              f"wall ${elapsed}%.1fs)")
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
          }
        }
      })
    }
    pool.shutdown()
    // Wait at most the remaining budget + grace for in-flight queries.
    val waitSec = math.max(30.0, budgetSec - elapsed + 120.0)
    if (!pool.awaitTermination(waitSec.toLong, TimeUnit.SECONDS)) {
      System.err.println("[verify] pool timeout — exiting with what landed")
      pool.shutdownNow()
    }
    System.err.println(
      f"[verify] done: ${done.get()}/${ordered.size} in ${elapsed}%.1fs")
    spark.stop()
    // Exit explicitly: a straggler non-daemon thread must not hold the JVM
    // past the driver's window.
    sys.exit(0)
  }
}
