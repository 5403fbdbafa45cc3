package graft

import graft.apps.{PageRank, WCC}
import graft.graph.SimpleGraph
import graft.graphbuild.CoPurchase
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main — prints ONE JSON line with per-query seconds plus the
  * north-rule scaling evidence: the same PageRank+WCC jobs on the same
  * input at two parallelism levels (local[N/4] vs local[N], the sandbox
  * stand-in for N vs 4N executors; worker-count-invariance precedent:
  * python/tests/test_scalability.py:42-56), with edges/sec/iteration
  * throughput at both levels and the scaling efficiency between them.
  *
  * The scaling section runs on a deterministic K-fold disjoint replication
  * of the co-purchase graph (~30M+ directed edges) so that per-superstep
  * compute dominates fixed per-round scheduling overhead — at the raw sf
  * sizes every round is overhead-bound and no parallelism level can help.
  * Both passes are JIT-warmed (a 2-round PageRank) and the lo pass runs
  * first, so the hi pass never borrows warmth the lo pass lacked.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE re-plans cached relations and drops their partitioning,
      // reinstating a per-superstep exchange (see SimpleGraph
      // .preparedEdges); the iterative plans are fixed-shape anyway.
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** K-fold edge replication of the co-purchase graph into a FIXED dense
    * vertex space: copy i hash-remaps both endpoints with seed i into
    * [0, vSpace). Edge count scales linearly with `copies` while the
    * vertex set stays small, so per-superstep compute grows but the
    * V-proportional serial costs (state broadcast, checkpoint) do not —
    * exactly the E >> V regime of the 10^12-file link graph. Deterministic
    * (xxhash64). Multi-edges are possible and harmless for PR/WCC. */
  private def scaledGraph(spark: SparkSession, dir: String, copies: Int)
      : SimpleGraph = {
    val vSpace = 50000L
    val p = CoPurchase.pairs(spark, dir).persist()
    p.count() // materialize once; the K-fold union below rescans the cache
    val shifted = (0 until copies).map { i =>
      p.select(
        pmod(xxhash64(col("src"), lit(i)), lit(vSpace)).as("src"),
        pmod(xxhash64(col("dst"), lit(i)), lit(vSpace)).as("dst"))
    }.reduce(_ unionByName _).where(col("src") =!= col("dst"))
    val edges = shifted.unionByName(
      shifted.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    edges.count()
    val verts = spark.range(vSpace).select(col("id").as("vid"))
    SimpleGraph(verts, edges, directed = false, simpleEdges = true)
  }

  /** (pagerank seconds, wcc seconds, wcc rounds, checksum) on a prepared
    * graph, after a short JIT warm-up. The PR part of the checksum is
    * quantized to 1e-6 — the raw double sum differs in final ULPs across
    * partition counts (aggregation order), which is not a result
    * difference at the 1e-6 comparison tolerance. */
  private def headline(g: SimpleGraph): (Double, Double, Int, Double) = {
    PageRank.run(g, 0.85, 1).count() // builds shared caches + JIT warmth
    val (prChk, prT) = time {
      PageRank.run(g, 0.85, 10)
        .agg(round(sum(col("rank")) * 1e6, 0)).head().getDouble(0)
    }
    val ((wccDf, wccRounds), wccT) = time {
      val r = WCC.runWithRounds(g)
      (r._1.localCheckpoint(true), r._2)
    }
    val chk = prChk + wccDf.agg(sum(col("comp"))).head().getLong(0)
    (prT, wccT, wccRounds, chk)
  }

  /** Compute-bound scaling probe: MinHash signatures (64 hash functions
    * over char shingles) on a `copies`-fold replicated documents table.
    * One stage + one agg — no per-round scheduling — so it isolates how
    * raw compute scales with cores, complementing the superstep probe
    * (whose per-round fixed job latency dominates at sandbox scale but is
    * noise at cluster scale where a round is minutes of work). */
  private def computeProbe(spark: SparkSession, dir: String,
      copies: Int = 64): Double = {
    import graft.text.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(copies - 1))).as("copy"))
      .select(concat_ws("#", col("text"), col("copy")).as("text"))
    val sigs = docs.select(
      Dedup.minhashSignature(Dedup.shingleHashes(col("text"), 5), 64)
        .as("sig"))
    val (_, t) = time {
      sigs.agg(sum(element_at(col("sig"), 1).cast("double"))).head()
    }
    t
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val hi = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val lo = math.max(1, hi / 4)
    // ~38M directed edges from sf0.1 (2.4M): enough compute per round to
    // make 4x cores visible. Scale down for smaller sf dirs.
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "96").toInt

    // --- per-query timings at hi parallelism, raw sf data ---
    var spark = session(hi)
    val nEdgesRaw = CoPurchase.graph(spark, sfDir).edges.count()
    val (prRawT, wccRawT, _, _) = headline(CoPurchase.graph(spark, sfDir))
    val others = Seq[(String, (SparkSession, String) => DataFrame)](
      "g_cdlp" -> Queries.cdlp,
      "g_triangles" -> Queries.triangles,
      "g_degree" -> Queries.degree,
      "i_aggs" -> Queries.iAggs,
      "d_exact_dedup" -> Queries.dExactDedup
    ).map { case (name, f) =>
      val (_, t) = time { f(spark, sfDir).count() }
      name -> t
    }
    spark.stop()

    // --- scaling: identical jobs, same scaled input, lo then hi ---
    spark = session(lo)
    val gLo = scaledGraph(spark, sfDir, copies)
    val nEdges = gLo.edges.count()
    val (prLoT, wccLoT, wccIters, chkLo) = headline(gLo)
    computeProbe(spark, sfDir, 2) // JIT warm-up for the probe
    val cpLoT = computeProbe(spark, sfDir)
    spark.stop()

    spark = session(hi)
    val gHi = scaledGraph(spark, sfDir, copies)
    gHi.edges.count()
    val (prHiT, wccHiT, wccItersHi, chkHi) = headline(gHi)
    computeProbe(spark, sfDir, 2)
    val cpHiT = computeProbe(spark, sfDir)
    spark.stop()

    val iters = 10 + wccIters
    val epsLo = nEdges.toDouble * iters / (prLoT + wccLoT)
    val epsHi = nEdges.toDouble * (10 + wccItersHi) / (prHiT + wccHiT)
    val efficiency = (epsHi / epsLo) / (hi.toDouble / lo)
    val resultsMatch = chkLo == chkHi && wccIters == wccItersHi

    val all = Seq("g_pagerank" -> prRawT, "g_wcc" -> wccRawT) ++ others
    val qs = all.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = all.map(_._2).sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec",""" +
      s""""queries":$qs,"sf":"$sfDir","edges_raw":$nEdgesRaw,""" +
      s""""scaling":{"edges":$nEdges,"iters":$iters,""" +
      s""""cores_lo":$lo,"cores_hi":$hi,""" +
      s""""pr_sec_lo":${f"$prLoT%.2f"},"pr_sec_hi":${f"$prHiT%.2f"},""" +
      s""""wcc_sec_lo":${f"$wccLoT%.2f"},"wcc_sec_hi":${f"$wccHiT%.2f"},""" +
      s""""eps_lo":${epsLo.round},"eps_hi":${epsHi.round},""" +
      s""""efficiency":${math.round(efficiency * 1000) / 1000.0},""" +
      s""""results_match":$resultsMatch},""" +
      s""""scaling_compute":{"minhash_sec_lo":${f"$cpLoT%.2f"},""" +
      s""""minhash_sec_hi":${f"$cpHiT%.2f"},""" +
      s""""efficiency":${
        math.round((cpLoT / cpHiT) / (hi.toDouble / lo) * 1000) / 1000.0
      }}}""")
  }
}
