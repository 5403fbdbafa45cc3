package graft

import graft.apps.{PageRank, WCC}
import graft.graphbuild.CoPurchase
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main — prints ONE JSON line with per-query seconds plus the
  * north-rule scaling evidence: the same PageRank+WCC jobs on the same
  * input at two parallelism levels (local[N/4] vs local[N], the sandbox
  * stand-in for N vs 4N executors; worker-count-invariance precedent:
  * python/tests/test_scalability.py:42-56), with edges/sec/iteration
  * throughput at both levels and the scaling efficiency between them. */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** (seconds, iterations, checksum) for the two headline iterative jobs. */
  private def prJob(spark: SparkSession, dir: String)
      : (Double, Int, Double) = {
    val g = CoPurchase.graph(spark, dir)
    val (chk, t) = time {
      PageRank.run(g, 0.85, 10)
        .agg(round(sum(col("rank")) * 1e6, 0)).head().getDouble(0)
    }
    (t, 10, chk)
  }

  private def wccJob(spark: SparkSession, dir: String)
      : (Double, Int, Long) = {
    val g = CoPurchase.graph(spark, dir)
    val ((df, rounds), t) = time {
      val r = WCC.runWithRounds(g)
      (r._1.localCheckpoint(true), r._2)
    }
    val chk = df.agg(sum(col("comp"))).head().getLong(0)
    (t, rounds, chk)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val hi = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val lo = math.max(1, hi / 4)

    // --- hi-parallelism pass ---
    var spark = session(hi)
    val nEdges = CoPurchase.graph(spark, sfDir).edges.count()
    val (prHiT, prIters, prChkHi) = prJob(spark, sfDir)
    val (wccHiT, wccIters, wccChkHi) = wccJob(spark, sfDir)
    val others = Seq[(String, (SparkSession, String) =>
        org.apache.spark.sql.DataFrame)](
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

    // --- lo-parallelism pass: identical jobs, same input ---
    spark = session(lo)
    val (prLoT, _, prChkLo) = prJob(spark, sfDir)
    val (wccLoT, _, wccChkLo) = wccJob(spark, sfDir)
    spark.stop()

    val iters = prIters + wccIters
    val epsHi = nEdges.toDouble * iters / (prHiT + wccHiT)
    val epsLo = nEdges.toDouble * iters / (prLoT + wccLoT)
    val efficiency = (epsHi / epsLo) / (hi.toDouble / lo)
    val resultsMatch = prChkHi == prChkLo && wccChkHi == wccChkLo

    val all = Seq("g_pagerank" -> prHiT, "g_wcc" -> wccHiT) ++ others
    val qs = all.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = all.map(_._2).sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec",""" +
      s""""queries":$qs,"sf":"$sfDir",""" +
      s""""edges":$nEdges,"pr_iters":$prIters,"wcc_iters":$wccIters,""" +
      s""""scaling":{"cores_lo":$lo,"cores_hi":$hi,""" +
      s""""eps_lo":${epsLo.round},"eps_hi":${epsHi.round},""" +
      s""""efficiency":${math.round(efficiency * 1000) / 1000.0},""" +
      s""""results_match":$resultsMatch}}""")
  }
}
