package graft

import graft.apps.{CDLP, PageRank, Triangles, WCC}
import graft.graphbuild.GraphBuilder
import graft.model.SourceFiles
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entrypoint (north rule: "jobs launch through spark-submit
  * on a multi-executor cluster at N and 4N executors").
  *
  * Unlike Verify/Bench — self-contained `local[n]` mains shaped for the
  * driver harness — this main inherits its master from spark-submit, so
  * the SAME packaged jar runs unchanged on `local[n]`,
  * `local-cluster[n,c,m]`, YARN or k8s:
  *
  * {{{
  * sbt package
  * /opt/spark/bin/spark-submit --class graft.Submit \
  *   --master local-cluster[4,2,2048] \
  *   target/scala-2.13/graphscopespark_2.13-0.1.0.jar [nFiles [nRepos]]
  * }}}
  *
  * Synthesizes the mandated source-file table (repo/path/commit/lang/
  * content — `model/SourceFiles`), derives the repo link graph, runs the
  * north-star suite (PageRank, WCC, CDLP, Triangles), and prints ONE JSON
  * line of per-app wall seconds and deterministic vid-weighted checksums.
  * Submit at two cluster sizes and diff the checksums: the generator is
  * partitioning-stable, so they must be byte-identical. */
object Submit {

  def main(args: Array[String]): Unit = {
    val nFiles = if (args.length > 0) args(0).toLong else 200000L
    val nRepos = if (args.length > 1) args(1).toInt else 2000

    val spark = SparkSession.builder()
      .appName("graft-submit")
      // NO .master(...): spark-submit owns the cluster manager choice.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val files = SourceFiles.generate(spark, nFiles, nRepos)
    val rg = GraphBuilder.build(files)
    val g = rg.simple(directed = true)
    val edges = g.numEdges

    val (prChk, prSec) = timed {
      PageRank.run(g, 0.85, 10)
        .agg(round(sum(col("rank") * col("vid")) * 1e6, 0))
        .head().getDouble(0).toLong
    }
    val und = g.toUndirected
    val (wccChk, wccSec) = timed {
      WCC.run(und).agg(sum((col("comp") + 1L) * col("vid")))
        .head().getLong(0)
    }
    val (cdlpChk, cdlpSec) = timed {
      CDLP.run(g, 10).agg(sum((col("label") + 1L) * col("vid")))
        .head().getLong(0)
    }
    val (triChk, triSec) = timed {
      Triangles.run(und).agg(sum(col("triangles") * (col("vid") + 1L)))
        .head().getLong(0)
    }

    println(
      s"""{"master":"${spark.sparkContext.master}"""" +
        s""","files":$nFiles,"repos":$nRepos,"edges":$edges""" +
        s""","pagerank":{"sec":${f"$prSec%.2f"},"checksum":$prChk}""" +
        s""","wcc":{"sec":${f"$wccSec%.2f"},"checksum":$wccChk}""" +
        s""","cdlp":{"sec":${f"$cdlpSec%.2f"},"checksum":$cdlpChk}""" +
        s""","triangles":{"sec":${f"$triSec%.2f"},"checksum":$triChk}}""")
    spark.stop()
  }
}
