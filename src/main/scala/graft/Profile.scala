package graft

import graft.apps.{PageRank, WCC}
import graft.graphbuild.CoPurchase
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-round timing + plan inspection for the headline apps.
  * Usage: runMain graft.Profile [sfDir] [cpus] */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      // AQE re-plans cached relations and drops their partitioning,
      // reinstating a per-superstep exchange (see SimpleGraph
      // .preparedEdges); the iterative plans are fixed-shape anyway.
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val g = t("graph build + materialize") {
      if (sys.env.contains("GRAFT_PROFILE_SCALED")) {
        val off = 10000000L
        val pr = CoPurchase.pairs(spark, sfDir).persist()
        pr.count()
        val shifted = (0 until 16).map { i =>
          pr.select((col("src") + i * off).as("src"),
            (col("dst") + i * off).as("dst"))
        }.reduce(_ unionByName _)
        val e = shifted.unionByName(shifted.select(col("dst").as("src"),
          col("src").as("dst"))).persist()
        e.count()
        val v = e.select(col("src").as("vid")).distinct().persist()
        v.count()
        graft.graph.SimpleGraph(v, e, directed = false, simpleEdges = true)
      } else {
        val g0 = CoPurchase.graph(spark, sfDir)
        g0.edges.count(); g0
      }
    }
    println(s"[profile] edges=${g.edges.count()} verts=${g.numVertices}")

    // one superstep plan, for shuffle inspection
    val deg = g.outDegrees
    val state = deg.withColumn("rank", lit(1.0 / 100))
      .repartition(cpus, col("vid"))
    val edges = g.edges.repartition(cpus, col("src"))
    val contrib = state.where(col("deg") > 0)
      .select(col("vid").as("src"), (col("rank") / col("deg")).as("c"))
    val msgs = edges.join(contrib, "src")
      .groupBy(col("dst").as("vid")).agg(sum(col("c")).as("msum"))
    val step = state.join(msgs, Seq("vid"), "left")
    println("[profile] one-superstep physical plan:")
    println(step.queryExecution.executedPlan.toString.take(4000))

    t("pagerank 10 rounds")(PageRank.run(g, 0.85, 10).count())
    t("pagerank 10 rounds (warm)")(PageRank.run(g, 0.85, 10).count())
    t("wcc")(WCC.run(g).count())
    spark.stop()
  }
}
