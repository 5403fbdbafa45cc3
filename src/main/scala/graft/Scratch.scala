package graft

import graft.apps.PageRank
import graft.graph.SimpleGraph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (not part of the driver contract): spot-time one
  * configuration against the scaled-graph parquet left by Bench. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val path = sys.env.getOrElse("SPARK_GRAFT_SCALED",
      "target/bench-scaled-c64")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin",
        (!sys.env.contains("GRAFT_PROBE_SHJ")).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pairs = spark.read.parquet(path)
    val edges = pairs.unionByName(
      pairs.select(col("dst").as("src"), col("src").as("dst"))).persist()
    println(s"edges=${edges.count()}")
    val verts = spark.range(50000L).select(col("id").as("vid")).persist()
    verts.count()
    val g = SimpleGraph(verts, edges, directed = false, simpleEdges = true)
    if (sys.env.contains("GRAFT_PROBE_GATHER")) {
      import graft.graph.EdgeBlocks
      def t[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val blocks = t("build+persist") {
        val b = EdgeBlocks.build(g.edges.select("src", "dst"), cpus)
          .persist()
        b.count(); b
      }
      val state = verts.select(col("vid"), rand(7).as("value"))
        .localCheckpoint(true)
      t("scan-cached-blocks") { blocks.toDF().count() }
      t("deserialize-blocks") {
        import spark.implicits._
        blocks.map(b => b.srcIds.length).reduce(_ + _)
      }
      for (i <- 1 to 3)
        t(s"gatherSum-$i") {
          EdgeBlocks.gatherSum(blocks, state, cpus).count()
        }
      EdgeBlocks.gatherSum(blocks, state, cpus).explain("formatted")
      spark.stop(); return
    }
    if (sys.env.contains("GRAFT_PROBE_CSR"))
      sys.props("graft.force.csr") = "true"
    if (sys.env.contains("GRAFT_PROBE_SHUFFLE"))
      sys.props("graft.force.shuffle") = "true"
    PageRank.run(g, 0.85, 1).count()
    val t0 = System.nanoTime()
    val chk = PageRank.run(g, 0.85, 10)
      .agg(round(sum(col("rank")) * 1e6, 0)).head().getDouble(0)
    val t = (System.nanoTime() - t0) / 1e9
    println(f"pr10_sec=$t%.2f chk=$chk")
    spark.stop()
  }
}
