package graft

// Dev probe: can this sandbox run Spark's local-cluster mode (separate
// executor JVMs —真 multi-executor evidence for the scaling rule)?
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val classesDir = new java.io.File("target/scala-2.13/classes")
      .getAbsolutePath
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,2048]")
      .appName("graft-localcluster-probe")
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L))
      .toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L).toDF("vid")
    val g = graft.graph.SimpleGraph(verts, edges, directed = true)
    val pr = graft.apps.PageRank.run(g, 0.85, 5)
      .orderBy("vid").collect()
    println(s"[probe] executors=" +
      spark.sparkContext.statusTracker.getExecutorInfos.length)
    pr.foreach(r => println(s"[probe] ${r.getLong(0)} ${r.getDouble(1)}"))
    // exercise the CSR (mapPartitions/case-class) path too — this is the
    // part that needs our classes on the executor classpath
    sys.props("graft.force.csr") = "true"
    try {
      val pr2 = graft.apps.PageRank.run(g, 0.85, 5).orderBy("vid")
        .collect()
      println(s"[probe] csr ok: ${pr2.map(_.getDouble(1)).sum}")
    } finally sys.props.remove("graft.force.csr")
    spark.stop()
  }
}
