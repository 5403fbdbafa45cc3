package graft.graphbuild

import graft.graph.SimpleGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The deterministic benchmark/verification graph over the driver-provided
  * TPC-H-ish tables: the part co-purchase graph. Two parts are adjacent iff
  * they appear in the same order; the vertex set is every part that appears
  * in lineitem (parts only ever bought alone become isolated = dangling
  * vertices, exercising PageRank's dangling redistribution).
  *
  * The same derivation is replayed in ANSI SQL by the DuckDB oracle
  * (graft.oracle.OracleSql.graphCtes), so every graph query below it has an
  * exact cross-engine check.
  *
  * Scale note: the pair self-join is keyed on l_orderkey, whose group size
  * is bounded by order size (≤ ~7 in TPC-H-like data), so the join cannot
  * explode; at 100 TB the orderkey hash-join shuffles once and AQE handles
  * any residual skew.
  */
object CoPurchase {

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")

  /** Canonical (src < dst) distinct co-purchase pairs. */
  def pairs(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir).select("l_orderkey", "l_partkey")
    val a = li.toDF("o", "src")
    val b = li.toDF("o", "dst")
    a.join(b, "o").where(col("src") < col("dst"))
      .select("src", "dst").distinct()
  }

  /** Undirected co-purchase graph (both directions materialized).
    * Memoized per (session, dir) with persisted vertex/edge frames — the
    * verify/bench drivers run many queries over the same graph and the
    * derivation self-join should run once, not once per query. */
  def graph(spark: SparkSession, dir: String): SimpleGraph =
    cache.synchronized {
      // Bounded memoization: entries keyed by a stopped session are dead
      // weight (their cached RDDs are gone with the context) — evict on
      // every access so a long-lived service never accumulates them.
      cache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
      cache.getOrElseUpdate((spark, dir), {
        val p = pairs(spark, dir)
        val edges = p.unionByName(
          p.select(col("dst").as("src"), col("src").as("dst"))).persist()
        edges.count()
        val verts = lineitem(spark, dir)
          .select(col("l_partkey").as("vid")).distinct().persist()
        verts.count()
        SimpleGraph(verts, edges, directed = false, simpleEdges = true)
      })
    }

  private val cache =
    scala.collection.mutable.Map[(SparkSession, String), SimpleGraph]()

  /** Deterministic per-edge weight for weighted algorithms (SSSP):
    * 1 + (src + dst) mod 7, replayable in SQL. */
  def weighted(g: SimpleGraph): SimpleGraph =
    g.copy(edges = g.edges.withColumn("weight",
      (lit(1.0) + pmod(col("src") + col("dst"), lit(7)).cast("double"))))
}
