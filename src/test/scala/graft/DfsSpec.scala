package graft

import graft.apps.{BFS, DFS}
import graft.graph.SimpleGraph
import graft.graphbuild.CoPurchase
import org.apache.spark.sql.functions._

/** DFS preorder vs an in-JVM recursive oracle (the reference golden files
  * are fragment-order-dependent; our contract is ascending-vid neighbor
  * order — see apps/DFS.scala). */
class DfsSpec extends SparkSpec {

  /** In-JVM recursive DFS with ascending-vid neighbor order. */
  def dfsOracle(verts: Seq[Long], edges: Seq[(Long, Long)], source: Long)
      : Map[Long, (Long, Long)] = {
    val adj = edges.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted).toMap
    val rank = scala.collection.mutable.Map[Long, Long]()
    val parent = scala.collection.mutable.Map[Long, Long]()
    var next = 0L
    def visit(v: Long): Unit = {
      rank(v) = next; next += 1
      adj.getOrElse(v, Nil).foreach { u =>
        if (!rank.contains(u)) { parent(u) = v; visit(u) }
      }
    }
    visit(source)
    verts.map(v => v -> (rank.getOrElse(v, -1L),
      parent.getOrElse(v, -1L))).toMap
  }

  val verts: Seq[Long] = 1L to 9L
  val edges: Seq[(Long, Long)] = Seq(
    (1L, 3L), (1L, 2L), (2L, 4L), (3L, 4L), (4L, 1L), (4L, 5L),
    (5L, 6L), (3L, 6L), (7L, 8L)) // 7,8,9 unreachable from 1

  def g: SimpleGraph = {
    import spark.implicits._
    SimpleGraph(verts.toDF("vid"), edges.toDF("src", "dst"),
      directed = true)
  }

  test("dfs preorder + parents match the recursive oracle (tiny)") {
    val got = DFS.run(g, 1L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == dfsOracle(verts, edges, 1L))
  }

  test("dfs on the co-purchase graph: matches oracle, preorder is a " +
      "permutation of the BFS-reachable set, parents precede children") {
    val cg = CoPurchase.graph(spark, "/root/testdata/sf0.001")
    val src = cg.vertices.agg(min(col("vid"))).head().getLong(0)
    val rows = DFS.run(cg, src).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = rows.map { case (v, r, p) => v -> (r, p) }.toMap

    val vs = cg.vertices.collect().map(_.getLong(0)).toSeq
    val es = cg.edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    assert(got == dfsOracle(vs, es, src), "vs recursive oracle")

    val reached = rows.filter(_._2 >= 0)
    assert(reached.map(_._2).sorted.toSeq ==
      (0L until reached.length.toLong), "preorder is a 0..n-1 permutation")
    val bfsReach = BFS.run(cg.copy(edges = cg.edges.select("src", "dst")),
      src).where(col("depth") >= 0).count()
    assert(reached.length.toLong == bfsReach,
      "DFS reaches exactly the BFS-reachable set")
    val rankOf = got.view.mapValues(_._1).toMap
    reached.filter(_._1 != src).foreach { case (v, r, p) =>
      assert(p >= 0 && rankOf(p) >= 0 && rankOf(p) < r,
        s"parent of $v precedes it in preorder")
    }
  }

  test("dfs refuses graphs beyond the serial-walk guard") {
    intercept[IllegalArgumentException] {
      DFS.run(g, 1L, maxEdges = 2L)
    }
  }
}
