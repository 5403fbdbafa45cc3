package graft.apps

import graft.graph.SimpleGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Depth-first search — preorder rank + tree parent from a source vertex
  * (reference: analytical_engine/apps/dfs/dfs.h:30-33 — the algorithm is a
  * SINGLE token walking the graph: each IncEval hands the "current vertex"
  * to the fragment owning it, visits unvisited out-neighbors one at a
  * time, and backtracks along parents; `rank[v]` is the visit order and
  * `parent[v]` the tree predecessor, collected to fragment 0 at the end).
  *
  * There is no parallel formulation of that contract — the token makes it
  * inherently serial (the reference runs one vertex-step per message
  * round-trip; its distribution buys memory, not speed). We therefore run
  * the classic explicit-stack DFS on the driver over the collected
  * adjacency, exactly like the reference's output stage collects every
  * rank to one worker anyway. Guarded: refuses beyond `maxEdges` — at that
  * point DFS preorder itself is the wrong tool, not the engine.
  *
  * Determinism: the reference visits neighbors in fragment adjacency order
  * (load-dependent); we canonicalize to ascending vid so the result is
  * partition- and run-invariant (same device as BFS.runWithParents /
  * SSSP.runWithParents canonical parents).
  *
  * @return (vid, rank, parent) — rank = 0-based preorder position, -1 if
  *         unreachable; parent = -1 for the source and unreachable.
  */
object DFS {

  /** Default edge guard sized from the ACTUAL driver heap, not a fixed
    * constant: the collected adjacency costs ~16 bytes/edge (one Long in a
    * neighbor array + amortized per-source row overhead), and the walk's
    * rank/parent maps cost ~32 bytes/vertex more — budgeting 64 bytes of
    * headroom per edge keeps the collect comfortably under maxMemory even
    * on drivers far smaller than the 24g default (r3 advice: the old flat
    * 50M-edge guard could pass while the collect itself OOMed). */
  def defaultMaxEdges: Long =
    math.min(50L * 1000 * 1000, Runtime.getRuntime.maxMemory / 64)

  def run(g: SimpleGraph, source: Long, maxEdges: Long = 0L): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val guard = if (maxEdges > 0) maxEdges else defaultMaxEdges
    val ne = g.numEdges
    require(ne <= guard,
      s"DFS is a serial preorder walk (reference dfs.h token passing); " +
        s"$ne edges exceeds the driver guard of $guard")

    // Collected CSR with ascending-vid neighbor order: sorted primitive
    // source array + parallel jagged neighbor array, looked up by binary
    // search — no boxed Map[Long, Array[Long]] (whose per-entry box +
    // hash-node overhead was several GB at the guard limit).
    val rows = g.edges.select(col("src"), col("dst"))
      .groupBy("src").agg(sort_array(collect_set(col("dst"))).as("nbrs"))
      .as[(Long, Array[Long])].collect()
      .sortBy(_._1)
    val srcs: Array[Long] = rows.map(_._1)
    val adj: Array[Array[Long]] = rows.map(_._2)
    val empty = Array.empty[Long]
    def nbrsOf(v: Long): Array[Long] = {
      val i = java.util.Arrays.binarySearch(srcs, v)
      if (i >= 0) adj(i) else empty
    }

    // Primitive-keyed maps (LongMap: open-addressed, no per-entry boxes).
    val rank = scala.collection.mutable.LongMap.empty[Long]
    val parent = scala.collection.mutable.LongMap.empty[Long]
    // Explicit stack of (vertex, next-neighbor index) — the iterative form
    // of the token walk; recursion would overflow on long paths.
    val stack = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    var next = 0L
    rank(source) = next; next += 1
    stack += ((source, 0))
    while (stack.nonEmpty) {
      val (v, i) = stack.last
      val nbrs = nbrsOf(v)
      if (i >= nbrs.length) stack.remove(stack.length - 1)
      else {
        stack(stack.length - 1) = (v, i + 1)
        val u = nbrs(i)
        if (!rank.contains(u)) {
          rank(u) = next; next += 1
          parent(u) = v
          stack += ((u, 0))
        }
      }
    }

    val res = rank.iterator.map { case (v, r) =>
      (v, r, parent.getOrElse(v, -1L))
    }.toSeq
    g.vertices.select(col("vid"))
      .join(res.toDF("vid", "rank", "parent"), Seq("vid"), "left")
      .select(col("vid"),
        coalesce(col("rank"), lit(-1L)).as("rank"),
        coalesce(col("parent"), lit(-1L)).as("parent"))
  }
}
