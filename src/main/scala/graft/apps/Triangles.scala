package graft.apps

import graft.graph.SimpleGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-vertex triangle counting on the undirected simple graph —
  * reference semantics: analytical_engine/apps/clustering/triangles.h:31-158
  * (stage1 orients each undirected edge from the lower-(degree, id) endpoint
  * to the higher one, triangles.h:78-94; stage2 intersects oriented
  * adjacency lists and credits +1 to all three corners,
  * triangles.h:110-138).
  *
  * Spark formulation: the degree orientation bounds every oriented
  * out-degree by O(sqrt(m)), so the wedge self-join
  * `orient ⋈ orient ON src` cannot explode on hub vertices — this is the
  * reference's own skew defense and the classic distributed TC plan. The
  * closing-edge check is an inner join against the oriented edge set
  * (each triangle {a,b,c} with a<b<c in (deg,id) order is found exactly
  * once, as wedge (a→b, a→c) closed by b→c).
  */
object Triangles {

  /** @return (vid, triangles) for every vertex (0 when none). */
  def run(g: SimpleGraph, numPartitions: Int = 0): DataFrame = {
    val spark = g.spark
    val p = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions

    // Canonical (src<dst) dedup pairs, degrees on the neighbor-set view.
    val pairs = g.canonicalPairs
    val deg = g.undirectedDegrees // (vid, deg)

    // Orient low (deg, id) -> high (deg, id); pairs already have src<dst so
    // the id tiebreak on equal degrees keeps src->dst.
    val da = deg.select(col("vid").as("src"), col("deg").as("dsrc"))
    val db = deg.select(col("vid").as("dst"), col("deg").as("ddst"))
    val orient = pairs.join(da, "src").join(db, "dst").select(
      when(col("dsrc") <= col("ddst"), col("src")).otherwise(col("dst"))
        .as("src"),
      when(col("dsrc") <= col("ddst"), col("dst")).otherwise(col("src"))
        .as("dst"))
      .repartition(p, col("src"))
      .persist()

    // Wedges (u->v, u->w), v != w; close with oriented edge v->w.
    // Both (v,w) and (w,v) wedge orderings are generated; exactly one of the
    // two closing edges exists in the oriented set, so each triangle is
    // counted once.
    val e1 = orient.select(col("src"), col("dst").as("b"))
    val e2 = orient.select(col("src"), col("dst").as("c"))
    val wedges = e1.join(e2, "src").where(col("b") =!= col("c"))
    val closing = orient.select(col("src").as("b"), col("dst").as("c"))
    val tris = wedges.join(closing, Seq("b", "c")) // (b, c, src=a)

    val corners = tris.select(col("src").as("vid"))
      .unionByName(tris.select(col("b").as("vid")))
      .unionByName(tris.select(col("c").as("vid")))
    val counts = corners.groupBy("vid").agg(count(lit(1)).as("triangles"))

    val out = g.vertices.select("vid").join(counts, Seq("vid"), "left")
      .select(col("vid"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .localCheckpoint(true) // materialize before dropping the oriented edges
    orient.unpersist()
    out
  }

  /** Global triangle count = Σ per-vertex / 3. */
  def total(g: SimpleGraph): Long = {
    val r = run(g).agg(sum(col("triangles"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0) / 3
  }
}
