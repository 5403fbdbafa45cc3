package graft

import graft.apps.Triangles
import graft.graph.SimpleGraph

/** Incremental triangle counting: delta-edge closures must equal a full
  * recount, including triangles made of 2-3 new edges. */
class IncrementalTrianglesSpec extends SparkSpec {

  import spark.implicits._

  private def counts(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      .filter(_._2 > 0)

  private def full(verts: Seq[Long], edges: Seq[(Long, Long)]) =
    counts(Triangles.run(SimpleGraph(verts.toDF("vid"),
      edges.toDF("src", "dst"), directed = false)))

  test("incremental == full recount on randomized splits") {
    val rng = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val nV = 25 + trial * 10
      val all = (0 until nV * 3).map { _ =>
        (rng.nextInt(nV).toLong, rng.nextInt(nV).toLong)
      }.filter { case (a, b) => a != b }.distinct
      val (base, delta) = all.partition { case (a, b) =>
        (a * 31 + b) % 4 != 0
      }
      val verts = (0L until nV.toLong)
      val prev = Triangles.run(SimpleGraph(verts.toDF("vid"),
        base.toDF("src", "dst"), directed = false)).localCheckpoint(true)
      val got = counts(Triangles.runIncremental(
        prev, base.toDF("src", "dst"), delta.toDF("src", "dst")))
      assert(got == full(verts, base ++ delta),
        s"trial $trial: incremental != full recount")
    }
  }

  test("multi-new-edge triangles count once; replays and loops ignored") {
    // old: 1-2 only; delta closes the triangle with TWO new edges, plus
    // a replayed old edge, a self-loop, and a reversed duplicate.
    val verts = Seq(1L, 2L, 3L)
    val base = Seq((1L, 2L))
    val prev = Triangles.run(SimpleGraph(verts.toDF("vid"),
      base.toDF("src", "dst"), directed = false)).localCheckpoint(true)
    val delta = Seq((2L, 3L), (3L, 1L), (1L, 2L), (3L, 3L), (3L, 2L))
    val got = counts(Triangles.runIncremental(
      prev, base.toDF("src", "dst"), delta.toDF("src", "dst")))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("a delta touching no wedges changes nothing") {
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val prev = Triangles.run(SimpleGraph(verts.toDF("vid"),
      base.toDF("src", "dst"), directed = false)).localCheckpoint(true)
    val got = counts(Triangles.runIncremental(
      prev, base.toDF("src", "dst"), Seq((5L, 6L)).toDF("src", "dst")))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
