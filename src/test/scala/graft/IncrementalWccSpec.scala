package graft

import graft.apps.WCC
import graft.graph.SimpleGraph
import graft.sources.SnapshotTable
import org.apache.spark.sql.functions._

/** Incremental WCC: contracted-graph updates must equal a full
  * recompute, including across snapshot-table edge appends consumed via
  * readIncremental. */
class IncrementalWccSpec extends SparkSpec {

  import spark.implicits._

  private def labelMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def graphOf(verts: Seq[Long], edges: Seq[(Long, Long)]) =
    SimpleGraph(verts.toDF("vid"),
      edges.toDF("src", "dst"), directed = false)

  test("incremental == full recompute on randomized splits") {
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val nV = 60 + trial * 20
      val all = (0 until (nV * 3 / 2)).map { _ =>
        (rng.nextInt(nV).toLong, rng.nextInt(nV).toLong)
      }.filter { case (a, b) => a != b }.distinct
      val (base, delta) = all.partition { case (a, b) =>
        (a * 31 + b) % 3 != 0
      }
      // base graph touches only the vertices its edges mention; the
      // delta introduces the rest as genuinely new vertices
      val baseVerts =
        base.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
      val fullVerts = (baseVerts ++
        delta.flatMap { case (a, b) => Seq(a, b) }).distinct.sorted

      val prev = WCC.run(graphOf(baseVerts, base)).localCheckpoint(true)
      val got = labelMap(WCC.runIncremental(prev, delta.toDF("src", "dst")))
      val want = labelMap(WCC.run(graphOf(fullVerts, delta ++ base)))
      assert(got == want, s"trial $trial: incremental != full recompute")
    }
  }

  test("no-op delta and pure-merge delta behave exactly") {
    val prev = WCC.run(graphOf(Seq(1L, 2L, 3L, 4L),
      Seq((1L, 2L), (3L, 4L)))).localCheckpoint(true)
    assert(labelMap(prev) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    // a delta edge that merges the two components
    val merged = labelMap(
      WCC.runIncremental(prev, Seq((4L, 2L)).toDF("src", "dst")))
    assert(merged == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // an in-component delta edge changes nothing
    val same = labelMap(
      WCC.runIncremental(prev, Seq((1L, 2L)).toDF("src", "dst")))
    assert(same == labelMap(prev))
  }

  test("follows a snapshot-table edge log via readIncremental") {
    val root = java.nio.file.Files.createTempDirectory("wcc-incr")
    val t = root.resolve("edges").toString
    try {
      SnapshotTable.create(Seq((1L, 2L), (3L, 4L), (5L, 6L))
        .toDF("src", "dst"), t)
      val e1 = SnapshotTable.read(spark, t)
      val verts1 = e1.select(explode(array(col("src"), col("dst")))
        .as("vid")).distinct()
      var labels = WCC.run(SimpleGraph(verts1, e1, directed = false))
        .localCheckpoint(true)

      // two appends; the consumer updates labels from the file diff only
      SnapshotTable.append(Seq((2L, 3L)).toDF("src", "dst"), t) // v2
      labels = WCC.runIncremental(labels,
        SnapshotTable.readIncremental(spark, t, 1, 2))
        .localCheckpoint(true)
      SnapshotTable.append(Seq((6L, 7L), (8L, 9L)).toDF("src", "dst"), t)
      labels = WCC.runIncremental(labels,
        SnapshotTable.readIncremental(spark, t, 2, 3))
        .localCheckpoint(true)

      val full = SnapshotTable.read(spark, t)
      val fullVerts = full.select(explode(array(col("src"), col("dst")))
        .as("vid")).distinct()
      val want = labelMap(WCC.run(SimpleGraph(fullVerts, full,
        directed = false)))
      assert(labelMap(labels) == want)
      assert(labelMap(labels) ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
          5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 8L))
    } finally {
      java.nio.file.Files.walk(root)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }
}
