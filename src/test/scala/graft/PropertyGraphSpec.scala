package graft

import graft.apps.SSSP
import graft.graph.PropertyGraph
import graft.ops.VertexDataContext
import org.apache.spark.sql.functions._

/** Property graph build/project/report + context/selector surface
  * (SURVEY.md §1.5, §2.1, §2.3). */
class PropertyGraphSpec extends SparkSpec {

  def pg: PropertyGraph = {
    import spark.implicits._
    PropertyGraph()
      .addVertices("person",
        Seq((1L, "alice", 1.5), (2L, "bob", 2.5), (3L, "carol", 0.5))
          .toDF("vid", "name", "weight"))
      .addVertices("software",
        Seq((10L, "lop"), (11L, "ripple")).toDF("vid", "name"))
      .addEdges("person", "knows", "person",
        Seq((1L, 2L, 0.4), (2L, 3L, 0.6)).toDF("src", "dst", "dist"))
      .addEdges("person", "created", "software",
        Seq((1L, 10L, 2009), (3L, 11L, 2010)).toDF("src", "dst", "year"))
  }

  test("build + report ops") {
    val g = pg
    assert(g.nodeNum("person") == 3)
    assert(g.edgeNum(("person", "knows", "person")) == 2)
    assert(g.hasNode("person", 2L) && !g.hasNode("person", 99L))
    assert(g.hasEdge(("person", "knows", "person"), 1L, 2L))
    assert(!g.hasEdge(("person", "knows", "person"), 2L, 1L))
    assert(g.neighbors(("person", "knows", "person"), 2L) == Seq(3L))
    assert(g.outDegree(("person", "created", "software"), 1L) == 1)
    assert(g.nodeData("person", 1L).get.getString(1) == "alice")
    assert(g.selfLoopsNum(("person", "knows", "person")) == 0)
  }

  test("addVertices unions into an existing label") {
    import spark.implicits._
    val g = pg.addVertices("person", Seq((4L, "dan", 9.0))
      .toDF("vid", "name", "weight"))
    assert(g.nodeNum("person") == 4)
  }

  test("project keeps chosen labels/properties only") {
    val g = pg.project(
      Map("person" -> Seq("name")),
      Map(("person", "knows", "person") -> Seq("dist")))
    assert(g.vertexLabels.keySet == Set("person"))
    assert(g.vertexLabels("person").columns.toSeq == Seq("vid", "name"))
    assert(g.edgeLabels.keySet == Set(("person", "knows", "person")))
  }

  test("projectToSimple + weighted app runs on the projection") {
    val sg = pg.projectToSimple("person",
      ("person", "knows", "person"), Some("dist"))
    assert(sg.hasWeight && sg.numVertices == 3 && sg.numEdges == 2)
    val dist = SSSP.run(sg, 1L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(dist(3L) - 1.0) < 1e-12) // 0.4 + 0.6
  }

  test("sampling_path enumerates label-matching paths") {
    val paths = graft.apps.SamplingPath.run(pg,
      Seq("person", "knows", "person", "created", "software"))
    // 1-knows->2, 2-knows->3; created: 1->10, 3->11 => only 2-3-11
    assert(paths.columns.toSeq == Seq("v0", "v1", "v2"))
    assert(paths.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))).toSet == Set((2L, 3L, 11L)))
  }

  test("context selectors, range, add_column, output") {
    import spark.implicits._
    val sg = pg.projectToSimple("person", ("person", "knows", "person"))
    val result = Seq((1L, 0.1), (2L, 0.7), (3L, 0.2)).toDF("vid", "rank")
    val ctx = VertexDataContext(sg, result, "rank")

    val df = ctx.toDataFrame(Map("node" -> "v.id", "r" -> "r"))
    assert(df.columns.sorted.toSeq == Seq("node", "r"))
    assert(df.count() == 3)

    val ranged = ctx.toDataFrame(Map("node" -> "v.id"),
      vertexRange = Some((1L, 3L)))
    assert(ranged.collect().map(_.getLong(0)).toSet == Set(1L, 2L))

    val arr = ctx.toArray("v.data")
    assert(arr.toSeq == Seq(0.1, 0.7, 0.2))

    val g2 = ctx.addColumn(Map("pr" -> "r"))
    assert(g2.vertices.columns.contains("pr"))

    val tmp = java.nio.file.Files.createTempDirectory("graft-ctx").toString
    ctx.output(s"$tmp/out", Map("node" -> "v.id", "score" -> "r"))
    val back = spark.read.parquet(s"$tmp/out")
    assert(back.count() == 3)
  }
}
