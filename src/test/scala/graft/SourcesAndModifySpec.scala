package graft

import graft.graph.PropertyGraph
import graft.sources.TableSource
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Loader option semantics (§2.7) + NX MODIFY_* batch deltas (§2.3). */
class SourcesAndModifySpec extends SparkSpec {

  def tmpDir(): String =
    Files.createTempDirectory("graft-src").toString

  test("csv loader: header + delimiter options round-trip") {
    import spark.implicits._
    val dir = tmpDir()
    Seq((1L, "a", 2.5), (2L, "b", -1.0)).toDF("id", "name", "score")
      .coalesce(1).write.option("header", "true").option("sep", "|")
      .csv(s"$dir/t")
    val back = TableSource.csv(spark, s"$dir/t", headerRow = true,
      delimiter = "|")
    assert(back.columns.toSeq == Seq("id", "name", "score"))
    assert(back.count() == 2)
    assert(back.where(col("name") === "a").head().getDouble(2) == 2.5)
  }

  test("csv loader: header_row=false names columns f0..fN " +
      "(loader.py:126)") {
    import spark.implicits._
    val dir = tmpDir()
    Seq((7L, "x"), (8L, "y")).toDF("a", "b")
      .coalesce(1).write.option("header", "false").csv(s"$dir/t")
    val back = TableSource.csv(spark, s"$dir/t", headerRow = false)
    assert(back.columns.toSeq == Seq("f0", "f1"))
    assert(back.count() == 2)
  }

  test("edge-list text loader parses `src dst [weight]` " +
      "(run_app.h:197-210)") {
    val dir = tmpDir()
    Files.writeString(java.nio.file.Paths.get(dir, "g.e"),
      "1 2 0.5\n2 3\n\n3 1 2.0\n")
    val e = TableSource.edgeListFile(spark, s"$dir/g.e")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(e == Set((1L, 2L, 0.5), (2L, 3L, 1.0), (3L, 1L, 2.0)))
  }

  def pg: PropertyGraph = {
    import spark.implicits._
    PropertyGraph()
      .addVertices("person",
        Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
          .toDF("vid", "name", "age"))
      .addEdges("person", "knows", "person",
        Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"))
  }

  test("MODIFY: delete vertices cascades to incident edges") {
    import spark.implicits._
    val g2 = pg.deleteVertices("person", Seq(2L).toDF("vid"))
    assert(g2.nodeNum("person") == 2)
    val left = g2.edgeLabels(("person", "knows", "person"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(left == Set((3L, 1L)))
  }

  test("MODIFY: delete edges by pair") {
    import spark.implicits._
    val g2 = pg.deleteEdges(("person", "knows", "person"),
      Seq((2L, 3L)).toDF("src", "dst"))
    assert(g2.edgeNum(("person", "knows", "person")) == 2)
    assert(!g2.hasEdge(("person", "knows", "person"), 2L, 3L))
  }

  test("lifecycle: TO_DIRECTED / CLEAR_EDGES / CLEAR_GRAPH / UNLOAD") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val g = graft.graph.SimpleGraph(
      Seq(1L, 2L, 3L).toDF("vid"), e, directed = false,
      simpleEdges = true)
    val d = g.toDirected
    assert(d.directed && d.numEdges == 4)
    assert(g.clearEdges.numEdges == 0 && g.clearEdges.numVertices == 3)
    assert(g.clearGraph.numVertices == 0)
    g.unload() // must not throw; caches released
  }

  test("GRAPH_TO_DATAFRAME selectors export vertex + edge data") {
    val g = pg
    val v = g.graphToDataFrame("person",
      Map("id" -> "v.id", "who" -> "v.name"))
    assert(v.columns.toSeq == Seq("id", "who"))
    assert(v.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    val e = g.graphToDataFrame(("person", "knows", "person"),
      Map("a" -> "e.src", "b" -> "e.dst"))
    assert(e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (2L, 3L), (3L, 1L)))
    intercept[IllegalArgumentException] {
      g.graphToDataFrame("person", Map("x" -> "r.bogus"))
    }
  }

  test("REPORT *_BY_LOC: stable resumable pages") {
    val g = pg
    val p1 = g.nodesByLoc("person", after = -1L, limit = 2)
      .map(_.getLong(0)).toSeq
    val p2 = g.nodesByLoc("person", after = p1.last, limit = 2)
      .map(_.getLong(0)).toSeq
    assert(p1 == Seq(1L, 2L) && p2 == Seq(3L))
    val d = g.degByLoc(("person", "knows", "person"), -1L, 10).toSeq
    assert(d == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("MODIFY: update vertices upserts delta columns, keeps the rest") {
    import spark.implicits._
    val g2 = pg.updateVertices("person",
      Seq((2L, 99)).toDF("vid", "age"))
    val rows = g2.vertexLabels("person").orderBy("vid").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(rows == Seq((1L, "a", 10), (2L, "b", 99), (3L, "c", 30)))
  }

  test("remote scheme: every loader reads through a non-file scheme") {
    // The reference's oss://-/hdfs://-/s3://-style scheme-in-path routing
    // (loader.py:96-127), driven through a registered non-`file` Hadoop
    // FileSystem — the same resolution path a real HDFS/S3A/OSS connector
    // takes, minus the network the sandbox doesn't have.
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockHdfsLikeFs].getName)
    val dir = tmpDir()

    Seq((1L, "a", 2.5), (2L, "b", -1.0)).toDF("id", "name", "score")
      .coalesce(1).write.option("header", "true").csv(s"$dir/c")
    val viaCsv = graft.sources.TableSource.csv(spark, s"mockfs://$dir/c")
    assert(viaCsv.orderBy("id").collect().map(_.get(0).toString).toSeq
      == Seq("1", "2"))

    Seq((10L, 3.5), (20L, 4.5)).toDF("k", "v")
      .write.parquet(s"$dir/p")
    val viaParquet =
      graft.sources.TableSource.parquet(spark, s"mockfs://$dir/p")
    assert(viaParquet.agg(org.apache.spark.sql.functions.sum("v"))
      .head().getDouble(0) == 8.0)

    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/e.txt"),
      "1 2 0.5\n2 3\n".getBytes)
    val viaEdges =
      graft.sources.TableSource.edgeListFile(spark, s"mockfs://$dir/e.txt")
    assert(viaEdges.orderBy("src").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      == Seq((1L, 2L, 0.5), (2L, 3L, 1.0)))
  }
}
