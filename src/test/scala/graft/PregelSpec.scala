package graft

import graft.graph.{EdgeBlocks, SimpleGraph}
import graft.multimodal.Multimodal
import graft.pregel.Pregel
import org.apache.spark.sql.functions._

/** Generic Pregel runner, CSR EdgeBlocks, multimodal plumbing. */
class PregelSpec extends SparkSpec {

  val verts: Seq[Long] = 1L to 10L
  val dirEdges: Seq[(Long, Long)] = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
    (1L, 6L), (1L, 7L), (6L, 7L), (7L, 1L), (8L, 9L), (9L, 8L))

  def g: SimpleGraph = {
    import spark.implicits._
    SimpleGraph(verts.toDF("vid"), dirEdges.toDF("src", "dst"),
      directed = true)
  }

  test("pregel pagerank variant (no dangling redistribution, " +
      "pagerank_pregel.h) matches in-JVM recurrence") {
    // In-JVM oracle of the pregel variant.
    val n = verts.size.toDouble
    val outDeg = dirEdges.groupBy(_._1).view.mapValues(_.size.toDouble)
      .toMap
    val inN = dirEdges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var rank = verts.map(v => v -> 1.0 / n).toMap
    for (_ <- 1 to 10) {
      rank = verts.map { v =>
        v -> (0.85 * inN.getOrElse(v, Nil)
          .map(w => rank(w) / outDeg(w)).sum + 0.15 / n)
      }.toMap
    }
    val got = Pregel.pagerankPregel(g).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assertAllClose(got, rank, 1e-9, "pregel pagerank")
  }

  test("pregel min-propagation == WCC labels") {
    val und = g.toUndirected
    val got = Pregel.run(und, 100,
      init = col("vid"),
      sendToDst = Some(col("src_state")),
      sendToSrc = None,
      agg = min,
      update = (s, m) => least(s, coalesce(m, s)),
      stopWhenNoChange = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = TestOracles.wcc(verts, dirEdges)
    assert(got == want)
  }

  test("EdgeBlocks CSR pack round-trips the edge set") {
    val blocks = EdgeBlocks.build(g.edges, 4)
    val unpacked = blocks.collect().flatMap { b =>
      b.srcIds.indices.flatMap { i =>
        (b.dstOffsets(i) until b.dstOffsets(i + 1))
          .map(j => (b.srcIds(i), b.dstUnique(b.dstIndex(j))))
      }
    }.toSet
    assert(unpacked == dirEdges.toSet)
  }

  test("EdgeBlocks gatherSum == join+groupBy gather") {
    import spark.implicits._
    val state = verts.map(v => (v, v * 1.5)).toDF("vid", "value")
    val blocks = EdgeBlocks.build(g.edges, 4)
    val got = EdgeBlocks.gatherSum(blocks, state, 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = dirEdges.groupBy(_._2).view
      .mapValues(_.map(_._1 * 1.5).sum).toMap
    assertAllClose(got, want, 1e-12, "gatherSum")
  }

  test("WCC via forced CSR gather tier == default tier") {
    import graft.apps.WCC
    val und = g.toUndirected
    val want = WCC.run(und).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sys.props("graft.force.csr") = "true"
    try {
      val got = WCC.run(und).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, "csr wcc differs")
    } finally sys.props.remove("graft.force.csr")
  }

  test("PageRank via forced CSR gather tier == default tier") {
    import graft.apps.PageRank
    val want = PageRank.run(g, 0.85, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    sys.props("graft.force.csr") = "true"
    try {
      val got = PageRank.run(g, 0.85, 10).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assertAllClose(got, want, 1e-12, "csr pagerank")
    } finally sys.props.remove("graft.force.csr")
  }

  test("multimodal: binary plumbing + stub decode is deterministic") {
    val media = Multimodal.mediaFromDocuments(spark,
      "/root/testdata/sf0.001")
    val f1 = Multimodal.extractFeatures(media, 4)
    val rows = f1.collect()
    assert(rows.length == media.count().toInt)
    assert(rows.forall(_.feature.length == 8))
    assert(rows.filter(_.kind == "video").forall(_.frames_sampled >= 1))
    // determinism across partitionings
    val f2 = Multimodal.extractFeatures(media, 2).collect()
    assert(rows.map(r => r.media_id -> r.payload_hash).toMap ==
      f2.map(r => r.media_id -> r.payload_hash).toMap)
  }
}
