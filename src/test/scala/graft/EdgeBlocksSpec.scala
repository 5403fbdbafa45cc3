package graft

import graft.graph.EdgeBlocks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized equivalence oracles for the CSR block gathers: every gather
  * must produce exactly the rows of its plain join + groupBy formulation
  * on arbitrary (multi-)graphs, arbitrary partial states, duplicate state
  * vids, and any block count. These are the kernels the 10^9+-vertex tier
  * of every superstep app (PageRank/WCC/BFS/SSSP/KShell/Louvain) rides on,
  * so they get direct generative coverage, not just app-level spot checks.
  */
class EdgeBlocksSpec extends SparkSpec {

  import spark.implicits._

  private def randomEdges(rng: Random, nV: Int, nE: Int): DataFrame =
    (0 until nE).map { _ =>
      val s = rng.nextInt(nV).toLong
      var d = rng.nextInt(nV).toLong
      if (d == s) d = (s + 1) % nV // no self loops, like the apps' graphs
      (s, d, (1 + rng.nextInt(9)).toDouble)
    }.toDF("src", "dst", "weight").repartition(5)

  /** State over a random subset of vids; optionally with duplicate vids
    * (the gathers document fold semantics for those). */
  private def randomState(rng: Random, nV: Int, dups: Boolean): DataFrame = {
    val base = (0 until nV).filter(_ => rng.nextBoolean()).map { v =>
      (v.toLong, rng.nextInt(100).toLong)
    }
    val rows = if (dups) base ++ base.take(base.size / 3) else base
    rng.shuffle(rows).toDF("vid", "value").repartition(3)
  }

  private val trials = Seq(
    // (seed, nV, nE, p, dup-state-vids)
    (1L, 30, 120, 4, false),
    (2L, 50, 300, 7, false),
    (3L, 12, 40, 3, true),
    (4L, 60, 1, 4, false), // single edge
    (5L, 40, 200, 1, false) // everything in one block
  )

  test("gatherSum == join + groupBy(dst).sum on random graphs") {
    for ((seed, nV, nE, p, dups) <- trials) {
      val rng = new Random(seed)
      val edges = randomEdges(rng, nV, nE)
      val state = randomState(rng, nV, dups)
      val blocks = EdgeBlocks.build(edges.select("src", "dst"), p)
      val got = EdgeBlocks.gatherSum(blocks, state, p)
      val want = edges
        .join(state.select(col("vid").as("src"),
          col("value").cast("double").as("value")), "src")
        .groupBy(col("dst").as("vid"))
        .agg(sum(col("value")).as("sum_value"))
      assertSameRows(got, want, s"gatherSum seed=$seed")
    }
  }

  test("gatherMin == join + groupBy(dst).min on random graphs") {
    for ((seed, nV, nE, p, dups) <- trials) {
      val rng = new Random(seed)
      val edges = randomEdges(rng, nV, nE)
      val state = randomState(rng, nV, dups)
      val blocks = EdgeBlocks.build(edges.select("src", "dst"), p)
      val got = EdgeBlocks.gatherMin(blocks, state, p)
      val want = edges
        .join(state.select(col("vid").as("src"), col("value")), "src")
        .groupBy(col("dst").as("vid"))
        .agg(min(col("value")).as("min_value"))
      assertSameRows(got, want, s"gatherMin seed=$seed")
    }
  }

  test("gatherMinPlus == join + groupBy(dst).min(value + w) on random " +
      "weighted graphs") {
    for ((seed, nV, nE, p, dups) <- trials) {
      val rng = new Random(seed)
      val edges = randomEdges(rng, nV, nE)
      val state = randomState(rng, nV, dups)
      val blocks = EdgeBlocks.buildWeighted(edges, p)
      val got = EdgeBlocks.gatherMinPlus(blocks, state, p)
      val want = edges
        .join(state.select(col("vid").as("src"),
          col("value").cast("double").as("value")), "src")
        .groupBy(col("dst").as("vid"))
        .agg(min(col("value") + col("weight")).as("min_value"))
      assertSameRows(got, want, s"gatherMinPlus seed=$seed")
    }
  }

  test("gatherLabelSum == join + groupBy(dst, label(src)).sum(w) on " +
      "random weighted graphs") {
    for ((seed, nV, nE, p, _) <- trials) {
      val rng = new Random(seed)
      val edges = randomEdges(rng, nV, nE)
      // labels are an assignment: one row per vid (Louvain's shape)
      val state = randomState(rng, nV, dups = false)
        .withColumnRenamed("value", "label")
      val blocks = EdgeBlocks.buildWeighted(edges, p)
      val got = EdgeBlocks.gatherLabelSum(blocks, state, p)
      val want = edges
        .join(state.select(col("vid").as("src"), col("label")), "src")
        .groupBy(col("dst").as("vid"), col("label"))
        .agg(sum(col("weight")).as("sum_w"))
      assertSameRows(got, want, s"gatherLabelSum seed=$seed")
    }
  }

  test("gatherLabelCount == join + groupBy(dst, label(src)).count on " +
      "random multigraphs") {
    for ((seed, nV, nE, p, _) <- trials) {
      val rng = new Random(seed)
      val edges = randomEdges(rng, nV, nE)
      // labels are an assignment: one row per vid (CDLP's shape)
      val state = randomState(rng, nV, dups = false)
        .withColumnRenamed("value", "label")
      val blocks = EdgeBlocks.build(edges.select("src", "dst"), p)
      val got = EdgeBlocks.gatherLabelCount(blocks, state, p)
      val want = edges
        .join(state.select(col("vid").as("src"), col("label")), "src")
        .groupBy(col("dst").as("vid"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      assertSameRows(got, want, s"gatherLabelCount seed=$seed")
    }
  }

  test("gatherCollect == join + collect_list (order-insensitive) on " +
      "random graphs") {
    for ((seed, nV, nE, p, dups) <- trials) {
      val rng = new Random(seed)
      val edges = randomEdges(rng, nV, nE)
      val state = randomState(rng, nV, dups)
      val blocks = EdgeBlocks.build(edges.select("src", "dst"), p)
      val got = EdgeBlocks.gatherCollect(blocks, state, p)
        .select(col("vid"), sort_array(col("values")).as("values"))
      val want = edges
        .join(state.select(col("vid").as("src"), col("value")), "src")
        .groupBy(col("dst").as("vid"))
        .agg(sort_array(collect_list(col("value"))).as("values"))
      val g = got.as[(Long, Seq[Long])].collect().toMap
      val w = want.as[(Long, Seq[Long])].collect().toMap
      assert(g == w, s"gatherCollect seed=$seed: ${g.size} vs ${w.size}")
    }
  }

  test("salted builds split hub adjacency and preserve every gather " +
      "exactly") {
    val rng = new Random(11L)
    val nV = 40
    val p = 6
    // Hub vertex 0: out-degree 400 (a multigraph — duplicates expected);
    // everyone else stays under the salt threshold.
    val hub = (0 until 400).map { _ =>
      (0L, (1 + rng.nextInt(nV - 1)).toLong, (1 + rng.nextInt(9)).toDouble)
    }
    val rest = (0 until 300).map { _ =>
      val s = rng.nextInt(nV).toLong
      var d = rng.nextInt(nV).toLong
      if (d == s) d = (s + 1) % nV
      (s, d, (1 + rng.nextInt(9)).toDouble)
    }
    val edges = rng.shuffle(hub ++ rest)
      .toDF("src", "dst", "weight").repartition(5)

    assert(EdgeBlocks.hubSalts(edges, 1000L, p).isEmpty,
      "no hub above a high threshold -> no salt table at all")
    val salts = EdgeBlocks.hubSalts(edges, 25L, p)
    assert(salts.isDefined)
    val k = salts.get.where(col("vid") === 0L).head().getInt(1)
    assert(k == p, "k = min(ceil(400/25) = 16, p = 6) = 6")

    val blocks = EdgeBlocks.build(edges.select("src", "dst"), p, salts)
    val wblocks = EdgeBlocks.buildWeighted(edges, p, salts)
    // The hub's adjacency must actually split across blocks...
    val hubBlocks = blocks.collect().count(_.srcIds.contains(0L))
    assert(hubBlocks >= 2, s"hub adjacency in $hubBlocks block(s)")
    // ...without losing or duplicating a single edge.
    assert(blocks.collect().map(_.dstIndex.length).sum == 700)

    val state = randomState(rng, nV, dups = true)
    val sumGot = EdgeBlocks.gatherSum(blocks, state, p, salts)
    val sumWant = edges
      .join(state.select(col("vid").as("src"),
        col("value").cast("double").as("value")), "src")
      .groupBy(col("dst").as("vid"))
      .agg(sum(col("value")).as("sum_value"))
    assertSameRows(sumGot, sumWant, "salted gatherSum")

    val minGot = EdgeBlocks.gatherMin(blocks, state, p, salts)
    val minWant = edges
      .join(state.select(col("vid").as("src"), col("value")), "src")
      .groupBy(col("dst").as("vid"))
      .agg(min(col("value")).as("min_value"))
    assertSameRows(minGot, minWant, "salted gatherMin")

    val mpGot = EdgeBlocks.gatherMinPlus(wblocks, state, p, salts)
    val mpWant = edges
      .join(state.select(col("vid").as("src"),
        col("value").cast("double").as("value")), "src")
      .groupBy(col("dst").as("vid"))
      .agg(min(col("value") + col("weight")).as("min_value"))
    assertSameRows(mpGot, mpWant, "salted gatherMinPlus")

    val labels = randomState(rng, nV, dups = false)
      .withColumnRenamed("value", "label")
    val lsGot = EdgeBlocks.gatherLabelSum(wblocks, labels, p, salts)
    val lsWant = edges
      .join(labels.select(col("vid").as("src"), col("label")), "src")
      .groupBy(col("dst").as("vid"), col("label"))
      .agg(sum(col("weight")).as("sum_w"))
    assertSameRows(lsGot, lsWant, "salted gatherLabelSum")

    val lcGot = EdgeBlocks.gatherLabelCount(blocks, labels, p, salts)
    val lcWant = edges
      .join(labels.select(col("vid").as("src"), col("label")), "src")
      .groupBy(col("dst").as("vid"), col("label"))
      .agg(count(lit(1)).as("cnt"))
    assertSameRows(lcGot, lcWant, "salted gatherLabelCount")

    val clGot = EdgeBlocks.gatherCollect(blocks, state, p, salts)
      .select(col("vid"), sort_array(col("values")).as("values"))
      .as[(Long, Seq[Long])].collect().toMap
    val clWant = edges
      .join(state.select(col("vid").as("src"), col("value")), "src")
      .groupBy(col("dst").as("vid"))
      .agg(sort_array(collect_list(col("value"))).as("values"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(clGot == clWant, "salted gatherCollect")
    salts.foreach(_.unpersist())
  }

  test("empty state and disjoint state both gather to zero rows") {
    val rng = new Random(9L)
    val edges = randomEdges(rng, 20, 60)
    val blocks = EdgeBlocks.build(edges.select("src", "dst"), 4)
    val empty = Seq.empty[(Long, Long)].toDF("vid", "value")
    assert(EdgeBlocks.gatherSum(blocks, empty, 4).count() == 0L)
    // vids outside the graph's vertex range contribute nothing
    val disjoint = Seq((1000L, 5L), (2000L, 7L)).toDF("vid", "value")
    assert(EdgeBlocks.gatherMin(blocks, disjoint, 4).count() == 0L)
  }
}
