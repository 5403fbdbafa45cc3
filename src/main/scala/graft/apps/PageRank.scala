package graft.apps

import graft.graph.{SimpleGraph, Strategy}
import graft.pregel.{CheckpointConfig, Iterate}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank with the reference's exact semantics
  * (analytical_engine/benchmarks/apps/pagerank/pagerank.h:95-196):
  *
  *   - p0 = 1/N for every vertex;
  *   - degree = OUT degree; messages flow along out-edges carrying the
  *     normalized rank `rank/deg` (pagerank.h:106-113);
  *   - each round: base = (1-d)/N + d*danglingSum/N (pagerank.h:143-144),
  *     rank'(v) = d * Σ_{u→v} rank(u)/deg(u) + base for deg(v)>0
  *     (pagerank.h:160-170 stores the deg-normalized value and the Output
  *     de-normalizes), rank'(v) = base for dangling v (pagerank.h:158);
  *   - danglingSum' = base * danglingVnum (pagerank.h:190-192) — a pure
  *     driver-side scalar recurrence, no extra Spark action per round;
  *   - EXACTLY `maxRound` IncEval rounds, no tolerance test
  *     (pagerank.h:139-141).
  *
  * One shuffle per round: the `groupBy(dst)` message combine (map-side
  * partial aggregation = the reference's message combiner). The edge side is
  * hash-partitioned by `src` once up front; the state side is produced
  * hash-partitioned by `vid` (= `src` of the contribution view), so the
  * per-round join reuses the cached exchange. Hub-vertex skew on the
  * `groupBy(dst)` is handled by Catalyst partial aggregation (per-partition
  * combine caps any single reducer's input at numPartitions rows per key).
  */
object PageRank {

  def run(
      g: SimpleGraph,
      delta: Double = 0.85,
      maxRound: Int = 10,
      numPartitions: Int = 0,
      checkpoint: CheckpointConfig = CheckpointConfig()): DataFrame = {
    val spark = g.spark
    val p = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions

    val n = g.numVertices.toDouble
    val tier = Strategy.tier(n.toLong)
    val bcast = tier == Strategy.Broadcast
    // bcast path: partition by dst once, so every round's groupBy(dst)
    // aggregates in place with no exchange; shuffle path: partition by src
    // so the per-round state join reuses the exchange instead; CSR path
    // (10^9+ vertices) packs edges once into partition-local CSR blocks and
    // per round ships only P state bundles (EdgeBlocks.gatherSum).
    lazy val edges = g.preparedEdges("dir", g.edges.select("src", "dst"),
      if (bcast) "dst" else "src", p)
    lazy val csr =
      g.preparedBlocks("csr", g.edges.select("src", "dst"), p)
    val degrees = g.preparedOutDegrees(p) // cached (vid, deg)
    val danglingVnum =
      degrees.where(col("deg") === 0L).count().toDouble

    val init = degrees
      .select(col("vid"), col("deg"), lit(1.0 / n).as("rank"))

    // Driver-side scalar recurrence for the dangling mass.
    var danglingSum = (1.0 / n) * danglingVnum
    val bases = new Array[Double](maxRound + 1)
    for (i <- 1 to maxRound) {
      bases(i) = (1.0 - delta) / n + delta * danglingSum / n
      danglingSum = bases(i) * danglingVnum
    }

    val res = Iterate.run(
      init, maxRound,
      step = (state, round) => {
        val base = bases(round)
        val contrib = state.where(col("deg") > 0)
          .select(col("vid").as("src"), (col("rank") / col("deg")).as("c"))
        val msgs =
          if (tier == Strategy.CsrGather)
            graft.graph.EdgeBlocks.gatherSum(csr.blocks,
              contrib.select(col("src").as("vid"), col("c").as("value")),
              p, csr.salts)
              .select(col("vid"), col("sum_value").as("msum"))
          else
            edges.join(Strategy.state(contrib, bcast), "src")
              .groupBy(col("dst").as("vid")).agg(sum(col("c")).as("msum"))
        state.join(msgs, Seq("vid"), "left").select(
          col("vid"), col("deg"),
          when(col("deg") === 0L, lit(base))
            .otherwise(lit(delta) * coalesce(col("msum"), lit(0.0)) +
              lit(base)).as("rank"))
      },
      stopWhenUnchanged = false,
      checkpoint = checkpoint)

    res.state.select("vid", "rank")
  }
}
