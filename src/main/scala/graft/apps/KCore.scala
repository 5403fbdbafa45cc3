package graft.apps

import graft.graph.{SimpleGraph, Strategy}
import graft.pregel.{CheckpointConfig, Iterate}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core: iteratively peel vertices of degree < k on the undirected
  * deduplicated graph until fixpoint; output binary membership per vertex
  * (reference: apps/kcore/kcore.h:58-126 — remove degree<curr_k, cascade
  * degree updates, binary ctx.data output :117-121).
  *
  * Each round recomputes degrees over the surviving edge set via one
  * groupBy + two semi-joins (the cascade); terminates when no vertex is
  * removed.
  */
object KCore {

  /** @return (vid, in_core: 0/1) */
  def run(
      g: SimpleGraph,
      k: Int,
      numPartitions: Int = 0,
      checkpoint: CheckpointConfig = CheckpointConfig(),
      maxRounds: Int = 10000): DataFrame = {
    coreMembership(g, k, numPartitions, checkpoint, maxRounds)
      .select(col("vid"),
        when(col("alive") === 1, lit(1L)).otherwise(lit(0L)).as("in_core"))
  }

  private[apps] def coreMembership(
      g: SimpleGraph, k: Int, numPartitions: Int,
      checkpoint: CheckpointConfig, maxRounds: Int = 10000): DataFrame = {
    val spark = g.spark
    val p = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val bcast = Strategy.smallEnoughToBroadcast(g.numVertices)
    val undTag = if (g.simpleEdges && !g.directed) "dir" else "und"
    val edges = g.preparedEdges(undTag, g.undirectedDedup, "src", p)

    // state: (vid, alive, _changed)
    val init = g.vertices.select(col("vid"), lit(1).as("alive"),
      lit(1).as("_changed"))

    val res = Iterate.run(
      init, maxRounds,
      step = (state, _) => {
        val aliveV = state.where(col("alive") === 1).select("vid")
        val liveEdges = edges
          .join(Strategy.state(aliveV.select(col("vid").as("src")), bcast),
            Seq("src"), "left_semi")
          .join(Strategy.state(aliveV.select(col("vid").as("dst")), bcast),
            Seq("dst"), "left_semi")
        val deg = liveEdges.groupBy(col("src").as("vid"))
          .agg(count(lit(1)).as("deg"))
        state.join(deg, Seq("vid"), "left").select(
          col("vid"),
          when(col("alive") === 1 && coalesce(col("deg"), lit(0L)) >= k,
            lit(1)).otherwise(lit(0)).as("alive"),
          when(col("alive") === 1 && coalesce(col("deg"), lit(0L)) < k,
            lit(1)).otherwise(lit(0)).as("_changed"))
      },
      stopWhenUnchanged = true,
      checkpoint = checkpoint)

    res.state
  }
}
