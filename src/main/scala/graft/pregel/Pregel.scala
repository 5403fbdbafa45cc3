package graft.pregel

import graft.graph.{SimpleGraph, Strategy}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic Pregel-style runner — the engine's user-extension surface,
  * mirroring the reference's Pregel UDF API
  * (`@graphscope.analytical.udf.pregel`: Init / Compute(messages) /
  * Combine — python/graphscope/analytical/udf/decorators.py:116, C++
  * adapter core/app/pregel/pregel_app_base.h, combiner
  * pregel_compute_context.h:94-130).
  *
  * Declarative column-expression form (GraphFrames-style) so the whole
  * superstep stays inside Catalyst codegen:
  *   - `init`: expression over the vertex columns -> initial state;
  *   - `sendToDst` / `sendToSrc`: expression over `src_state`/`dst_state`
  *     and edge columns -> message value (null = send nothing);
  *   - `agg`: combiner over the collected `msg` column (e.g. sum/min);
  *   - `update`: (state, aggregatedMsg) -> new state; aggregatedMsg is
  *     null for vertices that received nothing.
  *
  * One shuffle per superstep (the message groupBy) — the combiner runs
  * map-side, exactly like the reference's combine() hook.
  */
object Pregel {

  def run(
      g: SimpleGraph,
      maxRounds: Int,
      init: Column,
      sendToDst: Option[Column],
      sendToSrc: Option[Column],
      agg: Column => Column,
      update: (Column, Column) => Column,
      stopWhenNoChange: Boolean = false,
      numPartitions: Int = 0,
      checkpoint: CheckpointConfig = CheckpointConfig()): DataFrame = {
    val spark = g.spark
    val p = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val bcast = Strategy.smallEnoughToBroadcast(g.numVertices)
    // Persist a PRIVATE projection, not the caller's frame: persisting
    // g.edges directly and unpersisting it on exit would silently evict a
    // cache the caller shares (e.g. a memoized graph's edge frame).
    val edgeCols = g.edges.columns.toSeq
    val edges = {
      val own = g.edges.select(edgeCols.map(col): _*)
      (if (bcast) own else own.repartition(p, col("src"))).persist()
    }

    val initState = g.vertices
      .select(col("vid"), init.as("state"))
      .repartition(p, col("vid"))

    val res = Iterate.run(
      initState, maxRounds,
      step = (state, _) => {
        val toDst = sendToDst.map { m =>
          edges
            .join(Strategy.state(state.select(col("vid").as("src"),
              col("state").as("src_state")), bcast), "src")
            .select(col("dst").as("vid"), m.as("msg"))
            .where(col("msg").isNotNull)
        }
        val toSrc = sendToSrc.map { m =>
          edges
            .join(Strategy.state(state.select(col("vid").as("dst"),
              col("state").as("dst_state")), bcast), "dst")
            .select(col("src").as("vid"), m.as("msg"))
            .where(col("msg").isNotNull)
        }
        val msgs = (toDst.toSeq ++ toSrc.toSeq)
          .reduceOption(_ unionByName _)
          .map(_.groupBy("vid").agg(agg(col("msg")).as("agg_msg")))
          .getOrElse(spark.emptyDataFrame
            .select(lit(0L).as("vid"), lit(null).as("agg_msg")))
        val joined = state.join(msgs, Seq("vid"), "left")
        val newState = update(col("state"), col("agg_msg"))
        joined.select(col("vid"), newState.as("state"),
          when(!(newState <=> col("state")), lit(1)).otherwise(lit(0))
            .as("_changed"))
      },
      stopWhenUnchanged = stopWhenNoChange,
      checkpoint = checkpoint)

    edges.unpersist()
    res.state.select("vid", "state")
  }

  /** The reference's Pregel PageRank variant (apps/pregel/
    * pagerank_pregel.h:43-94): init 1/N, update d*Σmsgs + (1-d)/N, NO
    * dangling redistribution, fixed rounds, messages rank/outdeg along out
    * edges. Expressed on the generic runner as a living example. */
  def pagerankPregel(g: SimpleGraph, delta: Double = 0.85,
      maxRounds: Int = 10): DataFrame = {
    val n = g.numVertices.toDouble
    val degMap = g.outDegrees.select(col("vid").as("src"), col("deg"))
    val gd = g.copy(edges = g.edges.join(degMap, "src"))
    run(
      gd,
      maxRounds,
      init = lit(1.0 / n),
      sendToDst = Some(col("src_state") / col("deg")),
      sendToSrc = None,
      agg = sum,
      update = (state, msg) =>
        lit(delta) * coalesce(msg, lit(0.0)) + lit((1.0 - delta) / n))
      .select(col("vid"), col("state").as("rank"))
  }
}
