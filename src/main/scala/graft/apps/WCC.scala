package graft.apps

import graft.graph.{SimpleGraph, Strategy}
import graft.pregel.{CheckpointConfig, Iterate}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weakly connected components: propagate the minimum vertex id over the
  * symmetric closure of the edges until fixpoint — the reference's
  * WCCProjected (analytical_engine/apps/projected/wcc_projected.h:74-121:
  * init comp=gid, relax over out+in adjacency, frontier = modified set,
  * terminate when nothing changed).
  *
  * The reference labels components by min *gid* (partition-dependent bit
  * encoding); we label by min *vid*, which is partition-invariant — the
  * user-visible component partition is identical (SURVEY.md §7.4).
  *
  * Frontier optimization (the reference's curr_modified set,
  * wcc_projected.h:122-178): only vertices whose label changed last round
  * send messages, so late rounds touch a tiny frontier instead of the full
  * edge set.
  */
object WCC {

  def run(
      g: SimpleGraph,
      maxRounds: Int = 200,
      numPartitions: Int = 0,
      checkpoint: CheckpointConfig = CheckpointConfig()): DataFrame =
    runWithRounds(g, maxRounds, numPartitions, checkpoint)._1

  /** Like run, also returning the number of IncEval rounds executed
    * (for the edges/sec/iteration bench metric). */
  def runWithRounds(
      g: SimpleGraph,
      maxRounds: Int = 200,
      numPartitions: Int = 0,
      checkpoint: CheckpointConfig = CheckpointConfig())
      : (DataFrame, Int) = {
    val spark = g.spark
    val p = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions

    val tier = Strategy.tier(g.numVertices)
    val bcast = tier == Strategy.Broadcast
    val undTag = if (g.simpleEdges && !g.directed) "dir" else "und"
    lazy val edges = g.preparedEdges(undTag, g.undirectedDedup,
      if (bcast) "dst" else "src", p)
    lazy val csr =
      g.preparedBlocks(s"csr-$undTag", g.undirectedDedup, p)

    // state: (vid, comp, _changed); round 0 = PEval: everyone "changed".
    val init = g.vertices
      .select(col("vid"), col("vid").as("comp"), lit(1).as("_changed"))
      .repartition(p, col("vid"))

    val res = Iterate.runDelta(
      init, maxRounds,
      step = (state, _, prevChanged) => {
        val frontier = state.where(col("_changed") === 1)
          .select(col("vid").as("src"), col("comp"))
        val msgs =
          if (tier == Strategy.CsrGather)
            graft.graph.EdgeBlocks.gatherMin(csr.blocks,
              frontier.select(col("src").as("vid"),
                col("comp").as("value")), p, csr.salts)
              .select(col("vid"), col("min_value").as("mc"))
          else
            edges
              .join(Strategy.frontier(frontier, bcast, prevChanged), "src")
              .groupBy(col("dst").as("vid")).agg(min(col("comp")).as("mc"))
        state.join(msgs, Seq("vid"), "left").select(
          col("vid"),
          least(col("comp"), coalesce(col("mc"), col("comp"))).as("comp"),
          when(coalesce(col("mc"), col("comp")) < col("comp"), lit(1))
            .otherwise(lit(0)).as("_changed"))
      },
      stopWhenUnchanged = true,
      checkpoint = checkpoint)

    (res.state.select("vid", "comp"), res.completedRounds)
  }

  /** Incremental WCC — exact component labels after an edge append,
    * WITHOUT re-touching the old edge set (the reference's append-only
    * ingest story, SURVEY.md §2.8, done one better than full recompute):
    * contract every old component to its label vertex, map the new
    * edges' endpoints through their old labels (unknown endpoints are
    * genuinely new vertices and stay themselves), run WCC over the tiny
    * contracted graph — |old components| + |new endpoints| vertices and
    * |new edges| edges — and relabel. Exact because old labels are the
    * min vid of their component, so the contracted min-vid labels equal
    * the full-graph min-vid labels: components merge iff a new edge
    * chain connects them.
    *
    * At 10^12 edges this is the difference between a full-graph
    * superstep run and one over the day's delta: the old graph
    * participates only through its (vid, comp) label relation.
    *
    * @param prevLabels (vid, comp) from a previous run/runIncremental
    * @param newEdges   (src, dst), treated undirected like run()
    * @return (vid, comp) over old ∪ new vertices */
  def runIncremental(
      prevLabels: DataFrame,
      newEdges: DataFrame,
      maxRounds: Int = 200): DataFrame = {
    val labels = prevLabels.select(col("vid"), col("comp"))
    val e = newEdges.select(col("src"), col("dst"))

    val mapped = e
      .join(labels.select(col("vid").as("src"), col("comp").as("csrc")),
        Seq("src"), "left")
      .join(labels.select(col("vid").as("dst"), col("comp").as("cdst")),
        Seq("dst"), "left")
      .select(coalesce(col("csrc"), col("src")).as("src"),
        coalesce(col("cdst"), col("dst")).as("dst"))

    val newEndpoints = e
      .select(explode(array(col("src"), col("dst"))).as("vid")).distinct()
      .join(labels.select("vid"), Seq("vid"), "left_anti")
      .localCheckpoint(true)

    val contractedVerts = labels.select(col("comp").as("vid")).distinct()
      .unionByName(newEndpoints)
    val contracted = graft.graph.SimpleGraph(
      contractedVerts, mapped, directed = false)
    val relabel = run(contracted, maxRounds).localCheckpoint(true)

    // old vertices follow their component's new label; new vertices
    // take theirs directly
    labels
      .join(relabel.select(col("vid").as("comp"), col("comp").as("nc")),
        Seq("comp"))
      .select(col("vid"), col("nc").as("comp"))
      .unionByName(
        newEndpoints.join(relabel, Seq("vid")).select("vid", "comp"))
  }
}
