package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Driver-chosen physical strategies for the superstep joins
  * (SURVEY.md §4.1: "broadcast small frontiers / high-degree deltas").
  *
  * The per-round message join is `edges ⋈ vertexState`. With a shuffle
  * join, Spark re-sorts/shuffles the EDGE side (the 100 TB side) every
  * round; broadcasting the vertex-state side turns each round into a
  * map-side hash join over the cached edges plus one tiny exchange of
  * partial aggregates. Broadcasting is only correct while the state fits
  * in an executor (~a few hundred MB), so the cutover is vertex-count
  * driven: below `maxBroadcastVertices` broadcast, above it fall back to
  * co-partitioned joins (and, further up, the CSR EdgeBlocks gather,
  * which shuffles only state bundles).
  */
object Strategy {

  /** ~16 bytes/vertex state row -> 64M verts ~ 1 GiB broadcast; stay an
    * order of magnitude under that by default. */
  val maxBroadcastVertices: Long = 8L * 1000 * 1000

  def smallEnoughToBroadcast(numVertices: Long): Boolean =
    !sys.env.contains("GRAFT_FORCE_SHUFFLE") &&
      !sys.props.contains("graft.force.shuffle") &&
      numVertices <= maxBroadcastVertices

  /** Hint the state side of an edges-join when the graph is small. */
  def state(df: DataFrame, broadcastState: Boolean): DataFrame =
    if (broadcastState) broadcast(df) else df
}
