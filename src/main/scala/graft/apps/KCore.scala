package graft.apps

import graft.graph.SimpleGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core membership: vertices whose core number is >= k, binary output
  * per vertex (reference: apps/kcore/kcore.h:58-126 — remove degree<curr_k,
  * cascade, binary ctx.data output :117-121).
  *
  * Implemented over the shared core decomposition ([[KShell.coreNumbers]],
  * the distributed h-index fixpoint): `in_core = core_number >= k`.
  * The round-1 direct peeling loop (semi-join the FULL edge set twice and
  * recompute all degrees, per peel wave) was O(E) per round with possibly
  * hundreds of cascade waves — the h-index formulation converges in a
  * handful of rounds independent of peel depth and is the plan that
  * survives a 100x scale-up; it also leaves ONE core-decomposition
  * implementation for both KCore and KShell.
  */
object KCore {

  /** @return (vid, in_core: 0/1) */
  def run(g: SimpleGraph, k: Int, numPartitions: Int = 0): DataFrame =
    KShell.coreNumbers(g, numPartitions)
      .select(col("vid"),
        when(col("core") >= k, lit(1L)).otherwise(lit(0L)).as("in_core"))
}
