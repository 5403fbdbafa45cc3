package graft.apps

import graft.graph.SimpleGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Local clustering coefficient, average clustering, transitivity —
  * reference: apps/clustering/{clustering.h, avg_clustering.h,
  * transitivity.h}; all reuse the triangle machinery (SURVEY.md §2.2).
  * Undirected form: coeff(v) = 2*tri(v) / (deg(v)*(deg(v)-1)). */
object Clustering {

  /** @return (vid, coeff) on the undirected deduplicated view. */
  def local(g: SimpleGraph, numPartitions: Int = 0): DataFrame = {
    val tri = Triangles.run(g, numPartitions)
    val deg = g.undirectedDegrees
    tri.join(deg, "vid").select(
      col("vid"),
      when(col("deg") < 2, lit(0.0))
        .otherwise(lit(2.0) * col("triangles")
          / (col("deg") * (col("deg") - lit(1.0)))).as("coeff"))
  }

  /** Mean of local coefficients (apps/clustering/avg_clustering.h). */
  def average(g: SimpleGraph): Double =
    local(g).agg(avg(col("coeff"))).head().getDouble(0)

  /** Global transitivity = 3*triangles/wedges = Σ tri(v) / Σ C(deg(v),2)
    * (apps/clustering/transitivity.h). */
  def transitivity(g: SimpleGraph): Double = {
    val triSum = Triangles.run(g).agg(sum(col("triangles"))).head()
      .getLong(0).toDouble
    val wedges = g.undirectedDegrees
      .agg(sum(col("deg") * (col("deg") - lit(1.0)) / lit(2.0))).head()
      .getDouble(0)
    if (wedges == 0.0) 0.0 else triSum / wedges
  }
}
