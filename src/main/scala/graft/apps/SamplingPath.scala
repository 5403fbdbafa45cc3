package graft.apps

import graft.graph.PropertyGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sampling_path — enumerate (optionally sample) paths matching a
  * label pattern vlabel-elabel-vlabel-... over the property graph
  * (reference: analytical_engine/apps/sampling_path/sampling_path.h:27,
  * invoked with pattern "0-0-1-4-2" in test/app_tests.sh:379).
  *
  * Spark form: a chain of label-filtered equi-joins — hop i joins the
  * current path endpoints against the edge frame of (vlabel_i, elabel_i,
  * vlabel_{i+1}). Output one row per path with columns v0..vK.
  * `maxPaths` caps the result (the reference samples to bound output). */
object SamplingPath {

  /** @param pattern alternating vertex/edge labels:
    *   Seq(v0, e0, v1, e1, v2 ...) of odd length >= 3. */
  def run(g: PropertyGraph, pattern: Seq[String],
      maxPaths: Long = 1000000L): DataFrame = {
    require(pattern.size >= 3 && pattern.size % 2 == 1,
      "pattern must be v-e-v[-e-v...]")
    val hops = pattern.size / 2
    var paths: DataFrame = g.vertexLabels(pattern.head)
      .select(col("vid").as("v0"))
    for (i <- 0 until hops) {
      val (vl, el, vl2) =
        (pattern(2 * i), pattern(2 * i + 1), pattern(2 * i + 2))
      val e = g.edgeLabels((vl, el, vl2))
        .select(col("src").as(s"v$i"), col("dst").as(s"v${i + 1}"))
      paths = paths.join(e, s"v$i")
    }
    paths.select((0 to hops).map(i => col(s"v$i")): _*).limit(
      math.min(maxPaths, Int.MaxValue.toLong).toInt)
  }
}
