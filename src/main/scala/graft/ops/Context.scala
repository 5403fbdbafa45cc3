package graft.ops

import graft.graph.SimpleGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Result contexts + the selector mini-language (§1.5) — the reference
  * exposes app results through Context objects with selectors `v.id`,
  * `v.data`, `r`, `r.<prop>` and a vertex range
  * (core/context/selector.h:49-106, python/graphscope/framework/
  * context.py:101-158,275-380). Here a context is the result DataFrame
  * plus the graph it was computed on; selectors compile to Column picks.
  */
final case class VertexDataContext(
    graph: SimpleGraph,
    result: DataFrame, // (vid, ...result columns)
    defaultColumn: String) {

  /** Translate one selector into (outputName, Column). */
  private def compile(sel: String): (String, org.apache.spark.sql.Column) =
    sel match {
      case "v.id"   => ("id", col("vid"))
      case "v.data" => ("data", col(defaultColumn))
      case "r"      => (defaultColumn, col(defaultColumn))
      case s if s.startsWith("r.") =>
        val p = s.stripPrefix("r."); (p, col(p))
      case other =>
        throw new IllegalArgumentException(s"unknown selector: $other")
    }

  /** context.to_dataframe(selectors, vertex_range)
    * (framework/context.py:275-340 / CONTEXT_TO_DATAFRAME). */
  def toDataFrame(
      selectors: Map[String, String],
      vertexRange: Option[(Long, Long)] = None): DataFrame = {
    val base = vertexRange match {
      case Some((b, e)) =>
        result.where(col("vid") >= b && col("vid") < e)
      case None => result
    }
    base.select(selectors.toSeq.sortBy(_._1).map { case (out, sel) =>
      compile(sel)._2.as(out) }: _*)
  }

  /** context.to_numpy(selector) — one column, collected. */
  def toArray(selector: String,
      vertexRange: Option[(Long, Long)] = None): Array[Any] = {
    val (_, c) = compile(selector)
    val base = vertexRange match {
      case Some((b, e)) => result.where(col("vid") >= b && col("vid") < e)
      case None => result
    }
    base.orderBy(col("vid")).select(c).collect().map(_.get(0))
  }

  /** ADD_COLUMN (dag_utils.py:783): attach selected result columns to the
    * graph's vertices. */
  def addColumn(selectors: Map[String, String]): SimpleGraph = {
    val cols = col("vid") +: selectors.toSeq.sortBy(_._1).map {
      case (out, sel) => compile(sel)._2.as(out) }
    graph.addColumn(result.select(cols: _*))
  }

  /** ctx.output(path, selectors) — write parquet/csv
    * (framework/context.py:208-247), or `format="snapshot"` for the
    * durable versioned sink (the TO_VINEYARD_* / WRITE_ODPS seal-class
    * op, dag_utils.py:729-757): an atomically-committed
    * [[graft.sources.SnapshotTable]] snapshot with time travel. */
  def output(path: String, selectors: Map[String, String],
      format: String = "parquet"): Unit =
    if (format == "snapshot")
      graft.sources.SnapshotTable.overwrite(toDataFrame(selectors), path)
    else
      toDataFrame(selectors).write.mode("overwrite").format(format).save(path)
}
