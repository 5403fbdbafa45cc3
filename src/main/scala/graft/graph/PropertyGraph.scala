package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Labeled property graph — the engine-level mirror of the reference's
  * `vineyard::ArrowFragment` data model (multi-label, multi-property;
  * schema per label — python/graphscope/framework/graph_schema.py:28-90):
  * a map of vertex-label -> DataFrame plus a map of
  * (srcLabel, edgeLabel, dstLabel) -> DataFrame.
  *
  * Vertex frames carry (vid: long, ...properties); edge frames
  * (src: long, dst: long, ...properties). Construction mirrors the
  * incremental `add_vertices` / `add_edges` builder
  * (python/graphscope/framework/graph.py:737,761) and ADD_LABELS
  * (framework/dag_utils.py:101).
  */
final case class PropertyGraph(
    vertexLabels: Map[String, DataFrame],
    edgeLabels: Map[(String, String, String), DataFrame]) {

  def spark: SparkSession = vertexLabels.values.head.sparkSession

  /** add_vertices(loader, label, ...) — union when the label exists. */
  def addVertices(label: String, df: DataFrame): PropertyGraph =
    copy(vertexLabels = vertexLabels.updated(label,
      vertexLabels.get(label).map(_.unionByName(df, allowMissingColumns =
        true)).getOrElse(df)))

  /** add_edges(loader, label, src_label, dst_label). */
  def addEdges(srcLabel: String, edgeLabel: String, dstLabel: String,
      df: DataFrame): PropertyGraph = {
    val k = (srcLabel, edgeLabel, dstLabel)
    copy(edgeLabels = edgeLabels.updated(k,
      edgeLabels.get(k).map(_.unionByName(df, allowMissingColumns = true))
        .getOrElse(df)))
  }

  /** PROJECT_GRAPH (dag_utils.py:358): keep chosen labels + properties. */
  def project(
      vertices: Map[String, Seq[String]],
      edges: Map[(String, String, String), Seq[String]]): PropertyGraph =
    PropertyGraph(
      vertices.map { case (l, props) =>
        l -> vertexLabels(l).select(
          (col("vid") +: props.map(col)): _*) },
      edges.map { case (k, props) =>
        k -> edgeLabels(k).select(
          (col("src") +: col("dst") +: props.map(col)): _*) })

  /** PROJECT_TO_SIMPLE (dag_utils.py:383 / grape_instance.cc:181): one
    * vertex label + one edge label + at most one property each -> the
    * simple graph every analytical app runs on. The edge property (when
    * given) becomes `weight`. */
  def projectToSimple(
      vertexLabel: String,
      edgeLabel: (String, String, String),
      edgeProperty: Option[String] = None,
      directed: Boolean = true): SimpleGraph = {
    val v = vertexLabels(vertexLabel).select("vid")
    val e0 = edgeLabels(edgeLabel)
    val e = edgeProperty match {
      case Some(pcol) => e0.select(col("src"), col("dst"),
        col(pcol).cast("double").as("weight"))
      case None => e0.select("src", "dst")
    }
    SimpleGraph(v, e, directed)
  }

  // MODIFY_VERTICES / MODIFY_EDGES surface (proto/types.proto:207-215
  // ModifyType NX_ADD_NODES/NX_ADD_EDGES/NX_DEL_NODES/NX_DEL_EDGES/
  // NX_UPDATE_NODES/NX_UPDATE_EDGES; engine core/grape_instance.cc:247-296)
  // — batch deltas as union / anti-join / outer-join-coalesce, the
  // shuffle-once shapes that replace the reference's per-item mutation at
  // scale.

  /** NX_DEL_NODES: drop the listed vids and every incident edge. */
  def deleteVertices(label: String, vids: DataFrame): PropertyGraph = {
    val k = vids.select(col(vids.columns.head).as("vid")).distinct()
    val v2 = vertexLabels.updated(label,
      vertexLabels(label).join(k, Seq("vid"), "left_anti"))
    val e2 = edgeLabels.map { case (key @ (sl, _, dl), df) =>
      var d = df
      if (sl == label)
        d = d.join(k.select(col("vid").as("src")), Seq("src"), "left_anti")
      if (dl == label)
        d = d.join(k.select(col("vid").as("dst")), Seq("dst"), "left_anti")
      // key-based joins hoist the join column first — restore the frame's
      // declared column order
      key -> d.select(df.columns.map(col): _*)
    }
    PropertyGraph(v2, e2)
  }

  /** NX_DEL_EDGES: drop the listed (src, dst) pairs. */
  def deleteEdges(key: (String, String, String), pairs: DataFrame)
      : PropertyGraph = {
    val k = pairs.select(col(pairs.columns(0)).as("src"),
      col(pairs.columns(1)).as("dst")).distinct()
    copy(edgeLabels = edgeLabels.updated(key,
      edgeLabels(key).join(k, Seq("src", "dst"), "left_anti")))
  }

  /** NX_UPDATE_NODES: upsert property values for the listed vids — delta
    * columns win, untouched vertices keep their values (one outer join). */
  def updateVertices(label: String, delta: DataFrame): PropertyGraph = {
    val base = vertexLabels(label)
    val props = delta.columns.filter(_ != "vid")
    val renamed = delta.select(col("vid") +:
      props.map(c => col(c).as(s"__new_$c")): _*)
    val merged = base.join(renamed, Seq("vid"), "left").select(
      col("vid") +: base.columns.filter(_ != "vid").map { c =>
        if (props.contains(c)) coalesce(col(s"__new_$c"), col(c)).as(c)
        else col(c)
      }: _*)
    copy(vertexLabels = vertexLabels.updated(label, merged))
  }
  def nodeNum(label: String): Long = vertexLabels(label).count()
  def edgeNum(key: (String, String, String)): Long = edgeLabels(key).count()
  def hasNode(label: String, vid: Long): Boolean =
    vertexLabels(label).where(col("vid") === vid).limit(1).count() > 0
  def hasEdge(key: (String, String, String), src: Long, dst: Long)
      : Boolean =
    edgeLabels(key).where(col("src") === src && col("dst") === dst)
      .limit(1).count() > 0
  def nodeData(label: String, vid: Long): Option[org.apache.spark.sql.Row] =
    vertexLabels(label).where(col("vid") === vid).collect().headOption
  def neighbors(key: (String, String, String), vid: Long): Seq[Long] =
    edgeLabels(key).where(col("src") === vid).select("dst")
      .collect().map(_.getLong(0)).toSeq
  def degree(key: (String, String, String), vid: Long): Long =
    edgeLabels(key).where(col("src") === vid || col("dst") === vid).count()
  def outDegree(key: (String, String, String), vid: Long): Long =
    edgeLabels(key).where(col("src") === vid).count()
  def inDegree(key: (String, String, String), vid: Long): Long =
    edgeLabels(key).where(col("dst") === vid).count()
  def selfLoopsNum(key: (String, String, String)): Long =
    edgeLabels(key).where(col("src") === col("dst")).count()

  // *_BY_LOC ReportTypes (types.proto:227-233 NODES_BY_LOC /
  // DEG_BY_LOC / ...): the NX layer pages through the graph in
  // location-addressed chunks (worker + local offset,
  // dynamic_fragment_reporter.h). The Spark re-expression is a
  // deterministic keyset page: rows with vid >= `after`, vid-ordered,
  // `limit` at a time — the same contract (stable, resumable chunks)
  // without depending on physical placement.

  /** GRAPH_TO_DATAFRAME / GRAPH_TO_NUMPY (dag_utils.py:810,837 /
    * grape_instance.cc:801,819): export graph data by selector —
    * `v.id` / `v.<prop>` over a vertex label, `e.src` / `e.dst` /
    * `e.<prop>` over an edge label (selector grammar
    * core/context/selector.h:49-106). */
  def graphToDataFrame(label: String,
      selectors: Map[String, String]): DataFrame = {
    val base = vertexLabels(label)
    base.select(selectors.toSeq.sortBy(_._1).map {
      case (out, "v.id") => col("vid").as(out)
      case (out, s) if s.startsWith("v.") =>
        col(s.stripPrefix("v.")).as(out)
      case (_, s) =>
        throw new IllegalArgumentException(s"unknown vertex selector: $s")
    }: _*)
  }

  def graphToDataFrame(key: (String, String, String),
      selectors: Map[String, String]): DataFrame = {
    val base = edgeLabels(key)
    base.select(selectors.toSeq.sortBy(_._1).map {
      case (out, "e.src") => col("src").as(out)
      case (out, "e.dst") => col("dst").as(out)
      case (out, s) if s.startsWith("e.") =>
        col(s.stripPrefix("e.")).as(out)
      case (_, s) =>
        throw new IllegalArgumentException(s"unknown edge selector: $s")
    }: _*)
  }

  /** NODES_BY_LOC: one page of vertices (vid order, vid > after). */
  def nodesByLoc(label: String, after: Long, limit: Int)
      : Array[org.apache.spark.sql.Row] =
    vertexLabels(label).where(col("vid") > after)
      .orderBy(col("vid")).limit(limit).collect()

  /** DEG_BY_LOC: one page of (vid, degree). */
  def degByLoc(key: (String, String, String), after: Long, limit: Int)
      : Array[(Long, Long)] = {
    val e = edgeLabels(key)
    val deg = e.select(col("src").as("vid"))
      .unionByName(e.select(col("dst").as("vid")))
      .groupBy("vid").agg(count(lit(1)).as("deg"))
    deg.where(col("vid") > after).orderBy(col("vid")).limit(limit)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
  }
}

object PropertyGraph {
  /** CREATE_GRAPH from labeled frames (dag_utils.py:67). */
  def apply(): PropertyGraph = PropertyGraph(Map.empty, Map.empty)
}
