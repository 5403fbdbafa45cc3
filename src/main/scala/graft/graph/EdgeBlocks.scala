package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Partition-local CSR adjacency blocks (north rule): each row holds one
  * partition's compressed adjacency — the Spark re-expression of the
  * reference fragment's `ie_offsets_begin/end` + flat `NbrUnit` arrays
  * (analytical_engine/core/fragment/arrow_projected_fragment.h:431-470).
  *
  * Edges are hash-partitioned by src (pid = pmod(xxhash64(src), P), the
  * role of the reference's vid_parser fid bits), sorted, and packed once;
  * a gather-sum superstep then joins P state-bundles against P block rows
  * (a P-row join, not an |E|-row join) and scans arrays locally — the
  * edge table is never reshuffled per iteration.
  */
object EdgeBlocks {

  final case class EdgeBlock(
      pid: Int,
      srcIds: Array[Long],     // distinct sorted srcs in this partition
      dstOffsets: Array[Int],  // len = srcIds.length + 1 (CSR offsets)
      dstIds: Array[Long])     // flat neighbor array

  final case class VertexValue(vid: Long, value: Double)
  final case class Partial(vid: Long, partial: Double)

  def pidOf(c: org.apache.spark.sql.Column, p: Int) =
    pmod(xxhash64(c), lit(p)).cast("int")

  /** Pack an edge DataFrame (src, dst) into P CSR blocks — one block per
    * pid. (repartition hashes the pid column, so one Spark partition can
    * hold several pids; blocks therefore split on pid boundaries.) */
  def build(edges: DataFrame, p: Int): Dataset[EdgeBlock] = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("src"), col("dst"), pidOf(col("src"), p).as("pid"))
      .repartition(p, col("pid"))
      .sortWithinPartitions(col("pid"), col("src"), col("dst"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        new Iterator[EdgeBlock] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): EdgeBlock = {
            val pid = buf.head._3
            val srcs = mutable.ArrayBuffer[Long]()
            val offs = mutable.ArrayBuffer[Int](0)
            val dsts = mutable.ArrayBuffer[Long]()
            var last = Long.MinValue
            var started = false
            while (buf.hasNext && buf.head._3 == pid) {
              val (s, d, _) = buf.next()
              if (!started || s != last) {
                if (started) offs += dsts.length
                srcs += s; last = s; started = true
              }
              dsts += d
            }
            offs += dsts.length
            EdgeBlock(pid, srcs.toArray, offs.toArray, dsts.toArray)
          }
        }
      }
  }

  /** gather-sum: for a vertex-value table (vid, value), compute for every
    * dst the sum of src values over the CSR blocks.
    * Shuffles per call: one groupBy(pid) of the (small) vertex state and
    * one groupBy(vid) of per-block partials — the edges stay put. */
  def gatherSum(blocks: Dataset[EdgeBlock], state: DataFrame, p: Int)
      : DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    val bundles = state
      .select(pidOf(col("vid"), p).as("pid"),
        col("vid"), col("value").cast("double").as("value"))
      .groupBy("pid")
      .agg(collect_list(struct(col("vid"), col("value"))).as("vals"))
    blocks.toDF()
      .join(bundles, "pid")
      .as[(Int, Array[Long], Array[Int], Array[Long], Array[VertexValue])]
      .mapPartitions { it =>
        it.flatMap { case (_, srcs, offs, dsts, vals) =>
          val lookup = new java.util.HashMap[Long, Double](vals.length * 2)
          vals.foreach(v => lookup.put(v.vid, v.value))
          val acc = new java.util.HashMap[Long, Double](dsts.length / 2)
          var i = 0
          while (i < srcs.length) {
            val v = lookup.get(srcs(i))
            if (lookup.containsKey(srcs(i))) {
              var j = offs(i)
              while (j < offs(i + 1)) {
                acc.merge(dsts(j), v, (a, b) => a + b)
                j += 1
              }
            }
            i += 1
          }
          val out = mutable.ArrayBuffer[Partial]()
          acc.forEach((k, s) => out += Partial(k, s))
          out.iterator
        }
      }
      .groupBy("vid").agg(sum(col("partial")).as("sum_value"))
  }
}
