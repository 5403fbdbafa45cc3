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
  *
  * Neighbor ids are stored densified per block (`dstIndex` into the sorted
  * `dstUnique`), so the per-superstep gather accumulates into a flat
  * primitive double array — no hash map, no boxing, in the |E| loop
  * (the r1 HashMap.merge formulation was ~30x slower than the join path;
  * this one is array arithmetic, like the reference's dense
  * `vertex_array_t` accumulators).
  */
object EdgeBlocks {

  final case class EdgeBlock(
      pid: Int,
      srcIds: Array[Long],     // distinct sorted srcs in this partition
      dstOffsets: Array[Int],  // len = srcIds.length + 1 (CSR offsets)
      dstIndex: Array[Int],    // flat neighbor array, densified
      dstUnique: Array[Long])  // sorted distinct dsts; dstUnique(dstIndex(j))

  final case class VertexValue(vid: Long, value: Double)
  final case class Partial(vid: Long, partial: Double)

  /** Blocks + the salt table they were built with (pass both to gathers;
    * a salt table from a different build routes bundles to wrong pids). */
  final case class CsrGraph(
      blocks: Dataset[EdgeBlock], salts: Option[DataFrame])
  final case class WeightedCsrGraph(
      blocks: Dataset[WeightedEdgeBlock], salts: Option[DataFrame])

  def pidOf(c: org.apache.spark.sql.Column, p: Int) =
    pmod(xxhash64(c), lit(p)).cast("int")

  // ---------------------------------------------------------------------
  // Hub-vertex salting (north rule: "salting for hub-vertex skew").
  //
  // Hash-partitioning by src puts a hub's ENTIRE adjacency in one block:
  // at 10^12 edges a vertex with 10^9 out-edges makes one task scan 30x
  // the median block while 31 cores idle. Salting splits a hub src's
  // adjacency across k = ceil(deg/threshold) pid slots —
  // pid_i = (pid_base + i) mod p for i in [0, k) — and the state-bundle
  // router replicates that ONE state row to the same k slots, so every
  // gather sees a consistent (block, bundle) pairing. All six gathers
  // merge per-block partials with an associative groupBy (sum/min/
  // flatten/label-sum), which is exactly why splitting a src across
  // blocks is semantics-transparent.
  //
  // The pid arithmetic stays in [0, 2p) before the final pmod — never
  // raw xxhash64 + chunk, which can overflow Long under ANSI mode.
  // With k = 1 the chunk term is 0 and the pid equals pidOf, so an
  // unsalted vertex's placement is byte-identical to the unsalted build.
  // ---------------------------------------------------------------------

  /** Salt-table default: split a src only when its out-degree exceeds 8M
    * edges (a meaningful fraction of a 10^12/32k ≈ 3e7-edge block; at
    * test scale nothing triggers). Override with GRAFT_SALT_THRESHOLD /
    * -Dgraft.salt.threshold for benches and specs. */
  def saltThreshold: Long =
    sys.env.get("GRAFT_SALT_THRESHOLD")
      .orElse(sys.props.get("graft.salt.threshold"))
      .map(_.toLong).getOrElse(8L * 1000 * 1000)

  /** (vid, k) for every src whose out-degree exceeds `threshold`:
    * k = min(ceil(deg/threshold), p) pid slots. One degree aggregation at
    * build time; the table is hub-only and therefore tiny by definition
    * (broadcast on every use). Returns None when no vertex qualifies so
    * unsalted graphs pay zero per-round overhead. */
  def hubSalts(edges: DataFrame, threshold: Long, p: Int)
      : Option[DataFrame] = {
    require(threshold > 0, "saltThreshold must be positive")
    val s = edges.groupBy(col("src").as("vid"))
      .agg(count(lit(1)).as("deg"))
      .where(col("deg") > threshold)
      .select(col("vid"),
        least(ceil(col("deg").cast("double") / threshold.toDouble),
          lit(p.toLong)).cast("int").as("k"))
      .persist()
    if (s.count() == 0L) { s.unpersist(); None } else Some(s)
  }

  /** Edge-side pid: base slot + per-edge chunk in [0, k), k from the
    * broadcast salt table (1 when absent). */
  private def edgePid(salts: Option[DataFrame], edges: DataFrame, p: Int)
      : DataFrame = salts match {
    case None =>
      edges.withColumn("pid", pidOf(col("src"), p))
    case Some(s) =>
      edges
        .join(broadcast(s.select(col("vid").as("src"), col("k"))),
          Seq("src"), "left")
        .withColumn("pid",
          pmod(pmod(xxhash64(col("src")), lit(p))
            + pmod(xxhash64(lit("chunk"), col("src"), col("dst")),
                coalesce(col("k"), lit(1)).cast("long")),
            lit(p)).cast("int"))
        .drop("k")
  }

  /** State-side routing: a (vid, value) state row goes to pid slot(s)
    * (base + i) mod p for i in [0, k) — one row for normal vertices, k
    * replicas for salted hubs — then bundles per pid. Shared by all six
    * gathers. */
  private def bundleState(st: DataFrame, p: Int, salts: Option[DataFrame])
      : DataFrame = {
    val routed = salts match {
      case None =>
        st.select(pidOf(col("vid"), p).as("pid"), col("vid"), col("value"))
      case Some(s) =>
        st.join(broadcast(s), Seq("vid"), "left")
          .select(col("vid"), col("value"),
            explode(sequence(lit(0), coalesce(col("k"), lit(1)) - 1))
              .as("i"))
          .select(
            pmod(pmod(xxhash64(col("vid")), lit(p)) + col("i").cast("long"),
              lit(p)).cast("int").as("pid"),
            col("vid"), col("value"))
    }
    routed.groupBy("pid")
      .agg(collect_list(struct(col("vid"), col("value"))).as("vals"))
  }

  /** Pack an edge DataFrame (src, dst) into P CSR blocks — one block per
    * pid. (repartition hashes the pid column, so one Spark partition can
    * hold several pids; blocks therefore split on pid boundaries.)
    * With `salts`, hub srcs' adjacency splits across their k pid slots —
    * pass the SAME salt table to every gather over these blocks. */
  def build(edges: DataFrame, p: Int,
      salts: Option[DataFrame] = None): Dataset[EdgeBlock] = {
    val spark = edges.sparkSession
    import spark.implicits._
    edgePid(salts, edges.select(col("src"), col("dst")), p)
      .select(col("src"), col("dst"), col("pid"))
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
            // Densify neighbors: sorted unique dsts + per-edge index.
            val flat = dsts.toArray
            val uniq = {
              val a = flat.clone(); java.util.Arrays.sort(a)
              var n = 0
              var i = 0
              while (i < a.length) {
                if (n == 0 || a(n - 1) != a(i)) { a(n) = a(i); n += 1 }
                i += 1
              }
              java.util.Arrays.copyOf(a, n)
            }
            val idx = new Array[Int](flat.length)
            var i = 0
            while (i < flat.length) {
              idx(i) = java.util.Arrays.binarySearch(uniq, flat(i))
              i += 1
            }
            EdgeBlock(pid, srcs.toArray, offs.toArray, idx, uniq)
          }
        }
      }
      // The typed mapPartitions boundary erases output partitioning, so a
      // per-round join would RESHUFFLE the whole multi-GB block relation
      // every superstep (measured: 10x slowdown). One extra build-time
      // exchange re-establishes HashPartitioning(pid) on the cached
      // relation; gatherSum's bundle side arrives with the same
      // partitioning and the blocks never move again.
      .repartition(p, col("pid"))
  }

  /** gather-sum: for a vertex-value table (vid, value), compute for every
    * dst with at least one contributing src the sum of src values over the
    * CSR blocks. Shuffles per call: one groupBy(pid) of the (small) vertex
    * state and one groupBy(vid) of per-block partials — the edges stay
    * put. Inside a block: merge-join the sorted state bundle against the
    * sorted srcIds, accumulate into a flat double array indexed by the
    * densified neighbor ids. */
  def gatherSum(blocks: Dataset[EdgeBlock], state: DataFrame, p: Int,
      salts: Option[DataFrame] = None): DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    val bundles = bundleState(
      state.select(col("vid"), col("value").cast("double").as("value")),
      p, salts)
    blocks.toDF()
      .join(bundles, "pid")
      .as[(Int, Array[Long], Array[Int], Array[Int], Array[Long],
        Array[VertexValue])]
      .mapPartitions { it =>
        it.flatMap { case (_, srcs, offs, idx, uniq, vals) =>
          val sorted = vals.sortBy(_.vid)
          val acc = new Array[Double](uniq.length)
          val touched = new Array[Boolean](uniq.length)
          var si = 0
          var vi = 0
          while (si < srcs.length && vi < sorted.length) {
            val s = srcs(si)
            val v = sorted(vi).vid
            if (s < v) si += 1
            else if (s > v) vi += 1
            else {
              // Fold an equal-vid run in the state (duplicate vids sum,
              // matching what groupBy(vid).agg(sum) of the bundle would
              // produce) before scanning the adjacency once.
              var value = sorted(vi).value
              vi += 1
              while (vi < sorted.length && sorted(vi).vid == s) {
                value += sorted(vi).value; vi += 1
              }
              var j = offs(si)
              val end = offs(si + 1)
              while (j < end) {
                val k = idx(j)
                acc(k) += value
                touched(k) = true
                j += 1
              }
              si += 1
            }
          }
          val out = mutable.ArrayBuffer[Partial]()
          var k = 0
          while (k < uniq.length) {
            if (touched(k)) out += Partial(uniq(k), acc(k))
            k += 1
          }
          out.iterator
        }
      }
      .groupBy("vid").agg(sum(col("partial")).as("sum_value"))
  }

  final case class VertexLongValue(vid: Long, value: Long)
  final case class LongPartial(vid: Long, partial: Long)

  /** CSR block with a per-edge weight array parallel to dstIndex (the
    * reference's NbrUnit carries eid -> edata the same way,
    * arrow_projected_fragment.h:431-470). */
  final case class WeightedEdgeBlock(
      pid: Int,
      srcIds: Array[Long],
      dstOffsets: Array[Int],
      dstIndex: Array[Int],
      dstUnique: Array[Long],
      weights: Array[Double])

  /** Pack (src, dst, weight) into P weighted CSR blocks — the layout of
    * [[build]] plus the parallel weight array. */
  def buildWeighted(edges: DataFrame, p: Int,
      salts: Option[DataFrame] = None): Dataset[WeightedEdgeBlock] = {
    val spark = edges.sparkSession
    import spark.implicits._
    edgePid(salts, edges.select(col("src"), col("dst"),
        col("weight").cast("double").as("weight")), p)
      .select(col("src"), col("dst"), col("weight"), col("pid"))
      .repartition(p, col("pid"))
      .sortWithinPartitions(col("pid"), col("src"), col("dst"))
      .as[(Long, Long, Double, Int)]
      .mapPartitions { it =>
        new Iterator[WeightedEdgeBlock] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): WeightedEdgeBlock = {
            val pid = buf.head._4
            val srcs = mutable.ArrayBuffer[Long]()
            val offs = mutable.ArrayBuffer[Int](0)
            val dsts = mutable.ArrayBuffer[Long]()
            val ws = mutable.ArrayBuffer[Double]()
            var last = Long.MinValue
            var started = false
            while (buf.hasNext && buf.head._4 == pid) {
              val (s, d, w, _) = buf.next()
              if (!started || s != last) {
                if (started) offs += dsts.length
                srcs += s; last = s; started = true
              }
              dsts += d; ws += w
            }
            offs += dsts.length
            val flat = dsts.toArray
            val uniq = {
              val a = flat.clone(); java.util.Arrays.sort(a)
              var n = 0
              var i = 0
              while (i < a.length) {
                if (n == 0 || a(n - 1) != a(i)) { a(n) = a(i); n += 1 }
                i += 1
              }
              java.util.Arrays.copyOf(a, n)
            }
            val idx = new Array[Int](flat.length)
            var i = 0
            while (i < flat.length) {
              idx(i) = java.util.Arrays.binarySearch(uniq, flat(i))
              i += 1
            }
            WeightedEdgeBlock(pid, srcs.toArray, offs.toArray, idx, uniq,
              ws.toArray)
          }
        }
      }
      // same partitioning-erasure handling as build()
      .repartition(p, col("pid"))
  }

  final case class DoublePartial(vid: Long, partial: Double)

  /** gather-min-plus over a DOUBLE-valued state (the SSSP relax shape):
    * for every dst with at least one contributing src, the minimum of
    * (src value + edge weight). Same two-small-shuffles structure as
    * gatherSum — the weighted blocks never move. */
  def gatherMinPlus(blocks: Dataset[WeightedEdgeBlock], state: DataFrame,
      p: Int, salts: Option[DataFrame] = None): DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    val bundles = bundleState(
      state.select(col("vid"), col("value").cast("double").as("value")),
      p, salts)
    blocks.toDF()
      .join(bundles, "pid")
      .as[(Int, Array[Long], Array[Int], Array[Int], Array[Long],
        Array[Double], Array[VertexValue])]
      .mapPartitions { it =>
        it.flatMap { case (_, srcs, offs, idx, uniq, ws, vals) =>
          val sorted = vals.sortBy(_.vid)
          val acc = new Array[Double](uniq.length)
          java.util.Arrays.fill(acc, Double.MaxValue)
          var si = 0
          var vi = 0
          while (si < srcs.length && vi < sorted.length) {
            val s = srcs(si)
            val v = sorted(vi).vid
            if (s < v) si += 1
            else if (s > v) vi += 1
            else {
              // equal-vid runs take the MIN source value
              var value = sorted(vi).value
              vi += 1
              while (vi < sorted.length && sorted(vi).vid == s) {
                if (sorted(vi).value < value) value = sorted(vi).value
                vi += 1
              }
              var j = offs(si)
              val end = offs(si + 1)
              while (j < end) {
                val k = idx(j)
                val cand = value + ws(j)
                if (cand < acc(k)) acc(k) = cand
                j += 1
              }
              si += 1
            }
          }
          val out = mutable.ArrayBuffer[DoublePartial]()
          var k = 0
          while (k < uniq.length) {
            if (acc(k) != Double.MaxValue)
              out += DoublePartial(uniq(k), acc(k))
            k += 1
          }
          out.iterator
        }
      }
      .groupBy("vid").agg(min(col("partial")).as("min_value"))
  }

  final case class ArrayPartial(vid: Long, partial: Array[Long])

  /** gather-collect over a LONG-valued state (the k-shell h-index shape):
    * for every dst with at least one contributing src, the ARRAY of
    * contributing src values (per-block partial arrays flattened by one
    * groupBy — the edges stay put; only state bundles and value arrays
    * move, never the edge relation). */
  def gatherCollect(blocks: Dataset[EdgeBlock], state: DataFrame, p: Int,
      salts: Option[DataFrame] = None): DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    val bundles = bundleState(
      state.select(col("vid"), col("value").cast("long").as("value")),
      p, salts)
    blocks.toDF()
      .join(bundles, "pid")
      .as[(Int, Array[Long], Array[Int], Array[Int], Array[Long],
        Array[VertexLongValue])]
      .mapPartitions { it =>
        it.flatMap { case (_, srcs, offs, idx, uniq, vals) =>
          val sorted = vals.sortBy(_.vid)
          val acc =
            Array.fill(uniq.length)(null: mutable.ArrayBuffer[Long])
          var si = 0
          var vi = 0
          while (si < srcs.length && vi < sorted.length) {
            val s = srcs(si)
            val v = sorted(vi).vid
            if (s < v) si += 1
            else if (s > v) vi += 1
            else {
              var j = offs(si)
              val end = offs(si + 1)
              // duplicate state vids append each value, matching what a
              // plain join + collect_list would produce
              var run = vi
              while (run < sorted.length && sorted(run).vid == s) {
                j = offs(si)
                while (j < end) {
                  val k = idx(j)
                  if (acc(k) == null) acc(k) = mutable.ArrayBuffer[Long]()
                  acc(k) += sorted(run).value
                  j += 1
                }
                run += 1
              }
              vi = run
              si += 1
            }
          }
          val out = mutable.ArrayBuffer[ArrayPartial]()
          var k = 0
          while (k < uniq.length) {
            if (acc(k) != null) out += ArrayPartial(uniq(k), acc(k).toArray)
            k += 1
          }
          out.iterator
        }
      }
      .groupBy("vid")
      .agg(flatten(collect_list(col("partial"))).as("values"))
  }

  final case class LabelPartial(vid: Long, label: Long, partial: Double)

  /** gather-label-sum over a LONG-labeled state on WEIGHTED blocks (the
    * Louvain neighbor-community-weight shape): for every dst with at
    * least one contributing src, the per-(dst, label(src)) sum of edge
    * weights. On a SYMMETRIC edge relation this equals
    * w(v -> c) = Σ weights from v to neighbors labeled c — the quantity
    * Louvain's move scoring needs — with the same two-small-shuffles
    * structure as gatherSum: one groupBy(pid) of the (vid, label) state
    * and one groupBy(vid, label) of per-block partials; the weighted
    * edge relation never moves or re-sorts per round. Per-dst label
    * sums accumulate in primitive-keyed LongMaps (no tuple boxing in
    * the |E| loop). */
  def gatherLabelSum(blocks: Dataset[WeightedEdgeBlock], state: DataFrame,
      p: Int, salts: Option[DataFrame] = None): DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    val bundles = bundleState(
      state.select(col("vid"), col("label").cast("long").as("value")),
      p, salts)
    blocks.toDF()
      .join(bundles, "pid")
      .as[(Int, Array[Long], Array[Int], Array[Int], Array[Long],
        Array[Double], Array[VertexLongValue])]
      .mapPartitions { it =>
        it.flatMap { case (_, srcs, offs, idx, uniq, ws, vals) =>
          labelGatherWalk(srcs, offs, idx, uniq, vals, j => ws(j))
        }
      }
      .groupBy("vid", "label").agg(sum(col("partial")).as("sum_w"))
  }

  /** The shared merge-join walk of both label gathers: per
    * (dst, label(src)) accumulate `weightOf(edge)` over the CSR block.
    * Counts ride the same Double accumulator (exact to 2^53 — far past
    * any per-dst degree), so sum and count differ only in the weight
    * function and the final cast. */
  private def labelGatherWalk(
      srcs: Array[Long], offs: Array[Int], idx: Array[Int],
      uniq: Array[Long], vals: Array[VertexLongValue],
      weightOf: Int => Double): Iterator[LabelPartial] = {
    val sorted = vals.sortBy(_.vid)
    val acc = Array.fill(uniq.length)(null: mutable.LongMap[Double])
    var si = 0
    var vi = 0
    while (si < srcs.length && vi < sorted.length) {
      val s = srcs(si)
      val v = sorted(vi).vid
      if (s < v) si += 1
      else if (s > v) vi += 1
      else {
        // labels are one row per vid (an assignment); skip any
        // duplicate-vid run defensively, keeping the first
        val label = sorted(vi).value
        vi += 1
        while (vi < sorted.length && sorted(vi).vid == s) vi += 1
        var j = offs(si)
        val end = offs(si + 1)
        while (j < end) {
          val k = idx(j)
          if (acc(k) == null) acc(k) = mutable.LongMap.empty[Double]
          val m = acc(k)
          m.update(label, m.getOrElse(label, 0.0) + weightOf(j))
          j += 1
        }
        si += 1
      }
    }
    val out = mutable.ArrayBuffer[LabelPartial]()
    var k = 0
    while (k < uniq.length) {
      if (acc(k) != null)
        acc(k).foreach { case (l, w) =>
          out += LabelPartial(uniq(k), l, w) }
      k += 1
    }
    out.iterator
  }

  /** gather-label-count over a LONG-labeled state on UNWEIGHTED blocks
    * (the CDLP neighbor-label-multiset shape): for every dst with at
    * least one contributing src, the per-(dst, label(src)) count of
    * incoming edges — duplicate edges count twice, matching the
    * LDBC-Graphalytics multiset rule that the plain
    * `edges ⋈ labels -> groupBy(dst, label).count` path computes. Same
    * two-small-shuffles structure as gatherLabelSum; per-dst label
    * counts accumulate in primitive-keyed LongMaps. */
  def gatherLabelCount(blocks: Dataset[EdgeBlock], state: DataFrame,
      p: Int, salts: Option[DataFrame] = None): DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    val bundles = bundleState(
      state.select(col("vid"), col("label").cast("long").as("value")),
      p, salts)
    blocks.toDF()
      .join(bundles, "pid")
      .as[(Int, Array[Long], Array[Int], Array[Int], Array[Long],
        Array[VertexLongValue])]
      .mapPartitions { it =>
        it.flatMap { case (_, srcs, offs, idx, uniq, vals) =>
          labelGatherWalk(srcs, offs, idx, uniq, vals, _ => 1.0)
        }
      }
      .groupBy("vid", "label")
      .agg(sum(col("partial")).cast("long").as("cnt"))
  }

  /** gather-min over a LONG-valued vertex state (the WCC/label shape):
    * for every dst with at least one contributing src, the minimum src
    * value. Same two-small-shuffles structure as gatherSum. */
  def gatherMin(blocks: Dataset[EdgeBlock], state: DataFrame, p: Int,
      salts: Option[DataFrame] = None): DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    val bundles = bundleState(
      state.select(col("vid"), col("value").cast("long").as("value")),
      p, salts)
    blocks.toDF()
      .join(bundles, "pid")
      .as[(Int, Array[Long], Array[Int], Array[Int], Array[Long],
        Array[VertexLongValue])]
      .mapPartitions { it =>
        it.flatMap { case (_, srcs, offs, idx, uniq, vals) =>
          val sorted = vals.sortBy(_.vid)
          val acc = new Array[Long](uniq.length)
          java.util.Arrays.fill(acc, Long.MaxValue)
          var si = 0
          var vi = 0
          while (si < srcs.length && vi < sorted.length) {
            val s = srcs(si)
            val v = sorted(vi).vid
            if (s < v) si += 1
            else if (s > v) vi += 1
            else {
              // Equal-vid runs in the state take the MIN (what
              // groupBy(vid).agg(min) of the bundle would produce).
              var value = sorted(vi).value
              vi += 1
              while (vi < sorted.length && sorted(vi).vid == s) {
                if (sorted(vi).value < value) value = sorted(vi).value
                vi += 1
              }
              var j = offs(si)
              val end = offs(si + 1)
              while (j < end) {
                val k = idx(j)
                if (value < acc(k)) acc(k) = value
                j += 1
              }
              si += 1
            }
          }
          val out = mutable.ArrayBuffer[LongPartial]()
          var k = 0
          while (k < uniq.length) {
            if (acc(k) != Long.MaxValue) out += LongPartial(uniq(k), acc(k))
            k += 1
          }
          out.iterator
        }
      }
      .groupBy("vid").agg(min(col("partial")).as("min_value"))
  }
}
