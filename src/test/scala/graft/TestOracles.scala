package graft

import scala.collection.mutable

/** Single-threaded in-JVM reference implementations with the exact
  * semantics pinned in SURVEY.md §2.2 — the test-side stand-ins for the
  * reference's golden files (analytical_engine/test/app_tests.sh). */
object TestOracles {

  /** Directed PageRank, reference recurrence
    * (benchmarks/apps/pagerank/pagerank.h). */
  def pagerank(verts: Seq[Long], edges: Seq[(Long, Long)],
      delta: Double = 0.85, rounds: Int = 10): Map[Long, Double] = {
    val n = verts.size.toDouble
    val outDeg = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val inNbrs = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var rank = verts.map(v => v -> 1.0 / n).toMap
    val dangling = verts.filter(v => !outDeg.contains(v))
    var danglingSum = (1.0 / n) * dangling.size
    for (_ <- 1 to rounds) {
      val base = (1.0 - delta) / n + delta * danglingSum / n
      rank = verts.map { v =>
        if (!outDeg.contains(v)) v -> base
        else {
          val s = inNbrs.getOrElse(v, Nil)
            .map(w => rank(w) / outDeg(w)).sum
          v -> (delta * s + base)
        }
      }.toMap
      danglingSum = base * dangling.size
    }
    rank
  }

  /** WCC by union-find; labels = min member vid. */
  def wcc(verts: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map(verts.map(v => v -> v): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    for ((a, b) <- edges) parent(find(a)) = find(b)
    val minOf = verts.groupBy(find).map { case (r, vs) => r -> vs.min }
    verts.map(v => v -> minOf(find(v))).toMap
  }

  /** CDLP, LDBC semantics: synchronous, in+out neighbor multiset, mode with
    * min tiebreak, fixed rounds, isolated vertices keep their label. */
  def cdlp(verts: Seq[Long], directedEdges: Seq[(Long, Long)],
      rounds: Int = 10): Map[Long, Long] = {
    val nbrs = (directedEdges ++ directedEdges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var label = verts.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      label = verts.map { v =>
        nbrs.get(v) match {
          case None | Some(Nil) => v -> label(v)
          case Some(ns) =>
            val counts = ns.map(label).groupBy(identity).view
              .mapValues(_.size).toMap
            val best = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
            v -> best
        }
      }.toMap
    }
    label
  }

  /** Per-vertex triangle counts, brute force over neighbor sets. */
  def triangles(verts: Seq[Long], edges: Seq[(Long, Long)])
      : Map[Long, Long] = {
    val nbrs = mutable.Map[Long, mutable.Set[Long]]()
    for ((a, b) <- edges if a != b) {
      nbrs.getOrElseUpdate(a, mutable.Set()) += b
      nbrs.getOrElseUpdate(b, mutable.Set()) += a
    }
    verts.map { v =>
      val ns = nbrs.getOrElse(v, mutable.Set()).toSeq
      var c = 0L
      for (i <- ns.indices; j <- (i + 1) until ns.size)
        if (nbrs(ns(i)).contains(ns(j))) c += 1
      v -> c
    }.toMap
  }

  /** BFS depth, -1 if unreachable (directed edge relation as given). */
  def bfs(verts: Seq[Long], edges: Seq[(Long, Long)], source: Long)
      : Map[Long, Long] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val depth = mutable.Map(verts.map(v => v -> -1L): _*)
    depth(source) = 0L
    var frontier = Seq(source)
    var d = 0L
    while (frontier.nonEmpty) {
      d += 1
      frontier = frontier.flatMap(v => adj.getOrElse(v, Nil))
        .distinct.filter(depth(_) < 0)
      frontier.foreach(depth(_) = d)
    }
    depth.toMap
  }

  /** Dijkstra; -1.0 if unreachable. */
  def sssp(verts: Seq[Long], edges: Seq[(Long, Long, Double)], source: Long)
      : Map[Long, Double] = {
    val adj = edges.groupBy(_._1).view
      .mapValues(_.map(e => (e._2, e._3))).toMap
    val dist = mutable.Map(verts.map(v => v -> Double.MaxValue): _*)
    dist(source) = 0.0
    val pq = mutable.PriorityQueue((0.0, source))(
      Ordering.by[(Double, Long), Double](-_._1))
    while (pq.nonEmpty) {
      val (d, v) = pq.dequeue()
      if (d <= dist(v)) {
        for ((u, w) <- adj.getOrElse(v, Nil)) {
          if (d + w < dist(u)) { dist(u) = d + w; pq.enqueue((d + w, u)) }
        }
      }
    }
    dist.map { case (v, d) =>
      v -> (if (d == Double.MaxValue) -1.0 else d) }.toMap
  }

  /** Bounded synchronous peeling at fixed k (reference kcore.h semantics:
    * each wave removes ALL alive vertices with alive-degree < k at once).
    * @return (membership 0/1 after min(rounds, fixpoint) waves,
    *         waves to fixpoint when reached within `rounds`). */
  def kcorePeel(verts: Seq[Long], edges: Seq[(Long, Long)], k: Int,
      rounds: Int = Int.MaxValue): (Map[Long, Long], Int) = {
    val nbrs = mutable.Map[Long, mutable.Set[Long]]()
    for ((a, b) <- edges if a != b) {
      nbrs.getOrElseUpdate(a, mutable.Set()) += b
      nbrs.getOrElseUpdate(b, mutable.Set()) += a
    }
    val alive = mutable.Set(verts: _*)
    var r = 0
    var changed = true
    while (changed && r < rounds) {
      val doomed = alive.filter(v =>
        nbrs.getOrElse(v, mutable.Set()).count(alive) < k)
      changed = doomed.nonEmpty
      if (changed) { r += 1; alive --= doomed }
    }
    (verts.map(v => v -> (if (alive(v)) 1L else 0L)).toMap, r)
  }

  /** Core numbers by repeated peeling at escalating k. */
  def coreNumbers(verts: Seq[Long], edges: Seq[(Long, Long)])
      : Map[Long, Long] = {
    val nbrs = mutable.Map[Long, mutable.Set[Long]]()
    for ((a, b) <- edges if a != b) {
      nbrs.getOrElseUpdate(a, mutable.Set()) += b
      nbrs.getOrElseUpdate(b, mutable.Set()) += a
    }
    val core = mutable.Map[Long, Long]()
    val alive = mutable.Set(verts: _*)
    var k = 1L
    while (alive.nonEmpty) {
      var changed = true
      while (changed) {
        val doomed = alive.filter(v =>
          nbrs.getOrElse(v, mutable.Set()).count(alive) < k)
        changed = doomed.nonEmpty
        doomed.foreach { v => core(v) = k - 1; alive -= v }
      }
      k += 1
    }
    core.toMap
  }

  /** HITS, reference semantics (apps/hits/hits.h): see graft.apps.HITS. */
  def hits(verts: Seq[Long], edges: Seq[(Long, Long)],
      tolerance: Double = 0.01, maxRound: Int = 100,
      normalized: Boolean = true): Map[Long, (Double, Double)] = {
    val n = verts.size.toDouble
    val inN = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val outN = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var hub = verts.map(v => v -> 1.0 / n).toMap
    var auth = verts.map(v => v -> 0.0).toMap
    var step = 0
    var done = false
    while (!done && step < maxRound) {
      val hubLast = hub
      auth = verts.map(v =>
        v -> inN.getOrElse(v, Nil).map(hubLast).sum).toMap
      hub = verts.map(v =>
        v -> outN.getOrElse(v, Nil).map(auth).sum).toMap
      val maxH = hub.values.max
      val maxA = auth.values.max
      hub = hub.view.mapValues(_ / maxH).toMap
      auth = auth.view.mapValues(_ / maxA).toMap
      val eps = verts.map(v => math.abs(hub(v) - hubLast(v))).sum
      step += 1
      if (eps <= tolerance) done = true
    }
    if (normalized) {
      val sh = hub.values.sum; val sa = auth.values.sum
      verts.map(v => v -> (hub(v) / sh, auth(v) / sa)).toMap
    } else verts.map(v => v -> (hub(v), auth(v))).toMap
  }

  /** Eigenvector centrality, reference semantics (self term + in-sum,
    * L2 norm, delta < n*tol). */
  def eigenvector(verts: Seq[Long], edges: Seq[(Long, Long)],
      tolerance: Double = 1e-6, maxRound: Int = 100): Map[Long, Double] = {
    val n = verts.size.toDouble
    val inN = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var x = verts.map(v => v -> 1.0 / n).toMap
    var round = 0
    var done = false
    while (!done && round < maxRound) {
      round += 1
      val xl = x
      var nx = verts.map(v =>
        v -> (xl(v) + inN.getOrElse(v, Nil).map(xl).sum)).toMap
      val norm = math.sqrt(nx.values.map(a => a * a).sum)
      nx = nx.view.mapValues(_ / norm).toMap
      val delta = verts.map(v => math.abs(nx(v) - xl(v))).sum
      x = nx
      if (delta < n * tolerance) done = true
    }
    x
  }

  /** Katz centrality, reference semantics (x0=0, no per-round norm,
    * final L2 norm when normalized). */
  def katz(verts: Seq[Long], edges: Seq[(Long, Long)],
      alpha: Double = 0.1, beta: Double = 1.0, tolerance: Double = 1e-6,
      maxRound: Int = 100, normalized: Boolean = true): Map[Long, Double] = {
    val n = verts.size.toDouble
    val inN = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var x = verts.map(v => v -> 0.0).toMap
    var round = 0
    var done = false
    var totalSum = 0.0
    while (!done && round < maxRound) {
      round += 1
      val xl = x
      val nx = verts.map(v =>
        v -> (alpha * inN.getOrElse(v, Nil).map(xl).sum + beta)).toMap
      val delta = verts.map(v => math.abs(nx(v) - xl(v))).sum
      totalSum = nx.values.map(a => a * a).sum
      x = nx
      if (delta < n * tolerance) done = true
    }
    if (normalized) {
      val s = 1.0 / math.sqrt(totalSum)
      x.view.mapValues(_ * s).toMap
    } else x
  }
}
