package graft

import graft.apps.LPAU2I

/** LPA-U2I (bipartite weighted feature propagation, apps/lpa/lpa_u2i.h)
  * against a faithful in-JVM simulation of the reference's
  * u2i/i2u alternation. */
class LpaU2ISpec extends SparkSpec {

  // users 1..4 (2 features), items 101..103, weighted user->item edges
  val userFeat: Map[Long, Seq[Double]] = Map(
    1L -> Seq(1.0, 0.2), 2L -> Seq(0.0, 0.8),
    3L -> Seq(0.5, 0.5), 4L -> Seq(0.9, 0.1))
  val edges: Seq[(Long, Long, Double)] = Seq(
    (1L, 101L, 1.0), (1L, 102L, 2.0),
    (2L, 101L, 1.0), (2L, 103L, 1.0),
    (3L, 102L, 1.0), (3L, 103L, 3.0),
    (4L, 101L, 2.0))

  /** In-JVM oracle of lpa_u2i.h:140-245. */
  def oracle(maxRound: Int): Map[Long, Seq[Double]] = {
    val users = userFeat.keys.toSeq.sorted
    val items = edges.map(_._2).distinct.sorted
    val outDeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val inDeg = edges.groupBy(_._2).view.mapValues(_.size).toMap
    val onids = users.map(u => u ->
      edges.filter(_._1 == u).map(e => inDeg(e._2)).sum).toMap
    var uf = userFeat
    var itf = Map.empty[Long, Seq[Double]]
    for (step <- 2 to maxRound) {
      if (step % 2 == 0) {
        itf = items.map { i =>
          val in = edges.filter(_._2 == i)
          i -> (0 until 2).map(p =>
            in.map(e => uf(e._1)(p) * e._3).sum)
        }.toMap
      } else {
        uf = users.map { u =>
          val out = edges.filter(_._1 == u)
          u -> (0 until 2).map { p =>
            val f = uf(u)(p)
            if (f == 0.0 || f == 1.0) f
            else {
              val tmp = out.map(e => itf(e._2)(p) * e._3).sum
              val denom = onids(u) - outDeg(u)
              if (denom != 0) (tmp - outDeg(u) * f) / denom else f
            }
          }
        }.toMap
      }
    }
    uf
  }

  test("lpa_u2i matches the reference alternation for 10 rounds") {
    import spark.implicits._
    val users = userFeat.toSeq.map { case (v, f) => (v, f) }
      .toDF("vid", "features")
    val e = edges.toDF("src", "dst", "weight")
    val got = LPAU2I.run(users, e, maxRound = 10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val want = oracle(10)
    for (u <- userFeat.keys) {
      val (g, w) = (got(u), want(u))
      assert(g.size == w.size, s"user $u arity")
      for (p <- w.indices)
        assert(math.abs(g(p) - w(p)) < 1e-9,
          s"user $u prop $p: got ${g(p)} want ${w(p)}")
    }
  }

  test("ground-truth 0/1 features stay pinned") {
    import spark.implicits._
    val users = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.3, 0.7)))
      .toDF("vid", "features")
    val e = Seq((1L, 101L, 1.0), (2L, 101L, 1.0)).toDF("src", "dst",
      "weight")
    val got = LPAU2I.run(users, e, maxRound = 6).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) == Seq(1.0, 0.0))
  }
}
