package graft

import graft.sim.Ann
import org.apache.spark.sql.functions._

/** ANN over the driver-provided embeddings table: brute force is exact vs
  * an in-JVM oracle; LSH recalls most of the exact top-k. */
class AnnSpec extends SparkSpec {

  lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
    .localCheckpoint(true)

  lazy val vecs: Map[Long, Array[Float]] = emb.collect()
    .map(r => r.getLong(0) ->
      r.getSeq[Float](1).toArray).toMap

  def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  def exactTopK(q: Long, k: Int): Seq[Long] =
    vecs.toSeq.filter(_._1 != q)
      .map { case (id, v) => (id, cos(vecs(q), v)) }
      .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)

  lazy val queries = emb.where(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"),
      col("embedding").as("q_embedding"))

  test("brute-force cosine top-k matches in-JVM oracle") {
    val got = Ann.bruteForceTopK(emb, queries, k = 10).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq }
    for (q <- 0L until 5L) {
      assert(got(q) == exactTopK(q, 10), s"query $q")
    }
  }

  test("lsh top-k recalls most of the exact top-10") {
    val got = Ann.lshTopK(emb, queries, k = 10).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val recalls = (0L until 5L).map { q =>
      val exact = exactTopK(q, 10).toSet
      got.getOrElse(q, Set.empty).intersect(exact).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean LSH recall $mean (per-query $recalls)")
  }

  test("ivf top-k recalls most of the exact top-10 and never fabricates") {
    val got = Ann.ivfTopK(emb, queries, k = 10, nlist = 16, nprobe = 8,
      iters = 2).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val recalls = (0L until 5L).map { q =>
      val exact = exactTopK(q, 10).toSet
      got.getOrElse(q, Set.empty).intersect(exact).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"mean IVF recall $mean (per-query $recalls)")
    // Every returned (q, v) cosine must be exact (IVF re-ranks exactly
    // inside the probed lists — no approximate scores).
    val rows = Ann.ivfTopK(emb, queries, k = 3, nlist = 16, nprobe = 8,
      iters = 2).collect()
    rows.foreach { r =>
      val want = cos(vecs(r.getLong(0)), vecs(r.getLong(1)))
      // 1e-5: Spark's dot multiplies floats before the double accumulate;
      // the JVM oracle multiplies doubles.
      assert(math.abs(r.getDouble(2) - want) < 1e-5,
        s"ivf cosine must be exact for (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("ivf degenerates gracefully when the corpus is smaller than nlist") {
    val tiny = emb.where(col("vec_id") < 5)
    val got = Ann.ivfTopK(tiny, queries, k = 3, nlist = 16, nprobe = 16,
      iters = 1).collect()
    // 5 vectors -> 5 centroids max; probing all lists == brute force.
    val want = Ann.bruteForceTopK(tiny, queries, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      == want, "tiny-corpus IVF must equal brute force")
  }

  test("cosine near-dup pairs are symmetric-free and above threshold") {
    val pairs = Ann.cosineNearDupPairs(emb, threshold = 0.9, planes = 8)
      .collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.9)
      assert(math.abs(r.getDouble(2) -
        cos(vecs(r.getLong(0)), vecs(r.getLong(1)))) < 1e-6)
    }
  }
}
