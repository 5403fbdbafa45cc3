package graft

import graft.text.{Dedup, TextStats}
import org.apache.spark.sql.functions._

/** Dedup + text-analysis operators against in-JVM expectations. */
class TextOpsSpec extends SparkSpec {
  import Dedup._

  def docsDF(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  val near1 = "the quick brown fox jumps over the lazy dog in the park today"
  val near2 = "the quick brown fox jumps over the lazy dog in the park now"
  val other = "completely different content about spark shuffles and scans"

  test("exact dedup groups identical texts") {
    val docs = docsDF(Seq(1L -> "aaa", 2L -> "bbb", 3L -> "aaa",
      7L -> "aaa"))
    val got = exact(docs).select("canonical_id", "n_dups").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L))
  }

  test("minhash LSH finds near duplicates, not unrelated docs") {
    val docs = docsDF(Seq(1L -> near1, 2L -> near2, 3L -> other,
      4L -> near1))
    val pairs = minhashPairs(docs, threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)), s"exact dup must be found: $pairs")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      s"near dup should be found: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc must not pair: $pairs")
  }

  test("dedupClusters: transitive near-dup clusters, min-id survivor, " +
      "singletons intact") {
    // 1-2 near, 1-4 exact, 3 unrelated, 9 unrelated: expect cluster
    // {1,2,4} (via transitivity through 1) keeping 1, and {3}, {9}
    // keeping themselves.
    val docs = docsDF(Seq(1L -> near1, 2L -> near2, 3L -> other,
      4L -> near1, 9L -> "nothing like anything else here at all"))
    val got = dedupClusters(docs, threshold = 0.5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 9L), "one row per doc")
    assert(got(1L) == (1L, true), s"min-id survivor: $got")
    assert(got(4L) == (1L, false), s"exact dup joins cluster 1: $got")
    assert(got(2L)._1 == 1L, s"near dup clusters transitively: $got")
    assert(got(3L) == (3L, true) && got(9L) == (9L, true),
      s"singletons keep themselves: $got")
  }

  test("dedupClusters: all-distinct corpus degenerates to all singletons") {
    val docs = docsDF(Seq(1L -> near1, 5L -> other,
      9L -> "unrelated third text entirely about databases and storage"))
    val got = dedupClusters(docs, threshold = 0.5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got == Map(1L -> (1L, true), 5L -> (5L, true),
      9L -> (9L, true)), s"empty pair set must yield singletons: $got")
  }

  test("minhash estimated jaccard ~ true shingle jaccard") {
    def shingles(s: String, k: Int = 5): Set[String] =
      (0 to s.length - k).map(i => s.substring(i, i + k)).toSet
    val truth = {
      val a = shingles(near1); val b = shingles(near2)
      a.intersect(b).size.toDouble / a.union(b).size
    }
    val docs = docsDF(Seq(1L -> near1, 2L -> near2))
    val est = minhashPairs(docs, numHashes = 128, bands = 16,
      threshold = 0.0)
      .where(col("id_a") === 1 && col("id_b") === 2)
      .head().getDouble(2)
    assert(math.abs(est - truth) < 0.2, s"est $est vs truth $truth")
  }

  test("simhash: identical texts collide, near texts within few bits") {
    val docs = docsDF(Seq(1L -> near1, 2L -> near2, 3L -> other,
      4L -> near1))
    val sh = simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)),
      s"near pair must be closer than unrelated pair")
  }

  test("hamming64 column matches JVM popcount") {
    import spark.implicits._
    val rows = Seq((0x0L, 0xFFL), (0x123456789abcdefL, 0x0L),
      (-1L, 0L), (Long.MinValue, 0L))
    val got = rows.toDF("a", "b")
      .select(hamming64(col("a"), col("b"))).collect().map(_.getLong(0))
    val want = rows.map { case (a, b) =>
      java.lang.Long.bitCount(a ^ b).toLong }
    assert(got.toSeq == want)
  }

  test("simhashPairs blocks + verifies") {
    val docs = docsDF(Seq(1L -> near1, 2L -> near1, 3L -> other))
    val pairs = simhashPairs(docs, maxHamming = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("ngram jaccard pairs") {
    val docs = docsDF(Seq(1L -> near1, 2L -> near2, 3L -> other))
    val got = ngramJaccardPairs(docs, n = 2, threshold = 0.3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("token counts: whitespace formula and bpe-ish regex") {
    import spark.implicits._
    val df = Seq("a b c", "one").toDF("text")
    assert(df.select(TextStats.tokenCount(col("text")))
      .collect().map(_.getLong(0)).toSeq == Seq(3L, 1L))
    val bpe = Seq("foo.bar(1)").toDF("text")
      .select(TextStats.bpeishTokenCount(col("text"))).head().getLong(0)
    assert(bpe == 6L, s"foo . bar ( 1 ) -> got $bpe") // foo . bar ( 1 )
  }

  test("quality features are sane") {
    val f = TextStats.qualityFeatures(docsDF(Seq(
      1L -> "The cat, the dog!"))).head()
    assert(f.getLong(1) == 17L) // n_chars
    assert(f.getLong(2) == 4L)  // n_tokens
    assert(f.getDouble(4) > 0)  // punct_ratio
    assert(f.getDouble(5) > 0)  // upper_ratio
  }

  test("langId picks the dominant stopword language") {
    val got = TextStats.langId(docsDF(Seq(
      1L -> "x the y the z the w and q",
      2L -> "x der y und z der w die q",
      3L -> "x le y les z et w le q"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr"))
  }

  test("incremental dedup steps compose to the full-corpus recompute") {
    def pset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // pseudo-random token streams: non-planted docs share almost no
    // shingles, so only the planted copies can cross the 0.7 threshold
    def text(i: Long) =
      (0 until 15).map(j => s"w${(i * 977 + j * 131) % 99991}t$j")
        .mkString(" ")
    // batch1: 20 distinct docs; batch2: 20 docs of which three are exact
    // copies of batch-1 docs (cross-boundary) and two copy each other.
    val b1 = docsDF((0L until 20L).map(i => i -> text(i)))
    val b2 = docsDF((20L until 40L).map {
      case 25L => 25L -> text(3)
      case 30L => 30L -> text(12)
      case 36L => 36L -> text(35)
      case i => i -> text(i)
    })
    val root = java.nio.file.Files.createTempDirectory("incr-dedup")
    val (corpus, sigs) =
      (root.resolve("corpus").toString, root.resolve("sigs").toString)
    try {
      val p1 = pset(incrementalDedupStep(corpus, sigs, b1))
      assert(p1.isEmpty, "batch 1 is all-distinct")
      val p2 = pset(incrementalDedupStep(corpus, sigs, b2))
      assert(Set((3L, 25L), (12L, 30L), (35L, 36L)).subsetOf(p2),
        s"cross-boundary and in-delta plants must surface: $p2")

      // Union over steps == one full recompute over the final corpus.
      import graft.sources.SnapshotTable
      val fullCorpus = SnapshotTable.read(spark, corpus)
      assert(fullCorpus.count() == 40)
      assert(SnapshotTable.read(spark, sigs).count() == 40)
      assert(p1 ++ p2 == pset(minhashPairs(fullCorpus)))
    } finally {
      java.nio.file.Files.walk(root)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("incremental dedup self-heals a crash between corpus and sig " +
      "commits") {
    def pset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def text(i: Long) =
      (0 until 15).map(j => s"w${(i * 977 + j * 131) % 99991}t$j")
        .mkString(" ")
    val b1 = docsDF((0L until 20L).map(i => i -> text(i)))
    // b2: doc 25 copies doc 3 — its pair must STILL surface even though
    // b2's own step "crashed" after the corpus append
    val b2 = docsDF((20L until 30L).map {
      case 25L => 25L -> text(3)
      case i => i -> text(i)
    })
    // b3: doc 31 copies the crashed batch's doc 22
    val b3 = docsDF(Seq(30L -> text(30), 31L -> text(22)))
    val root = java.nio.file.Files.createTempDirectory("incr-crash")
    val (corpus, sigs) =
      (root.resolve("corpus").toString, root.resolve("sigs").toString)
    try {
      import graft.sources.SnapshotTable
      assert(pset(incrementalDedupStep(corpus, sigs, b1)).isEmpty)
      // simulate the crash: the corpus append landed, the sig append
      // never did
      SnapshotTable.append(b2, corpus)
      assert(SnapshotTable.read(spark, sigs).count() == 20)
      // next step re-signs the orphaned batch and emits BOTH the
      // crashed batch's pairs and its own
      val p3 = pset(incrementalDedupStep(corpus, sigs, b3))
      assert(p3 == Set((3L, 25L), (22L, 31L)),
        s"reconcile must surface the crashed delta's pairs too: $p3")
      // lockstep restored: every corpus doc has a signature, and the
      // marker points at the current corpus version
      assert(SnapshotTable.read(spark, sigs).count() ==
        SnapshotTable.read(spark, corpus).count())
      val sigV = SnapshotTable.currentVersionOpt(spark, sigs).get
      val marker = SnapshotTable.manifest(spark, sigs, sigV)
        .summary("corpusVersion").toInt
      assert(marker ==
        SnapshotTable.currentVersionOpt(spark, corpus).get)
      // union over (completed) steps == full recompute on the corpus
      val full = pset(minhashPairs(SnapshotTable.read(spark, corpus)))
      assert(p3 == full)
    } finally {
      java.nio.file.Files.walk(root)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("fingerprint is stable and edit-robust at the tail") {
    import spark.implicits._
    val fp = Seq(near1, near1 + " extra", other).toDF("text")
      .select(TextStats.fingerprint(col("text"))).collect()
      .map(_.getLong(0))
    assert(fp(0) == fp(1), "appending text keeps the min-shingle hash")
    assert(fp(0) != fp(2))
  }
}
