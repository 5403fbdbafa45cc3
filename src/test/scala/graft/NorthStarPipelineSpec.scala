package graft

import java.nio.file.Files

import graft.apps.PageRank
import graft.graphbuild.GraphBuilder
import graft.model.SourceFiles
import graft.pregel.CheckpointConfig
import graft.sources.SnapshotTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full north-star lifecycle over a snapshot-table catalog
  * (BASELINE.json north_rule): the mandated source-file table sealed as
  * a versioned table, per-row sha256 equality through the seal, the
  * link graph derived from the TABLE read (not the in-memory frame),
  * PageRank with per-iteration snapshot checkpoints + app-level resume,
  * ranks sealed durably, and catalog evolution with pinned-snapshot
  * reproducibility (time travel to the old catalog reproduces the old
  * ranks bit-for-bit while the current catalog has moved on). */
class NorthStarPipelineSpec extends SparkSpec {

  private def prChecksum(ranks: DataFrame): Long =
    ranks.agg(round(sum(col("rank") * col("vid")) * 1e6, 0))
      .head().getDouble(0).toLong

  test("catalog seal -> graph -> checkpointed PageRank -> evolution") {
    val root = Files.createTempDirectory("northstar").toString
    val catalog = s"$root/catalog"
    val ckDir = s"$root/ck"
    val resultTable = s"$root/ranks"

    // 1. Synthesize the mandated table and seal it as catalog v1.
    val files = SourceFiles.withSha(
      SourceFiles.generate(spark, nFiles = 3000L, nRepos = 120))
    SnapshotTable.create(files, catalog)
    val sealedCat = SnapshotTable.read(spark, catalog)

    // Per-row sha256 invariant THROUGH the seal: recomputing the hash
    // from sealed content matches the pre-seal column, and the sealed
    // row set equals the source row set exactly.
    assert(sealedCat.where(
      sha2(col("content"), 256) =!= col("content_sha")).count() == 0,
      "content bytes survived the seal per-row")
    assert(sealedCat.exceptAll(files).isEmpty
        && files.exceptAll(sealedCat).isEmpty,
      "sealed catalog == source table, row for row")

    // 2. Link graph from the TABLE read; PageRank with per-iteration
    //    snapshot checkpoints.
    val g = GraphBuilder.build(sealedCat).simple(directed = true)
    val cp = CheckpointConfig(Some(ckDir), runId = "pr", snapshot = true)
    val ranks = PageRank.run(g, 0.85, 10, checkpoint = cp)
      .localCheckpoint(true)
    val chk = prChecksum(ranks)

    val ckTable = s"$ckDir/pr"
    val hist = SnapshotTable.snapshots(spark, ckTable)
    assert(hist.size == 10, "one committed snapshot per superstep")
    assert(hist.map(_.summary("iteration")) == (1 to 10).map(_.toString))
    val nV = g.vertices.count()
    assert(SnapshotTable.readVersion(spark, ckTable, 5).count() == nV,
      "iteration 5's full vertex state is time-travelable")

    // 3. App-level resume: a fresh 10-round run over the SAME runId
    //    starts from committed iteration 10 (nothing re-runs), and a
    //    4-round-then-10-round split run matches the uninterrupted one.
    val resumed = PageRank.run(g, 0.85, 10, checkpoint = cp)
    assert(prChecksum(resumed) == chk, "resume-at-fixpoint is a no-op read")
    val cp2 = CheckpointConfig(Some(ckDir), runId = "pr2", snapshot = true)
    PageRank.run(g, 0.85, 4, checkpoint = cp2)
    val split = PageRank.run(g, 0.85, 10, checkpoint = cp2)
    assert(prChecksum(split) == chk,
      "4+6 rounds via snapshot resume == 10 uninterrupted rounds")

    // 4. Seal the ranks durably; read back identical.
    SnapshotTable.create(ranks, resultTable,
      summary = Map("app" -> "pagerank", "rounds" -> "10"))
    assert(prChecksum(SnapshotTable.read(spark, resultTable)) == chk)

    // 5. Catalog evolution: append a second batch of files -> the
    //    CURRENT graph grows, but time travel to catalog v1 reproduces
    //    the original ranks bit-for-bit (pinned-snapshot runs).
    val extra = SourceFiles.withSha(
      SourceFiles.generate(spark, nFiles = 800L, nRepos = 120, seed = 99L))
    SnapshotTable.append(extra, catalog)
    assert(SnapshotTable.read(spark, catalog).count() == 3800,
      "append committed both batches")
    val evolved = GraphBuilder.build(SnapshotTable.read(spark, catalog))
      .simple(directed = true)
    // The new batch pushes shared basenames over the co-occurrence
    // fanout cap, so the evolved edge set legitimately shrinks — the
    // point is that it CHANGED while the pinned snapshot below did not.
    assert(evolved.numEdges != g.numEdges, "the catalog moved on")

    val pinned = GraphBuilder.build(
      SnapshotTable.readVersion(spark, catalog, 1)).simple(directed = true)
    val rerun = PageRank.run(pinned, 0.85, 10)
    assert(prChecksum(rerun) == chk,
      "a pinned catalog snapshot reproduces the original ranks exactly")
  }
}
