package graft.streaming

import graft.sources.SnapshotTable
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-Streaming ingestion into a snapshot table
  * ([[graft.sources.SnapshotTable]]) — the streaming half of the
  * durable-sink story (the reference itself has no streaming surface,
  * SURVEY.md §2.8; this is the pipeline capability a 100 TB ingest
  * needs on top of it).
  *
  * Exactly-once per micro-batch: every committed batch records its
  * `streamBatch` id in the manifest summary, and [[commitBatch]] skips
  * any batch id at or below the table's high-water mark. Spark replays
  * micro-batches after a failure/restart (foreachBatch is
  * at-least-once); the skip makes the append idempotent, so the table
  * holds each batch exactly once — the same ledger trick Delta/Iceberg
  * streaming sinks use (txnVersion/txnAppId).
  *
  * At 100 TB this is the small-file treadmill: frequent micro-batch
  * appends + periodic [[SnapshotTable.compact]] + [[SnapshotTable
  * .expire]] — each a metadata-first operation, and downstream
  * consumers follow the table with [[SnapshotTable.readIncremental]]
  * (append-only commits, which is exactly what this sink produces).
  */
object StreamIngest {

  /** The table's committed stream high-water mark (-1 when the table
    * does not exist yet or carries no stream commits). Walks retained
    * manifests newest-first and stops at the first stream commit —
    * batch ids grow with version, so that IS the max, and a long-lived
    * stream reads one small JSON per batch instead of its whole history
    * (maintenance commits in between just add a step each). Only
    * summaries are read, never data. Caveat: after a manual rollback
    * the mark still reflects the rolled-back-over stream commits
    * (conservative — replays are skipped, never double-applied). */
  def lastCommittedBatch(spark: org.apache.spark.sql.SparkSession,
      table: String): Long =
    SnapshotTable.retainedVersions(spark, table).reverseIterator
      .map(v => SnapshotTable.manifest(spark, table, v)
        .summary.get("streamBatch"))
      .collectFirst { case Some(b) => b.toLong }
      .getOrElse(-1L)

  /** Append one micro-batch with the exactly-once ledger check.
    * Returns true when the batch was committed, false when it was a
    * replay of an already-committed id (skipped). The cheap ledger read
    * is only a fast path — the authoritative gate re-evaluates ATOMICALLY
    * inside the snapshot commit loop ([[SnapshotTable.appendBatch]]), so
    * two concurrent committers of the same batch (a zombie driver racing
    * a restarted query) cannot both land it. Public so the idempotence
    * contract is directly testable. */
  def commitBatch(batch: DataFrame, table: String, batchId: Long)
      : Boolean = {
    val spark = batch.sparkSession
    if (batchId <= lastCommittedBatch(spark, table)) false
    else SnapshotTable.appendBatch(batch, table, batchId)
  }

  /** Start ingesting a streaming DataFrame into `table`. Works for raw
    * ingest and for watermarked windowed aggregations in append output
    * mode alike (finalized windows arrive as ordinary micro-batch
    * rows). `checkpointDir` is Spark's streaming offset checkpoint —
    * source progress; the TABLE's durability is the manifest chain. */
  def intoSnapshot(stream: DataFrame, table: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        commitBatch(batch.toDF(), table, batchId)
        ()
      }
      .start()
}
