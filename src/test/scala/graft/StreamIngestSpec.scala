package graft

import java.nio.file.Files
import java.util.Comparator

import graft.sources.SnapshotTable
import graft.streaming.StreamIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured-Streaming ingestion into the snapshot catalog: per-batch
  * exactly-once commits, replay idempotence, incremental follow-reads,
  * and watermarked windowed aggregation through the same sink. */
class StreamIngestSpec extends SparkSpec {

  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def rmrf(root: java.nio.file.Path): Unit =
    Files.walk(root).sorted(Comparator.reverseOrder())
      .forEach(p => Files.delete(p))

  test("micro-batches land exactly once; replays are skipped") {
    val root = Files.createTempDirectory("stream-snap")
    val t = root.resolve("t").toString
    val mem = MemoryStream[(Long, String)]
    val q = StreamIngest.intoSnapshot(
      mem.toDF().toDF("id", "text"), t, root.resolve("cp").toString)
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(SnapshotTable.read(spark, t).count() == 2)

      mem.addData((3L, "c"))
      q.processAllAvailable()
      assert(SnapshotTable.read(spark, t).count() == 3)
      assert(StreamIngest.lastCommittedBatch(spark, t) == 1L)

      // A replayed batch id (what Spark does after a failure/restart)
      // must be skipped — the ledger makes the append idempotent.
      val replay = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
      assert(!StreamIngest.commitBatch(replay, t, 0L))
      assert(!StreamIngest.commitBatch(replay, t, 1L))
      assert(SnapshotTable.read(spark, t).count() == 3)

      // Stream commits are plain appends: a downstream consumer follows
      // the table incrementally and sees only batch 1's row.
      val incr = SnapshotTable.readIncremental(spark, t, 1)
      assert(incr.collect().map(_.getLong(0)).toSeq == Seq(3L))

      // A genuinely new batch id commits and advances the high-water mark.
      assert(StreamIngest.commitBatch(
        Seq((4L, "d")).toDF("id", "text"), t, 7L))
      assert(StreamIngest.lastCommittedBatch(spark, t) == 7L)
      assert(SnapshotTable.read(spark, t).count() == 4)
    } finally {
      q.stop(); rmrf(root)
    }
  }

  test("watermarked windowed aggregation streams into the table") {
    val root = Files.createTempDirectory("stream-win")
    val t = root.resolve("t").toString
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "v")
      .withWatermark("ts", "5 seconds")
      .groupBy(window(col("ts"), "10 seconds"))
      .agg(sum(col("v")).as("total"))
      .select(col("window.start").cast("long").as("ws"), col("total"))
    val q = StreamIngest.intoSnapshot(agg, t, root.resolve("cp").toString)
    try {
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
      mem.addData((ts(1), 1.5), (ts(3), 2.5)) // window [0, 10)
      q.processAllAvailable()
      // advance the watermark past 10s so the window finalizes...
      mem.addData((ts(21), 9.0))
      q.processAllAvailable()
      // ...and trigger one more batch to flush the finalized window
      mem.addData((ts(40), 1.0))
      q.processAllAvailable()
      val got = SnapshotTable.read(spark, t).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(got.get(0L).contains(4.0),
        s"finalized window [0,10) must hold 1.5+2.5: $got")
    } finally {
      q.stop(); rmrf(root)
    }
  }
}
