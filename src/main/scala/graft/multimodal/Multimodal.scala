package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch
  * extractors. The decode step is STUBBED (media codecs are not in this
  * container) behind a deterministic fake — the Spark-side contract
  * (schema, partitioning, batch shape, typed Dataset plumbing) is real and
  * tested, and swapping `StubDecoder` for a JNI/FFI codec is a local
  * change. */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,       // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      payload_hash: Long,
      frames_sampled: Int,
      feature: Array[Float]) // stub embedding

  /** === STUB ===: a real implementation decodes the payload with an
    * image/audio library; this deterministic fake hashes byte windows so
    * tests can assert exact outputs and the pipeline shape is preserved.
    * Batch-shaped on purpose: one call per partition iterator, matching how
    * a native decoder would amortize model/codec initialization. */
  object StubDecoder {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val h = java.util.Arrays.hashCode(r.payload).toLong
        val dim = 8
        val feat = Array.tabulate(dim)(i =>
          (((h * (i + 1) + r.media_id) % 1000L) / 1000.0f))
        val frames = if (r.kind == "video")
          math.max(1, (r.duration_ms / 1000L).toInt) else 1
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, h,
          frames, feat)
      }
  }

  /** Distributed feature extraction: mapPartitions over the typed Dataset
    * (the Scala analogue of mapInPandas batch UDFs) — repartition first so
    * decode parallelism matches cores, independent of input file layout. */
  def extractFeatures(media: Dataset[MediaRow], numPartitions: Int = 0)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val p = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    media.repartition(p).mapPartitions(StubDecoder.decodeBatch)
  }

  /** Frame sampling for video rows: one output row per `intervalMs` of
    * duration (n_frames = max(1, floor(duration/interval)) — the same
    * count StubDecoder reports as frames_sampled). The payload decode is
    * what a codec would add; the row-multiplication plumbing (explode of a
    * sequence — codegen'd, no UDF) is the part that matters at 100 TB:
    * frame rows shuffle/partition like any table. */
  def frameSample(media: Dataset[MediaRow], intervalMs: Long = 1000L)
      : DataFrame =
    media.toDF().where(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L),
          greatest(lit(1L),
            floor(col("duration_ms") / intervalMs).cast("long")) - 1L))
          .as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * intervalMs).as("t_ms"))

  /** === STUB === resize: a real implementation decodes, resamples and
    * re-encodes the payload; the stub rewrites the typed metadata and
    * keeps the payload opaque. Batch-shaped like decodeBatch. */
  def resizeStub(media: Dataset[MediaRow], w: Int, h: Int)
      : Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(r => r.copy(width = w, height = h)))
  }

  /** Build a synthetic media table from the documents table (payload =
    * utf-8 bytes of the text) — exercises binary-column plumbing
    * deterministically without codec deps. */
  def mediaFromDocuments(spark: SparkSession, dir: String)
      : Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "utf-8").as("payload"),
      (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
      // 1500..10500 ms -> 1..10 sampled frames at EVERY sf (a pure
      // doc_id % 10000 duration gives sub-2s videos at small scales and
      // the frame-sampling row multiplication degenerates to 1 row each)
      (pmod(col("doc_id"), lit(10)) * 1000L + 1500L).as("duration_ms"))
      .as[MediaRow]
  }
}
