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

  /** === STUB === (audio/video only, since round 3): a real
    * implementation decodes the payload with an audio/video codec; this
    * deterministic fake hashes byte windows so tests can assert exact
    * outputs and the pipeline shape is preserved. Batch-shaped on purpose:
    * one call per partition iterator, matching how a native decoder would
    * amortize model/codec initialization. */
  object StubDecoder {
    def decodeOne(r: MediaRow): MediaFeatures = {
      val h = java.util.Arrays.hashCode(r.payload).toLong
      val dim = 8
      val feat = Array.tabulate(dim)(i =>
        (((h * (i + 1) + r.media_id) % 1000L) / 1000.0f))
      val frames = if (r.kind == "video")
        math.max(1, (r.duration_ms / 1000L).toInt) else 1
      MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, h,
        frames, feat)
    }
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map(decodeOne)
  }

  /** REAL image decode (pure JVM, javax.imageio — no native codecs
    * needed): image payloads that parse as PNG/JPEG/BMP/GIF produce real
    * features — decoded width, height, mean luminance and a 5-bin
    * luminance histogram (dim 8, same shape as the stub embedding).
    * Non-image kinds and undecodable image bytes fall through to
    * StubDecoder, so the extractor is total either way. */
  object ImageDecoder {
    def decodeOne(r: MediaRow): MediaFeatures = {
      if (r.kind != "image") return StubDecoder.decodeOne(r)
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        catch { case _: Throwable => null }
      if (img == null) return StubDecoder.decodeOne(r)
      val w = img.getWidth
      val h = img.getHeight
      val hist = new Array[Long](5)
      var lumSum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (0.299 * ((rgb >> 16) & 0xff)
            + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)) / 255.0
          lumSum += lum
          hist(math.min(4, (lum * 5).toInt)) += 1
          x += 1
        }
        y += 1
      }
      val n = (w * h).toDouble
      val feat = Array(w.toFloat, h.toFloat, (lumSum / n).toFloat) ++
        hist.map(c => (c / n).toFloat)
      MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
        java.util.Arrays.hashCode(r.payload).toLong, 1, feat)
    }
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map(decodeOne)
  }

  /** Deterministic PNG payloads for image rows (render + encode via
    * javax.imageio, batch-shaped like a real transcoder): gives the REAL
    * decode path real bytes to chew on without external media files. */
  def withRealImagePayloads(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      if (r.kind != "image") r
      else {
        val img = new java.awt.image.BufferedImage(
          r.width, r.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < r.height) {
          var x = 0
          while (x < r.width) {
            img.setRGB(x, y,
              ((x * 31 + y * 17 + r.media_id) & 0xffffffL).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        r.copy(payload = bos.toByteArray)
      }
    })
  }

  /** Distributed feature extraction: mapPartitions over the typed Dataset
    * (the Scala analogue of mapInPandas batch UDFs) — repartition first so
    * decode parallelism matches cores, independent of input file layout.
    * Image rows take the REAL javax.imageio decode path (falling back to
    * the stub on undecodable bytes); audio/video stay stubbed (no codecs
    * in this container). */
  def extractFeatures(media: Dataset[MediaRow], numPartitions: Int = 0)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val p = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    media.repartition(p).mapPartitions(ImageDecoder.decodeBatch)
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
