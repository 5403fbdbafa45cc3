package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch
  * extractors. ALL three modalities decode for real on pure-JVM codecs:
  * image via javax.imageio (since r3), audio via javax.sound.sampled
  * WAV/PCM (since r4), video via a RIFF/AVI demuxer + per-frame
  * javax.imageio JPEG decode — the Motion-JPEG layout, the one video
  * container a JVM can handle without native codecs (since r4).
  * `StubDecoder` remains only as the total-function fallback for
  * undecodable payloads and as the place a JNI/FFI codec for other
  * containers (H.264 etc.) would slot in — a local change either way. */
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

  /** Fallback decoder (since r4 no modality is stubbed BY DESIGN — image/
    * audio/video all have real pure-JVM decode paths): rows whose payloads
    * don't parse in their kind's real decoder land here, producing a
    * deterministic hash-derived fake so the extractor stays total and
    * tests can assert exact outputs. Also the seam where a JNI/FFI codec
    * for containers the JVM can't parse (H.264, Opus...) would slot in.
    * Batch-shaped on purpose: one call per partition iterator, matching
    * how a native decoder would amortize model/codec initialization. */
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

  /** REAL audio decode (pure JVM, javax.sound.sampled — WAV/PCM needs no
    * native codec): audio payloads that parse as a RIFF/WAVE stream
    * produce real features — decoded sample count, sample rate, RMS
    * amplitude, zero-crossing rate, duration (dim 8, same shape as the
    * stub embedding). Assumes 16-bit signed little-endian PCM (what
    * withRealAudioPayloads synthesizes and by far the most common WAV
    * layout); other layouts and undecodable bytes fall through to
    * StubDecoder, keeping the extractor total. */
  object AudioDecoder {
    def decodeOne(r: MediaRow): MediaFeatures = {
      if (r.kind != "audio") return StubDecoder.decodeOne(r)
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        catch { case _: Throwable => null }
      if (ais == null) return StubDecoder.decodeOne(r)
      val f = ais.getFormat
      if (f.getSampleSizeInBits != 16 || f.getChannels != 1 ||
          f.isBigEndian ||
          f.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return StubDecoder.decodeOne(r)
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      var i = 0
      var sumSq = 0.0
      var zc = 0L
      var prev = 0
      while (i < n) {
        val s = ((bytes(2 * i + 1).toInt << 8) |
          (bytes(2 * i) & 0xff)).toShort.toInt
        val v = s / 32768.0
        sumSq += v * v
        if (i > 0 && (s >= 0) != (prev >= 0)) zc += 1
        prev = s
        i += 1
      }
      val sr = f.getSampleRate
      val feat = Array(n.toFloat, sr,
        math.sqrt(sumSq / math.max(1, n)).toFloat,
        (zc.toDouble / math.max(1, n)).toFloat,
        (n / sr), 0f, 0f, 0f)
      MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
        java.util.Arrays.hashCode(r.payload).toLong, 1, feat)
    }
  }

  /** Minimal RIFF/AVI reader-writer for Motion-JPEG streams — the video
    * container+codec pair a JVM can handle without native libraries
    * (frames are plain JPEGs, decodable by javax.imageio; the container
    * is length-prefixed RIFF chunks). Little-endian throughout per the
    * RIFF spec. */
  private[graft] object Avi {
    private def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def rdLe32(b: Array[Byte], p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
    private def fourcc(b: Array[Byte], p: Int): String =
      new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Mux JPEG frames into a minimal AVI: RIFF('AVI ') { LIST hdrl
      * { avih, LIST strl { strh(vids/MJPG), strf(BITMAPINFOHEADER) } },
      * LIST movi { 00dc <jpeg> ... } }. */
    def mux(frames: Seq[Array[Byte]], w: Int, h: Int,
        usPerFrame: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def s(tag: String): Unit = bos.write(
        tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      def i32(v: Int): Unit = bos.write(le32(v))
      val maxFrame = frames.map(_.length).max
      // avih: 56-byte main header
      val avihTotal = 8 + 56
      val strhTotal = 8 + 56
      val strfTotal = 8 + 40
      val strlTotal = 12 + strhTotal + strfTotal
      val hdrlTotal = 12 + avihTotal + strlTotal
      val moviBody = frames.map(f => 8 + f.length + (f.length & 1)).sum
      val moviTotal = 12 + moviBody
      s("RIFF"); i32(4 + hdrlTotal + moviTotal); s("AVI ")
      s("LIST"); i32(4 + avihTotal + strlTotal); s("hdrl")
      s("avih"); i32(56)
      i32(usPerFrame); i32(0); i32(0); i32(0x10 /*HASINDEX off, 0x10=?*/)
      i32(frames.length); i32(0); i32(1); i32(maxFrame)
      i32(w); i32(h); i32(0); i32(0); i32(0); i32(0)
      s("LIST"); i32(4 + strhTotal + strfTotal); s("strl")
      s("strh"); i32(56)
      s("vids"); s("MJPG"); i32(0); i32(0); i32(0)
      i32(usPerFrame); i32(1000000) // dwScale/dwRate -> rate/scale fps
      i32(0); i32(frames.length); i32(maxFrame); i32(-1); i32(0)
      i32(0); i32(0) // rcFrame: 4 shorts = 8 bytes
      s("strf"); i32(40)
      i32(40); i32(w); i32(h); bos.write(Array[Byte](1, 0, 24, 0))
      s("MJPG"); i32(w * h * 3); i32(0); i32(0); i32(0); i32(0)
      s("LIST"); i32(4 + moviBody); s("movi")
      frames.foreach { f =>
        s("00dc"); i32(f.length); bos.write(f)
        if ((f.length & 1) == 1) bos.write(0)
      }
      bos.toByteArray
    }

    /** Demux: returns (microseconds per frame, JPEG frame payloads), or
      * None when the bytes aren't a RIFF/AVI stream. Walks top-level
      * chunks; reads dwMicroSecPerFrame from avih inside LIST hdrl and
      * collects compressed-video chunks (fourcc *dc / *db) inside LIST
      * movi. Bounds-checked so truncated/garbage buffers return None
      * instead of throwing. */
    def demux(b: Array[Byte]): Option[(Int, Seq[Array[Byte]])] = {
      if (b.length < 12 || fourcc(b, 0) != "RIFF" ||
        fourcc(b, 8) != "AVI ") return None
      var usPerFrame = 0
      val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      var p = 12
      while (p + 8 <= b.length) {
        val tag = fourcc(b, p)
        val len = rdLe32(b, p + 4)
        if (len < 0 || p + 8 + len > b.length) return None
        if (tag == "LIST" && len >= 4) {
          val listType = fourcc(b, p + 8)
          if (listType == "hdrl") {
            // avih is the first sub-chunk of hdrl
            if (p + 12 + 8 + 4 <= b.length && fourcc(b, p + 12) == "avih")
              usPerFrame = rdLe32(b, p + 12 + 8)
          } else if (listType == "movi") {
            var q = p + 12
            val end = p + 8 + len
            while (q + 8 <= end) {
              val ft = fourcc(b, q)
              val fl = rdLe32(b, q + 4)
              if (fl < 0 || q + 8 + fl > end) return None
              if (ft.endsWith("dc") || ft.endsWith("db"))
                frames += java.util.Arrays.copyOfRange(b, q + 8, q + 8 + fl)
              q += 8 + fl + (fl & 1)
            }
          }
        }
        p += 8 + len + (len & 1)
      }
      if (usPerFrame <= 0 || frames.isEmpty) None
      else Some((usPerFrame, frames.toSeq))
    }
  }

  /** REAL video decode (pure JVM): RIFF/AVI demux + per-frame
    * javax.imageio JPEG decode (Motion-JPEG — each frame is an
    * independent JPEG, the layout `withRealVideoPayloads` muxes). Real
    * features: frame count, decoded width/height, fps from the container
    * header, mean luminance across frames, and mean |Δ frame luminance|
    * (a motion proxy that is zero iff frames are identical — proving the
    * path decodes every frame's pixels, not just the header). Undecodable
    * payloads and non-AVI containers fall through to StubDecoder, keeping
    * the extractor total. */
  object VideoDecoder {
    def decodeOne(r: MediaRow): MediaFeatures = {
      if (r.kind != "video") return StubDecoder.decodeOne(r)
      val parsed = try Avi.demux(r.payload) catch { case _: Throwable => None }
      parsed match {
        case None => StubDecoder.decodeOne(r)
        case Some((usPerFrame, frameBytes)) =>
          var w = 0; var h = 0
          var prevLum = Double.NaN
          var lumSum = 0.0
          var motionSum = 0.0
          var n = 0
          frameBytes.foreach { fb =>
            val img =
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(fb))
              catch { case _: Throwable => null }
            if (img != null) {
              if (n == 0) { w = img.getWidth; h = img.getHeight }
              var sum = 0.0
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  sum += (0.299 * ((rgb >> 16) & 0xff)
                    + 0.587 * ((rgb >> 8) & 0xff)
                    + 0.114 * (rgb & 0xff)) / 255.0
                  x += 1
                }
                y += 1
              }
              val lum = sum / (img.getWidth.toLong * img.getHeight)
              lumSum += lum
              if (n > 0) motionSum += math.abs(lum - prevLum)
              prevLum = lum
              n += 1
            }
          }
          if (n == 0) return StubDecoder.decodeOne(r)
          val fps = 1e6 / usPerFrame
          val feat = Array(n.toFloat, w.toFloat, h.toFloat, fps.toFloat,
            (lumSum / n).toFloat,
            (if (n > 1) motionSum / (n - 1) else 0.0).toFloat, 0f, 0f)
          MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
            java.util.Arrays.hashCode(r.payload).toLong, n, feat)
      }
    }
  }

  /** Total per-row decoder dispatch: REAL image decode (javax.imageio),
    * REAL audio decode (javax.sound.sampled), REAL video decode
    * (RIFF/AVI + Motion-JPEG frames) — StubDecoder only as the
    * undecodable-payload fallback inside each. */
  object Decoders {
    def decodeOne(r: MediaRow): MediaFeatures = r.kind match {
      case "image" => ImageDecoder.decodeOne(r)
      case "audio" => AudioDecoder.decodeOne(r)
      case "video" => VideoDecoder.decodeOne(r)
      case _       => StubDecoder.decodeOne(r)
    }
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map(decodeOne)
  }

  /** Deterministic WAV payloads for audio rows (synthesize a sine wave
    * whose frequency is derived from media_id, encode as 16-bit mono PCM
    * RIFF/WAVE via javax.sound.sampled): gives the REAL audio decode path
    * real bytes without external media files — the audio analogue of
    * withRealImagePayloads. */
  def withRealAudioPayloads(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      if (r.kind != "audio") r
      else {
        val srInt = 8000
        // exact integer sample count — float duration_ms * rate math
        // loses integer precision past 2^24
        val n = (r.duration_ms * srInt / 1000L).toInt
        val freq = 200.0 + (r.media_id % 17) * 40.0
        val amp = 0.5
        val bytes = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = (math.sin(2 * math.Pi * freq * i / srInt) * amp
            * 32767.0).toInt
          bytes(2 * i) = (s & 0xff).toByte
          bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          srInt.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        r.copy(payload = bos.toByteArray)
      }
    })
  }

  /** Deterministic AVI/Motion-JPEG payloads for video rows: synthesize
    * duration_ms * 4fps / 1000 frames (1500..10500 ms metadata -> 6..42
    * frames), each a width x height JPEG whose mean gray level ramps with
    * the frame index (so frame-to-frame luminance delta — the decoder's
    * motion feature — is provably nonzero), muxed by `Avi.mux`. Gives the
    * REAL video decode path real container + codec bytes without external
    * media files — the video analogue of withRealAudioPayloads. */
  def withRealVideoPayloads(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      if (r.kind != "video") r
      else {
        val fps = 4
        val n = math.max(1, (r.duration_ms * fps / 1000L).toInt)
        val frames = (0 until n).map { f =>
          val img = new java.awt.image.BufferedImage(
            r.width, r.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < r.height) {
            var x = 0
            while (x < r.width) {
              // per-frame gray ramp: texture from (x,y), mean from f
              val v = ((x * 31 + y * 17 + r.media_id) % 128 +
                (f * 97) % 128).toInt
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", bos)
          bos.toByteArray
        }
        r.copy(payload = Avi.mux(frames, r.width, r.height,
          1000000 / fps))
      }
    })
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
    * Image rows take the REAL javax.imageio decode path, audio rows the
    * REAL javax.sound.sampled WAV decode path, and video rows the REAL
    * RIFF/AVI MJPEG demux + per-frame JPEG decode — each falling back to
    * the stub only on undecodable bytes. */
  def extractFeatures(media: Dataset[MediaRow], numPartitions: Int = 0)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val p = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    media.repartition(p).mapPartitions(Decoders.decodeBatch)
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

  /** REAL image resize (decode -> java.awt bilinear rescale -> re-encode
    * PNG) for image rows with decodable payloads; non-image kinds and
    * undecodable bytes keep the metadata-rewrite behavior (payload
    * opaque) so the transform is total. Batch-shaped like decodeBatch;
    * was a declared stub through r3. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int)
      : Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val img =
        if (r.kind != "image") null
        else try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        catch { case _: Throwable => null }
      if (img == null) r.copy(width = w, height = h)
      else {
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        r.copy(payload = bos.toByteArray, width = w, height = h)
      }
    })
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
