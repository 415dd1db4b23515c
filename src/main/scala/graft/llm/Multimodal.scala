package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling: media ride along as opaque `binary` columns with
 * a typed metadata struct; decode / feature-extraction runs batched per
 * partition so a real decoder (JNI image lib, or `mapInPandas` on the PySpark
 * side) can amortize setup per-batch, not per-row.
 *
 * The container has no image/audio libraries, so [[FakeDecoder]] is a
 * clearly-marked deterministic stand-in: the Spark-side plumbing — schema,
 * batch shape, partition-wise iteration, feature schema — is real and tested;
 * only the innermost decode math is fake.
 */
object Multimodal {

  /** A media row: opaque bytes + typed metadata. */
  case class MediaRow(
      doc_id: Long,
      media_type: String, // "image" | "audio" | "video"
      content: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int)

  /** Extracted features (what a decode/resize/frame-sample stage emits). */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      content_sha: String,
      // decoded-feature stand-ins (mean "pixel", n "frames")
      mean_value: Double,
      n_frames: Int)

  /** Batched decoder contract — one call per partition-batch, not per row. */
  trait MediaDecoder extends Serializable {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures]
  }

  /**
   * Deterministic fake decoder (STUB — a real build plugs libjpeg/ffmpeg or a
   * Pandas UDF here). Features are pure functions of the bytes so tests and
   * the DuckDB oracle can reproduce them.
   */
  object FakeDecoder extends MediaDecoder {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = rows.map { r =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(r.content).map("%02x".format(_)).mkString
      val mean =
        if (r.content.isEmpty) 0.0
        else r.content.map(b => (b & 0xFF).toLong).sum.toDouble / r.content.length
      MediaFeatures(r.doc_id, r.media_type, r.content.length.toLong, sha,
        math.rint(mean * 100) / 100, r.content.length / 64 + 1)
    }
  }

  /**
   * REAL decoder for the container-formats that need no external library —
   * plain byte parsing of the published file layouts:
   *
   *  - PPM (P6): ASCII header `P6 <w> <h> <maxval>` + raw RGB triplets;
   *  - BMP (BITMAPINFOHEADER, uncompressed 24 bpp): little-endian header,
   *    BGR pixel rows padded to 4 bytes, bottom-up when height > 0;
   *  - WAV (RIFF/PCM 16-bit): `fmt ` chunk (channels, sample rate, bits),
   *    `data` chunk of little-endian int16 samples.
   *
   * Compressed IMAGE formats (JPEG / PNG / GIF) decode through
   * `javax.imageio` — JDK standard library, headless, no external
   * dependency (the JDK ships pure-Java plugins for all three), with GIF
   * frame counts read as n_frames (the frame-sample stage's input).
   *
   * Compressed AUDIO/VIDEO decode their METADATA layers byte-level — the
   * part a frame-sample / duration / shard-planning stage actually needs:
   *  - MP3: ID3v2 skip, MPEG frame-header walk (version/layer/bitrate/
   *    samplerate tables, padding), n_frames = frame count and
   *    mean_value = duration in seconds;
   *  - H.264 Annex B: start-code NAL walk, n_frames = VCL NALs
   *    (types 1-5), mean_value = keyframe (IDR) fraction.
   * Only the SAMPLE decode itself (what needs libmpg123/ffmpeg-class
   * codecs) stays environment-bound; undecodable bytes fall back to
   * [[FakeDecoder]]'s byte statistics, keeping the batch contract total.
   *
   * Features: images → mean luminance ((r+g+b)/3 averaged over pixels,
   * 0..255); PCM audio → RMS amplitude normalized to [0,1], n_frames =
   * samples per channel.
   */
  object RealDecoder extends MediaDecoder {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = rows.map { r =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(r.content).map("%02x".format(_)).mkString
      val b = r.content
      // total function: ANY malformed-header surprise (overflowed offsets,
      // truncated chunks) degrades to the byte-stat fallback — a media blob
      // must never kill the task
      val decoded: Option[(Double, Int)] =
        try {
          if (b.length >= 2 && b(0) == 'P' && b(1) == '6') decodePpm(b)
          else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') decodeBmp(b)
          else if (b.length >= 12 && new String(b, 0, 4, "US-ASCII") == "RIFF" &&
            new String(b, 8, 4, "US-ASCII") == "WAVE") decodeWav(b)
          else if (isJpeg(b) || isPng(b) || isGif(b)) decodeImageIo(b)
          else if (isMp3(b)) decodeMp3Meta(b)
          else if (isAnnexB(b)) decodeH264Meta(b)
          else None
        } catch { case scala.util.control.NonFatal(_) => None }
      decoded match {
        case Some((mean, frames)) =>
          MediaFeatures(r.doc_id, r.media_type, b.length.toLong, sha,
            math.rint(mean * 100) / 100, frames)
        case None => // compressed/unknown → deterministic byte-stat fallback
          FakeDecoder.decodeBatch(Iterator(r)).next()
      }
    }

    private def isMp3(b: Array[Byte]): Boolean =
      (b.length >= 3 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
        (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0)
    private def isAnnexB(b: Array[Byte]): Boolean =
      (b.length >= 4 && b(0) == 0 && b(1) == 0 &&
        (b(2) == 1 || (b(2) == 0 && b(3) == 1)))

    // MPEG audio frame-header tables (public layout). Indexed by the
    // 4-bit bitrate field and 2-bit samplerate field.
    private val mp3BitrateV1L3 = // MPEG-1 Layer III, kbps (0 = free, 15 = bad)
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
    private val mp3BitrateV2L3 = // MPEG-2/2.5 Layer III
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, -1)
    private val mp3SampleRateV1 = Array(44100, 48000, 32000, -1)

    /**
     * MP3 metadata walk: skip ID3v2 (syncsafe size), then step frame to
     * frame via the header length formula. Returns
     * (duration seconds, frame count) — no sample decode.
     */
    private[llm] def decodeMp3Meta(b: Array[Byte]): Option[(Double, Int)] = {
      var i = 0
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
          ((b(8) & 0x7f) << 7) | (b(9) & 0x7f) // syncsafe int
        i = 10 + size
      }
      var frames = 0
      var seconds = 0.0
      while (i + 4 <= b.length) {
        if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xe0) == 0xe0) {
          val versionBits = (b(i + 1) >> 3) & 3 // 3 = MPEG1, 2 = MPEG2, 0 = MPEG2.5
          val layerBits = (b(i + 1) >> 1) & 3 // 1 = Layer III
          val bitrateIdx = (b(i + 2) >> 4) & 0xf
          val srIdx = (b(i + 2) >> 2) & 3
          val padding = (b(i + 2) >> 1) & 1
          if (layerBits != 1 || srIdx == 3 || bitrateIdx == 0 || bitrateIdx == 15 ||
            versionBits == 1) return if (frames > 0) Some((rnd(seconds), frames)) else None
          val mpeg1 = versionBits == 3
          val bitrate = (if (mpeg1) mp3BitrateV1L3 else mp3BitrateV2L3)(bitrateIdx) * 1000
          val sampleRate = mp3SampleRateV1(srIdx) / (versionBits match {
            case 3 => 1
            case 2 => 2
            case _ => 4 // MPEG-2.5
          })
          val samplesPerFrame = if (mpeg1) 1152 else 576
          val frameLen = samplesPerFrame / 8 * bitrate / sampleRate + padding
          if (frameLen <= 4) return if (frames > 0) Some((rnd(seconds), frames)) else None
          frames += 1
          seconds += samplesPerFrame.toDouble / sampleRate
          i += frameLen
        } else if (frames == 0) i += 1 // resync before the first frame only
        else return Some((rnd(seconds), frames)) // trailing junk (e.g. ID3v1)
      }
      if (frames > 0) Some((rnd(seconds), frames)) else None
    }
    private def rnd(d: Double): Double = math.rint(d * 100) / 100

    /**
     * H.264 Annex B metadata walk: NAL units split on 3/4-byte start
     * codes; n_frames = VCL NALs (nal_unit_type 1..5), mean = IDR
     * (keyframe, type 5) fraction of VCL NALs — no slice decode.
     */
    private[llm] def decodeH264Meta(b: Array[Byte]): Option[(Double, Int)] = {
      var vcl = 0
      var idr = 0
      var i = 0
      var sawNal = false
      while (i + 3 < b.length) {
        if (b(i) == 0 && b(i + 1) == 0 &&
          (b(i + 2) == 1 || (b(i + 2) == 0 && i + 4 < b.length && b(i + 3) == 1))) {
          val hdr = i + (if (b(i + 2) == 1) 3 else 4)
          if (hdr < b.length) {
            sawNal = true
            val nalType = b(hdr) & 0x1f
            if (nalType >= 1 && nalType <= 5) {
              vcl += 1
              if (nalType == 5) idr += 1
            }
          }
          i = hdr + 1
        } else i += 1
      }
      if (!sawNal || vcl == 0) None
      else Some((rnd(idr.toDouble / vcl), vcl))
    }

    private def isJpeg(b: Array[Byte]): Boolean =
      b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff
    private def isPng(b: Array[Byte]): Boolean =
      b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    private def isGif(b: Array[Byte]): Boolean =
      b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'

    /** JPEG/PNG/GIF via the JDK's ImageIO (headless, no external libs):
     * mean (r+g+b)/3 luminance over the first frame; n_frames = animation
     * frame count (GIF) else 1. */
    private[llm] def decodeImageIo(b: Array[Byte]): Option[(Double, Int)] = {
      val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(b))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(in, false, true)
          val frames = try math.max(1, reader.getNumImages(true)) catch {
            case scala.util.control.NonFatal(_) => 1
          }
          val img = reader.read(0)
          val (w, h) = (img.getWidth, img.getHeight)
          if (w <= 0 || h <= 0) return None
          var sum = 0L
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val px = row(x)
              sum += ((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)
              x += 1
            }
            y += 1
          }
          Some((sum.toDouble / (w.toLong * h * 3), frames))
        } finally reader.dispose()
      } finally in.close()
    }

    private def u16le(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def i32le(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

    /** P6: header tokens (with `#` comments), then w*h RGB triplets. */
    private[llm] def decodePpm(b: Array[Byte]): Option[(Double, Int)] = {
      var i = 2
      def token(): Option[Int] = {
        while (i < b.length && (b(i).toChar.isWhitespace || b(i) == '#')) {
          if (b(i) == '#') while (i < b.length && b(i) != '\n') i += 1
          else i += 1
        }
        val start = i
        while (i < b.length && !b(i).toChar.isWhitespace) i += 1
        if (start == i) None else Some(new String(b, start, i - start, "US-ASCII").toInt)
      }
      for {
        w <- token(); h <- token(); maxVal <- token()
        if maxVal == 255 && w > 0 && h > 0
        pixelStart = i + 1 // single whitespace after maxval
        if b.length >= pixelStart + w * h * 3
      } yield {
        var sum = 0L
        var p = pixelStart
        val end = pixelStart + w * h * 3
        while (p < end) { sum += (b(p) & 0xff); p += 1 }
        (sum.toDouble / (w * h * 3), 1)
      }
    }

    /** BITMAPINFOHEADER, biCompression=0, 24 bpp, 4-byte-padded BGR rows. */
    private[llm] def decodeBmp(b: Array[Byte]): Option[(Double, Int)] = {
      if (b.length < 54) return None
      val dataOffset = i32le(b, 10)
      val w = i32le(b, 18)
      val hRaw = i32le(b, 22)
      val h = math.abs(hRaw)
      val bpp = u16le(b, 28)
      val compression = i32le(b, 30)
      if (bpp != 24 || compression != 0 || w <= 0 || h == 0) return None
      // bounds math in Long: a forged header (w,h ~ 40000) overflows Int and
      // would defeat the guard → ArrayIndexOutOfBounds instead of fallback
      val rowBytes = ((w.toLong * 3 + 3) / 4) * 4 // each row padded to 4 bytes
      if (dataOffset < 0 || b.length.toLong < dataOffset.toLong + rowBytes * h) return None
      var sum = 0L
      var row = 0
      while (row < h) {
        var p = (dataOffset + row * rowBytes).toInt // guard above proves it fits
        val end = p + w * 3 // padding bytes excluded from the mean
        while (p < end) { sum += (b(p) & 0xff); p += 1 }
        row += 1
      }
      Some((sum.toDouble / (w.toLong * h * 3), 1))
    }

    /** RIFF/WAVE with PCM (format 1) 16-bit samples → (RMS in [0,1], frames). */
    private[llm] def decodeWav(b: Array[Byte]): Option[(Double, Int)] = {
      var i = 12
      var channels = 0
      var bits = 0
      var fmtOk = false
      var result: Option[(Double, Int)] = None
      while (i + 8 <= b.length && result.isEmpty) {
        val id = new String(b, i, 4, "US-ASCII")
        val size = i32le(b, i + 4)
        // a forged/corrupt negative chunk size would advance i by <= 0 —
        // an infinite loop in an executor task; treat as malformed
        if (size < 0) return None
        if (id == "fmt " && i + 8 + 16 <= b.length) {
          fmtOk = u16le(b, i + 8) == 1 // PCM
          channels = u16le(b, i + 10)
          bits = u16le(b, i + 22)
        } else if (id == "data" && fmtOk && bits == 16 && channels > 0) {
          val n = math.min(size, b.length - i - 8) / 2
          var sumSq = 0.0
          var s = 0
          while (s < n) {
            val v = u16le(b, i + 8 + s * 2).toShort / 32768.0
            sumSq += v * v
            s += 1
          }
          result = Some((if (n == 0) 0.0 else math.sqrt(sumSq / n), n / channels))
        }
        i += 8 + size + (size & 1) // RIFF chunks are 2-byte aligned
      }
      result
    }
  }

  /**
   * Synthesize a media table from the documents table (deterministic: bytes =
   * UTF-8 of text). Stands in for `spark.read.format("binaryFile")`.
   */
  def mediaFromDocuments(docs: DataFrame): DataFrame = docs.select(
    col("doc_id"),
    element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
    encode(col("text"), "UTF-8").as("content"),
    lit(64).as("width"), lit(64).as("height"), lit(16000).as("sample_rate"))

  /**
   * Partition-batched feature extraction. `repartition` first if media blobs
   * are large relative to `spark.sql.files.maxPartitionBytes` — each task
   * should hold one decoder instance and a bounded batch in memory.
   */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(it => decoder.decodeBatch(it))
  }
}
