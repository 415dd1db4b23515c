package graft.llm

import graft.SparkSpec

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/**
 * Real byte-parsing decoders for library-free media formats (PPM/BMP/WAV),
 * the batch contract, and the fallback for compressed formats.
 */
class MultimodalSpec extends SparkSpec {
  import Multimodal._

  private def ppm2x2: Array[Byte] = {
    // pixels (255,0,0) (0,255,0) (0,0,255) (255,255,255) → mean 1530/12 = 127.5
    val px = Array[Int](255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte)
    "P6\n# comment line\n2 2\n255\n".getBytes(US_ASCII) ++ px
  }

  private def bmp2x2(value: Int): Array[Byte] = {
    val rowBytes = 8 // 2 px × 3 B = 6, padded to 8
    val buf = ByteBuffer.allocate(54 + rowBytes * 2).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * 2)
      .putShort(0).putShort(0).putInt(54) // data offset
    buf.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(rowBytes * 2).putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until 2).foreach { _ =>
      (0 until 6).foreach(_ => buf.put(value.toByte))
      buf.putShort(0) // row padding — must NOT enter the mean
    }
    buf.array()
  }

  private def wavPcm16(samples: Seq[Short], channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen).put("WAVE".getBytes(US_ASCII))
    buf.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(16000)
      .putInt(16000 * channels * 2).putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes(US_ASCII)).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  private def feats(mediaType: String, bytes: Array[Byte]): MediaFeatures =
    RealDecoder.decodeBatch(Iterator(
      MediaRow(1L, mediaType, bytes, 2, 2, 16000))).next()

  test("ppm: header with comments parses; mean luminance exact") {
    val f = feats("image", ppm2x2)
    assert(f.mean_value == 127.5 && f.n_frames == 1)
  }

  test("bmp: 24bpp rows decode; 4-byte row padding excluded from the mean") {
    val f = feats("image", bmp2x2(100))
    assert(f.mean_value == 100.0 && f.n_frames == 1)
    // padding bytes are zeros: including them would drag the mean to 75
  }

  test("wav: PCM16 RMS amplitude and per-channel frame count") {
    val f = feats("audio", wavPcm16(Seq(16384, -16384, 0, 32767)))
    assert(f.mean_value == 0.61) // sqrt((0.25+0.25+0+~1)/4) rounded 2dp
    assert(f.n_frames == 4)
    val stereo = feats("audio", wavPcm16(Seq(100, 100, 100, 100), channels = 2))
    assert(stereo.n_frames == 2) // frames = samples / channels
  }

  test("malformed headers degrade to the fallback — never hang or crash the task") {
    // WAV with a negative chunk size: 'i += 8 + size' would otherwise spin forever
    val evilWav = {
      val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes(US_ASCII)).putInt(16).put("WAVE".getBytes(US_ASCII))
      b.put("fmt ".getBytes(US_ASCII)).putInt(-8) // forged negative size
      b.array()
    }
    // BMP with 40000x40000 dims: Int bounds math would overflow past the guard
    val evilBmp = {
      val b = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54).putShort(0).putShort(0).putInt(54)
      b.putInt(40).putInt(40000).putInt(40000).putShort(1).putShort(24).putInt(0)
      b.array()
    }
    Seq(evilWav, evilBmp).foreach { evil =>
      val real = feats("image", evil)
      val fake = FakeDecoder.decodeBatch(Iterator(
        MediaRow(1L, "image", evil, 2, 2, 16000))).next()
      assert(real == fake) // fell back; and the test finishing proves no hang
    }
  }

  test("jpeg/png/gif decode through the JDK's ImageIO — real pixels, real frames") {
    import java.awt.image.BufferedImage
    // a flat gray 16x8 image: mean luminance known exactly
    val img = new BufferedImage(16, 8, BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(y => (0 until 16).foreach(x => img.setRGB(x, y, 0x646464))) // 100,100,100
    def encode(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val png = feats("image", encode("png"))
    assert(png.mean_value == 100.0 && png.n_frames == 1) // lossless: exact
    val gif = feats("image", encode("gif"))
    assert(gif.mean_value == 100.0 && gif.n_frames == 1)
    val jpg = feats("image", encode("jpeg"))
    assert(math.abs(jpg.mean_value - 100.0) < 3.0, s"jpeg mean ${jpg.mean_value}") // lossy: close
    assert(jpg.n_frames == 1)
    // truncated JPEG degrades to the byte-stat fallback, never crashes
    val broken = encode("jpeg").take(20)
    val fake = FakeDecoder.decodeBatch(Iterator(
      MediaRow(1L, "image", broken, 2, 2, 16000))).next()
    assert(feats("image", broken) == fake)
  }

  test("mp3: ID3v2 skip + frame-header walk yields duration and frame count") {
    // MPEG-1 Layer III, 128 kbps, 44100 Hz, no padding:
    // frameLen = 1152/8 * 128000 / 44100 = 417 bytes; header FF FB 90 00
    def mp3(frames: Int, id3: Boolean): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      if (id3) {
        out.write("ID3".getBytes(US_ASCII))
        out.write(Array[Byte](4, 0, 0)) // version + flags
        out.write(Array[Byte](0, 0, 0, 100)) // syncsafe size = 100
        out.write(new Array[Byte](100))
      }
      (1 to frames).foreach { _ =>
        val frame = new Array[Byte](417)
        frame(0) = 0xff.toByte; frame(1) = 0xfb.toByte // MPEG1 L3, no CRC
        frame(2) = 0x90.toByte // bitrate idx 9 (128k), sr idx 0 (44100)
        out.write(frame)
      }
      out.toByteArray
    }
    val f = feats("audio", mp3(38, id3 = true)) // ≈ 38*1152/44100 = 0.99 s
    assert(f.n_frames == 38)
    assert(f.mean_value == 0.99)
    val bare = feats("audio", mp3(5, id3 = false))
    assert(bare.n_frames == 5)
    // truncated garbage after valid frames: counted frames survive
    val trailing = mp3(3, id3 = false) ++ Array[Byte](0x12, 0x34)
    assert(feats("audio", trailing).n_frames == 3)
  }

  test("h264: annex-b NAL walk counts VCL frames and keyframe fraction") {
    def nal(nalType: Int, long: Boolean = false): Array[Byte] = {
      val start = if (long) Array[Byte](0, 0, 0, 1) else Array[Byte](0, 0, 1)
      start ++ Array[Byte]((0x60 | nalType).toByte, 0x11, 0x22)
    }
    // SPS(7) PPS(8) IDR(5) P(1) P(1) P(1) IDR(5) P(1) → 6 VCL, 2 IDR
    val stream = nal(7, long = true) ++ nal(8) ++ nal(5) ++ nal(1) ++
      nal(1, long = true) ++ nal(1) ++ nal(5) ++ nal(1)
    val f = feats("video", stream)
    assert(f.n_frames == 6)
    assert(f.mean_value == 0.33) // 2/6 keyframes, rounded 2dp
    // SPS/PPS only (no VCL) falls back
    val noVcl = nal(7) ++ nal(8)
    val fake = FakeDecoder.decodeBatch(Iterator(
      MediaRow(1L, "video", noVcl, 2, 2, 16000))).next()
    assert(feats("video", noVcl) == fake)
  }

  test("compressed/unknown bytes fall back to the deterministic byte-stat stub") {
    val junk = Array[Byte](0x1f, 0x2e, 0x3d, 0x4c)
    val real = feats("image", junk)
    val fake = FakeDecoder.decodeBatch(Iterator(
      MediaRow(1L, "image", junk, 2, 2, 16000))).next()
    assert(real == fake) // total function, same contract
  }

  test("extractFeatures e2e: real decoder through the partition-batched path") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "image", ppm2x2, 2, 2, 0),
      MediaRow(2L, "audio", wavPcm16(Seq(0, 0)), 0, 0, 16000),
      MediaRow(3L, "video", Array[Byte](9, 9, 9), 0, 0, 0)).toDF()
    val out = Multimodal.extractFeatures(media, RealDecoder)
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).mean_value == 127.5)
    assert(out(2L).mean_value == 0.0 && out(2L).n_frames == 2)
    assert(out(3L).n_bytes == 3) // fallback path still emits features
  }
}
