package graft

import java.io.ByteArrayOutputStream
import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Real-codec multimodal decode: JDK ImageIO / javax.sound parse actual
  * payload bytes; unparseable payloads degrade to the deterministic
  * descriptor the l15 oracle recomputes.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int, rgb: Int = 0x336699): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wav(sampleRate: Float, nFrames: Int): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val data = new Array[Byte](nFrames * fmt.getFrameSize)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real PNG decode: exact dimensions + normalized luminance histogram") {
    val d = Multimodal.decodeBytes(1L, "image", png(37, 21))
    assert(d.decoded && d.width == 37 && d.height == 21 && d.n_frames == 1)
    assert(math.abs(d.feature.sum - 1.0f) < 1e-4, "histogram must normalize to 1")
    // a uniform image puts all mass in one luminance bin
    assert(d.feature.count(_ > 0.99f) == 1)
  }

  test("real WAV decode: sample rate and frame count from the header") {
    val d = Multimodal.decodeBytes(2L, "audio", wav(22050f, 4410))
    assert(d.decoded && d.sample_rate == 22050 && d.n_frames == 4410)
  }

  test("corrupt payloads degrade to the deterministic descriptor, never throw") {
    val bytes = "not a media file".getBytes("UTF-8")
    val img = Multimodal.decodeBytes(3L, "image", bytes)
    assert(!img.decoded && img.width == 64 + bytes.length % 640 && img.n_frames == 1)
    val aud = Multimodal.decodeBytes(4L, "audio", bytes)
    assert(!aud.decoded && aud.sample_rate == 16000)
  }

  test("distributed decode handles mixed real + degraded payloads in one pass") {
    val media = Seq(
      (1L, "image", png(10, 8)),
      (2L, "audio", wav(8000f, 100)),
      (3L, "image", "garbage".getBytes("UTF-8")),
      (4L, "video", "novideo".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.decode(spark, media).collect().map(d => d.media_id -> d).toMap
    assert(out(1L).decoded && out(1L).width == 10 && out(1L).height == 8)
    assert(out(2L).decoded && out(2L).sample_rate == 8000)
    assert(!out(3L).decoded && !out(4L).decoded)
  }

  test("real resize re-encodes to the target dims; round-trips through decode") {
    val media = Seq((1L, png(64, 64)), (2L, "junk".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val resized = Multimodal.resize(spark, media, 16, 12).collect()
      .map(r => r.getLong(0) -> (r.getAs[Array[Byte]]("payload"), r.getBoolean(2))).toMap
    assert(resized(1L)._2, "real image resizes")
    val rt = Multimodal.decodeBytes(1L, "image", resized(1L)._1)
    assert(rt.decoded && rt.width == 16 && rt.height == 12)
    assert(!resized(2L)._2 && new String(resized(2L)._1) == "junk",
      "non-image passes through unchanged")
  }

  private def jpeg(seed: Int): Array[Byte] = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(Multimodal.testPatternPng(seed)))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("real MJPEG-AVI decode: frame count, first-frame dims, quarantine flag off") {
    val avi = Multimodal.buildMjpegAvi((1 to 5).map(jpeg))
    val d = Multimodal.decodeBytes(9L, "video", avi)
    assert(d.decoded, "MJPEG AVI is REAL-decoded, not degraded")
    assert(d.kind == "video" && d.n_frames == 5)
    assert(d.width == 64 && d.height == 64)
    assert(math.abs(d.feature.sum - 1.0f) < 1e-4)
    // non-AVI video bytes still degrade deterministically, never throw
    assert(!Multimodal.decodeBytes(10L, "video", "not a container".getBytes).decoded)
  }

  test("corrupt RIFF payloads terminate without throwing (crafted sizes, deep nesting, truncation)") {
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val hdr = "RIFF".getBytes("US-ASCII") ++ le32(0xffffffffL) ++ "AVI ".getBytes("US-ASCII")
    // u32 size 0xFFFFFFF8 once wrapped to -8 → offset never advanced
    val nonAdvancing = hdr ++ "00dc".getBytes ++ le32(0xfffffff8L) ++ Array[Byte](1, 2)
    // size 0xFFFFFF00 walked the cursor backward → negative indices
    val backward = hdr ++ "00dc".getBytes ++ le32(0xffffff00L) ++ Array[Byte](1, 2, 3, 4)
    // size near Int.MaxValue: dataStart + size overflowed Int
    val overflowing = hdr ++ "00dc".getBytes ++ le32(Int.MaxValue.toLong) ++ Array[Byte](1, 2)
    // 10k nested LISTs: unbounded recursion once StackOverflowError'd
    val deep = hdr ++ (1 to 10000).toArray.flatMap(_ =>
      "LIST".getBytes ++ le32(0x7fffff0L) ++ "rec ".getBytes)
    // truncated mid-header
    val truncated = hdr ++ "00dc".getBytes
    for (payload <- Seq(nonAdvancing, backward, overflowing, deep, truncated)) {
      val t0 = System.nanoTime()
      Multimodal.aviMjpegFrames(payload) // must return, not hang/throw
      assert(System.nanoTime() - t0 < 5e9, "corrupt payload parse must terminate fast")
      assert(!Multimodal.decodeBytes(1L, "video", payload).decoded,
        "corrupt video degrades to the deterministic fallback descriptor")
    }
    // a frame already collected before a truncated trailing chunk is kept
    val good = jpeg(1)
    val partial = "RIFF".getBytes ++ le32(good.length * 2 + 100L) ++ "AVI ".getBytes ++
      "LIST".getBytes ++ le32(good.length * 2 + 50L) ++ "movi".getBytes ++
      "00dc".getBytes ++ le32(good.length.toLong) ++ good ++
      "00dc".getBytes ++ le32(0xffffffffL) ++ Array[Byte](9)
    assert(Multimodal.aviMjpegFrames(partial).exists(_.size == 1),
      "frames before the corrupt tail survive")
  }

  test("real frame sampling: every stride-th frame's actual JPEG bytes, each decodable") {
    val media = Seq(
      (1L, Multimodal.buildMjpegAvi((1 to 6).map(jpeg))),
      (2L, "junk".getBytes("UTF-8"))).toDF("media_id", "payload")
    val sampled = Multimodal.sampleFrameBytes(spark, media, stride = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    assert(sampled.map(s => (s._1, s._2)).toSet == Set((1L, 0), (1L, 2), (1L, 4)),
      "stride-2 sampling over 6 frames; undecodable payloads absent")
    sampled.foreach { case (_, idx, bytes) =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == 64, s"frame $idx must be a real JPEG")
    }
  }

  /** Shared fixture (Multimodal.squareWav): peak = RMS = amp exactly. */
  private def squareWav(sampleRate: Float, nFrames: Int, amp: Short): Array[Byte] =
    Multimodal.squareWav(sampleRate, nFrames, amp)

  test("audio PCM features: integer-exact peak and RMS from real sample decode") {
    // square wave: every sample is ±amp, so peak = rms = amp exactly
    val (sr, n, peak, rms) = Multimodal.audioPcmFeatures(squareWav(16000f, 1000, 1234)).get
    assert(sr == 16000 && n == 1000L)
    assert(peak == 1234 && rms == 1234L, s"square wave: peak=$peak rms=$rms")
    // silence: both zero
    val (_, _, p0, r0) = Multimodal.audioPcmFeatures(wav(8000f, 100)).get
    assert(p0 == 0 && r0 == 0L)
    assert(Multimodal.audioPcmFeatures("not audio".getBytes("UTF-8")).isEmpty)
  }

  test("distributed audio features: decodable payloads only, exact values") {
    val media = Seq(
      (1L, squareWav(22050f, 64, 100)),
      (2L, "junk".getBytes("UTF-8")),
      (3L, squareWav(8000f, 32, 32000))).toDF("media_id", "payload")
    val out = Multimodal.audioFeatureFrame(spark, media).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4))).toMap
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L) == ((22050, 64L, 100, 100L)))
    assert(out(3L) == ((8000, 32L, 32000, 32000L)))
  }

  /** The cell-quantized deterministic test picture (Multimodal
    * .testPatternPng): a 16-px corner flip covers exactly 4 aHash cells.
    */
  private def patternPng(seed: Int, flip: Int = 0): Array[Byte] =
    Multimodal.testPatternPng(seed, flip)

  test("aHash64: deterministic, identical bytes hash equal, perturbation stays near") {
    val a = Multimodal.aHash64(patternPng(1)).get
    assert(Multimodal.aHash64(patternPng(1)).contains(a), "pure function of the pixels")
    val aFlip = Multimodal.aHash64(patternPng(1, flip = 16)).get
    val b = Multimodal.aHash64(patternPng(2)).get
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, aFlip) <= 4, s"corner flip moves few cells: ${ham(a, aFlip)}")
    assert(ham(a, b) > 12, s"different pattern is far: ${ham(a, b)}")
    assert(Multimodal.aHash64("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("image near-dup pairs: perturbed copy found within radius, distinct images not") {
    val media = Seq(
      (1L, patternPng(1)), (2L, patternPng(1, flip = 16)),
      (3L, patternPng(2)), (4L, patternPng(3)),
      (5L, "junk".getBytes("UTF-8"))).toDF("media_id", "payload")
    val hashed = Multimodal.imageAHash(spark, media)
    assert(hashed.count() == 4, "undecodable payloads are absent, not hashed")
    val pairs = Multimodal.imageNearDupPairs(hashed, maxHamming = 8, maxBucket = 10000)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"only the perturbed copy pairs up: $pairs")
  }
}
