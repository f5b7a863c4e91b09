package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(rows: (Long, String, String)*) =
    rows.toSeq.map { case (id, kind, s) =>
      Multimodal.MediaRow(id, kind, s.getBytes(StandardCharsets.UTF_8))
    }.toDS()

  test("scan-side metadata: byte length and stable content hash on BINARY") {
    val df = media((1L, "image", "abcd"), (2L, "image", "日本語")).toDF()
    val got = df.select(col("media_id"), Multimodal.nBytes(col("content")).as("n"),
      Multimodal.contentHash(col("content")).as("h"))
      .orderBy("media_id").collect()
    assert(got(0).getLong(1) == 4L)
    assert(got(1).getLong(1) == 9L) // 3 chars x 3 bytes utf-8
    val again = df.select(Multimodal.contentHash(col("content"))).collect()
    assert(got.map(_.getLong(2)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("fake image metadata and embedding have the contracted shape and are deterministic") {
    val df = media((1L, "image", "payload-one"), (2L, "image", "payload-two")).toDF()
    val m = df.select(Multimodal.fakeImageMeta(col("content")).as("m")).collect()
    m.foreach { r =>
      val s = r.getStruct(0)
      assert(s.getInt(0) >= 1 && s.getInt(0) <= 1920) // width
      assert(s.getInt(1) >= 1 && s.getInt(1) <= 1080) // height
      assert(s.getInt(2) >= 1 && s.getInt(2) <= 3)    // channels
    }
    val e = df.select(Multimodal.fakeEmbedding(col("content")).as("e"))
      .as[Seq[Float]].collect()
    assert(e.forall(_.length == 64))
    assert(e.forall(_.forall(v => v >= -1.0f && v <= 1.0f)))
    assert(e(0) != e(1), "different payloads must embed differently")
    // composition with the similarity surface: cosine over fake embeddings
    val sim = df.agg(collect_list(Multimodal.fakeEmbedding(col("content")))).as[Seq[Seq[Float]]].head()
    val self = Seq((sim(0), sim(0))).toDF("a", "b")
      .select(graft.functions.VectorExpressions.cosine(col("a"), col("b")))
      .as[Double].head()
    assert(math.abs(self - 1.0) < 1e-9)
  }

  test("frame sampling slices binary payloads without shuffling them") {
    val df = media((7L, "video", "0123456789abcdefghij")).toDF() // 20 bytes
    val frames = Multimodal.sampleFrames(df, "media_id", "content", frameBytes = 8, maxFrames = 10)
      .orderBy("frame_no").collect()
    assert(frames.length == 3) // ceil(20/8)
    val sizes = frames.map(r => r.getAs[Array[Byte]]("frame").length).toSeq
    assert(sizes == Seq(8, 8, 4))
    assert(new String(frames(0).getAs[Array[Byte]]("frame"), StandardCharsets.UTF_8) == "01234567")
    val capped = Multimodal.sampleFrames(df, "media_id", "content", frameBytes = 2, maxFrames = 5)
    assert(capped.count() == 5) // maxFrames bound respected
  }

  test("resizeBytes: uniform byte-subsample thumbnail, scan-side only") {
    import org.apache.spark.sql.functions.col
    // 20-byte payload "0123456789abcdefghij", 4 rows × 3 bytes:
    // row starts floor(20·r/4) = 0,5,10,15 → "012" "567" "abc" "fgh"
    val df = media((1L, "image", "0123456789abcdefghij")).toDF()
    val thumb = df.select(
      Multimodal.resizeBytes(col("content"), rows = 4, rowBytes = 3).as("t"))
      .collect().head.getAs[Array[Byte]]("t")
    assert(new String(thumb, StandardCharsets.UTF_8) == "012567abcfgh")
    // short payload degrades to short thumb, never errors
    val short = media((2L, "image", "xy")).toDF().select(
      Multimodal.resizeBytes(col("content"), rows = 4, rowBytes = 3).as("t"))
      .collect().head.getAs[Array[Byte]]("t")
    // len 2: row starts floor(2·r/4) = 0,0,1,1 → "xy","xy","y","y"
    assert(new String(short, StandardCharsets.UTF_8) == "xyxyyy")
  }

  test("decodeBatch seam: per-partition typed decode with fake codec") {
    val out = Multimodal.decodeBatch(media(
      (1L, "image", "img-bytes"), (2L, "audio", "wav-bytes"))).collect().sortBy(_.media_id)
    assert(out.length == 2)
    assert(out(0).n_bytes == 9 && out(0).sample_rate == 0)
    assert(out(1).kind == "audio" && out(1).sample_rate == 16000)
    assert(out.forall(r => r.width >= 1 && r.width <= 1920))
    // deterministic across runs
    val again = Multimodal.decodeBatch(media((1L, "image", "img-bytes"))).collect().head
    assert(again.width == out(0).width && again.height == out(0).height)
  }

  test("decodePngBatch: a REAL png decodes + thumbnails through the production seam") {
    // craft a genuine 4x4 png with a distinct color per pixel
    def rgb(x: Int, y: Int): Int = (x * 60 + 10) << 16 | (y * 60 + 20) << 8 | 99
    val src = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) src.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val png = bos.toByteArray
    val poison = "not-an-image".getBytes(StandardCharsets.UTF_8)
    val out = Multimodal.decodePngBatch(
      Seq(Multimodal.MediaRow(1L, "image", png),
        Multimodal.MediaRow(2L, "image", poison)).toDS(),
      tw = 2, th = 2).collect().sortBy(_.media_id)
    // real decoded dimensions, not hash-derived fakes
    assert(out(0).width == 4 && out(0).height == 4)
    // the thumb is a genuine png: decode it back and check the exact
    // nearest-neighbor pixel picks (source pixels (0,0),(2,0),(0,2),(2,2))
    val thumb = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).thumb))
    assert(thumb.getWidth == 2 && thumb.getHeight == 2)
    for (y <- 0 until 2; x <- 0 until 2)
      assert((thumb.getRGB(x, y) & 0xffffff) == rgb(x * 2, y * 2),
        s"thumb pixel ($x,$y) must be the nearest-neighbor source pick")
    // a poison payload quarantines the row, never fails the task
    assert(out(1).width == -1 && out(1).height == -1 && out(1).thumb.isEmpty)
    // the seam is deterministic: same payload, same thumb bytes
    val again = Multimodal.decodePngBatch(
      Seq(Multimodal.MediaRow(1L, "image", png)).toDS(), 2, 2).collect().head
    assert(java.util.Arrays.equals(again.thumb, out(0).thumb))
  }

  test("decodeWavBatch: a REAL wav decodes through the production seam; " +
    "truncated and poison payloads quarantine the row") {
    import javax.sound.sampled._
    // craft a genuine 16 kHz mono 16-bit WAV: 160 frames (10 ms) of a
    // deterministic sawtooth so the PCM checksum is predictable
    val nFrames = 160
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val v = (i * 257 - 16384).toShort // little-endian 16-bit PCM
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(16000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt,
        nFrames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    // the checksum contract: FNV-1a over the decoded PCM byte stream
    var expectHash = 0xcbf29ce484222325L
    pcm.foreach(b => expectHash = (expectHash ^ (b & 0xffL)) * 0x100000001b3L)
    val truncated = wav.take(wav.length - 40) // header intact, PCM short
    val poison = "not-audio-at-all".getBytes(StandardCharsets.UTF_8)
    val out = Multimodal.decodeWavBatch(
      Seq(Multimodal.MediaRow(1L, "audio", wav),
        Multimodal.MediaRow(2L, "audio", truncated),
        Multimodal.MediaRow(3L, "audio", poison)).toDS())
      .collect().sortBy(_.media_id)
    // real parsed format, not hash-derived fakes — asserted EXACTLY
    assert(out(0).sample_rate == 16000 && out(0).channels == 1 &&
      out(0).bits == 16)
    assert(out(0).n_frames == nFrames.toLong)
    assert(out(0).duration_ms == 10L) // 160 frames / 16 kHz
    assert(out(0).pcm_hash == expectHash,
      "the checksum must cover the DECODED pcm bytes, bit-exactly")
    // a truncated payload quarantines (partial audio must never look
    // valid downstream), and a non-audio payload quarantines too
    assert(out(1).sample_rate == -1 && out(1).n_frames == -1L &&
      out(1).pcm_hash == 0L)
    assert(out(2).sample_rate == -1 && out(2).duration_ms == -1L)
    // deterministic across invocations
    val again = Multimodal.decodeWavBatch(
      Seq(Multimodal.MediaRow(1L, "audio", wav)).toDS()).collect().head
    assert(again == out(0))
  }

  test("decodeImageBatch: a REAL bmp decodes with an exact pixel " +
    "checksum; truncated and poison payloads quarantine the row") {
    // the synth gradient: seed 37 → w = 8+5 = 13, h = 8+(111%12) = 11,
    // base = 37; closed-form sum = h·w(w−1)/2 + w·h(h−1)/2 + w·h·base
    val seed = 37L
    val bmp = Multimodal.synthBmp(seed)
    val (w, h, base) = (13L, 11L, 37L)
    val expectSum = h * w * (w - 1) / 2 + w * h * (h - 1) / 2 + w * h * base
    val truncated = bmp.take(bmp.length / 2) // header intact, pixels short
    val poison = "not-an-image-at-all".getBytes(StandardCharsets.UTF_8)
    val out = Multimodal.decodeImageBatch(
      Seq(Multimodal.MediaRow(1L, "image", bmp),
        Multimodal.MediaRow(2L, "image", truncated),
        Multimodal.MediaRow(3L, "image", poison)).toDS())
      .collect().sortBy(_.media_id)
    // real parsed container + dimensions, checksum over DECODED pixels
    assert(out(0).format == "bmp")
    assert(out(0).width == w.toInt && out(0).height == h.toInt)
    assert(out(0).pix_sum == expectSum,
      s"decoded pixel sum ${out(0).pix_sum} must equal closed form $expectSum")
    // truncated pixel data quarantines (a partial image must never look
    // valid downstream); an unidentifiable payload quarantines too
    assert(out(1).width == -1 && out(1).height == -1 && out(1).pix_sum == 0L,
      s"truncated payload must quarantine, got ${out(1)}")
    assert(out(2).format == "" && out(2).width == -1)
    // deterministic across invocations
    val again = Multimodal.decodeImageBatch(
      Seq(Multimodal.MediaRow(1L, "image", bmp)).toDS()).collect().head
    assert(again == out(0))
  }
}
