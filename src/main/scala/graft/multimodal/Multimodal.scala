package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star extension): image/audio/video as opaque
  * BINARY columns with typed metadata, processed by column expressions
  * where possible and by one clearly-marked per-partition decode seam
  * where a real codec would plug in.
  *
  * The decode math is a DETERMINISTIC FAKE (this container ships no
  * image/audio codecs): pseudo-metadata and pseudo-embeddings are derived
  * from content hashes, so plans, schemas, partitioning, and tests are
  * real and reproducible while the codec is swappable. Every fake is
  * named `fake*` — nothing else in the module depends on the fake's
  * internals, only on its schema.
  *
  * 100 TB posture: binary payloads never enter a shuffle — metadata and
  * features are extracted scan-side (codegen'd expressions or a
  * mapPartitions seam), and downstream joins/aggs carry only the derived
  * columns. Frame sampling explodes bounded slices, not whole payloads.
  */
object Multimodal {

  /** Typed row for the batch-decode seam. */
  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class DecodedRow(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, sample_rate: Int)

  /** Scan-side metadata: real byte length + content hash (codegen'd). */
  def nBytes(content: Column): Column = length(content).cast("long")
  def contentHash(content: Column): Column = xxhash64(content)

  /** FAKE image decode as pure column expressions: dimensions derived
    * deterministically from the content hash. A real decoder replaces the
    * hash arithmetic; the struct schema is the contract.
    */
  def fakeImageMeta(content: Column): Column = struct(
    (pmod(xxhash64(content, lit(1)), lit(1920)) + 1).cast("int").as("width"),
    (pmod(xxhash64(content, lit(2)), lit(1080)) + 1).cast("int").as("height"),
    (pmod(xxhash64(content, lit(3)), lit(3)) + 1).cast("int").as("channels"))

  /** FAKE feature extraction: a unit-free 64-dim pseudo-embedding from
    * seeded content hashes — array<float> with the exact shape the
    * similarity operators (cosine top-k, ANN) consume, so the multimodal →
    * embedding → search composition is testable end to end.
    */
  def fakeEmbedding(content: Column, dim: Int = 64): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => ((pmod(xxhash64(content, i), lit(2000)) - 1000) / 1000.0).cast("float"))

  /** Frame sampling for video-like payloads: fixed-size byte slices as an
    * exploded (media_id, frame_no, frame) relation. Real plumbing —
    * substring on BINARY is a codegen'd expression; a real demuxer would
    * replace the uniform slicing with keyframe offsets.
    */
  def sampleFrames(media: DataFrame, idCol: String, contentCol: String,
                   frameBytes: Int, maxFrames: Int): DataFrame = {
    val nFrames = least(ceil(length(col(contentCol)).cast("double") / frameBytes).cast("int"),
      lit(maxFrames))
    media.select(col(idCol), col(contentCol), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col(idCol),
        explode(transform(sequence(lit(0), col("n_frames") - 1),
          i => struct(i.as("frame_no"),
            col(contentCol).substr((i * frameBytes + 1).cast("int"), lit(frameBytes))
              .as("frame")))).as("f"))
      .select(col(idCol), col("f.frame_no").as("frame_no"), col("f.frame").as("frame"))
  }

  /** Resize plumbing for image-like payloads: a thumbnail as `rows`
    * uniformly-spaced `rowBytes`-byte slices concatenated — the byte-
    * subsampling analog of nearest-neighbor downscale, as PURE codegen'd
    * column expressions (substr/concat on BINARY). A real resizer
    * replaces the slice arithmetic with pixel-aware scaling; the
    * contract — binary in, bounded smaller binary out, computed
    * scan-side so full payloads never reach a shuffle — is what the
    * plan depends on. Payloads shorter than one row yield
    * correspondingly short thumbs (never an error).
    */
  def resizeBytes(content: Column, rows: Int, rowBytes: Int): Column = {
    require(rows > 0 && rowBytes > 0, "resize dims must be positive")
    val len = length(content)
    concat((0 until rows).map { r =>
      // row r starts at floor(r · len / rows), 1-based substr
      content.substr((len * r / rows).cast("int") + 1, lit(rowBytes))
    }: _*)
  }

  /** The batch-decode seam (mapInPandas analog): one pass per partition,
    * typed in/out, no driver involvement. THIS is where a real codec
    * (JNI/ffi image lib) would run; the fake derives metadata from the
    * payload hash. Everything expressible as columns stays columnar —
    * the only mapPartitions here are this seam and its real-codec twin
    * [[decodePngBatch]].
    */
  def decodeBatch(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    implicit val enc = Encoders.product[DecodedRow]
    media.mapPartitions { rows =>
      rows.map { r =>
        val h = java.util.Arrays.hashCode(r.content)
        DecodedRow(
          media_id = r.media_id,
          kind = r.kind,
          n_bytes = r.content.length.toLong,
          width = math.floorMod(h, 1920) + 1,
          height = math.floorMod(h * 31, 1080) + 1,
          sample_rate = if (r.kind == "audio") 16000 else 0)
      }
    }
  }

  /** Decoded-and-thumbnailed row from the REAL image path. */
  final case class ThumbRow(
      media_id: Long, width: Int, height: Int, thumb: Array[Byte])

  /** REAL pure-JVM image decode + thumbnail through the SAME
    * per-partition seam shape as [[decodeBatch]] — the proof that the
    * seam's contract (binary in, typed metadata + bounded binary out,
    * computed scan-side, no driver involvement) holds with an actual
    * codec, not only the deterministic fake: `javax.imageio` parses the
    * PNG/GIF/BMP payload, a NEAREST-NEIGHBOR downscale (explicit pixel
    * arithmetic — `x·W/w`, floor — so the thumb is bit-deterministic
    * across JVMs, unlike `getScaledInstance`'s smoothing) produces a
    * `tw`×`th` thumbnail, re-encoded as PNG (lossless, so the spec can
    * assert exact pixel values through a decode round-trip).
    *
    * Undecodable payloads (truncated file, non-image kind routed here
    * by mistake) yield width = height = −1 and an EMPTY thumb rather
    * than a task failure: at 100 TB a poison payload must quarantine a
    * row, never an executor. Real deployments swap the codec call for
    * JNI ffmpeg/turbojpeg behind this exact signature.
    */
  /** Decoded audio metadata + content checksum from the REAL audio path. */
  final case class AudioRow(
      media_id: Long, sample_rate: Int, channels: Int, bits: Int,
      n_frames: Long, duration_ms: Long, pcm_hash: Long)

  /** REAL pure-JVM audio decode through the SAME per-partition seam
    * shape as [[decodeBatch]] — the audio counterpart of
    * [[decodePngBatch]] (round-16 closed the image leg; this closes the
    * audio one): `javax.sound.sampled` parses the WAV/AIFF/AU payload,
    * the seam emits the format metadata (sample rate, channels, bit
    * depth, frame count, derived duration) plus an FNV-1a checksum over
    * the DECODED PCM byte stream — the exact-bytes assertion surface
    * the spec pins, and the hook where a real pipeline computes
    * features (fbank/MFCC) without the payload ever reaching a shuffle.
    *
    * Poison discipline (the decodePngBatch contract): an unparseable
    * header quarantines the ROW (all-−1 metadata, zero hash), and a
    * payload whose PCM stream ends short of the header's frame count
    * (truncated upload) quarantines the same way — a checksum over
    * partial audio would LOOK valid downstream, which is worse than no
    * row. Unknown frame counts (streaming containers report
    * NOT_SPECIFIED) also quarantine: this seam certifies complete,
    * seekable payloads; real deployments swap in ffmpeg via JNI behind
    * this exact signature for everything else.
    */
  def decodeWavBatch(media: Dataset[MediaRow]): Dataset[AudioRow] = {
    implicit val enc = Encoders.product[AudioRow]
    val poison = (id: Long) => AudioRow(id, -1, -1, -1, -1L, -1L, 0L)
    media.mapPartitions { rows =>
      rows.map { r =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.content))
          try {
            val f = ais.getFormat
            val frames = ais.getFrameLength
            val frameSize = f.getFrameSize
            if (frames < 0 || frameSize <= 0) poison(r.media_id)
            else {
              var h = 0xcbf29ce484222325L // FNV-1a offset basis
              var total = 0L
              val buf = new Array[Byte](8192)
              var n = ais.read(buf)
              while (n > 0) {
                var i = 0
                while (i < n) {
                  h = (h ^ (buf(i) & 0xffL)) * 0x100000001b3L
                  i += 1
                }
                total += n
                n = ais.read(buf)
              }
              val rate = math.round(f.getSampleRate)
              if (total != frames * frameSize || rate <= 0) poison(r.media_id)
              else AudioRow(r.media_id, rate, f.getChannels,
                f.getSampleSizeInBits, frames, frames * 1000L / rate, h)
            }
          } finally ais.close()
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException |
               _: java.io.IOException => poison(r.media_id)
        }
      }
    }
  }

  /** Decoded image metadata + pixel checksum from the REAL image path. */
  final case class ImageRow(
      media_id: Long, format: String, width: Int, height: Int, pix_sum: Long)

  /** REAL image decode with a CHECKSUM surface — the [[decodeWavBatch]]
    * pattern for images (round-19; [[decodePngBatch]] already proves the
    * codec through the thumbnail leg, this seam adds the exact-bytes
    * assertion surface an oracle can recompute): `javax.imageio`
    * identifies and parses the payload (BMP/PNG/GIF — whatever the JDK
    * registry holds), the seam emits the container format name, the
    * REAL decoded dimensions, and an exact integer sum over the decoded
    * red channel — for the gray synthetic corpora used in the gate,
    * r=g=b, so the sum pins every pixel of the decode bit-exactly while
    * staying closed-form recomputable without a decoder.
    *
    * Poison discipline (the decodeWavBatch contract): an unidentifiable
    * payload (no reader claims it) and a truncated one (the reader
    * throws mid-pixel-data) both quarantine the ROW — format "",
    * width = height = −1, zero sum — never the task; at 100 TB a poison
    * payload must cost one row, not an executor. Payloads never reach a
    * shuffle: metadata and checksum leave the seam, bytes stay
    * scan-side. Real deployments swap in turbojpeg/ffmpeg via JNI
    * behind this exact signature.
    */
  def decodeImageBatch(media: Dataset[MediaRow]): Dataset[ImageRow] = {
    implicit val enc = Encoders.product[ImageRow]
    val poison = (id: Long) => ImageRow(id, "", -1, -1, 0L)
    media.mapPartitions { rows =>
      rows.map { r =>
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.content))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) poison(r.media_id)
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                val fmt = reader.getFormatName.toLowerCase
                val img = reader.read(0)
                var sum = 0L
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    sum += (img.getRGB(x, y) >> 16) & 0xff
                    x += 1
                  }
                  y += 1
                }
                ImageRow(r.media_id, fmt, img.getWidth, img.getHeight, sum)
              } finally reader.dispose()
            }
          } finally iis.close()
        } catch {
          // a truncated/corrupt payload surfaces as IIOException,
          // EOFException, or a reader-internal bounds error — all
          // quarantine the row, none may fail the task
          case scala.util.control.NonFatal(_) => poison(r.media_id)
        }
      }
    }
  }

  /** Deterministic REAL-BMP synthesis for gate fixtures: a `w`×`h` gray
    * gradient with pixel(x,y) = x + y + (seed % 200) in every channel —
    * dimensions and every pixel are pure functions of the seed, so the
    * decode checksum has the closed form
    * `h·w(w−1)/2 + w·h(h−1)/2 + w·h·(seed % 200)` (max pixel 239 < 256,
    * no wraparound), recomputable by a SQL oracle with no codec. The
    * bytes are a genuine JDK-encoded BMP — the decode side must really
    * parse the container to recover them. */
  def synthBmp(seed: Long): Array[Byte] = {
    val w = 8 + (seed % 16).toInt
    val h = 8 + ((seed * 3) % 12).toInt
    val base = (seed % 200).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = x + y + base
        img.setRGB(x, y, g << 16 | g << 8 | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  def decodePngBatch(media: Dataset[MediaRow], tw: Int, th: Int): Dataset[ThumbRow] = {
    require(tw > 0 && th > 0, "thumbnail dims must be positive")
    implicit val enc = Encoders.product[ThumbRow]
    media.mapPartitions { rows =>
      rows.map { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
          catch { case _: java.io.IOException => null }
        if (img == null) ThumbRow(r.media_id, -1, -1, Array.emptyByteArray)
        else {
          val (iw, ih) = (img.getWidth, img.getHeight)
          val out = new java.awt.image.BufferedImage(
            tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < th) {
            var x = 0
            while (x < tw) {
              out.setRGB(x, y, img.getRGB(x * iw / tw, y * ih / th) | 0xff000000)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          ThumbRow(r.media_id, iw, ih, bos.toByteArray)
        }
      }
    }
  }
}
