package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `BINARY` columns with
  * typed metadata structs, plus batch decode/feature-extract plumbing.
  *
  * Image formats the JDK ships codecs for (PNG/BMP/GIF via `javax.imageio`)
  * are decoded FOR REAL in `decodeImages` — true raster width/height/bands
  * from parsing the bytes. Formats needing external codecs (video, JPEG2000,
  * audio) stay behind `decodeStub`, a clearly-marked deterministic FAKE —
  * but everything around it is the real production shape: binary columns
  * flow through parquet scans column-pruned, the decoder runs per-partition
  * (one "model/codec handle" per task, the mapPartitions service pattern),
  * and outputs are a typed struct per item. Swapping `decodeStub` for a
  * JNI/FFmpeg call changes no plumbing.
  *
  * Scale notes: binary payloads dominate row size — `spark.sql.files.
  * maxPartitionBytes` governs split sizing, and the decode stage is a pure map
  * (no shuffle); feature columns should be written to a separate table keyed by
  * content hash so re-decodes are incremental.
  */
object Multimodal {

  /** Typed decoded-media record (the schema a real decoder would emit). */
  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      content_md5: String,
      // STUB fields: a real decoder emits true width/height/duration here
      fake_width: Int,
      fake_height: Int)

  /** Deterministic FAKE decode of one payload — stands in for image/audio
    * decoding (`???` in spirit): derives pseudo-dimensions from the byte length
    * so results are reproducible in any engine.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
    MediaFeatures(
      media_id = id,
      n_bytes = bytes.length.toLong,
      content_md5 = md5,
      fake_width = (bytes.length % 64) + 1,
      fake_height = ((bytes.length * 7) % 64) + 1)
  }

  /** Typed record of a REAL image decode (see `decodeImages`). */
  final case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int)

  /** REAL image decode — `javax.imageio` ships PNG/BMP/GIF codecs in the
    * JDK, so this path is NOT a stub: the payload bytes are parsed as an
    * actual image and the true raster dimensions come back. Undecodable or
    * NULL payloads are skipped (a corrupt image must not kill a 100 TB
    * decode job — count them from the input/output row delta). Video and
    * formats needing external codecs stay on `decodeStub`.
    *
    * Same scale shape as `decodeAll`: one pass, mapPartitions, no shuffle;
    * the in-memory stream cache is disabled once per partition (ImageIO
    * otherwise spills temp files per image).
    */
  def decodeImages(df: DataFrame, idCol: String, binCol: String): Dataset[ImageFeatures] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // once per task, like a codec handle
        it.flatMap { case (id, bytes) =>
          if (bytes == null) None
          else {
            // NonFatal, not just IOException: JDK decoders throw
            // IllegalArgumentException / ArrayIndexOutOfBounds / CMMException
            // on fuzzed or truncated bytes — all must mean "skip", not "kill
            // the 100 TB decode job"
            val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) None // skip-undecodable semantics
            else Some(ImageFeatures(id, img.getWidth, img.getHeight,
              img.getRaster.getNumBands))
          }
        }
      }
  }

  /** Deterministic tiny-PNG synthesizer for fixtures/tests: a real encoded
    * PNG whose dimensions are a pure function the caller chooses — the
    * differential oracle predicts (width, height, channels) independently
    * and the gate verifies `decodeImages` actually parsed the bytes.
    */
  def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] =
    syntheticImage(width, height, seed, "png")

  /** [[syntheticPng]] generalized over the JDK's lossless writers ("png",
    * "bmp") — the same raster encoded through different codecs, which is
    * exactly what a perceptual hash must see through (q116).
    */
  def syntheticImage(width: Int, height: Int, seed: Long, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, (((seed + x * 31 + y * 131) & 0xffffff)).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  /** Average-hash (aHash) of one decoded image: luminance block-means over an
    * 8×8 grid, one bit per block (block mean ≥ global mean), 64-bit output.
    * All-INTEGER arithmetic — block sums and pixel counts compare by
    * cross-multiplication (`blockSum·totalCnt ≥ totalSum·blockCnt`), so the
    * hash is bit-reproducible on any platform: no float mean, no rounding.
    * Pixels map to blocks by `x·8/w` (nearest), so an exact k× nearest-
    * neighbor rescale preserves the hash — the resize-invariance that makes
    * it a near-dup key rather than a byte checksum. Empty blocks (w or h < 8)
    * contribute 0 bits, deterministically.
    */
  def averageHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        val b = (y * 8 / h) * 8 + (x * 8 / w)
        sums(b) += lum
        cnts(b) += 1
        x += 1
      }
      y += 1
    }
    val total = sums.sum
    val n = cnts.sum
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (cnts(i) > 0 && sums(i) * n >= total * cnts(i)) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Deterministic 16-bit PCM mono WAV synthesizer (fixtures/tests): a real
    * RIFF/WAVE container the JDK's `javax.sound` stack parses — the audio
    * analog of [[syntheticPng]]; the differential oracle predicts
    * (frames, rate, channels, duration) analytically.
    */
  def syntheticWav(nFrames: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v = (((seed + i * 2654435761L) & 0xffff) - 0x8000).toInt
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Typed record of a REAL audio decode (see [[decodeAudio]]). */
  final case class AudioFeatures(
      media_id: Long,
      n_frames: Long,
      sample_rate: Int,
      channels: Int,
      duration_us: Long)

  /** REAL audio decode — `javax.sound.sampled` ships WAV/AIFF/AU parsers in
    * the JDK, so this path is NOT a stub: the container is actually parsed
    * and the true frame count / rate / channel count come back
    * (duration_us = frames·1,000,000/rate, exact integer when rate divides).
    * Undecodable payloads are skipped, like [[decodeImages]]; compressed
    * codecs (mp3/aac/opus) need external libraries and stay on
    * [[decodeStub]] — the documented boundary.
    */
  def decodeAudio(df: DataFrame, idCol: String, binCol: String): Dataset[AudioFeatures] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          if (bytes == null) None
          else {
            val ais = try javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
            if (ais == null) None
            else {
              val f = ais.getFormat
              val frames = ais.getFrameLength
              ais.close()
              Some(AudioFeatures(id, frames, f.getSampleRate.toInt, f.getChannels,
                frames * 1000000L / f.getSampleRate.toLong))
            }
          }
        }
      }
  }

  /** Image near-dup fingerprinting: decode + [[averageHash]] per row, one
    * pass, no shuffle (the dedup join downstream keys on the hash — 8 bytes
    * per image regardless of payload size, the multimodal analog of the
    * text pipelines' md5-before-shuffle rule). Undecodable payloads are
    * skipped, matching [[decodeImages]].
    */
  def imagePhash(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          if (bytes == null) None
          else {
            val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) None else Some((id, averageHash(img)))
          }
        }
      }.toDF("media_id", "phash")
  }

  /** Batch decode: mapPartitions so a real implementation amortizes one codec/
    * model handle per task (the Jet `mapUsingService` pattern, SURVEY §2.4).
    * Input: (id, payload) binary rows; output: typed feature Dataset.
    */
  def decodeAll(df: DataFrame, idCol: String, binCol: String): Dataset[MediaFeatures] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val codec = Codec.open() here, once per partition.
        // NULL payloads are normal in real corpora — skip them instead of
        // letting one null row NPE the whole decode job
        it.filter(_._2 != null).map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Feature extraction over the raw payload bytes: a 16-bin byte histogram
    * normalized by length — a REAL (not stubbed) content feature computed the
    * way an embedding model would run (mapPartitions, one pass over the bytes,
    * fixed-width vector out). Swapping the histogram for a model forward pass
    * changes no plumbing; the output column is the `embeddings`-table shape
    * (fixed-length ARRAY<DOUBLE>), ready for the similarity/dedup operators.
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String,
                      bins: Int = 16): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val model = Model.load() here, once per partition
        it.filter(_._2 != null).map { case (id, bytes) =>
          val hist = new Array[Long](bins)
          var i = 0
          while (i < bytes.length) { hist(((bytes(i) & 0xff) * bins) / 256) += 1; i += 1 }
          val n = math.max(1, bytes.length).toDouble
          (id, hist.map(_ / n).toSeq)
        }
      }
      .toDF(idCol, "features")
  }

  /** Frame-sampling shape for video-like payloads: split a payload into fixed
    * windows ("frames") and emit one row per sampled frame — the explode-style
    * fan-out a video pipeline needs, bounded by `maxFrames`.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   frameBytes: Int, maxFrames: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Iterator.empty
        else bytes.grouped(frameBytes).take(maxFrames).zipWithIndex.map {
          case (frame, i) => (id, i, frame.length, decodeStub(id, frame).content_md5)
        }
      }
      .toDF(idCol, "frame_no", "frame_bytes", "frame_md5")
  }
}
