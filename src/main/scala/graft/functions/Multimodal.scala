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
  def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] = {
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
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
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
