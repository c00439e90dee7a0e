package graft.functions

import graft.SparkSpec

/** Real image decode (javax.imageio, in-JDK codecs): true dimensions come
  * back from parsing actual PNG/BMP bytes; undecodable payloads are skipped,
  * not fatal.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  test("decodeImages returns true raster dims for PNG and BMP, skips junk") {
    val rows = Seq(
      (1L, Multimodal.syntheticPng(5, 9, seed = 42L)), // real PNG
      (2L, bmpBytes(17, 3)),                           // real BMP
      (3L, "not an image".getBytes("UTF-8")),          // undecodable → skipped
      (4L, null.asInstanceOf[Array[Byte]])             // null → skipped
    ).toDF("id", "payload")
    val out = Multimodal.decodeImages(rows, "id", "payload")
      .collect().map(f => f.media_id -> ((f.width, f.height, f.channels))).toMap
    assert(out === Map(1L -> ((5, 9, 3)), 2L -> ((17, 3, 3))))
  }

  test("syntheticPng bytes are a genuine parseable PNG with the requested dims") {
    val bytes = Multimodal.syntheticPng(13, 7, seed = 7L)
    // PNG magic
    assert((bytes(0) & 0xff) === 0x89 && bytes(1) === 'P'.toByte)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth === 13 && img.getHeight === 7)
  }

  test("averageHash discriminates distinct images and survives exact k× rescale") {
    def decode(b: Array[Byte]) =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    // discrimination: images large enough to fill the 8×8 grid should mostly
    // hash apart (tiny 1×1 images all collapse to a constant — expected)
    val hashes = (0 until 100).map { i =>
      Multimodal.averageHash(decode(Multimodal.syntheticPng(16, 16, seed = i.toLong)))
    }
    assert(hashes.distinct.size > 50, s"only ${hashes.distinct.size} distinct hashes")
    // exact 3× nearest-neighbor upscale preserves every block mean → same hash
    val img = decode(Multimodal.syntheticPng(8, 8, seed = 99L))
    val up = new java.awt.image.BufferedImage(24, 24,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 24; x <- 0 until 24) up.setRGB(x, y, img.getRGB(x / 3, y / 3))
    assert(Multimodal.averageHash(img) === Multimodal.averageHash(up))
    // ... which is what a byte-level fingerprint can never do
    val pngBytes = Multimodal.syntheticImage(9, 9, 5L, "png")
    val bmpBytes2 = Multimodal.syntheticImage(9, 9, 5L, "bmp")
    assert(!java.util.Arrays.equals(pngBytes, bmpBytes2))
    assert(Multimodal.averageHash(decode(pngBytes)) ===
      Multimodal.averageHash(decode(bmpBytes2)))
  }

  test("mp3 frame walk: MPEG1 fixture with ID3v2 + alternating padding, exact duration") {
    val df = Seq(
      (1L, Multimodal.syntheticMp3(30, bitrateIdx = 9, rateIdx = 1, seed = 7L, id3Bytes = 12)),
      (2L, Multimodal.syntheticMp3(50, bitrateIdx = 1, rateIdx = 2, seed = 3L)))
      .toDF("id", "payload")
    val out = Multimodal.decodeAudio(df, "id", "payload").collect()
      .map(a => a.media_id -> a).toMap
    assert(out(1L).n_frames === 30 && out(1L).sample_rate === 48000 &&
      out(1L).channels === 1 &&
      out(1L).duration_us === 30L * 1152 * 1000000 / 48000)
    assert(out(2L).n_frames === 50 && out(2L).sample_rate === 32000 &&
      out(2L).duration_us === 50L * 1152 * 1000000 / 32000)
  }

  test("mp3 frame walk: hand-built MPEG2 Layer III stereo chain parses on its own tables") {
    // ver=2 (spf 576, 72000*kbps/rate sizing), bitrateIdx 5 = 40 kbps on the
    // MPEG2 table, rateIdx 1 = 24000 Hz, stereo mode bits 00 -> 120-byte frames
    val h = (0x7ff << 21) | (2 << 19) | (1 << 17) | (1 << 16) |
      (5 << 12) | (1 << 10) | (0 << 9) | (0 << 6)
    val out = new java.io.ByteArrayOutputStream()
    (0 until 3).foreach { _ =>
      out.write((h >>> 24) & 0xff); out.write((h >>> 16) & 0xff)
      out.write((h >>> 8) & 0xff); out.write(h & 0xff)
      (4 until 120).foreach(j => out.write(j & 0x7f))
    }
    val df = Seq((9L, out.toByteArray)).toDF("id", "payload")
    val a = Multimodal.decodeAudio(df, "id", "payload").collect().head
    assert(a.n_frames === 3 && a.sample_rate === 24000 && a.channels === 2)
    assert(a.duration_us === 3L * 576 * 1000000 / 24000)
  }

  test("mp3 sniff rejects sync-like junk without breaking the WAV/SPI fallbacks") {
    val junk = Array[Byte](0xff.toByte, 0xf0.toByte, 1, 2, 3, 4, 5)
    val wav = Multimodal.syntheticWav(80, 8000, 1L)
    val df = Seq((1L, junk), (2L, wav)).toDF("id", "payload")
    val out = Multimodal.decodeAudio(df, "id", "payload").collect()
    assert(out.map(_.media_id).toSet === Set(2L), "junk skipped, WAV still decodes")
    assert(out.head.n_frames === 80)
  }
}
