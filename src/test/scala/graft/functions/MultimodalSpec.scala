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
}
