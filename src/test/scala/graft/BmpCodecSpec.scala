package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BmpCodec, BmpImage}

/** The BMP codec is a REAL format implementation; the strongest check
  * here is INDEPENDENT: the JDK's own javax.imageio BMP reader must
  * accept the encoder's bytes and reproduce every pixel — that validates
  * bottom-up row order, BGR byte order, row padding, and both headers
  * against an implementation we didn't write.
  */
class BmpCodecSpec extends AnyFunSuite {

  private def testImage(w: Int, h: Int): BmpImage = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      rgb((y * w + x) * 3 + c) = ((x * 31 + y * 17 + c * 67) % 256).toByte
    BmpImage(w, h, rgb)
  }

  test("javax.imageio reads the encoder's bytes and reproduces every pixel") {
    val img = testImage(5, 3) // odd width forces row padding (15 -> 16)
    val bytes = BmpCodec.encode(img)
    val read = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(read != null, "JDK BMP reader rejected the encoding")
    assert(read.getWidth == 5 && read.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 5) {
      val argb = read.getRGB(x, y)
      val p = (y * 5 + x) * 3
      assert(((argb >> 16) & 0xff) == (img.rgb(p) & 0xff), s"R at ($x,$y)")
      assert(((argb >> 8) & 0xff) == (img.rgb(p + 1) & 0xff), s"G at ($x,$y)")
      assert((argb & 0xff) == (img.rgb(p + 2) & 0xff), s"B at ($x,$y)")
    }
  }

  test("decode inverts encode exactly, honoring a non-54 pixel offset") {
    val img = testImage(7, 4)
    val bytes = BmpCodec.encode(img)
    val back = BmpCodec.decode(1L, bytes)
    assert(back.width == 7 && back.height == 4)
    assert(back.rgb.toSeq == img.rgb.toSeq)
    // splice 8 junk bytes between headers and pixels, bump the declared
    // offset: a decoder assuming offset 54 reads garbage
    val spliced = bytes.take(54) ++ Array.fill(8)(0x5a.toByte) ++ bytes.drop(54)
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(2); bb.putInt(spliced.length)
    bb.position(10); bb.putInt(62)
    assert(BmpCodec.decode(2L, spliced).rgb.toSeq == img.rgb.toSeq)
  }

  test("2x2 box filter is the floor of the 4-pixel mean, odd edges dropped") {
    val img = testImage(5, 3)
    val t = BmpCodec.boxDownsample2x(img)
    assert(t.width == 2 && t.height == 1)
    for (tx <- 0 until 2; c <- 0 until 3) {
      def px(x: Int, y: Int): Int = img.rgb((y * 5 + x) * 3 + c) & 0xff
      val want = (px(2 * tx, 0) + px(2 * tx + 1, 0) +
        px(2 * tx, 1) + px(2 * tx + 1, 1)) / 4
      assert((t.rgb(tx * 3 + c) & 0xff) == want)
    }
  }

  test("Sobel edge energy: zero on flat cards, exact on a step edge") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    import graft.operators.{Bmp, BmpCodec, BmpImage}
    // operator on real docs: n_interior matches dims, recompute one doc
    // from the pixel ladder (the oracle arithmetic, independently coded)
    val rows = Bmp.bmpSobel(spark, Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) == (r.getInt(1) - 2).toLong * (r.getInt(2) - 2)) // n_interior
      assert(r.getLong(4) >= r.getLong(5)) // energy >= max term
    }
    val r0 = rows.minBy(_.getLong(0))
    val id = r0.getLong(0)
    def v(x: Int, y: Int): Long =
      (graft.functions.PortableSql.seedLadder(id) + x * 31L + y * 17L + 67L) % 256L
    val (w, h) = (r0.getInt(1), r0.getInt(2))
    var energy = 0L
    for (y <- 1 until h - 1; x <- 1 until w - 1) {
      val gx = (v(x + 1, y - 1) + 2 * v(x + 1, y) + v(x + 1, y + 1)) -
        (v(x - 1, y - 1) + 2 * v(x - 1, y) + v(x - 1, y + 1))
      val gy = (v(x - 1, y + 1) + 2 * v(x, y + 1) + v(x + 1, y + 1)) -
        (v(x - 1, y - 1) + 2 * v(x, y - 1) + v(x + 1, y - 1))
      energy += math.abs(gx) + math.abs(gy)
    }
    assert(r0.getLong(4) == energy)
  }

  test("corrupt blobs fail loudly") {
    val good = BmpCodec.encode(testImage(4, 2))
    intercept[IllegalArgumentException] {
      BmpCodec.decode(1L, "XX".getBytes("US-ASCII") ++ good.drop(2))
    }
    val compressed = good.clone()
    compressed(30) = 1 // biCompression: BI_RGB -> BI_RLE8
    intercept[IllegalArgumentException] { BmpCodec.decode(2L, compressed) }
    // truncated pixels: labelled reject, not an out-of-bounds read
    intercept[IllegalArgumentException] { BmpCodec.decode(3L, good.take(60)) }
    def patchIntLE(b: Array[Byte], at: Int, v: Int): Array[Byte] = {
      val c = b.clone()
      java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .position(at).asInstanceOf[java.nio.ByteBuffer].putInt(v)
      c
    }
    // zero width and an adversarial huge height (allocation bomb) both
    // fail the declared-pixels-must-exist check before any allocation
    intercept[IllegalArgumentException] { BmpCodec.decode(4L, patchIntLE(good, 18, 0)) }
    intercept[IllegalArgumentException] {
      BmpCodec.decode(5L, patchIntLE(good, 22, 100000000))
    }
  }
}
