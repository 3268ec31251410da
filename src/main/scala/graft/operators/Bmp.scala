package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Decoded + thumbnailed facts of one BMP blob. Channel sums are kept
  * separate: a decoder that mixed up the BGR byte order would swap
  * sum_r/sum_b and flip the oracle hash.
  */
case class BmpInfo(
    doc_id: Long,
    width: Int,
    height: Int,
    n_bytes: Long,
    sum_r: Long,
    sum_g: Long,
    sum_b: Long,
    thumb_width: Int,
    thumb_height: Int,
    thumb_sum_r: Long,
    thumb_sum_g: Long,
    thumb_sum_b: Long)

/** Decoded pixels, top-down row-major interleaved RGB. */
final case class BmpImage(width: Int, height: Int, rgb: Array[Byte])

/** A REAL image codec — 24-bit uncompressed BMP is a plain byte format
  * (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up BGR rows padded to
  * 4 bytes), so like the WAV path it needs no native library. The
  * decoder honors the header's declared pixel OFFSET (never assumes 54),
  * bottom-up row order, and row padding; the resize is a true 2x2
  * box-filter over decoded pixels, not a byte-skip.
  */
object BmpCodec {

  def rowSize(width: Int): Int = (3 * width + 3) / 4 * 4

  /** Canonical bottom-up 24bpp encoder. */
  def encode(img: BmpImage): Array[Byte] = {
    val rs = rowSize(img.width)
    val fileSize = 54 + rs * img.height
    val out = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putInt(0).putInt(54) // reserved, pixel offset
    out.putInt(40).putInt(img.width).putInt(img.height)
      .putShort(1.toShort).putShort(24.toShort) // planes, bpp
      .putInt(0).putInt(rs * img.height) // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = img.height - 1
    while (y >= 0) { // bottom-up
      var x = 0
      while (x < img.width) {
        val p = (y * img.width + x) * 3
        out.put(img.rgb(p + 2)).put(img.rgb(p + 1)).put(img.rgb(p)) // BGR
        x += 1
      }
      var pad = rs - 3 * img.width
      while (pad > 0) { out.put(0.toByte); pad -= 1 }
      y -= 1
    }
    out.array()
  }

  /** Header-driven decoder; throws on anything not 24bpp uncompressed. */
  def decode(docId: Long, bytes: Array[Byte]): BmpImage = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte,
      s"doc $docId: not a BMP")
    bb.getInt(); bb.getInt()
    val pixelOffset = bb.getInt() // honor the header, never assume 54
    bb.getInt() // info header size
    val width = bb.getInt()
    val height = bb.getInt()
    require(width > 0, s"doc $docId: non-positive width $width")
    require(height > 0, s"doc $docId: top-down BMPs not produced here")
    bb.getShort()
    val bpp = bb.getShort()
    require(bpp == 24, s"doc $docId: only 24bpp supported (bpp=$bpp)")
    require(bb.getInt() == 0, s"doc $docId: compressed BMP not supported")
    // a truncated blob or adversarial declared dimensions must fail HERE
    // with a labelled error, not as an out-of-bounds read mid-pixel-loop
    // or a giant allocation. Row size is computed in LONG: 3*width+3
    // overflows Int for width near 2^31/3, which would wrap to a tiny rs
    // and slip past the length check below.
    val rsL = (3L * width + 3L) / 4L * 4L
    require(pixelOffset >= 54 && pixelOffset.toLong + rsL * height <= bytes.length,
      s"doc $docId: declared ${width}x$height at offset $pixelOffset " +
        s"needs ${pixelOffset.toLong + rsL * height} bytes, blob has ${bytes.length}")
    val rs = rsL.toInt // safe: bounded by bytes.length above
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      val rowStart = pixelOffset + (height - 1 - y) * rs // bottom-up
      while (x < width) {
        val s = rowStart + 3 * x
        val d = (y * width + x) * 3
        rgb(d) = bytes(s + 2) // R
        rgb(d + 1) = bytes(s + 1) // G
        rgb(d + 2) = bytes(s) // B
        x += 1
      }
      y += 1
    }
    BmpImage(width, height, rgb)
  }

  /** True 2x2 box-filter downsample (floor of the 4-pixel mean per
    * channel); odd trailing row/column dropped.
    */
  def boxDownsample2x(img: BmpImage): BmpImage = {
    val tw = img.width / 2
    val th = img.height / 2
    val out = new Array[Byte](tw * th * 3)
    var ty = 0
    while (ty < th) {
      var tx = 0
      while (tx < tw) {
        var c = 0
        while (c < 3) {
          def px(x: Int, y: Int): Int =
            img.rgb((y * img.width + x) * 3 + c) & 0xff
          val v = (px(2 * tx, 2 * ty) + px(2 * tx + 1, 2 * ty) +
            px(2 * tx, 2 * ty + 1) + px(2 * tx + 1, 2 * ty + 1)) / 4
          out((ty * tw + tx) * 3 + c) = v.toByte
          c += 1
        }
        tx += 1
      }
      ty += 1
    }
    BmpImage(tw, th, out)
  }

  def channelSums(img: BmpImage): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < img.rgb.length) {
      r += img.rgb(i) & 0xff
      g += img.rgb(i + 1) & 0xff
      b += img.rgb(i + 2) & 0xff
      i += 3
    }
    (r, g, b)
  }
}

/** Image flavor of the multimodal family over the REAL BMP codec: a
  * deterministic RGB test card per doc is encoded, decoded back through
  * the header-driven parser, 2x2 box-thumbnailed on real pixels, and
  * the thumbnail re-encoded + re-decoded (two full codec round trips).
  * The oracle computes every fact from the pixel arithmetic alone.
  */
object Bmp {

  private[graft] def dims(docId: Long): (Int, Int) =
    ((16 + docId % 17).toInt, (8 + docId % 13).toInt)

  /** Channel c of pixel (x, y): a deterministic ladder in [0, 256).
    * Seeded by the SHARED PortableSql.seedLadder (one definition for
    * every codec signal generator and its oracle fragment).
    */
  private[graft] def pixel(docId: Long, c: Int, x: Int, y: Int): Int =
    ((graft.functions.PortableSql.seedLadder(docId) +
      x * 31L + y * 17L + c * 67L) % 256L).toInt

  def bmpStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (w, h) = dims(id)
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          val (x, y) = (i % w, i / w)
          var c = 0
          while (c < 3) {
            rgb(i * 3 + c) = pixel(id, c, x, y).toByte
            c += 1
          }
          i += 1
        }
        val bytes = BmpCodec.encode(BmpImage(w, h, rgb))
        val img = BmpCodec.decode(id, bytes)
        val (r, g, b) = BmpCodec.channelSums(img)
        val thumb = BmpCodec.decode(id,
          BmpCodec.encode(BmpCodec.boxDownsample2x(img)))
        val (tr, tg, tb) = BmpCodec.channelSums(thumb)
        BmpInfo(id, img.width, img.height, bytes.length.toLong, r, g, b,
          thumb.width, thumb.height, tr, tg, tb)
      }
    }.toDF()
  }

  /** Integer Sobel edge-energy extraction over the REAL codec — the
    * classic 3x3 gradient feature (|Gx| + |Gy| per interior pixel) run
    * on the decoded GREEN channel after a full encode->decode round
    * trip, i.e. the image-curation signal ("is this a blank/flat
    * image?") computed the way a real pipeline would: from container
    * bytes, not from the generator. All arithmetic is int64-exact, and
    * the oracle replays the convolution in CLOSED FORM over the pixel
    * ladder (v(x,y) is a formula, so each kernel tap is a term — no
    * pixel self-joins). Per-blob work is one codec pass + one 3x3
    * convolution in mapPartitions; no shuffle.
    */
  def bmpSobel(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (w, h) = dims(id)
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          val (x, y) = (i % w, i / w)
          var c = 0
          while (c < 3) {
            rgb(i * 3 + c) = pixel(id, c, x, y).toByte
            c += 1
          }
          i += 1
        }
        val img = BmpCodec.decode(id, BmpCodec.encode(BmpImage(w, h, rgb)))
        def g(x: Int, y: Int): Long = (img.rgb((y * img.width + x) * 3 + 1) & 0xff).toLong
        var energy = 0L; var maxGrad = 0L; var n = 0L
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            val gx = (g(x + 1, y - 1) + 2 * g(x + 1, y) + g(x + 1, y + 1)) -
              (g(x - 1, y - 1) + 2 * g(x - 1, y) + g(x - 1, y + 1))
            val gy = (g(x - 1, y + 1) + 2 * g(x, y + 1) + g(x + 1, y + 1)) -
              (g(x - 1, y - 1) + 2 * g(x, y - 1) + g(x + 1, y - 1))
            val e = math.abs(gx) + math.abs(gy)
            energy += e
            if (e > maxGrad) maxGrad = e
            n += 1
            x += 1
          }
          y += 1
        }
        (id, w, h, n, energy, maxGrad)
      }
    }.toDF("doc_id", "width", "height", "n_interior", "edge_energy", "max_grad")
  }

  /** Center-crop through the REAL codec — the region-of-interest
    * extraction (training-crop / letterbox-strip) pass: decode the
    * container, take the integer center box [w/4, w/4 + w/2) ×
    * [h/4, h/4 + h/2), RE-ENCODE the crop (its own row padding — the
    * BMP 4-byte row alignment changes with the new width, which is
    * exactly what the byte-size column audits), decode the new file,
    * and emit its channel sums. The oracle sums the pixel ladder over
    * the crop box in closed form — any off-by-one in the crop bounds
    * or the re-encode row stride breaks it.
    */
  def bmpCrop(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (w, h) = dims(id)
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          val (x, y) = (i % w, i / w)
          var c = 0
          while (c < 3) {
            rgb(i * 3 + c) = pixel(id, c, x, y).toByte
            c += 1
          }
          i += 1
        }
        val img = BmpCodec.decode(id, BmpCodec.encode(BmpImage(w, h, rgb)))
        val (x0, y0, cw, chh) = (w / 4, h / 4, w / 2, h / 2)
        val crgb = new Array[Byte](cw * chh * 3)
        var cy = 0
        while (cy < chh) {
          var cx = 0
          while (cx < cw) {
            var c = 0
            while (c < 3) {
              crgb((cy * cw + cx) * 3 + c) =
                img.rgb(((y0 + cy) * w + (x0 + cx)) * 3 + c)
              c += 1
            }
            cx += 1
          }
          cy += 1
        }
        val bytes = BmpCodec.encode(BmpImage(cw, chh, crgb))
        val back = BmpCodec.decode(id, bytes)
        val (r, g, b) = BmpCodec.channelSums(back)
        (id, back.width, back.height, bytes.length.toLong, r, g, b)
      }
    }.toDF("doc_id", "crop_width", "crop_height", "n_bytes",
      "sum_r", "sum_g", "sum_b")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_image_crop" -> ((s, dir) => bmpCrop(s, Tables.documents(s, dir))),
    "q_multimodal_bmp" -> ((s, dir) => bmpStats(s, Tables.documents(s, dir))),
    "q_image_sobel" -> ((s, dir) => bmpSobel(s, Tables.documents(s, dir)))
  )

  def oracleSql: Map[String, String] = Map(
    // the Sobel taps in closed form over the pixel ladder: the green
    // value at (x, y) is a FORMULA, so each kernel term substitutes it
    "q_image_sobel" -> {
      def v(xe: String, ye: String): String =
        s"((base + ($xe) * 31 + ($ye) * 17 + 67) % 256)"
      val gx = s"((${v("x+1", "y-1")} + 2 * ${v("x+1", "y")} + ${v("x+1", "y+1")})" +
        s" - (${v("x-1", "y-1")} + 2 * ${v("x-1", "y")} + ${v("x-1", "y+1")}))"
      val gy = s"((${v("x-1", "y+1")} + 2 * ${v("x", "y+1")} + ${v("x+1", "y+1")})" +
        s" - (${v("x-1", "y-1")} + 2 * ${v("x", "y-1")} + ${v("x+1", "y-1")}))"
      s"""WITH d AS (SELECT doc_id,
         |   CAST(16 + doc_id % 17 AS INT) AS width,
         |   CAST(8 + doc_id % 13 AS INT) AS height,
         |   ${graft.functions.PortableSql.seedLadderSql("doc_id")} AS base
         |  FROM documents),
         | e AS (SELECT doc_id, width, height,
         |   abs($gx) + abs($gy) AS e
         |  FROM d, LATERAL unnest(generate_series(1, width - 2)) AS gxs(x),
         |   LATERAL unnest(generate_series(1, height - 2)) AS gys(y))
         |SELECT doc_id, width, height,
         | CAST(count(*) AS BIGINT) AS n_interior,
         | CAST(sum(e) AS BIGINT) AS edge_energy,
         | CAST(max(e) AS BIGINT) AS max_grad
         |FROM e GROUP BY doc_id, width, height""".stripMargin
    },
    // Every decoded fact from the pixel ladder alone; n_bytes is the
    // exact container size (54 + height * 4-byte-padded BGR rows).
    // crop-box ladder sums in closed form; n_bytes re-applies the BMP
    // container formula at the CROP width (fresh 4-byte row padding)
    "q_image_crop" ->
      s"""WITH d AS (SELECT doc_id,
        |   CAST(16 + doc_id % 17 AS INT) AS width,
        |   CAST(8 + doc_id % 13 AS INT) AS height,
        |   ${graft.functions.PortableSql.seedLadderSql("doc_id")} AS base
        |  FROM documents),
        | c AS (SELECT doc_id, base,
        |   width // 4 AS x0, height // 4 AS y0,
        |   width // 2 AS cw, height // 2 AS ch FROM d),
        | px AS (SELECT doc_id, cw, ch,
        |   (base + (x0 + cx) * 31 + (y0 + cy) * 17) % 256 AS r,
        |   (base + (x0 + cx) * 31 + (y0 + cy) * 17 + 67) % 256 AS g,
        |   (base + (x0 + cx) * 31 + (y0 + cy) * 17 + 134) % 256 AS b
        |  FROM c, LATERAL unnest(generate_series(0, cw - 1)) AS gx(cx),
        |   LATERAL unnest(generate_series(0, ch - 1)) AS gy(cy))
        |SELECT doc_id,
        | CAST(max(cw) AS INT) AS crop_width,
        | CAST(max(ch) AS INT) AS crop_height,
        | CAST(54 + max(ch) * ((3 * max(cw) + 3) // 4 * 4) AS BIGINT) AS n_bytes,
        | CAST(sum(r) AS BIGINT) AS sum_r,
        | CAST(sum(g) AS BIGINT) AS sum_g,
        | CAST(sum(b) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id""".stripMargin,

    "q_multimodal_bmp" ->
      s"""WITH d AS (SELECT doc_id,
        |   CAST(16 + doc_id % 17 AS INT) AS width,
        |   CAST(8 + doc_id % 13 AS INT) AS height,
        |   ${graft.functions.PortableSql.seedLadderSql("doc_id")} AS base
        |  FROM documents),
        | px AS (SELECT doc_id, width, height, base, x, y,
        |   (base + x * 31 + y * 17) % 256 AS r,
        |   (base + x * 31 + y * 17 + 67) % 256 AS g,
        |   (base + x * 31 + y * 17 + 134) % 256 AS b
        |  FROM d, LATERAL unnest(generate_series(0, width - 1)) AS gx(x),
        |   LATERAL unnest(generate_series(0, height - 1)) AS gy(y)),
        | full_sums AS (SELECT doc_id, sum(r) AS sum_r, sum(g) AS sum_g,
        |   sum(b) AS sum_b FROM px GROUP BY doc_id),
        | tpx AS (SELECT doc_id, width, height, base, tx, ty,
        |   ((base + (2*tx) * 31 + (2*ty) * 17) % 256
        |    + (base + (2*tx+1) * 31 + (2*ty) * 17) % 256
        |    + (base + (2*tx) * 31 + (2*ty+1) * 17) % 256
        |    + (base + (2*tx+1) * 31 + (2*ty+1) * 17) % 256) // 4 AS tr,
        |   ((base + (2*tx) * 31 + (2*ty) * 17 + 67) % 256
        |    + (base + (2*tx+1) * 31 + (2*ty) * 17 + 67) % 256
        |    + (base + (2*tx) * 31 + (2*ty+1) * 17 + 67) % 256
        |    + (base + (2*tx+1) * 31 + (2*ty+1) * 17 + 67) % 256) // 4 AS tg,
        |   ((base + (2*tx) * 31 + (2*ty) * 17 + 134) % 256
        |    + (base + (2*tx+1) * 31 + (2*ty) * 17 + 134) % 256
        |    + (base + (2*tx) * 31 + (2*ty+1) * 17 + 134) % 256
        |    + (base + (2*tx+1) * 31 + (2*ty+1) * 17 + 134) % 256) // 4 AS tb
        |  FROM d, LATERAL unnest(generate_series(0, width // 2 - 1)) AS gx(tx),
        |   LATERAL unnest(generate_series(0, height // 2 - 1)) AS gy(ty)),
        | thumb_sums AS (SELECT doc_id, sum(tr) AS thumb_sum_r,
        |   sum(tg) AS thumb_sum_g, sum(tb) AS thumb_sum_b
        |  FROM tpx GROUP BY doc_id)
        |SELECT d.doc_id, d.width, d.height,
        | CAST(54 + d.height * ((3 * d.width + 3) // 4 * 4) AS BIGINT) AS n_bytes,
        | CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
        | CAST(sum_b AS BIGINT) AS sum_b,
        | CAST(d.width // 2 AS INT) AS thumb_width,
        | CAST(d.height // 2 AS INT) AS thumb_height,
        | CAST(thumb_sum_r AS BIGINT) AS thumb_sum_r,
        | CAST(thumb_sum_g AS BIGINT) AS thumb_sum_g,
        | CAST(thumb_sum_b AS BIGINT) AS thumb_sum_b
        |FROM d JOIN full_sums USING (doc_id) JOIN thumb_sums USING (doc_id)""".stripMargin
  )
}
