package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Extracted metadata for one media blob. */
case class MediaMeta(
    doc_id: Long,
    n_bytes: Long,
    width: Int,
    height: Int,
    channels: Int,
    checksum: Long)

/** One sampled "frame" of a media blob. */
case class FrameSample(doc_id: Long, frame_idx: Int, frame_hash: Long)

/** Result of the resize/thumbnail stub. */
case class ThumbMeta(
    doc_id: Long,
    orig_bytes: Long,
    thumb_bytes: Long,
    thumb_width: Int,
    thumb_height: Int,
    thumb_checksum: Long)

/** Stand-in for a native IMAGE/VIDEO codec: real decoders are expensive
  * to initialize and not thread-safe across rows, so exactly ONE
  * instance exists per task (created in mapPartitions, reused for every
  * row of the partition). The byte loops below are the seam where a
  * libjpeg / ffmpeg JNI call would go — everything around them (schema,
  * partitioning, batch shape) is the real production plumbing. The
  * UNCOMPRESSED formats need no native library and are therefore the
  * genuine article — see [[WavCodec]] (RIFF/PCM16, validated against
  * Python's stdlib reader) and [[BmpCodec]] (24bpp BMP with a true
  * box-filter resize, validated against the JDK's own javax.imageio
  * reader). COMPRESSED image formats are real too, via the JDK's
  * built-in ImageIO plugins — see [[ImageIoCodec]] (PNG lossless
  * round-trip, JPEG decode with bounded reconstruction error, and
  * multi-frame animated-GIF frame extraction — a REAL multi-frame
  * container decode, palette-lossless). Only codecs with no JDK decoder
  * (h264 video, mp3 audio) remain stubbed.
  */
final class StubDecoder extends Serializable {
  import Multimodal.{FrameSize, FrameStride, P}

  /** Rolling polynomial checksum over the raw bytes — imperative on
    * purpose: this models work that must see the physical byte stream
    * (entropy scan, signature sniffing), not a columnar expression.
    */
  def checksum(bytes: Array[Byte], from: Int, until: Int): Long = {
    var acc = 0L
    var i = from
    val end = math.min(until, bytes.length)
    while (i < end) {
      acc = (acc * 131 + (bytes(i) & 0xff)) % P
      i += 1
    }
    acc
  }

  /** "Header parse": dimensions and channel count derived from the
    * leading bytes (a real decoder reads its magic + header here).
    */
  def decodeHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    def b(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else 0
    val width = 1 + (b(0) * 256 + b(1)) % 640
    val height = 1 + (b(1) * 256 + b(2)) % 480
    val channels = 1 + b(2) % 3
    (width, height, channels)
  }

  /** "Resize": keep every ResizeFactor-th byte — the downsample shape
    * (a real decoder would box-filter pixels; the output is a genuinely
    * smaller payload built imperatively in a fresh buffer).
    */
  def resize(bytes: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + Multimodal.ResizeFactor - 1) /
      Multimodal.ResizeFactor)
    var i = 0
    while (i < out.length) {
      out(i) = bytes(i * Multimodal.ResizeFactor)
      i += 1
    }
    out
  }

  /** Sample every FrameStride-th FrameSize-byte frame and hash it — the
    * video-frame-sampling shape (seek + decode only the sampled frames).
    */
  def sampleFrames(bytes: Array[Byte]): Iterator[(Int, Long)] = {
    if (bytes.isEmpty) Iterator.empty
    else {
      val lastFrame = (bytes.length - 1) / FrameSize
      Iterator.range(0, lastFrame + 1, FrameStride).map { f =>
        (f, checksum(bytes, f * FrameSize, f * FrameSize + FrameSize))
      }
    }
  }
}

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata alongside. Decode / feature-extract /
  * frame-sample run as batched `mapPartitions` over the typed Dataset —
  * the Scala analogue of a Pandas-UDF `mapInPandas` stage: one decoder
  * init per partition, streaming iterator, no driver collection. The
  * actual codec is STUBBED ([[StubDecoder]] — no media libraries in this
  * container) but does real imperative byte-stream work, and the DuckDB
  * oracle reproduces it arithmetically (the corpus is ASCII, so
  * ascii(substr(text, i, 1)) == byte i-1 of the utf-8 blob).
  */
object Multimodal {

  val P = 1000000007L
  val FrameSize = 64
  val FrameStride = 4
  val ResizeFactor = 3

  private def blobs(spark: SparkSession, docs: DataFrame): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[(Long, Array[Byte])]
  }

  /** Binary-column pipeline: blob → per-partition batched decode →
    * typed metadata rows.
    */
  def mediaMetadata(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    blobs(spark, docs).mapPartitions { rows =>
      val decoder = new StubDecoder // once per task, NOT per row
      rows.map { case (id, blob) =>
        val (w, h, c) = decoder.decodeHeader(blob)
        MediaMeta(id, blob.length.toLong, w, h, c,
          decoder.checksum(blob, 0, blob.length))
      }
    }
  }

  /** Frame sampling: one output row per sampled frame (flatMap — the
    * generator/UDTF shape).
    */
  def frameSamples(spark: SparkSession, docs: DataFrame): Dataset[FrameSample] = {
    import spark.implicits._
    blobs(spark, docs).mapPartitions { rows =>
      val decoder = new StubDecoder
      rows.flatMap { case (id, blob) =>
        decoder.sampleFrames(blob).map { case (f, h) => FrameSample(id, f, h) }
      }
    }
  }

  /** Resize/thumbnail pipeline: downsampled payload produced per row,
    * checked via its size, derived dimensions, and checksum (the binary
    * itself stays executor-side — at scale it would be written back as a
    * new binary column, never collected).
    */
  def thumbnails(spark: SparkSession, docs: DataFrame): Dataset[ThumbMeta] = {
    import spark.implicits._
    blobs(spark, docs).mapPartitions { rows =>
      val decoder = new StubDecoder
      rows.map { case (id, blob) =>
        val t = decoder.resize(blob)
        val (w, h, _) = decoder.decodeHeader(blob)
        ThumbMeta(id, blob.length.toLong, t.length.toLong,
          w / ResizeFactor, h / ResizeFactor,
          decoder.checksum(t, 0, t.length))
      }
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> ((s, dir) =>
      mediaMetadata(s, Tables.documents(s, dir)).toDF()),
    "q_multimodal_frames" -> ((s, dir) =>
      frameSamples(s, Tables.documents(s, dir)).toDF()),
    "q_multimodal_thumbs" -> ((s, dir) =>
      thumbnails(s, Tables.documents(s, dir)).toDF())
  )

  private val byteHash =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |   list_transform(generate_series(__FROM__, __UNTIL__, __STEP__),
       |     i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
       |  (acc, x) -> (acc * 131 + x) % $P)""".stripMargin

  private def hashOver(from: String, until: String, step: String = "1"): String =
    byteHash.replace("__FROM__", from).replace("__UNTIL__", until)
      .replace("__STEP__", step)

  def oracleSql: Map[String, String] = Map(
    "q_multimodal_meta" ->
      s"""SELECT doc_id,
         | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         | CAST(1 + (ascii(substr(text, 1, 1)) * 256 + ascii(substr(text, 2, 1))) % 640 AS INT) AS width,
         | CAST(1 + (ascii(substr(text, 2, 1)) * 256 + ascii(substr(text, 3, 1))) % 480 AS INT) AS height,
         | CAST(1 + ascii(substr(text, 3, 1)) % 3 AS INT) AS channels,
         | ${hashOver("1", "length(text)")} AS checksum
         |FROM documents""".stripMargin,

    "q_multimodal_frames" ->
      s"""SELECT doc_id, CAST(f AS INT) AS frame_idx,
         | ${hashOver(s"f * $FrameSize + 1",
               s"least(f * $FrameSize + $FrameSize, length(text))")} AS frame_hash
         |FROM (SELECT doc_id, text,
         |  unnest(generate_series(0,
         |    CAST(floor((length(text) - 1) / $FrameSize.0) AS BIGINT), $FrameStride)) AS f
         | FROM documents) t""".stripMargin,

    "q_multimodal_thumbs" ->
      s"""SELECT doc_id,
         | CAST(length(text) AS BIGINT) AS orig_bytes,
         | CAST(floor((length(text) + ${ResizeFactor - 1}) / $ResizeFactor.0) AS BIGINT)
         |   AS thumb_bytes,
         | CAST(floor((1 + (ascii(substr(text, 1, 1)) * 256 + ascii(substr(text, 2, 1))) % 640)
         |   / $ResizeFactor.0) AS INT) AS thumb_width,
         | CAST(floor((1 + (ascii(substr(text, 2, 1)) * 256 + ascii(substr(text, 3, 1))) % 480)
         |   / $ResizeFactor.0) AS INT) AS thumb_height,
         | ${hashOver("1", "length(text)", ResizeFactor.toString)} AS thumb_checksum
         |FROM documents""".stripMargin
  )
}
