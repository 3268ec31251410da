package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, StubDecoder}

/** The partition-wise media decode must agree with a direct driver-side
  * decode of the same bytes, and frame sampling must cover exactly every
  * FrameStride-th frame.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("metadata matches a direct decode; one decoder result per row") {
    val text = "hello multimodal world, this is a fake image payload"
    val out = Multimodal.mediaMetadata(spark, docs((7L, text))).collect()
    assert(out.length == 1)
    val m = out.head
    val dec = new StubDecoder
    val bytes = text.getBytes("UTF-8")
    val (w, h, c) = dec.decodeHeader(bytes)
    assert(m.n_bytes == bytes.length.toLong)
    assert((m.width, m.height, m.channels) == ((w, h, c)))
    assert(m.checksum == dec.checksum(bytes, 0, bytes.length))
  }

  test("frame sampling emits every 4th 64-byte frame with correct hashes") {
    val text = "x" * 300 // frames 0..4 -> sampled 0 and 4
    val out = Multimodal.frameSamples(spark, docs((1L, text))).collect()
      .map(f => f.frame_idx -> f.frame_hash).toMap
    assert(out.keySet == Set(0, 4))
    val dec = new StubDecoder
    val bytes = text.getBytes("UTF-8")
    assert(out(0) == dec.checksum(bytes, 0, 64))
    assert(out(4) == dec.checksum(bytes, 256, 320)) // tail frame clipped at 300
  }

  test("resize keeps every 3rd byte and derives thumbnail dims") {
    val text = "abcdefghij" // 10 bytes -> thumb bytes a,d,g,j
    val out = Multimodal.thumbnails(spark, docs((3L, text))).collect().head
    assert(out.orig_bytes == 10L)
    assert(out.thumb_bytes == 4L)
    val dec = new StubDecoder
    assert(out.thumb_checksum ==
      dec.checksum("adgj".getBytes("UTF-8"), 0, 4))
    val (w, h, _) = dec.decodeHeader(text.getBytes("UTF-8"))
    assert(out.thumb_width == w / 3 && out.thumb_height == h / 3)
  }

  test("empty-adjacent edge: short doc yields exactly frame 0") {
    val out = Multimodal.frameSamples(spark, docs((2L, "tiny"))).collect()
    assert(out.map(_.frame_idx).toSeq == Seq(0))
  }
}
