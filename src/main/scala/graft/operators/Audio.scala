package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Decoded facts of one WAV blob. */
case class WavInfo(
    doc_id: Long,
    n_bytes: Long,
    channels: Int,
    sample_rate: Int,
    bits_per_sample: Int,
    n_frames: Long,
    duration_ms: Long,
    sum_squares: Long,
    sum_abs: Long)

/** A REAL audio codec — WAVE/PCM is a plain byte format, so unlike the
  * image/video paths (StubDecoder — those need native libraries this
  * container lacks) the audio decode is the genuine article: a RIFF
  * chunk walker that validates magic numbers, reads the fmt chunk,
  * SKIPS unknown chunks (the encoder plants a LIST chunk precisely so a
  * parser that assumes fixed offsets fails), and streams little-endian
  * int16 frames out of the data chunk.
  *
  * The test blobs are encoded from a deterministic integer signal, so
  * the DuckDB oracle reproduces every decoded fact (frame counts,
  * duration, energy sums) ARITHMETICALLY — any encoder/parser bug
  * (endianness, header offset, chunk padding) breaks the hash match.
  */
object WavCodec {

  /** Canonical little-endian WAVE/PCM16 encoder, with a LIST/INFO chunk
    * between fmt and data (real files carry metadata chunks; a decoder
    * must walk, not assume offset 44).
    */
  def encode(channels: Int, sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataBytes = samples.length * 2
    val listPayload = "INFO".getBytes("US-ASCII")
    val riffSize = 4 + (8 + 16) + (8 + listPayload.length) + (8 + dataBytes)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16.toShort) // bits
    out.put("LIST".getBytes("US-ASCII")).putInt(listPayload.length).put(listPayload)
    out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    samples.foreach(s => out.putShort(s))
    out.array()
  }

  /** Chunk-walking decoder. Throws on anything that is not a PCM16 WAV —
    * a media pipeline must dead-letter corrupt blobs loudly, not emit
    * garbage stats.
    */
  def decode(docId: Long, bytes: Array[Byte]): WavInfo = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); bb.get(a); new String(a, "US-ASCII")
    }
    require(ascii(4) == "RIFF", s"doc $docId: not a RIFF container")
    bb.getInt() // riff size
    require(ascii(4) == "WAVE", s"doc $docId: not a WAVE stream")
    // advance to `pos`, tolerating a missing pad byte on the final chunk
    def seek(pos: Int): Unit = bb.position(math.min(pos, bb.limit()))
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var nSamples = 0L
    var sumSquares = 0L
    var sumAbs = 0L
    var sawData = false
    while (bb.remaining() >= 8) {
      val id = ascii(4)
      val size = bb.getInt()
      // a corrupt negative size would walk the cursor BACKWARDS (infinite
      // loop) or record negative frame counts — reject before using it
      require(size >= 0 && size <= bb.remaining(),
        s"doc $docId: chunk '$id' declares size $size with ${bb.remaining()} bytes left")
      id match {
        case "fmt " =>
          require(size >= 16,
            s"doc $docId: fmt chunk declares $size bytes (needs >= 16)")
          val fmtStart = bb.position()
          val audioFormat = bb.getShort()
          require(audioFormat == 1, s"doc $docId: not PCM (fmt=$audioFormat)")
          channels = bb.getShort()
          require(channels > 0, s"doc $docId: fmt declares $channels channels")
          sampleRate = bb.getInt()
          require(sampleRate > 0, s"doc $docId: fmt declares sample rate $sampleRate")
          bb.getInt(); bb.getShort() // byte rate, block align
          bits = bb.getShort()
          require(bits == 16, s"doc $docId: only PCM16 supported (bits=$bits)")
          seek(fmtStart + size + (size & 1)) // pad-to-even, like any chunk
        case "data" =>
          require(channels > 0, s"doc $docId: data chunk before fmt")
          require(!sawData, s"doc $docId: multiple data chunks")
          val dataStart = bb.position()
          var i = 0
          val n = size / 2
          while (i < n) {
            val v = bb.getShort().toLong
            sumSquares += v * v
            sumAbs += math.abs(v)
            i += 1
          }
          // seek from CHUNK START: an odd data size leaves one unread
          // payload byte before the pad — seeking from the post-read
          // cursor would misalign the walker by one byte
          seek(dataStart + size + (size & 1))
          nSamples = n
          sawData = true
        case _ => // LIST / metadata chunks: walk past (pad to even)
          seek(bb.position() + size + (size & 1))
      }
    }
    require(sawData, s"doc $docId: no data chunk")
    val frames = nSamples / channels
    WavInfo(docId, bytes.length.toLong, channels, sampleRate, bits,
      frames, frames * 1000L / sampleRate, sumSquares, sumAbs)
  }

  /** Decode to raw PCM (channels, rate, interleaved samples) — the DSP
    * entry point: same chunk walker as [[decode]], but the data chunk is
    * materialized instead of folded into stats.
    */
  def decodeSamples(docId: Long, bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); bb.get(a); new String(a, "US-ASCII")
    }
    require(ascii(4) == "RIFF" && { bb.getInt(); ascii(4) == "WAVE" },
      s"doc $docId: not a RIFF/WAVE container")
    def seek(pos: Int): Unit = bb.position(math.min(pos, bb.limit()))
    var channels = 0
    var sampleRate = 0
    var out: Array[Short] = null
    while (bb.remaining() >= 8) {
      val id = ascii(4)
      val size = bb.getInt()
      require(size >= 0 && size <= bb.remaining(),
        s"doc $docId: chunk '$id' declares size $size with ${bb.remaining()} bytes left")
      id match {
        case "fmt " =>
          require(size >= 16,
            s"doc $docId: fmt chunk declares $size bytes (needs >= 16)")
          val fmtStart = bb.position()
          require(bb.getShort() == 1, s"doc $docId: not PCM")
          channels = bb.getShort()
          require(channels > 0, s"doc $docId: fmt declares $channels channels")
          sampleRate = bb.getInt()
          require(sampleRate > 0, s"doc $docId: fmt declares sample rate $sampleRate")
          bb.getInt(); bb.getShort()
          require(bb.getShort() == 16, s"doc $docId: only PCM16 supported")
          seek(fmtStart + size + (size & 1))
        case "data" =>
          require(channels > 0 && out == null,
            s"doc $docId: data chunk before fmt or duplicated")
          val dataStart = bb.position()
          out = Array.fill(size / 2)(bb.getShort())
          seek(dataStart + size + (size & 1))
        case _ => seek(bb.position() + size + (size & 1))
      }
    }
    require(out != null, s"doc $docId: no data chunk")
    (channels, sampleRate, out)
  }

  /** Decimate by `factor`: keep every factor-th FRAME (all channels of
    * it), halve-or-divide the rate — the no-filter downsampler (a
    * production resampler adds an anti-alias low-pass; the container
    * and interleave mechanics are what the codec layer owns).
    */
  def decimate(channels: Int, sampleRate: Int, samples: Array[Short],
      factor: Int): (Int, Array[Short]) = {
    val frames = samples.length / channels
    val keptFrames = (frames + factor - 1) / factor
    val out = new Array[Short](keptFrames * channels)
    var f = 0
    while (f < keptFrames) {
      var c = 0
      while (c < channels) {
        out(f * channels + c) = samples(f * factor * channels + c)
        c += 1
      }
      f += 1
    }
    (sampleRate / factor, out)
  }
}

/** Audio flavor of the multimodal family: a deterministic PCM signal per
  * doc is ENCODED into real WAV bytes and DECODED back through the real
  * parser, per-partition (one codec per task, the mapInPandas shape).
  * The oracle computes the same facts from the signal arithmetic — the
  * byte round-trip is exactly what is under test.
  */
object Audio {

  /** Deterministic per-doc signal parameters (int64-safe ladders). */
  private def params(docId: Long): (Int, Int, Int) = {
    val ch = (1 + docId % 2).toInt
    val rate = (8000 * (1 + docId % 3)).toInt
    val frames = (200 + (docId % 101) * 7).toInt
    (ch, rate, frames)
  }

  /** Sample j of the doc's interleaved PCM stream, in [-32768, 32767].
    * Seeded by the shared PortableSql.seedLadder.
    */
  private def sample(docId: Long, j: Long): Short =
    ((graft.functions.PortableSql.seedLadder(docId) + j * 1299721L)
      % 65536L - 32768L).toShort

  def wavStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (ch, rate, frames) = params(id)
        val samples = Array.tabulate(frames * ch)(j => sample(id, j.toLong))
        WavCodec.decode(id, WavCodec.encode(ch, rate, samples))
      }
    }.toDF()
  }

  /** Downsample-by-2 through the REAL codec end to end: encode the
    * deterministic signal, decode raw PCM back out of the container,
    * decimate frames, re-encode at half rate, decode the NEW file for
    * its stats. Any bug in either direction of the codec or in the
    * frame/channel interleave breaks the arithmetic oracle, which
    * reconstructs the kept-sample set relationally ((j DIV ch) even).
    */
  def wavDownsample(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (ch, rate, frames) = params(id)
        val wav = WavCodec.encode(ch, rate,
          Array.tabulate(frames * ch)(j => sample(id, j.toLong)))
        val (ch2, rate2, pcm) = WavCodec.decodeSamples(id, wav)
        val (outRate, outPcm) = WavCodec.decimate(ch2, rate2, pcm, factor = 2)
        WavCodec.decode(id, WavCodec.encode(ch2, outRate, outPcm))
      }
    }.toDF()
  }

  /** Peak-normalization (gain staging) through the REAL codec end to
    * end — the loudness-leveling pass an audio-corpus pipeline runs
    * before feature extraction: decode raw PCM out of the container,
    * compute the per-doc peak, scale every sample by the integer gain
    * floor(32767·1e6 / peak) with SIGN-SPLIT truncating division
    * (abs before dividing — the one integer division semantics both
    * engines share), re-encode, and decode the NEW file for its
    * post-gain peak and energy. The floor guarantees the scaled peak
    * never clips (<= 32767 by construction), so no clamp branch exists
    * to disagree on. The oracle replays the ladder + gain arithmetic
    * relationally.
    */
  def wavNormalize(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (ch, rate, frames) = params(id)
        val wav = WavCodec.encode(ch, rate,
          Array.tabulate(frames * ch)(j => sample(id, j.toLong)))
        val (ch2, rate2, pcm) = WavCodec.decodeSamples(id, wav)
        val peak = math.max(1L, pcm.map(s => math.abs(s.toLong)).max)
        val gain = 32767L * 1000000L / peak
        val out = pcm.map { s =>
          val a = math.abs(s.toLong) * gain / 1000000L
          (if (s < 0) -a else a).toShort
        }
        val (_, _, back) = WavCodec.decodeSamples(id, WavCodec.encode(ch2, rate2, out))
        val peakAfter = back.map(s => math.abs(s.toLong)).max
        val ss = back.map(s => s.toLong * s).sum
        (id, peak, gain, peakAfter, ss)
      }
    }.toDF("doc_id", "peak_before", "gain_ppm", "peak_after", "sum_squares_after")
  }

  /** Every 50th blob truncated mid-header — the corrupt-media rate. */
  val CorruptMod = 50

  /** Media dead-lettering — the U4/U10 error-branch pattern applied to
    * binary columns: corrupt blobs (every [[CorruptMod]]-th, truncated
    * to 20 bytes so the chunk walker's size guard trips) must be
    * COUNTED AND LABELLED, never crash the task or emit garbage stats.
    * The decoder's loud `require`s become per-row catch + status; the
    * oracle reproduces the split arithmetically.
    */
  /** Decode verdict for one blob (the per-row kernel shared by the batch
    * dead-letter audit and its streaming twin): generate, corrupt every
    * [[CorruptMod]]-th, decode through the real parser, catch loudly.
    */
  private[graft] def decodeStatus(id: Long): String = {
    val (ch, rate, frames) = params(id)
    val wav = WavCodec.encode(ch, rate,
      Array.tabulate(frames * ch)(j => sample(id, j.toLong)))
    val bytes = if (id % CorruptMod == 0) wav.take(20) else wav
    try { WavCodec.decode(id, bytes); "decoded" }
    catch { case _: IllegalArgumentException => "dead_letter" }
  }

  def wavDeadLetter(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map(id => (id, decodeStatus(id)))
    }.toDF("doc_id", "status")
      .groupBy("status").agg(count(lit(1)).as("n"))
  }

  /** Goertzel (1958) single-bin DFT energies at RATIONAL-COSINE bins —
    * the tone-detection filter (the DTMF trick) run where it is EXACT
    * integer arithmetic: at bins with 2cos(w) in {1, 0, -1} (f = rate/6,
    * rate/4, rate/3) the recurrence s_n = x_n + 2cos(w)s_{n-1} - s_{n-2}
    * stays in int64, so the power s²_{N-1} + s²_{N-2} -
    * 2cos(w)s_{N-1}s_{N-2} is bit-exact cross-engine with no libm
    * trigonometry anywhere. The oracle replays it RELATIONALLY: the
    * recurrence solution is s_n = sum_j U_{n-j} x_j with Chebyshev-U
    * weights that are PERIODIC integers at these bins ([1,1,0,-1,-1,0],
    * [1,0,-1,0], [1,-1,0,1,-1,0]), i.e. a CASE-weighted sum — no
    * sequential fold in SQL. The engine side goes through the REAL WAV
    * container: encode, decode, filter the decoded PCM. Overflow: |s| <=
    * (2N/3)*32768 ~ 4e7 at the corpus frame cap, powers ~5e15 < 2^63.
    *
    * Shape at 100 TB: one codec+filter pass per blob inside
    * mapPartitions (the mapInPandas shape), no shuffle — the output is
    * one narrow fingerprint row per media blob.
    */
  /** The integer Goertzel kernel at a rational-cosine bin. */
  private[graft] def goertzelPower(pcm: Array[Short], twoCos: Long): Long = {
    var s1 = 0L; var s2 = 0L // s_{n-1}, s_{n-2}
    var i = 0
    while (i < pcm.length) {
      val s = pcm(i).toLong + twoCos * s1 - s2
      s2 = s1; s1 = s
      i += 1
    }
    s1 * s1 + s2 * s2 - twoCos * s1 * s2
  }

  def wavGoertzel(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (ch, rate, frames) = params(id)
        val wav = WavCodec.encode(ch, rate,
          Array.tabulate(frames * ch)(j => sample(id, j.toLong)))
        val (_, _, pcm) = WavCodec.decodeSamples(id, wav)
        val dc = { var a = 0L; var i = 0; while (i < pcm.length) { a += pcm(i); i += 1 }; a }
        (id, pcm.length.toLong, dc, goertzelPower(pcm, 1L),
          goertzelPower(pcm, 0L), goertzelPower(pcm, -1L))
      }
    }.toDF("doc_id", "n_samples", "dc", "pow_r6", "pow_r4", "pow_r3")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_audio" -> ((s, dir) => wavStats(s, Tables.documents(s, dir))),
    "q_audio_downsample" -> ((s, dir) => wavDownsample(s, Tables.documents(s, dir))),
    "q_audio_normalize" -> ((s, dir) => wavNormalize(s, Tables.documents(s, dir))),
    "q_audio_goertzel" -> ((s, dir) => wavGoertzel(s, Tables.documents(s, dir))),
    "q_media_deadletter" -> ((s, dir) => wavDeadLetter(s, Tables.documents(s, dir)))
  )

  def oracleSql: Map[String, String] = Map(
    // The decoded facts from the signal arithmetic alone: n_bytes is the
    // exact container layout (12 RIFF/WAVE + 24 fmt + 12 LIST[INFO] +
    // 8 + 2 bytes/sample data); energy sums fold the same ladder.
    "q_multimodal_audio" ->
      s"""WITH p AS (SELECT doc_id,
        |   CAST(1 + doc_id % 2 AS INT) AS channels,
        |   CAST(8000 * (1 + doc_id % 3) AS INT) AS sample_rate,
        |   CAST(200 + (doc_id % 101) * 7 AS BIGINT) AS n_frames
        |  FROM documents),
        | s AS (SELECT doc_id, channels, sample_rate, n_frames,
        |   unnest(generate_series(0, n_frames * channels - 1)) AS j FROM p),
        | v AS (SELECT doc_id, channels, sample_rate, n_frames,
        |   (${graft.functions.PortableSql.seedLadderSql("doc_id")} + j * 1299721)
        |     % 65536 - 32768 AS x
        |  FROM s)
        |SELECT doc_id,
        | CAST(56 + n_frames * channels * 2 AS BIGINT) AS n_bytes,
        | channels, sample_rate,
        | CAST(16 AS INT) AS bits_per_sample,
        | n_frames,
        | CAST(n_frames * 1000 // sample_rate AS BIGINT) AS duration_ms,
        | CAST(sum(x * x) AS BIGINT) AS sum_squares,
        | CAST(sum(abs(x)) AS BIGINT) AS sum_abs
        |FROM v
        |GROUP BY doc_id, channels, sample_rate, n_frames""".stripMargin,

    // the decimated signal, reconstructed relationally: kept samples are
    // exactly those whose FRAME index (j DIV channels) is even, the rate
    // halves, and the container layout formula re-applies to the kept
    // count
    "q_audio_downsample" ->
      s"""WITH p AS (SELECT doc_id,
        |   CAST(1 + doc_id % 2 AS INT) AS channels,
        |   CAST(8000 * (1 + doc_id % 3) AS INT) AS sample_rate,
        |   CAST(200 + (doc_id % 101) * 7 AS BIGINT) AS n_frames
        |  FROM documents),
        | s AS (SELECT doc_id, channels, sample_rate, n_frames,
        |   unnest(generate_series(0, n_frames * channels - 1)) AS j FROM p),
        | v AS (SELECT doc_id, channels, sample_rate, n_frames, j,
        |   (${graft.functions.PortableSql.seedLadderSql("doc_id")} + j * 1299721)
        |     % 65536 - 32768 AS x
        |  FROM s
        |  WHERE (j // channels) % 2 = 0),
        | g AS (SELECT doc_id, channels, sample_rate,
        |   (n_frames + 1) // 2 AS out_frames,
        |   CAST(sum(x * x) AS BIGINT) AS sum_squares,
        |   CAST(sum(abs(x)) AS BIGINT) AS sum_abs
        |  FROM v GROUP BY doc_id, channels, sample_rate, n_frames)
        |SELECT doc_id,
        | CAST(56 + out_frames * channels * 2 AS BIGINT) AS n_bytes,
        | channels,
        | CAST(sample_rate // 2 AS INT) AS sample_rate,
        | CAST(16 AS INT) AS bits_per_sample,
        | out_frames AS n_frames,
        | CAST(out_frames * 1000 // (sample_rate // 2) AS BIGINT) AS duration_ms,
        | sum_squares, sum_abs
        |FROM g""".stripMargin,

    // peak + gain arithmetic replayed on the ladder; the codec roundtrip
    // must hand back exactly the scaled samples for the post-gain stats
    // to land on this closed form
    "q_audio_normalize" ->
      s"""WITH p AS (SELECT doc_id,
        |   CAST(1 + doc_id % 2 AS INT) AS channels,
        |   CAST(200 + (doc_id % 101) * 7 AS BIGINT) AS n_frames
        |  FROM documents),
        | s AS (SELECT doc_id,
        |   unnest(generate_series(0, n_frames * channels - 1)) AS j FROM p),
        | v AS (SELECT doc_id,
        |   (${graft.functions.PortableSql.seedLadderSql("doc_id")} + j * 1299721)
        |     % 65536 - 32768 AS x
        |  FROM s),
        | pk AS (SELECT doc_id, greatest(max(abs(x)), 1) AS peak_before
        |  FROM v GROUP BY 1),
        | g AS (SELECT doc_id, peak_before,
        |   CAST(32767 AS BIGINT) * 1000000 // peak_before AS gain_ppm FROM pk),
        | y AS (SELECT v.doc_id,
        |   CASE WHEN x < 0 THEN -((-x) * gain_ppm // 1000000)
        |        ELSE (x * gain_ppm) // 1000000 END AS y
        |  FROM v JOIN g USING (doc_id))
        |SELECT y.doc_id, g.peak_before, g.gain_ppm,
        | CAST(max(abs(y)) AS BIGINT) AS peak_after,
        | CAST(sum(y * y) AS BIGINT) AS sum_squares_after
        |FROM y JOIN g ON y.doc_id = g.doc_id
        |GROUP BY y.doc_id, g.peak_before, g.gain_ppm""".stripMargin,

    "q_media_deadletter" ->
      s"""SELECT CASE WHEN doc_id % $CorruptMod = 0
         |   THEN 'dead_letter' ELSE 'decoded' END AS status,
         | count(*) AS n
         |FROM documents GROUP BY 1""".stripMargin,

    // the Goertzel recurrence replayed relationally: s_n = sum_j
    // U_{n-j} x_j with periodic integer Chebyshev-U weights at the
    // rational-cosine bins (see wavGoertzel)
    "q_audio_goertzel" -> {
      def cheb(m: String, w: Seq[Int]): String =
        s"(CASE CAST(($m) % ${w.length} AS INT) " +
          w.zipWithIndex.map { case (c, i) => s"WHEN $i THEN $c" }.mkString(" ") +
          " ELSE 0 END)"
      def pair(tag: String, w: Seq[Int]): String =
        s"""CAST(sum(${cheb("n - 1 - j", w)} * x) AS BIGINT) AS ${tag}1,
           |   CAST(sum(CASE WHEN j <= n - 2
           |     THEN ${cheb("n - 2 - j", w)} * x ELSE 0 END) AS BIGINT) AS ${tag}2""".stripMargin
      s"""WITH p AS (SELECT doc_id,
         |   CAST(1 + doc_id % 2 AS INT) AS channels,
         |   CAST(200 + (doc_id % 101) * 7 AS BIGINT) AS n_frames
         |  FROM documents),
         | s AS (SELECT doc_id, n_frames * channels AS n,
         |   unnest(generate_series(0, n_frames * channels - 1)) AS j FROM p),
         | v AS (SELECT doc_id, n, j,
         |   (${graft.functions.PortableSql.seedLadderSql("doc_id")} + j * 1299721)
         |     % 65536 - 32768 AS x
         |  FROM s),
         | g AS (SELECT doc_id, n,
         |   CAST(sum(x) AS BIGINT) AS dc,
         |   ${pair("a", Seq(1, 1, 0, -1, -1, 0))},
         |   ${pair("b", Seq(1, 0, -1, 0))},
         |   ${pair("c", Seq(1, -1, 0, 1, -1, 0))}
         |  FROM v GROUP BY doc_id, n)
         |SELECT doc_id, n AS n_samples, dc,
         | a1 * a1 + a2 * a2 - a1 * a2 AS pow_r6,
         | b1 * b1 + b2 * b2 AS pow_r4,
         | c1 * c1 + c2 * c2 + c1 * c2 AS pow_r3
         |FROM g""".stripMargin
    }
  )
}
