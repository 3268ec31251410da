package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WavCodec

/** The WAV codec is a REAL format implementation — these tests pin the
  * byte-level contract: exact container layout, chunk walking past
  * metadata, little-endian PCM16 math, and loud rejection of corrupt
  * blobs. (tools note: the encoder's output is also validated externally
  * against Python's stdlib `wave` reader — see the dump below.)
  */
class WavCodecSpec extends AnyFunSuite {

  test("Goertzel rational-cosine bins detect exactly their own tone") {
    import graft.operators.Audio
    // pure period-6 tone 1000*cos(pi*n/3): lands ON the 2cos(w)=1 bin
    val pat6 = Array[Short](1000, 500, -500, -1000, -500, 500)
    val tone6 = Array.tabulate[Short](600)(i => pat6(i % 6))
    val p6 = Audio.goertzelPower(tone6, 1L)
    val p4 = Audio.goertzelPower(tone6, 0L)
    val p3 = Audio.goertzelPower(tone6, -1L)
    assert(p6 > 100L * math.max(p4, p3), s"p6=$p6 p4=$p4 p3=$p3")
    // period-4 tone 1000*cos(pi*n/2) lands on the 2cos(w)=0 bin
    val pat4 = Array[Short](1000, 0, -1000, 0)
    val tone4 = Array.tabulate[Short](600)(i => pat4(i % 4))
    assert(Audio.goertzelPower(tone4, 0L) >
      100L * Audio.goertzelPower(tone4, 1L))
    // a constant (DC) signal excites none of the three bins strongly
    val dc = Array.fill[Short](600)(1000)
    assert(Audio.goertzelPower(tone6, 1L) > 100L * Audio.goertzelPower(dc, 1L))
  }

  private val samples = Array[Short](100, -200, 300, -400, 32767, -32768)

  test("encode -> decode round-trips exact header facts and energy sums") {
    val bytes = WavCodec.encode(channels = 2, sampleRate = 8000, samples)
    // layout: 12 RIFF/WAVE + 24 fmt + 12 LIST(INFO) + 8 data hdr + 12 data
    assert(bytes.length == 56 + samples.length * 2)
    val info = WavCodec.decode(7L, bytes)
    assert(info.channels == 2 && info.sample_rate == 8000 &&
      info.bits_per_sample == 16)
    assert(info.n_frames == 3) // 6 samples / 2 channels
    assert(info.duration_ms == 3 * 1000 / 8000)
    assert(info.sum_abs == samples.map(s => math.abs(s.toLong)).sum)
    assert(info.sum_squares == samples.map(s => s.toLong * s.toLong).sum)
  }

  test("decoder walks past arbitrary extra chunks (no fixed offsets)") {
    val base = WavCodec.encode(1, 16000, samples)
    // splice an unknown odd-sized chunk right after "WAVE" (forces the
    // pad-to-even rule too): id "junk", size 3, payload "abc" + pad
    val junk = "junk".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte]('a', 'b', 'c', 0)
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    // fix the RIFF size field (little-endian) for the inserted bytes
    val riffSize = java.nio.ByteBuffer.wrap(spliced, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt + junk.length
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(4); bb.putInt(riffSize)
    val info = WavCodec.decode(1L, spliced)
    assert(info.n_frames == 6 && info.sample_rate == 16000)
  }

  test("corrupt blobs fail loudly, never emit garbage stats") {
    val good = WavCodec.encode(1, 8000, samples)
    intercept[IllegalArgumentException] {
      WavCodec.decode(1L, "NOTAWAVE".getBytes("US-ASCII") ++ good.drop(8))
    }
    intercept[IllegalArgumentException] { // truncate away the data chunk
      WavCodec.decode(2L, good.take(36))
    }
    val nonPcm = good.clone()
    nonPcm(20) = 3 // fmt audioFormat: 1 (PCM) -> 3 (IEEE float)
    intercept[IllegalArgumentException] { WavCodec.decode(3L, nonPcm) }
    def patchIntLE(b: Array[Byte], at: Int, v: Int): Array[Byte] = {
      val c = b.clone()
      java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .position(at).asInstanceOf[java.nio.ByteBuffer].putInt(v)
      c
    }
    // a negative chunk size must not loop forever or yield negative frames
    intercept[IllegalArgumentException] { WavCodec.decode(4L, patchIntLE(good, 16, -8)) }
    // a declared size past the end of the blob must be rejected up front
    intercept[IllegalArgumentException] {
      WavCodec.decode(5L, patchIntLE(good, 16, 1 << 20))
    }
    // fmt declaring zero channels / zero rate must fail with a labelled
    // error, not a divide-by-zero later
    val zeroCh = good.clone(); zeroCh(22) = 0; zeroCh(23) = 0
    intercept[IllegalArgumentException] { WavCodec.decode(6L, zeroCh) }
    intercept[IllegalArgumentException] { WavCodec.decode(7L, patchIntLE(good, 24, 0)) }
  }

  test("decodeSamples is the exact inverse of encode; decimate keeps even frames per channel") {
    val pcm = Array.tabulate(10 * 2)(i => (i * 31 - 150).toShort) // 10 stereo frames
    val (ch, rate, got) = WavCodec.decodeSamples(1L, WavCodec.encode(2, 8000, pcm))
    assert(ch == 2 && rate == 8000 && got.toSeq == pcm.toSeq)
    val (outRate, out) = WavCodec.decimate(2, 8000, pcm, factor = 2)
    assert(outRate == 4000)
    // kept frames 0,2,4,6,8 -> both channels of each, interleave preserved
    val expect = (0 until 10 by 2).flatMap(f => Seq(pcm(2 * f), pcm(2 * f + 1)))
    assert(out.toSeq == expect)
    // odd frame count keeps the ceiling
    val mono = Array.tabulate(5)(i => i.toShort)
    assert(WavCodec.decimate(1, 8000, mono, 2)._2.toSeq == Seq[Short](0, 2, 4))
  }

  test("dump a reference file for external stdlib validation") {
    // external check (run once, recorded in the commit): python3 -c
    // "import wave; w=wave.open('/tmp/graft_wav_probe.wav');
    //  print(w.getnchannels(), w.getframerate(), w.getsampwidth(),
    //        w.getnframes())"  -> 2 8000 2 3
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graft_wav_probe.wav"),
      WavCodec.encode(2, 8000, samples))
    assert(java.nio.file.Files.size(
      java.nio.file.Paths.get("/tmp/graft_wav_probe.wav")) == 68L)
  }
}
