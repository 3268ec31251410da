package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fpe

/** Property-based invariants (SURVEY §5.2): the crypto and masking
  * kernels must hold for ALL inputs in their domains, not just the
  * fixture rows. Generators are driven with deterministic seeds (the
  * scalatest-scalacheck bridge artifact is not on the offline
  * classpath, so the sampling loop is explicit).
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val key = "property-spec-key-0123456789abcd".getBytes("UTF-8")
  private val digitStrings: Gen[String] = for {
    n <- Gen.choose(1, 24)
    ds <- Gen.listOfN(n, Gen.numChar)
  } yield ds.mkString

  private val pans: Gen[String] = for {
    n <- Gen.choose(13, 19)
    ds <- Gen.listOfN(n, Gen.numChar)
  } yield ds.mkString

  test("Goertzel power is a PSD quadratic form: non-negative for every signal") {
    // power = s1² + s2² - 2c·s1·s2 with |2c| <= 2 is positive
    // semi-definite, so NO pcm input may produce a negative energy
    val pcms: Gen[Array[Short]] = for {
      n <- Gen.choose(0, 64)
      xs <- Gen.listOfN(n, Gen.chooseNum(Short.MinValue, Short.MaxValue))
    } yield xs.map(_.toShort).toArray
    forAll(pcms) { pcm =>
      for (twoCos <- Seq(-1L, 0L, 1L))
        assert(graft.operators.Audio.goertzelPower(pcm, twoCos) >= 0L)
    }
  }

  test("FPE: decrypt∘encrypt = id, format preserved, for all digit strings") {
    forAll(digitStrings) { d =>
      val t = Fpe.encrypt(key, d)
      assert(t.length == d.length)
      assert(t.forall(_.isDigit))
      assert(Fpe.decrypt(key, t) == d)
    }
  }

  test("FPE padded tokens: >= 16 digits, zfill inverts by original length") {
    forAll(pans) { pan =>
      val tok = Fpe.encryptPadded(key, pan)
      assert(tok.length == math.max(pan.length, 16))
      assert(tok.forall(_.isDigit))
      val raw = tok.substring(tok.length - pan.length)
      assert(Fpe.decrypt(key, raw) == pan)
    }
  }

  test("fused kernels == symbolic chains, for random ASCII documents") {
    // The fused TrigramHashes / RollingFp kernels replaced interpreted
    // higher-order chains whose symbolic forms remain the DuckDB oracle;
    // prove in-engine, on random inputs (multi-space runs, short docs,
    // punctuation), that kernel output is bit-identical to the symbolic
    // Spark expression — the same claim the oracle hash makes, but over
    // a much wider input space than the fixtures.
    import org.apache.spark.sql.functions.{col, expr, split}
    import graft.functions.PortableSql._
    val spark = SparkTestBase.spark
    import spark.implicits._
    val word: Gen[String] = for {
      n <- Gen.choose(1, 20)
      cs <- Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('.', ',', '!')))
    } yield cs.mkString
    val doc: Gen[String] = for {
      n <- Gen.choose(0, 30)
      ws <- Gen.listOfN(n, word)
      sep <- Gen.oneOf(" ", "  ") // double space exercises empty tokens
    } yield ws.mkString(sep)
    forAll(Gen.listOfN(60, doc), n = 3) { docs =>
      val rows = docs.toDF("text")
        .select(
          graft.functions.TrigramHashesExpression.trigramHashes(col("text")).as("k_tri"),
          split(col("text"), " ").as("toks"),
          graft.functions.RollingFpExpression.rollingFp(col("text")).as("k_fp"),
          expr(reduceLong(tokenHashes("text", duck = false), "acc", "x",
            s"(acc * 31 + x) % $P", duck = false)).as("s_fp"))
        .select(col("k_tri"),
          expr(xform(trigramShingles("toks", duck = false), "g",
            strHash("g"), duck = false)).as("s_tri"),
          col("k_fp"), col("s_fp"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"trigram kernel diverged from symbolic form")
        assert(r.getLong(2) == r.getLong(3),
          s"rolling-fp kernel diverged from symbolic form")
      }
    }
  }

  test("bitLen ladder == JDK bit length, for random and boundary longs") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val rnd = new scala.util.Random(11)
    val edges = (0 to 47).flatMap(k => Seq((1L << k) - 1, 1L << k, (1L << k) + 1))
    val vals = (edges ++ Seq.fill(200)(math.abs(rnd.nextLong()) % (1L << 48)))
      .filter(x => x >= 1 && x < (1L << 48)).distinct
    val rows = vals.toDF("x")
      .withColumn("bl", expr(graft.functions.PortableSql.bitLen("x")))
      .select(col("x"), col("bl").cast("long")).collect()
    rows.foreach { r =>
      val expected = 64 - java.lang.Long.numberOfLeadingZeros(r.getLong(0))
      assert(r.getLong(1) == expected, s"x=${r.getLong(0)}")
    }
  }

  test("mask: first 6 + six asterisks + last 4, for all valid PAN lengths") {
    import org.apache.spark.sql.functions.col
    import graft.ingest.TxnPipeline
    val spark = SparkTestBase.spark
    import spark.implicits._
    forAll(Gen.listOfN(40, pans), n = 5) { ps =>
      val out = ps.toDF("pan")
        .select(col("pan"), TxnPipeline.maskPan(col("pan")).as("m"))
        .collect()
      assert(out.length == ps.length)
      out.foreach { r =>
        val (pan, m) = (r.getString(0), r.getString(1))
        assert(m == pan.take(6) + "******" + pan.takeRight(4))
        assert(m.length == 16) // fixed shape regardless of PAN length
      }
    }
  }

  test("BPE merge prefix: token count non-increasing in rule count, floor 1") {
    val words = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    forAll(words, n = 300) { w =>
      import graft.functions.BpeMerges
      val counts = (0 to BpeMerges.Merges.length)
        .map(n => BpeMerges.mergedLenN(w, n))
      assert(counts.head == w.codePointCount(0, w.length))
      assert(counts.last >= 1)
      assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
        s"merges must never grow the token count: $w -> $counts")
    }
  }

  test("portable integer sqrt == exact floor sqrt across [0, 2^52), via real SQL") {
    import org.apache.spark.sql.functions.{col, expr}
    import graft.functions.PortableSql.isqrtSql
    val spark = SparkTestBase.spark
    import spark.implicits._
    val xs = (Seq(0L, 1L, 2L, 3L, 4L, 15L, 16L, (1L << 52) - 1, 1L << 51,
      (1L << 26) * ((1L << 26) - 1)) ++ // just below a perfect square
      (1 to 400).map { i =>
        val bits = 1 + (i * 7919) % 52
        ((i.toLong * 2654435761L) & ((1L << bits) - 1)).abs
      }).distinct
    val out = xs.toDF("x")
      .withColumn("isq", expr(isqrtSql("x", duck = false)))
      .select(col("x"), col("isq"))
      .collect()
    out.foreach { r =>
      val (x, got) = (r.getLong(0), r.getLong(1))
      val want = {
        var w = math.sqrt(x.toDouble).toLong
        while (w * w > x) w -= 1
        while ((w + 1) * (w + 1) <= x) w += 1
        w
      }
      assert(got == want, s"isqrt($x): got $got want $want")
    }
  }

  test("postings varint cost formula == actual LEB128 length, for random longs") {
    def leb128Len(x: Long): Long = {
      var v = x; var n = 0L
      do { v >>>= 7; n += 1 } while (v != 0)
      n
    }
    def ladder(x: Long): Long = {
      // max(1, ceil(bitLen(x)/7)) — the q_postings_delta cost
      val bits = 64 - java.lang.Long.numberOfLeadingZeros(x) max 0
      math.max(1L, (bits + 6) / 7)
    }
    val longs = Gen.chooseNum(0L, Long.MaxValue)
    forAll(longs, n = 500)(x => assert(ladder(x) == leb128Len(x), s"x=$x"))
    Seq(0L, 1L, 127L, 128L, 16383L, 16384L, Long.MaxValue)
      .foreach(x => assert(ladder(x) == leb128Len(x), s"boundary $x"))
  }
}
