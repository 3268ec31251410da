package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.JaroWinklerKernel
import graft.operators.StringSimOps

class StringSimSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("Jaro-Winkler kernel reproduces the published vectors (DuckDB-verified values)") {
    def jw(a: String, b: String) = JaroWinklerKernel.similarity(a, b)
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("small ring", "small ramp") - 0.88) < 1e-15)
    // below the 0.7 boost threshold the Winkler bonus must NOT fire
    assert(math.abs(jw("abcdef", "abzzzz") - 0.5555555555555555) < 1e-15)
    assert(jw("ab", "") == 0.0 && jw("", "") == 1.0)
    assert(jw("same", "same") == 1.0)
  }

  test("kernel is symmetric and bounded on random strings") {
    val rnd = new scala.util.Random(3)
    (1 to 500).foreach { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val s = JaroWinklerKernel.similarity(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s == JaroWinklerKernel.similarity(b, a), s"asym: '$a' '$b'")
    }
  }

  test("jw bound screen is SOUND on random strings and selective on real blocks") {
    // soundness on adversarial random pairs: whenever the screen says
    // "cannot reach", the exact kernel must agree
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val a = rnd.alphanumeric.take(1 + rnd.nextInt(20)).mkString
      val b = rnd.alphanumeric.take(1 + rnd.nextInt(20)).mkString
      if (!JaroWinklerKernel.mayReachMicro(a, b, 850000L))
        assert(math.floor(JaroWinklerKernel.similarity(a, b) * 1e6) < 850000,
          s"UNSOUND screen: '$a' vs '$b'")
    }
    // and on every REAL brand-blocked candidate pair of the test
    // dimension (the exact population q_er_fs_score scores)
    import org.apache.spark.sql.functions._
    val p = Tables.part(spark, dir)
      .select(col("p_partkey").as("k"), col("p_name").as("n"),
        col("p_brand").as("brand"), col("p_size").as("s"))
    val pairs = p.join(p.select(col("k").as("k2"), col("n").as("n2"),
        col("brand"), col("s").as("s2")), Seq("brand"))
      .filter(col("k") < col("k2") &&
        abs(col("s") - col("s2")) <= graft.operators.StringSimOps.FsSizeBand)
      .select(col("n"), col("n2")).collect()
    assert(pairs.nonEmpty)
    var skipped = 0
    pairs.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      if (!JaroWinklerKernel.mayReachMicro(a, b, 850000L)) {
        skipped += 1
        assert(math.floor(JaroWinklerKernel.similarity(a, b) * 1e6) < 850000,
          s"UNSOUND screen on real pair: '$a' vs '$b'")
      }
    }
    info(s"screen skip rate on ${pairs.length} real block pairs: " +
      s"${skipped * 100 / pairs.length}%")
    // the screen must never rule out a pair that actually reaches weak:
    // verified above; it must also rule out a meaningful share or the
    // prefilter is dead weight
    assert(skipped * 10 >= pairs.length,
      s"screen skipped only $skipped of ${pairs.length} — not selective")
  }

  test("jw bound screen never skips past the Long-overflow length bound") {
    // l1*l2 > 2^37 would overflow the cross-multiplied comparison — the
    // guard must return true (never skip) instead of a garbage verdict
    // (ADVICE r14). 400k x 400k chars crosses the bound.
    val big1 = "a" * 400000
    val big2 = "b" * 400000 // zero character overlap: an unguarded
                            // screen would confidently (and unsafely) skip
    assert(JaroWinklerKernel.mayReachMicro(big1, big2, 850000L),
      "past the overflow bound the screen must decline to skip")
    // just under the bound the screen still works normally
    assert(!JaroWinklerKernel.mayReachMicro("abc", "xyz", 850000L))
  }

  test("levPairs returns only sub-threshold distances over distinct names") {
    val rows = StringSimOps.levPairs(Tables.part(spark, dir)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) >= 1 && r.getInt(2) <= StringSimOps.LevMax)
      assert(r.getString(0) < r.getString(1))
    }
  }

  test("jwPairs agree with a driver-side kernel recomputation") {
    val rows = StringSimOps.jwPairs(Tables.part(spark, dir)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = math.floor(
        JaroWinklerKernel.similarity(r.getString(0), r.getString(1)) * 1e6).toLong
      assert(r.getLong(2) == expect && expect >= StringSimOps.JwMicroMin)
    }
  }

  test("incremental entity resolution equals the full recompute") {
    // q_entity_resolve_incr's proof obligation: batch-vs-vocabulary JW
    // pairs + maintained labels reproduce the full transitive closure —
    // including entity minima, which are lexicographic string minima here.
    val part = Tables.part(spark, dir)
    val full = StringSimOps.entityClusters(part).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    spark.catalog.clearCache()
    val incr = StringSimOps.entityClustersIncremental(part).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    spark.catalog.clearCache()
    assert(incr == full)
    assert(full.nonEmpty)
  }
}
