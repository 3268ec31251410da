package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAggregate.mgSketch

/** The Misra–Gries guarantees must hold for ANY stream and ANY merge
  * order — exercised over random skewed streams with forced partial
  * buffers (repartition → map-side sketches merged at the exchange).
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("every heavy key is caught within the n/(k+1) undercount bound") {
    import spark.implicits._
    val k = 4
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val keys = Seq.fill(2000) {
        val r = rnd.nextDouble()
        if (r < 0.4) 1L // planted heavy hitter ~40%
        else if (r < 0.6) 2L // borderline ~20%
        else rnd.nextInt(50).toLong + 10L
      }
      val n = keys.size.toLong
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sketch = keys.toDF("k").repartition(7)
        .agg(mgSketch(col("k"), k).as("mg"))
        .collect()(0).getMap[Long, Long](0)
      val bound = n / (k + 1)
      exact.filter(_._2 > bound).foreach { case (key, cnt) =>
        val est = sketch.get(key)
        assert(est.isDefined, s"seed=$seed: heavy key $key (cnt=$cnt) missing")
        assert(cnt - est.get <= bound,
          s"seed=$seed: key $key undercount ${cnt - est.get} > $bound")
        assert(est.get <= cnt, s"seed=$seed: key $key OVERcounted")
      }
      assert(sketch.size <= k, s"seed=$seed: summary exceeded capacity")
    }
  }

  test("Count-Min is linear: partitioning cannot change the sketch; never undercounts") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val keys = Seq.fill(3000)(rnd.nextInt(40).toLong)
    val a = keys.toDF("k").repartition(1)
      .agg(graft.functions.CountMinAggregate.cmSketch(col("k"))).collect()(0).getSeq[Long](0)
    val b = keys.toDF("k").repartition(13)
      .agg(graft.functions.CountMinAggregate.cmSketch(col("k"))).collect()(0).getSeq[Long](0)
    assert(a == b, "merge order changed a linear sketch")
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, cnt) =>
      val est = (0 until graft.functions.CountMinAggregate.Depth).map { d =>
        a(d * graft.functions.CountMinAggregate.Width +
          graft.functions.CountMinAggregate.cell(k, d))
      }.min
      assert(est >= cnt, s"key $k undercounted: $est < $cnt")
    }
  }
}
