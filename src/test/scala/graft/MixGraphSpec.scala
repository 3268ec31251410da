package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraphOps, MixOps}

/** Invariants of the domain-mixture planner/resampler and the fixed-point
  * PageRank that hold for ANY corpus, beyond the oracle-pinned fixtures.
  */
class MixGraphSpec extends AnyFunSuite {

  test("water-filling allocation: caps at availability, fills the budget fairly") {
    val spark = SparkTestBase.spark
    val rows = graft.operators.MixOps.waterfill(
        Tables.documents(spark, "/root/testdata/sf0.001")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, avail, _, alloc, capped) =>
      assert(alloc <= avail && alloc >= 0)
      if (capped == 1L) assert(alloc == avail)
    }
    val totalAvail = rows.map(_._2).sum
    val budget = totalAvail * graft.operators.MixOps.WfBudgetPct / 100
    val allocated = rows.map(_._4).sum
    // fixed-point floors under-fill by at most one token per domain plus
    // the per-domain weight mass over the scale
    assert(allocated <= budget)
    assert(budget - allocated <= rows.length + rows.map(_._3).sum,
      s"budget=$budget allocated=$allocated")
    // at least one domain must be left uncapped (the budget is < corpus)
    assert(rows.exists(_._5 == 0L))
    spark.catalog.clearCache()
  }
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("domain mix: ppm shares conserve mass and factors point toward the target") {
    val mix = MixOps.domainMix(Tables.documents(spark, dir)).cache()
    try {
      val n = mix.count()
      // truncating DIV loses < 1 ppm per source on each share column
      val sums = mix.agg(sum("actual_ppm").as("a"), sum("target_ppm").as("t"))
        .collect()(0)
      assert(sums.getLong(0) > 1000000 - n && sums.getLong(0) <= 1000000)
      assert(sums.getLong(1) > 1000000 - n && sums.getLong(1) <= 1000000)
      // factor direction: target above actual ⇒ oversample (>1000), below
      // ⇒ downsample (<=1000); truncation can only pull the factor DOWN
      val wrong = mix.filter(
        (col("target_ppm") > col("actual_ppm") && col("factor_milli") <= 1000) ||
          (col("target_ppm") < col("actual_ppm") && col("factor_milli") > 1000)).count()
      assert(wrong == 0, "a factor points away from its target share")
    } finally spark.catalog.clearCache()
  }

  test("domain resample: realized share lands nearer the target than the original") {
    val docs = Tables.documents(spark, dir)
    val mix = MixOps.domainMix(docs).select("source", "actual_ppm", "target_ppm")
    val rs = MixOps.domainResample(docs)
    val tot = rs.agg(sum("kept_tokens").as("kt")).collect()(0).getLong(0)
    assert(tot > 0)
    val moved = rs.join(mix, "source")
      .select(col("source"), col("actual_ppm"), col("target_ppm"),
        col("kept_tokens"))
      .collect()
    // aggregate distance to target must shrink (per-source monotonicity
    // can wobble by one doc's quantization on a tiny corpus)
    val before = moved.map(r => math.abs(r.getLong(1) - r.getLong(2)).toDouble).sum
    val after = moved.map(r =>
      math.abs(r.getLong(3) * 1000000L / tot - r.getLong(2)).toDouble).sum
    assert(after < before, s"resample moved away from target: $after !< $before")
  }

  test("triangle edges point from the (degree, id)-smaller endpoint") {
    val e = GraphOps.degreeOrientedEdges(spark, dir).cache()
    try {
      assert(e.count() > 0)
      // undirected degree, recomputed independently of the operator
      val d = e.select(explode(array(col("b1"), col("b2"))).as("b"))
        .groupBy("b").agg(count(lit(1)).as("deg"))
      val bad = e
        .join(d.select(col("b").as("b1"), col("deg").as("d1")), "b1")
        .join(d.select(col("b").as("b2"), col("deg").as("d2")), "b2")
        .filter(col("d1") > col("d2") ||
          (col("d1") === col("d2") && col("b1") >= col("b2")))
      assert(bad.count() == 0,
        "an edge's wedge side is not its lower-(degree, id) endpoint")
      // orientation is a bijection on the undirected edge set: same pairs
      val undirected = e.select(least(col("b1"), col("b2")).as("u"),
        greatest(col("b1"), col("b2")).as("v"))
      assert(undirected.distinct().count() == e.count(),
        "re-orientation dropped or duplicated an undirected edge")
    } finally spark.catalog.clearCache()
  }

  test("k-core peel: pendant chain cascades away round by round, core is a fixpoint") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // Triangle a-b-c (2-core) with a pendant path c-d-e: d and e peel in
    // a CASCADE (e first, then d, then the c-d edge) — needs >= 2 rounds.
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("b1", "b2")
    def set(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // after 1 round only the e-pendant is gone; the d-pendant remains
    assert(set(GraphOps.kCorePeel(edges, 2, 1)) ==
      Set(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")))
    // fixpoint: rounds 2, 3, and 8 all give the bare triangle
    val core = Set(("a", "b"), ("a", "c"), ("b", "c"))
    assert(set(GraphOps.kCorePeel(edges, 2, 2)) == core)
    assert(set(GraphOps.kCorePeel(edges, 2, 3)) == core)
    assert(set(GraphOps.kCorePeel(edges, 2, 8)) == core)
    // k above the max core empties the graph
    assert(set(GraphOps.kCorePeel(edges, 3, 8)).isEmpty)
  }

  test("pagerank: ranks at least teleport mass, total bounded by the scale") {
    val r = GraphOps.pageRank(spark, dir).cache()
    try {
      val n = r.count()
      assert(n > 0)
      val tele = ((GraphOps.RankScale / n) * 15) / 100
      assert(r.filter(col("rank_pico") < tele).count() == 0,
        "a node fell below the teleport floor")
      // truncating division and dangling nodes only LOSE mass
      val total = r.agg(sum("rank_pico")).collect()(0).getLong(0)
      assert(total <= GraphOps.RankScale, s"rank mass exceeds the scale: $total")
      spark.catalog.clearCache()
      // fixed-point arithmetic: bit-identical across runs
      val again = GraphOps.pageRank(spark, dir).collect()
        .map(x => x.getString(0) -> x.getLong(1)).toMap
      r.collect().foreach(x => assert(again(x.getString(0)) == x.getLong(1)))
    } finally spark.catalog.clearCache()
  }
}
