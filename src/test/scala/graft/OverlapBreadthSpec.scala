package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupOps, PackOps, SampleOps, ShuffleOps, StringSimOps}

/** Invariants of the round-8 breadth operators (KMV set operations,
  * context planning, weighted sampling, entity resolution) that hold for
  * ANY input, beyond the oracle-pinned fixtures.
  */
class OverlapBreadthSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("kmv overlap: estimator algebra holds on every pair") {
    val rows = ShuffleOps.kmvOverlap(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exInter, exUnion) = (r.getLong(2), r.getLong(3))
      val (ku, nBoth, estU, estI, jacc) =
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
      assert(ku > 0 && ku <= ShuffleOps.KmvK)
      assert(nBoth >= 0 && nBoth <= ku, "sketch intersection exceeds the sketch")
      assert(exInter <= exUnion, "exact intersection exceeds exact union")
      assert(estI <= estU, "estimated intersection exceeds estimated union")
      assert(jacc >= 0 && jacc <= 1000000, "Jaccard estimate outside [0, 1]")
      // under-full union sketch ⇒ both audiences fully observed ⇒ exact
      if (ku < ShuffleOps.KmvK) {
        assert(estU == exUnion, s"under-full sketch must be exact: $r")
        assert(estI == exInter, s"under-full sketch must be exact: $r")
      }
    }
  }

  test("ctx plan: token conservation and monotonicity across lengths") {
    val rows = PackOps.ctxPlan(Tables.documents(spark, dir)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == PackOps.CtxCandidates.toSet)
    rows.values.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "kept_tokens exceeds total_tokens")
      assert(r.getLong(5) >= r.getLong(1), "fewer chunks than docs")
    }
    // a longer window can only keep more tokens and truncate fewer docs
    PackOps.CtxCandidates.sliding(2).foreach { case Seq(a, b) =>
      assert(rows(a).getLong(3) <= rows(b).getLong(3))
      assert(rows(a).getLong(4) >= rows(b).getLong(4))
    }
  }

  test("chunk overlap: emitted mass equals total plus the closed-form overlap") {
    val l = PackOps.CtxLen; val s = PackOps.ChunkStride
    PackOps.chunkOverlap(Tables.documents(spark, dir)).collect().foreach { r =>
      val (nDocs, total, nChunks, emitted) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nChunks >= nDocs)
      assert(emitted == total + (nChunks - nDocs) * (l - s),
        "emitted tokens disagree with the closed form")
    }
  }

  test("weighted sample: k per source, priorities recompute, weights bias up") {
    val docs = Tables.documents(spark, dir)
    val sel = SampleOps.weightedSample(docs).collect()
    val perSource = sel.groupBy(_.getString(0))
    perSource.foreach { case (_, rows) =>
      assert(rows.length <= SampleOps.WeightedK)
      assert(rows.map(_.getLong(4)).sorted.toSeq == (1L to rows.length).toSeq,
        "ranks must be 1..k")
    }
    // the selected docs' mean weight must exceed the corpus mean — the
    // whole point of weighting (char-mass varies enough that equality
    // would mean the weight never entered the key)
    val corpusAvg = docs.agg(avg(greatest(col("n_chars"), lit(1L))))
      .collect()(0).getDouble(0)
    val selAvg = sel.map(_.getLong(2)).sum.toDouble / sel.length
    assert(selAvg > corpusAvg,
      s"weighted sample not biased toward heavy docs: $selAvg !> $corpusAvg")
  }

  test("entity resolution: pairs land in one entity, labels are component minima") {
    val part = Tables.part(spark, dir)
    val ent = StringSimOps.entityClusters(part).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // every scored pair must collapse into the same entity
    StringSimOps.jwPairs(part).collect().foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(ent(a) == ent(b), s"pair ($a, $b) split across entities")
    }
    // a label is a member of its own component and never above any member
    ent.foreach { case (name, id) =>
      assert(id <= name, s"entity label $id is not the component minimum")
      assert(ent(id) == id, "entity label must label itself")
    }
  }

  test("clustersFromPairs propagates string labels like numeric ones") {
    import spark.implicits._
    val nodes = Seq("a", "b", "c", "d", "z").toDF("doc_id")
    val pairs = Seq(("b", "c"), ("c", "d")).toDF("d1", "d2")
    val got = DedupOps.clustersFromPairs(nodes, pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "b", "c" -> "b", "d" -> "b", "z" -> "z"))
  }
}
