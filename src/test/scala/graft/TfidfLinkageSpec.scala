package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.JaroWinklerKernel
import graft.operators.{StringSimOps, TextOps}

/** q_tfidf_terms / q_text_pmi / q_er_fs_score — the keyword-extraction,
  * collocation-mining, and Fellegi-Sunter linkage operators.
  */
class TfidfLinkageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("log2Eighths matches 8*log2 within one eighth-bit across the domain") {
    import graft.functions.PortableSql.log2Eighths
    val xs = (1L to 1000L) ++ Seq(1L << 20, (1L << 20) + 7, (1L << 54) - 1)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(xs.map(org.apache.spark.sql.Row(_)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType))))
    val got = df.select(col("x"), expr(log2Eighths("x")).as("l8")).collect()
    got.foreach { r =>
      val x = r.getLong(0); val l8 = r.getInt(1)
      val exact = 8.0 * math.log(x.toDouble) / math.log(2.0)
      assert(l8 >= exact - 1.000001 && l8 <= exact + 1.000001,
        s"x=$x l8=$l8 exact=$exact")
      assert(l8 >= 0)
    }
    // monotone: the fixed-point log may never invert an ordering
    val sorted = got.sortBy(_.getLong(0)).map(_.getInt(1))
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
  }

  test("tfidf terms: k per doc, positive scores, rank consistent with score") {
    val rows = TextOps.tfidfTerms(Tables.documents(spark, dir)).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rs) =>
      assert(rs.length <= TextOps.TfidfK)
      // ranks are 1..n and score never increases with rank
      val ordered = rs.sortBy(_.getLong(4))
      assert(ordered.map(_.getLong(4)).toSeq == (1L to rs.length).toSeq)
      val scores = ordered.map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(scores.forall(_ > 0))
    }
  }

  test("pmi collocations: every emitted pair beats the lift threshold exactly") {
    val docs = Tables.documents(spark, dir)
    val rows = TextOps.pmiCollocations(docs).collect()
    rows.foreach { r =>
      val (cxy, c1, c2, lift) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cxy >= TextOps.PmiMinCount)
      assert(lift >= TextOps.PmiMinLiftMicro)
      assert(r.getString(0).split(" ").length == 2)
      assert(c1 >= cxy && c2 >= cxy) // unigram counts dominate the pair count
    }
  }

  test("FS linkage scores recompute from the kernel and classify correctly") {
    val part = Tables.part(spark, dir)
    val byKey = part.select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getInt(4))).toMap
    val rows = StringSimOps.fsLinkage(part).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k1, k2, jw, score, cls) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      val (n1, b1, t1, s1) = byKey(k1); val (n2, b2, t2, s2) = byKey(k2)
      assert(k1 < k2 && b1 == b2 && math.abs(s1 - s2) <= StringSimOps.FsSizeBand)
      assert(jw == math.floor(JaroWinklerKernel.similarity(n1, n2) * 1e6).toLong)
      val wName =
        if (jw >= StringSimOps.FsJwStrong) StringSimOps.FsNameStrong
        else if (jw >= StringSimOps.JwMicroMin) StringSimOps.FsNameWeak
        else StringSimOps.FsNameDis
      val wType = if (t1 == t2) StringSimOps.FsTypeAgree else StringSimOps.FsTypeDis
      val wSize = if (math.abs(s1 - s2) <= StringSimOps.FsSizeTol)
        StringSimOps.FsSizeAgree else StringSimOps.FsSizeDis
      assert(score == wName + wType + wSize && score >= 0)
      assert(cls == (if (score >= StringSimOps.FsMatchMin) "match" else "possible"))
    }
  }

  test("streaming FS twin equals the batch linkage filtered to batch-touching pairs") {
    val mod = graft.operators.DedupOps.IncrMod
    val rem = graft.operators.DedupOps.IncrRem
    val expect = StringSimOps.fsLinkage(Tables.part(spark, dir))
      .filter(col("k1") % mod === rem || col("k2") % mod === rem)
      .collect().map(_.toSeq).toSet
    val got = graft.streaming.StreamQueries.streamErFs(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("FS eval confusion matrix is complete and recall catches exact-name pairs") {
    val r = StringSimOps.fsEval(Tables.part(spark, dir)).collect().head
    val (tp, fp, fn, tn) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(tp + fp + fn + tn > 0)
    // exact-name pairs carry the strong-name weight: even with both other
    // fields disagreeing the score is positive, so FN must be zero here
    assert(fn == 0L, s"fn=$fn")
    assert(r.getLong(4) >= -1L && r.getLong(4) <= 1000000L)
    // recall = 1 by the fn=0 argument, unless no gold positives exist
    assert(r.getLong(5) == (if (tp == 0L) -1L else 1000000L))
  }

  test("two-phase-ranked SN pairs equal the naive global-window version") {
    val cust = Tables.customer(spark, dir)
    val got = StringSimOps.snPairs(cust).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // naive recomputation: one driver-side global sort
    val ranked = cust.selectExpr("c_custkey AS k",
        "CAST(round(c_acctbal * 100) AS BIGINT) AS bal")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, bal) => (bal, k) }.zipWithIndex
    val expect = (for {
      ((k1, b1), r1) <- ranked.iterator
      ((k2, b2), r2) <- ranked.iterator
      if r2 > r1 && r2 - r1 <= StringSimOps.SnW
    } yield (k1, k2, (r2 - r1).toLong, math.abs(b2 - b1))).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("FS linkage emits no pair outside the brand block (prune is real)") {
    // the blocked candidate plan must contain a brand equi-join, not a
    // cartesian: assert no BroadcastNestedLoopJoin over the full part^2
    val plan = StringSimOps.fsLinkage(Tables.part(spark, dir))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
