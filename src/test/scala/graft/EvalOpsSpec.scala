package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EvalOps, TextOps}

/** The eval family's strongest check is independence: AUC recomputed the
  * O(n^2) textbook way (pairwise pos-vs-neg comparisons with half-credit
  * ties) over collected rows must equal the relational rank-sum plan's
  * answer exactly — any off-by-one in the tie-averaged 2x rank algebra
  * or the cumsum seam shows up as a ppm mismatch.
  */
class EvalOpsSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def scoredRows(): Seq[(Long, Long)] = {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    TextOps.qualityScore(docs)
      .select(col("doc_id"), expr("CAST(round(quality * 1000000) AS BIGINT)").as("s"))
      .join(docs.select(col("doc_id"), (col("lang") === "en").cast("long").as("y")),
        "doc_id")
      .select(col("s"), col("y")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("rank-sum AUC equals the O(n^2) pairwise definition exactly") {
    val rows = scoredRows()
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    assert(pos.nonEmpty && neg.nonEmpty)
    // doubled win count: 2 per strict win, 1 per tie
    val wins2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expectPpm = wins2 * 1000000L / (2L * pos.size * neg.size)
    val got = EvalOps.queries("q_eval_auc")(spark, dir).collect().head
    assert(got.getAs[Long]("n_pos") == pos.size.toLong)
    assert(got.getAs[Long]("n_neg") == neg.size.toLong)
    assert(got.getAs[Long]("auc_ppm") == expectPpm,
      s"relational AUC ${got.getAs[Long]("auc_ppm")} != pairwise $expectPpm")
  }

  test("KS statistic equals the brute-force max CDF gap, at the same score") {
    val rows = scoredRows()
    val n1 = rows.count(_._2 == 1L).toLong
    val n0 = rows.size - n1
    val byScore = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var cp = 0L; var cn = 0L
    var best = (-1L, Long.MaxValue) // (d, score) — max d, min score tiebreak
    for ((s, g) <- byScore) {
      cp += g.count(_._2 == 1L)
      cn += g.count(_._2 == 0L)
      val d = math.abs(cp * n0 - cn * n1)
      if (d > best._1) best = (d, s)
    }
    val got = EvalOps.queries("q_eval_ks")(spark, dir).collect().head
    assert(got.getAs[Long]("ks_at_score") == best._2)
    assert(got.getAs[Long]("ks_ppm") == best._1 * 1000000L / (n1 * n0))
  }

  test("calibration buckets partition the corpus; pr-sweep recall is monotone") {
    val cal = EvalOps.queries("q_eval_calibration")(spark, dir).collect()
    assert(cal.map(_.getAs[Long]("n")).sum == scoredRows().size.toLong)
    assert(cal.forall(r => r.getAs[Long]("bucket") >= 0 && r.getAs[Long]("bucket") <= 9))
    val pr = EvalOps.queries("q_eval_pr_sweep")(spark, dir).collect()
      .sortBy(_.getAs[Long]("threshold_micro"))
    val recalls = pr.map(_.getAs[Long]("recall_ppm"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b },
      s"recall must fall as the threshold rises: ${recalls.mkString(",")}")
  }

  test("Brier and ECE equal their collected-row definitions exactly") {
    val rows = scoredRows()
    val n = rows.size.toLong
    val brierExpect = rows.map { case (s, y) =>
      val d = s - y * 1000000L; d * d
    }.sum / n
    val gotB = EvalOps.queries("q_eval_brier")(spark, dir).collect().head
    assert(gotB.getAs[Long]("n") == n)
    assert(gotB.getAs[Long]("brier_micro2") == brierExpect,
      s"relational Brier ${gotB.getAs[Long]("brier_micro2")} != direct $brierExpect")
    // ECE folded from scratch with the same truncating per-bucket algebra
    val buckets = rows.groupBy { case (s, _) => math.min(s / 100000L, 9L) }
    val w = buckets.values.map { g =>
      val nb = g.size.toLong
      val posRate = g.map(_._2).sum * 1000000L / nb
      val meanScore = g.map(_._1).sum / nb
      nb * math.abs(posRate - meanScore)
    }.sum
    val gotE = EvalOps.queries("q_eval_ece")(spark, dir).collect().head
    assert(gotE.getAs[Long]("n_docs") == n)
    assert(gotE.getAs[Long]("ece_ppm") == w / n,
      s"relational ECE ${gotE.getAs[Long]("ece_ppm")} != direct ${w / n}")
  }
}
