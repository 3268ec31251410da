package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Classifier-evaluation operators — the measurement side of model-based
  * quality filtering, which every large-scale training-data pipeline
  * runs (train a cheap quality/language classifier, score the corpus,
  * keep what clears a threshold): AUC says whether the scorer ranks
  * well, the calibration table says whether its scores mean what they
  * claim, KS locates the score where the classes separate most, and the
  * precision/recall sweep is the table a curator reads to pick the
  * production cutoff.
  *
  * The "model" under evaluation is the shared integer-micro quality
  * score ([[TextOps.qualityScore]] — same formula, one definition) and
  * the ground-truth label is `lang = 'en'` (the corpus carries real
  * labels, ~44% positive). Everything downstream of the score is EXACT
  * integer arithmetic (tie-averaged ranks via 2x-scaled integers, ppm
  * ratios by integer division), so DuckDB reproduces every row
  * bit-for-bit.
  *
  * Scale shape: ONE tokenizing scan builds (score, label); every
  * statistic then reduces to a groupBy(score) — linear, shuffle on the
  * score key — plus ordered windows over the |distinct scores| frame
  * only (score is integer micro in [0, 1e6], so that frame is bounded
  * by 1e6 rows regardless of corpus size — the bucket-offset exemption).
  * No data-sized global sort anywhere: AUC's rank sums fold into
  * per-score (count, positives) cells before any ordering.
  */
object EvalOps {

  /** Positive-class predicate (the ground-truth label). */
  private val PosLang = "en"

  /** PR-sweep thresholds in score micro-units. */
  val PrThresholds: Seq[Long] = Seq(400000L, 600000L, 800000L)

  /** (doc_id, s = score micro, y = 1/0 label). The quality pass carries
    * the tokenizer; lang rides a second column-pruned scan joined on
    * doc_id (a deployment materializes the score as an ingest column and
    * this becomes one metadata-narrow scan).
    */
  private def scored(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    TextOps.qualityScore(docs)
      .select(col("doc_id"),
        expr("CAST(round(quality * 1000000) AS BIGINT)").as("s"))
      .join(docs.select(col("doc_id"),
        (col("lang") === PosLang).cast("long").as("y")), "doc_id")
  }

  /** Per-distinct-score cells: the sufficient statistic for AUC/KS.
    * cnt/pos per score value — the only shuffle in the family.
    */
  private def scoreCells(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir).groupBy(col("s"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))

  /** Exact Mann-Whitney AUC in ppm. Tie-averaged ranks are kept integral
    * by 2x scaling: a tie group at score s with min-rank r and size k
    * has average rank r + (k-1)/2, so 2*avgrank = 2r + k - 1 and the
    * positives' doubled rank sum is Σ pos_s * (2*(cum_lt + 1) + cnt_s - 1)
    * over the per-score cells (cum_lt = count of strictly smaller
    * scores, one cumsum over the bounded distinct-score frame).
    * auc_ppm = (2*R1 - n1*(n1+1)) * 1e6 DIV (2*n1*n0).
    *
    * DOMAIN BOUND (int64): 2*R1 <= 2*N^2 and the ppm scale needs
    * U2 * 1e6 < 2^63, so N (corpus docs) must stay under ~2e6 per
    * evaluation slice at exact-ppm precision; bigger corpora evaluate on
    * a stratified sample (q_sample_stratified feeds this directly).
    */
  def auc(spark: SparkSession, dir: String): DataFrame =
    aucFromCells(scoreCells(spark, dir))

  /** The rank-sum fold over pre-aggregated (s, cnt, pos) cells — shared
    * by the batch query and the streaming twin (whose cells accumulate
    * in complete mode and re-derive the AUC on readback through THIS
    * arithmetic, so one oracle scores both).
    */
  def aucFromCells(cells: DataFrame): DataFrame = {
    val w = Window.orderBy(col("s"))
    val ranked = cells
      .withColumn("cum_lt",
        coalesce(sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
    ranked.agg(
        sum(col("pos")).as("n_pos"),
        sum(col("cnt") - col("pos")).as("n_neg"),
        sum(col("pos") * (lit(2L) * (col("cum_lt") + 1L) + col("cnt") - 1L))
          .as("two_r1"))
      .select(col("n_pos"), col("n_neg"),
        // single-class corpus (n_pos*n_neg = 0): AUC is undefined — emit the
        // -1 sentinel instead of diverging from the oracle (Spark NULL vs
        // DuckDB `//`-by-zero ERROR — ADVICE r12)
        expr("CASE WHEN n_pos * n_neg = 0 THEN -1 " +
          "ELSE (two_r1 - n_pos * (n_pos + 1)) * 1000000 DIV (2 * n_pos * n_neg) END")
          .as("auc_ppm"))
  }

  /** Reliability (calibration) table: decile buckets of the score, per
    * bucket the observed positive rate in ppm next to the bucket's mean
    * score — the "does 0.8 mean 80%" audit. One groupBy over the scored
    * frame; 10 output rows.
    */
  def calibration(spark: SparkSession, dir: String): DataFrame =
    calibrationFromBuckets(scored(spark, dir)
      .groupBy(least(expr("s DIV 100000"), lit(9L)).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("s")).as("s_sum")))

  /** The reliability-table arithmetic over pre-aggregated per-bucket
    * cells — shared with the streaming twin (bucket counts accumulate
    * in complete mode, the table re-derives on readback through THIS).
    */
  def calibrationFromBuckets(buckets: DataFrame): DataFrame =
    buckets.select(col("bucket"), col("n"), col("n_pos"),
      expr("n_pos * 1000000 DIV n").as("pos_rate_ppm"),
      expr("s_sum DIV n").as("mean_score_micro"))

  /** Brier score of the classifier in micro^2 units — the proper scoring
    * rule complementing AUC (ranking) and the reliability table
    * (calibration): mean squared gap between the micro-scaled score and
    * the 0/1 label, kept exact as sum((s - y*1e6)^2) DIV n. One
    * aggregation pass over the scored frame; one output row.
    *
    * DOMAIN BOUND (int64): each term <= 1e12, so the sum stays in int64
    * up to ~9e6 docs — same stratified-sample escape hatch as [[auc]].
    */
  def brier(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir).agg(count(lit(1)).as("n"),
        sum((col("s") - col("y") * 1000000L) * (col("s") - col("y") * 1000000L))
          .as("sq"))
      .select(col("n"),
        expr("CASE WHEN n = 0 THEN -1 ELSE sq DIV n END").as("brier_micro2"))

  /** Expected calibration error in ppm over the decile reliability
    * buckets: ECE = Σ_b (n_b/N) · |acc(b) − conf(b)|, folded exactly as
    * sum(n_b · |pos_rate_ppm − mean_score_micro|) DIV N over the same
    * per-bucket cells [[calibration]] emits (score micro IS a ppm-scale
    * confidence, so the two columns subtract directly). The one-number
    * release gate on "does 0.8 mean 80%".
    */
  def ece(spark: SparkSession, dir: String): DataFrame =
    calibration(spark, dir)
      .agg(sum(col("n")).as("n_docs"),
        sum(col("n") * abs(col("pos_rate_ppm") - col("mean_score_micro")))
          .as("w"))
      .select(col("n_docs"),
        expr("CASE WHEN n_docs = 0 THEN -1 ELSE w DIV n_docs END").as("ece_ppm"))

  /** Kolmogorov-Smirnov separation of the positive vs negative score
    * distributions: D = max_s |F1(s) - F0(s)|, computed as the maximum
    * of |cum_pos * n0 - cum_neg * n1| over the distinct-score cumsum
    * (one division at the end — the argmax is invariant). Emits the KS
    * statistic in ppm plus the arg-max score, i.e. the threshold where
    * the classes separate most — the natural default cutoff.
    *
    * DOMAIN BOUND (int64): the final ppm scale needs
    * max_d * 1e6 <= n1*n0 * 1e6 < 2^63 — corpora beyond ~3e9 docs
    * evaluate on a sample, as with [[auc]].
    */
  def ks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("s"))
    val cum = scoreCells(spark, dir)
      .withColumn("cum_pos", sum(col("pos")).over(w))
      .withColumn("cum_neg", sum(col("cnt") - col("pos")).over(w))
    val tot = cum.agg(max(col("cum_pos")).as("n1"), max(col("cum_neg")).as("n0"))
    cum.crossJoin(broadcast(tot))
      .select(col("s"),
        abs(col("cum_pos") * col("n0") - col("cum_neg") * col("n1")).as("d"),
        col("n1"), col("n0"))
      .orderBy(col("d").desc, col("s").asc)
      .limit(1)
      .select(col("s").as("ks_at_score"),
        // same single-class guard as auc_ppm: -1 sentinel, never engine-divergent
        expr("CASE WHEN n1 * n0 = 0 THEN -1 " +
          "ELSE d * 1000000 DIV (n1 * n0) END").as("ks_ppm"))
  }

  /** Precision/recall sweep at the fixed operating thresholds — the
    * cutoff-selection table. One conditional-aggregation pass (no
    * per-threshold rescans), stacked to one row per threshold.
    */
  def prSweep(spark: SparkSession, dir: String): DataFrame = {
    val aggs: Seq[Column] = PrThresholds.flatMap { t =>
      Seq(sum(when(col("s") >= t, 1L).otherwise(0L)).as(s"pp_$t"),
        sum(when(col("s") >= t, col("y")).otherwise(0L)).as(s"tp_$t"))
    } :+ sum(col("y")).as("n_pos")
    val one = scored(spark, dir).agg(aggs.head, aggs.tail: _*)
    val stacked = PrThresholds.map { t =>
      s"CAST($t AS BIGINT), pp_$t, tp_$t"
    }.mkString(", ")
    one.selectExpr(s"stack(${PrThresholds.size}, $stacked) " +
        "AS (threshold_micro, n_pred_pos, n_tp)", "n_pos")
      .select(col("threshold_micro"), col("n_pred_pos"), col("n_tp"),
        expr("CASE WHEN n_pred_pos = 0 THEN -1 " +
          "ELSE n_tp * 1000000 DIV n_pred_pos END").as("precision_ppm"),
        expr("CASE WHEN n_pos = 0 THEN -1 " +
          "ELSE n_tp * 1000000 DIV n_pos END").as("recall_ppm"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_eval_auc" -> ((s, dir) => auc(s, dir)),
    "q_eval_calibration" -> ((s, dir) => calibration(s, dir)),
    "q_eval_ks" -> ((s, dir) => ks(s, dir)),
    "q_eval_pr_sweep" -> ((s, dir) => prSweep(s, dir)),
    "q_eval_brier" -> ((s, dir) => brier(s, dir)),
    "q_eval_ece" -> ((s, dir) => ece(s, dir))
  )

  /** Shared scored-frame CTE: the quality formula via TextOps' one
    * definition, micro-scaled, labelled by lang.
    */
  private def scoredCte: String =
    s"""sc AS (SELECT q.doc_id,
       |   CAST(round(q.quality * 1000000) AS BIGINT) AS s,
       |   CASE WHEN d.lang = '$PosLang' THEN 1 ELSE 0 END AS y
       |  FROM (${TextOps.qualityDocOracleSql}) q
       |  JOIN documents d ON q.doc_id = d.doc_id),
       | cells AS (SELECT s, count(*) AS cnt, CAST(sum(y) AS BIGINT) AS pos
       |  FROM sc GROUP BY s)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_eval_auc" ->
      s"""WITH $scoredCte,
         | r AS (SELECT s, cnt, pos,
         |   coalesce(sum(cnt) OVER (ORDER BY s
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_lt
         |  FROM cells),
         | t AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
         |   CAST(sum(cnt - pos) AS BIGINT) AS n_neg,
         |   CAST(sum(pos * (2 * (cum_lt + 1) + cnt - 1)) AS BIGINT) AS two_r1
         |  FROM r)
         |SELECT n_pos, n_neg,
         | CAST(CASE WHEN n_pos * n_neg = 0 THEN -1
         |   ELSE (two_r1 - n_pos * (n_pos + 1)) * 1000000
         |     // (2 * n_pos * n_neg) END AS BIGINT) AS auc_ppm
         |FROM t""".stripMargin,

    "q_eval_calibration" ->
      s"""WITH $scoredCte
         |SELECT least(s // 100000, 9) AS bucket,
         | CAST(count(*) AS BIGINT) AS n,
         | CAST(sum(y) AS BIGINT) AS n_pos,
         | CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS pos_rate_ppm,
         | CAST(sum(s) // count(*) AS BIGINT) AS mean_score_micro
         |FROM sc GROUP BY 1""".stripMargin,

    "q_eval_ks" ->
      s"""WITH $scoredCte,
         | cum AS (SELECT s,
         |   sum(pos) OVER (ORDER BY s) AS cum_pos,
         |   sum(cnt - pos) OVER (ORDER BY s) AS cum_neg
         |  FROM cells),
         | t AS (SELECT max(cum_pos) AS n1, max(cum_neg) AS n0 FROM cum)
         |SELECT s AS ks_at_score,
         | CAST(CASE WHEN n1 * n0 = 0 THEN -1
         |   ELSE abs(cum_pos * n0 - cum_neg * n1) * 1000000
         |     // (n1 * n0) END AS BIGINT) AS ks_ppm
         |FROM cum, t
         |ORDER BY abs(cum_pos * n0 - cum_neg * n1) DESC, s ASC
         |LIMIT 1""".stripMargin,

    "q_eval_brier" ->
      s"""WITH $scoredCte
         |SELECT CAST(count(*) AS BIGINT) AS n,
         | CAST(CASE WHEN count(*) = 0 THEN -1
         |   ELSE sum((s - y * 1000000) * (s - y * 1000000)) // count(*)
         |   END AS BIGINT) AS brier_micro2
         |FROM sc""".stripMargin,

    "q_eval_ece" ->
      s"""WITH $scoredCte,
         | b AS (SELECT least(s // 100000, 9) AS bucket,
         |   CAST(count(*) AS BIGINT) AS n,
         |   CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS pos_rate_ppm,
         |   CAST(sum(s) // count(*) AS BIGINT) AS mean_score_micro
         |  FROM sc GROUP BY 1)
         |SELECT CAST(sum(n) AS BIGINT) AS n_docs,
         | CAST(CASE WHEN sum(n) = 0 THEN -1
         |   ELSE sum(n * abs(pos_rate_ppm - mean_score_micro)) // sum(n)
         |   END AS BIGINT) AS ece_ppm
         |FROM b""".stripMargin,

    "q_eval_pr_sweep" -> {
      val rows = PrThresholds.map { t =>
        s"""SELECT CAST($t AS BIGINT) AS threshold_micro,
           | CAST(sum(CASE WHEN s >= $t THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pos,
           | CAST(sum(CASE WHEN s >= $t THEN y ELSE 0 END) AS BIGINT) AS n_tp,
           | CAST(sum(y) AS BIGINT) AS n_pos
           |FROM sc""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $scoredCte
         |SELECT threshold_micro, n_pred_pos, n_tp,
         | CAST(CASE WHEN n_pred_pos = 0 THEN -1
         |   ELSE n_tp * 1000000 // n_pred_pos END AS BIGINT) AS precision_ppm,
         | CAST(CASE WHEN n_pos = 0 THEN -1
         |   ELSE n_tp * 1000000 // n_pos END AS BIGINT) AS recall_ppm
         |FROM ($rows) u""".stripMargin
    }
  )
}
