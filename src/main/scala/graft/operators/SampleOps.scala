package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Sampling + distribution-summary operators a training-data pipeline
  * runs constantly: carve a deterministic subset for eval/ablation, and
  * summarize a measure's distribution before/after filtering.
  *
  * Sampling here is HASH-sampling, not rand(): a Knuth multiplicative
  * hash of the row key orders rows pseudo-randomly, so the sample is
  * (a) reproducible run-to-run and across engines — the DuckDB oracle
  * computes the same sample exactly; (b) stable under re-partitioning
  * (rand() changes with split layout); (c) consistent across tables —
  * any operator sampling "the same 2%" picks the same keys. This is how
  * production pipelines pin eval sets.
  */
object SampleOps {

  val StratumK = 50
  val UniformK = 100

  /** Pseudo-random order key from the row id — the SHARED seed ladder
    * (PortableSql.seedLadderSql) at the big-prime modulus.
    */
  private def hashKey(c: String): String =
    graft.functions.PortableSql.seedLadderSql(c, mod = 1000000007L)

  /** Stratified sample: the first `StratumK` docs of each language by
    * hash order. One shuffle on the stratum key; the per-stratum window
    * keeps only k rows of state. (At extreme stratum cardinality the
    * dial is the same rank-over-hash with an approximate per-stratum
    * threshold instead of a full window sort.)
    */
  def stratifiedByLang(docs: DataFrame, k: Int = StratumK): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h").asc, col("doc_id").asc)
    docs.select(col("doc_id"), col("lang"), expr(hashKey("doc_id")).as("h"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("lang"), col("doc_id"), col("rnk"))
  }

  /** Uniform sample without replacement: global first `UniformK` by hash
    * order — plans as TakeOrderedAndProject (per-partition top-k, k-row
    * driver merge), so it never full-sorts the corpus.
    */
  def uniformSample(docs: DataFrame, k: Int = UniformK): DataFrame =
    docs.select(col("doc_id"), expr(hashKey("doc_id")).as("h"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"))

  /** Rows kept per source by the weighted sample. */
  val WeightedK = 10
  /** Priority scale for the weighted keys (h ~ 1e9 × 1e3 stays far
    * inside int64).
    */
  val WeightedScale = 1000L

  /** Deterministic WEIGHTED sample without replacement, k per source:
    * the A-ES/priority-sampling shape with integer keys — each doc gets
    * priority = hash · SCALE DIV weight (weight = its character mass,
    * the "keep more of the substantive docs" curation bias) and the k
    * smallest priorities per source win. Monotone in hash/weight exactly
    * like the float u^(1/w) key, but every comparison is int64, so the
    * sample is reproducible across engines, runs, and partitionings —
    * the same discipline as the uniform/stratified samples above. One
    * shuffle on source; the per-source window keeps k rows of state.
    */
  def weightedSample(docs: DataFrame, k: Int = WeightedK): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("pri").asc, col("doc_id").asc)
    docs.select(col("doc_id"), col("source"),
        greatest(col("n_chars"), lit(1L)).as("wt"),
        expr(hashKey("doc_id")).as("h"))
      .withColumn("pri", expr(s"h * $WeightedScale DIV wt"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("source"), col("doc_id"), col("wt"), col("pri"), col("rnk"))
  }

  val TokenBudget = 10000L
  val BudgetBuckets = 64

  /** Token-budget prefix sample: take documents in deterministic hash
    * order until the cumulative token count reaches `budget` (a doc is
    * kept iff the tokens BEFORE it are under budget, so the crossing doc
    * is included) — how a training run carves "the first N tokens" out
    * of a corpus reproducibly.
    *
    * The naive plan is a running sum over one global ordering — a
    * single-partition window that serializes the corpus through one
    * task. This is the scalable two-pass decomposition instead:
    *
    *   1. bucket each doc by a monotone function of its hash order
    *      (`h * B DIV mod`, so bucket order == hash order);
    *   2. per-bucket token sums (tiny: B rows), prefix-summed with a
    *      window over that B-row frame — the only "global" ordering
    *      ever materialized is over B buckets, not N docs;
    *   3. broadcast the bucket offsets back and run the exact running
    *      sum WITHIN each bucket (parallel across buckets), adding the
    *      bucket's offset.
    *
    * The decomposition is exact because bucketing is monotone in the
    * sort key. At 100 TB, B dials up with cluster size; each pass is one
    * shuffle of doc-count rows plus a B-row side plan. The oracle runs
    * the naive global window — same answer, independent plan.
    */
  /** Budget sweep points for the sampling-plan table. */
  val BudgetSweep: Seq[Long] = Seq(5000L, 10000L, 50000L)

  /** Token-budget SWEEP — kept-doc and kept-token counts at each
    * candidate prefix budget, all off ONE bucketed running-sum frame
    * (the tokenBudgetSample cumsum computes once; each budget is a
    * conditional sum over it). The sampling-plan table read before
    * committing a corpus slice size.
    */
  def tokenBudgetSweep(docs: DataFrame,
      budgets: Seq[Long] = BudgetSweep): DataFrame = {
    import graft.functions.PortableSql.{alen, tokens}
    val base = docs.select(col("doc_id"),
      expr(hashKey("doc_id")).as("h"),
      expr(s"CAST(${alen(tokens("text", duck = false), duck = false)} AS BIGINT)")
        .as("n_tokens"))
    val run = bucketedRunningBefore(base, "n_tokens", "tokens_before")
    val sums = budgets.zipWithIndex.flatMap { case (b, i) =>
      Seq(sum(when(col("tokens_before") < b, 1L).otherwise(0L)).as(s"d$i"),
        sum(when(col("tokens_before") < b, col("n_tokens")).otherwise(0L)).as(s"t$i"))
    }
    run.agg(sums.head, sums.tail: _*)
      .selectExpr(
        s"""stack(${budgets.length},
           |${budgets.zipWithIndex
               .map { case (b, i) => s" CAST($b AS BIGINT), d$i, t$i" }
               .mkString(",")})
           | AS (budget, n_docs_kept, n_tokens_kept)""".stripMargin)
  }

  def tokenBudgetSample(docs: DataFrame, budget: Long = TokenBudget): DataFrame = {
    import graft.functions.PortableSql.{alen, tokens}
    val base = docs.select(col("doc_id"),
      expr(hashKey("doc_id")).as("h"),
      expr(s"CAST(${alen(tokens("text", duck = false), duck = false)} AS BIGINT)")
        .as("n_tokens"))
    bucketedRunningBefore(base, "n_tokens", "tokens_before")
      .filter(col("tokens_before") < budget)
      .select(col("doc_id"), col("n_tokens"), col("tokens_before"))
  }

  /** The bucketed two-pass exact running sum shared by the budget sample
    * and the shard plan: `before = sum of valueCol over all rows earlier
    * in (h, doc_id) order`, computed without ever materializing a global
    * ordering (monotone bucketing makes the decomposition exact — see
    * [[tokenBudgetSample]]'s scaladoc for the proof sketch). Input needs
    * (doc_id, h, valueCol).
    */
  /** Monotone bucket of the hash order key `h` — shared with PackOps so
    * its per-bucket packing and this running sum agree on shard layout.
    */
  private[operators] def withBucket(base: DataFrame): DataFrame =
    base.withColumn("bucket",
      expr(s"CAST(h * $BudgetBuckets DIV 1000000007 AS INT)"))

  private[operators] def bucketedRunningBefore(base0: DataFrame, valueCol: String,
      beforeCol: String): DataFrame = {
    val base = withBucket(base0)
    val bucketOffsets = base.groupBy(col("bucket"))
      .agg(sum(col(valueCol)).as("btok"))
      // no-partition window is deliberate: the frame is <= B rows
      .withColumn("bucket_before",
        coalesce(sum(col("btok")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("bucket_before"))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(bucketOffsets), "bucket")
      .withColumn(beforeCol,
        col("bucket_before") + coalesce(sum(col(valueCol)).over(w), lit(0L)))
  }

  /** Range-bucket count for [[withValueRanks]]. */
  val RankBuckets = 256

  /** Exact global rank under the strict (valueCol, tieCol) total order,
    * WITHOUT a global window — the distributed-selection skeleton the
    * equi-depth histogram, conversion-lag median, rfm cuts and winsorize
    * all need, extracted once: range-bucket on the value (bucket id
    * monotone in v and tie-stable — equal values land in one bucket, so
    * per-bucket ranking plus the bucket's offset IS the global rank),
    * per-bucket counts prefix-summed with a ≤B² theta-join (no window
    * over data rows anywhere), then a row_number PARTITIONED by bucket.
    * Appends `rn` (1-based global rank) and `n` (total rows); all other
    * input columns pass through. Precondition: (v - min) · B fits in
    * int64 — every caller's domain (cents, micros) is ≤ ~1e13.
    */
  private[operators] def withValueRanks(df: DataFrame, valueCol: String,
      tieCol: String, b: Int = RankBuckets): DataFrame = {
    val st = df.agg(min(col(valueCol)).as("graft_mn"),
      max(col(valueCol)).as("graft_mx"), count(lit(1)).as("n"))
    val withB = df.crossJoin(broadcast(st))
      .withColumn("graft_bkt",
        expr(s"(($valueCol - graft_mn) * $b) DIV (graft_mx - graft_mn + 1)"))
    val bc = withB.groupBy("graft_bkt").agg(count(lit(1)).as("graft_cnt"))
    val off = bc.as("a")
      .join(bc.as("b"), col("b.graft_bkt") < col("a.graft_bkt"), "left")
      .groupBy(col("a.graft_bkt").as("graft_bkt"))
      .agg(coalesce(sum(col("b.graft_cnt")), lit(0L)).as("graft_off"))
    val w = Window.partitionBy(col("graft_bkt"))
      .orderBy(col(valueCol).asc, col(tieCol).asc)
    withB.join(broadcast(off), "graft_bkt")
      .withColumn("rn", row_number().over(w).cast("long") + col("graft_off"))
      .drop("graft_bkt", "graft_off", "graft_mn", "graft_mx")
  }

  /** ntile(k)-equivalent tile from [[withValueRanks]]'s exact global
    * rank: the first n%k tiles hold n/k+1 rows, the rest n/k — pure
    * integer arithmetic on the `rn`/`n` columns the helper appends,
    * matching the SQL ntile bit-for-bit under a strict order. (With
    * n < k the else-branch is unreachable, so the n/k = 0 divide never
    * evaluates.)
    */
  private[operators] def tileExpr(k: Int): String =
    s"""CAST(CASE WHEN rn <= (n % $k) * (n DIV $k + 1)
       |  THEN (rn - 1) DIV (n DIV $k + 1) + 1
       |  ELSE (n % $k) + (rn - (n % $k) * (n DIV $k + 1) - 1) DIV (n DIV $k) + 1
       |END AS INT)""".stripMargin

  val ShardChars = 20000L

  /** Balanced output sharding — the file-sizing step before a 100 TB
    * write: assign every document a shard so that each shard holds
    * ~[[ShardChars]] chars of content, deterministically (hash order,
    * not arrival order). shard = chars_before DIV target over the
    * running sum, computed with the SAME bucketed two-pass
    * decomposition as [[tokenBudgetSample]] — the only global ordering
    * materialized is over the B bucket rows, never the corpus. Emits
    * per-shard stats (the plan a writer turns into repartitionByRange
    * + sortWithinPartitions); the oracle runs the naive global cumsum.
    */
  def shardPlan(docs: DataFrame, target: Long = ShardChars): DataFrame = {
    val base = docs.select(col("doc_id"),
      expr(hashKey("doc_id")).as("h"), col("n_chars"))
    bucketedRunningBefore(base, "n_chars", "chars_before")
      .select(col("doc_id"), col("n_chars"),
        expr(s"chars_before DIV $target").as("shard"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
  }

  /** Exact distribution summary of order value per priority: linear-
    * interpolated quantiles (Spark `percentile` == DuckDB `quantile_cont`,
    * both type-7: index p·(n−1) on the sorted values). Exact quantiles
    * sort per group; the at-scale swap is percentile_approx (KLL-ish
    * sketch, mergeable map-side) — same query shape, bounded memory.
    */
  def valueQuantiles(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(o_totalprice, 0.25)"), 6).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 6).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 6).as("p99"))

  /** Sketch-quantile accuracy invariant (the q_approx_distinct pattern:
    * raw sketches differ between engines, so the oracle-checked claim is
    * each engine's OWN approximation landing within tolerance of the
    * exact value it also computes).
    */
  def approxQuantileInvariant(orders: DataFrame): DataFrame =
    orders.agg(
        round(expr("percentile(o_totalprice, 0.5)"), 6).as("exact_p50"),
        expr("percentile_approx(o_totalprice, 0.5, 10000)").as("approx_p50"))
      .select(col("exact_p50"),
        (abs(col("approx_p50") - col("exact_p50")) /
          col("exact_p50") <= 0.01).as("approx_within_1pct"))

  /** Per-group EXACT order statistics — the latency-SLO shape (p50/p95/
    * p99 per service) applied to transaction sizes per event type. No
    * float interpolation anywhere: each percentile SELECTS the actual
    * element at rank ceil(q·n) (computed as the integer (q·n + 99) DIV
    * 100; p50 is the lower median (n+1) DIV 2), so the result is
    * engine-exact by construction. One partitioned sort per group + one
    * aggregate — groups parallelize independently, nothing global; the
    * approx twin for wide groups is q_approx_quantiles.
    */
  /** Daily SLO trend — [[groupOrderStats]] with the time axis a real SLO
    * dashboard plots: exact p50/p95 per (event_type, day), each day's
    * order statistics selected inside its own (type, day) window
    * partition. Day partitions parallelize independently and each holds
    * one day of one type — the partition-size bound that makes exact
    * per-slice percentiles fine at 100 TB even though a GLOBAL exact
    * percentile would not be.
    */
  def sloTrend(events: DataFrame): DataFrame = {
    val e = events.select(col("event_type"),
      expr("unix_micros(ts) DIV 86400000000").as("day"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val part = Window.partitionBy(col("event_type"), col("day"))
    val r = e.withColumn("rn", row_number().over(part.orderBy(col("cents"))))
      .withColumn("n", count(lit(1)).over(part))
    r.groupBy(col("event_type"), col("day")).agg(
      max(col("n")).as("n"),
      max(when(col("rn") === expr("(n + 1) DIV 2"), col("cents"))).as("p50_cents"),
      max(when(col("rn") === expr("(95 * n + 99) DIV 100"), col("cents"))).as("p95_cents"))
  }

  def groupOrderStats(events: DataFrame): DataFrame = {
    val e = events.select(col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val part = Window.partitionBy(col("event_type"))
    val r = e.withColumn("rn", row_number().over(part.orderBy(col("cents"))))
      .withColumn("n", count(lit(1)).over(part))
    r.groupBy(col("event_type")).agg(
      max(col("n")).as("n"),
      max(when(col("rn") === expr("(n + 1) DIV 2"), col("cents"))).as("p50_cents"),
      max(when(col("rn") === expr("(95 * n + 99) DIV 100"), col("cents"))).as("p95_cents"),
      max(when(col("rn") === expr("(99 * n + 99) DIV 100"), col("cents"))).as("p99_cents"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_group_slo" -> ((s, dir) => groupOrderStats(Tables.events(s, dir))),
    "q_slo_trend" -> ((s, dir) => sloTrend(Tables.events(s, dir))),
    "q_sample_stratified" -> ((s, dir) => stratifiedByLang(Tables.documents(s, dir))),
    "q_sample_weighted" -> ((s, dir) => weightedSample(Tables.documents(s, dir))),
    "q_sample_uniform" -> ((s, dir) => uniformSample(Tables.documents(s, dir))),
    "q_sample_budget" -> ((s, dir) => tokenBudgetSample(Tables.documents(s, dir))),
    "q_budget_sweep" -> ((s, dir) => tokenBudgetSweep(Tables.documents(s, dir))),
    "q_shard_plan" -> ((s, dir) => shardPlan(Tables.documents(s, dir))),
    // balanced: exact percentile buffers are per-row expensive and the
    // single-row-group scan would aggregate 1-task; percentile merges
    // are order-insensitive so partitioning cannot change the result
    "q_quantiles" -> ((s, dir) => valueQuantiles(Tables.balanced(s, Tables.orders(s, dir), Seq("o_orderkey")))),
    "q_approx_quantiles" -> ((s, dir) => approxQuantileInvariant(Tables.balanced(s, Tables.orders(s, dir), Seq("o_orderkey"))))
  )

  def oracleSql: Map[String, String] = Map(
    "q_group_slo" ->
      """WITH e AS (SELECT event_type,
        |   CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        | r AS (SELECT event_type, cents,
        |   row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
        |   count(*) OVER (PARTITION BY event_type) AS n FROM e)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        | CAST(max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS BIGINT)
        |   AS p50_cents,
        | CAST(max(CASE WHEN rn = (95 * n + 99) // 100 THEN cents END) AS BIGINT)
        |   AS p95_cents,
        | CAST(max(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END) AS BIGINT)
        |   AS p99_cents
        |FROM r GROUP BY 1""".stripMargin,
    "q_slo_trend" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |   CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        | r AS (SELECT event_type, day, cents,
        |   row_number() OVER (PARTITION BY event_type, day ORDER BY cents) AS rn,
        |   count(*) OVER (PARTITION BY event_type, day) AS n FROM e)
        |SELECT event_type, day, CAST(max(n) AS BIGINT) AS n,
        | CAST(max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS BIGINT)
        |   AS p50_cents,
        | CAST(max(CASE WHEN rn = (95 * n + 99) // 100 THEN cents END) AS BIGINT)
        |   AS p95_cents
        |FROM r GROUP BY 1, 2""".stripMargin,
    "q_sample_stratified" ->
      s"""SELECT lang, doc_id, rnk FROM (
         | SELECT lang, doc_id,
         |  row_number() OVER (PARTITION BY lang
         |    ORDER BY ${hashKey("doc_id")}, doc_id) AS rnk
         | FROM documents) t
         |WHERE rnk <= $StratumK""".stripMargin,

    "q_sample_uniform" ->
      s"""SELECT doc_id FROM documents
         |ORDER BY ${hashKey("doc_id")}, doc_id LIMIT $UniformK""".stripMargin,

    "q_sample_weighted" ->
      s"""SELECT source, doc_id, wt, pri, rnk FROM (
         | SELECT source, doc_id, wt, pri,
         |  row_number() OVER (PARTITION BY source ORDER BY pri, doc_id) AS rnk
         | FROM (SELECT source, doc_id, greatest(n_chars, 1) AS wt,
         |   ${hashKey("doc_id")} * $WeightedScale // greatest(n_chars, 1) AS pri
         |  FROM documents) p) t
         |WHERE rnk <= $WeightedK""".stripMargin,

    // the NAIVE single-ordering running sum — an independent plan for the
    // bucketed two-pass decomposition on the Spark side
    "q_budget_sweep" -> {
      val branches = BudgetSweep.map { b =>
        s"""SELECT CAST($b AS BIGINT) AS budget,
           | CAST(sum(CASE WHEN tokens_before < $b THEN 1 ELSE 0 END) AS BIGINT)
           |   AS n_docs_kept,
           | CAST(sum(CASE WHEN tokens_before < $b THEN n_tokens ELSE 0 END)
           |   AS BIGINT) AS n_tokens_kept
           |FROM run""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH run AS (
         | SELECT doc_id, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS tokens_before
         | FROM (SELECT doc_id, ${hashKey("doc_id")} AS h,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |   FROM documents) t)
         |$branches""".stripMargin
    },

    "q_sample_budget" ->
      s"""SELECT doc_id, n_tokens, tokens_before FROM (
         | SELECT doc_id, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS tokens_before
         | FROM (SELECT doc_id, ${hashKey("doc_id")} AS h,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |   FROM documents) t) s
         |WHERE tokens_before < $TokenBudget""".stripMargin,

    "q_shard_plan" ->
      s"""SELECT chars_before // $ShardChars AS shard,
         | count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
         |FROM (
         | SELECT doc_id, n_chars,
         |  CAST(coalesce(sum(n_chars) OVER (ORDER BY ${hashKey("doc_id")}, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS chars_before
         | FROM documents) t
         |GROUP BY 1""".stripMargin,

    "q_approx_quantiles" ->
      """SELECT round(quantile_cont(o_totalprice, 0.5), 6) AS exact_p50,
        | abs(approx_quantile(o_totalprice, 0.5) - quantile_cont(o_totalprice, 0.5))
        |   / quantile_cont(o_totalprice, 0.5) <= 0.01 AS approx_within_1pct
        |FROM orders""".stripMargin,

    "q_quantiles" ->
      """SELECT o_orderpriority, count(*) AS n,
        | round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
        | round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
        | round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
        | round(quantile_cont(o_totalprice, 0.99), 6) AS p99
        |FROM orders GROUP BY o_orderpriority""".stripMargin
  )
}
