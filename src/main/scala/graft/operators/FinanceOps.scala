package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Financial time-series analytics over the events stream — the queries a
  * market-data / transaction-ledger consumer of the reference pipeline
  * (viru2001/realtime_financial_transactions_data_pipeline — BigQuery
  * dashboards over the fact table, `dataflow_pipeline/pipeline.py`) runs
  * downstream of ingest: OHLC candlestick bars, per-account running
  * balances with overdraft detection, and a Benford first-digit fraud
  * screen.
  *
  * Money is integer cents throughout (`CAST(round(value * 100) AS
  * BIGINT)`, the engine-wide convention) so every compared value is
  * exact integer arithmetic in both engines.
  */
object FinanceOps {

  private def cents = expr("CAST(round(value * 100) AS BIGINT)")

  /** Daily OHLC bars per event_type. Open/close are decided by the total
    * order (t, event_id) — deterministic even under timestamp ties, which
    * WILL happen at 100 TB/day — via one ordered window (row_number) and
    * one unordered count over the same partitioning: a single shuffle on
    * (event_type, day), each day's bar computed independently. No global
    * sort anywhere; day partitions are the natural parallel unit.
    */
  def ohlcBars(events: DataFrame): DataFrame = {
    val e = events.select(col("event_type"), unix_micros(col("ts")).as("t"),
        col("event_id"), cents.as("cents"))
      .withColumn("day", expr("t DIV 86400000000"))
    val part = Window.partitionBy(col("event_type"), col("day"))
    val r = e.withColumn("rn", row_number().over(part.orderBy(col("t"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(part))
    r.groupBy(col("event_type"), col("day")).agg(
      max(when(col("rn") === 1, col("cents"))).as("open_cents"),
      max(col("cents")).as("high_cents"),
      min(col("cents")).as("low_cents"),
      max(when(col("rn") === col("n"), col("cents"))).as("close_cents"),
      sum(col("cents")).as("volume_cents"),
      count(lit(1)).as("n_trades"))
  }

  /** Per-account running ledger: purchases debit, every other event type
    * credits. Emits final balance, the running minimum (worst exposure),
    * and how many ledger entries sat below zero — the overdraft screen.
    * One window partitioned BY ACCOUNT (never global), ordered by the
    * unique (t, event_id) key, then one aggregate on the same key — a
    * single shuffle, and per-account state is one running long.
    */
  def runningBalance(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), unix_micros(col("ts")).as("t"),
      col("event_id"),
      when(col("event_type") === "purchase", -cents).otherwise(cents).as("delta"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("bal", sum(col("delta")).over(w))
      .groupBy(col("user_id")).agg(
        sum(col("delta")).as("final_cents"),
        min(col("bal")).as("min_cents"),
        sum(when(col("bal") < 0, 1L).otherwise(0L)).as("n_overdraft"))
  }

  /** Benford's-law expected first-digit shares in ppm: round(log10(1 +
    * 1/d) * 1e6). INTEGER LITERALS on both sides — no libm log10 (whose
    * last-bit rounding differs across engines) enters a compared value.
    */
  val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  private[graft] def benfordCase(digitCol: String): String =
    BenfordPpm.map { case (d, p) => s"WHEN $digitCol = $d THEN CAST($p AS BIGINT)" }
      .mkString("CASE ", " ", " END")

  /** Benford first-digit audit over transaction amounts — the classic
    * fabricated-numbers screen. Observed share per leading digit (ppm,
    * integer division) against the hardcoded Benford expectation, plus
    * the absolute deviation. Shape: one 9-row hash aggregate + a
    * broadcast of the single-row total; nothing here grows with data
    * volume. (uniform-ish synthetic amounts will show large deviations —
    * the audit reports them, it doesn't assert.)
    */
  def benfordAudit(events: DataFrame): DataFrame = {
    val d = events.select(cents.as("cents"))
      .filter(col("cents") >= 1) // non-positive rows carry no leading digit
      .select(expr("CAST(substr(CAST(cents AS STRING), 1, 1) AS BIGINT)").as("digit"))
    benfordFromCounts(d.groupBy(col("digit")).agg(count(lit(1)).as("n")))
  }

  /** (digit, n) counts → the full Benford audit row set. Split out so the
    * streaming twin can feed state-accumulated counts through the
    * identical scoring arithmetic.
    */
  private[graft] def benfordFromCounts(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("n")).as("tot"))
    counts.crossJoin(broadcast(tot))
      .withColumn("observed_ppm", expr("n * 1000000 DIV tot"))
      .withColumn("expected_ppm", expr(benfordCase("digit")))
      .select(col("digit"), col("n"), col("observed_ppm"), col("expected_ppm"),
        abs(col("observed_ppm") - col("expected_ppm")).as("deviation_ppm"))
  }

  /** EWMA packing/threshold constants: the packed accumulator keeps
    * (smoothed level + 1) in the high bits and the running flag count in
    * the low [[EwmaFlagBits]] bits; 0 is the empty sentinel. Domain
    * check: cents < 2^17 here, level+1 < 2^18, so the pack stays under
    * 2^42; the flag count is bounded by the per-key history length.
    */
  val EwmaFlagBits = 24
  val EwmaPack = 1L << EwmaFlagBits // 16777216
  val EwmaJumpCents = 20000L        // |x - level| > $200 flags

  /** Integer exponential smoothing with jump flags — the classic EWMA
    * anomaly monitor (alpha = 1/2, so the update is the exact integer
    * fold e' = (e + x) DIV 2 — no float decay anywhere): per user, walk
    * the event sequence in arrival (event_id) order, flag every value
    * jumping more than [[EwmaJumpCents]] off the current smoothed level,
    * and report the final level + flag count. Sequential-by-nature state
    * runs as ONE portable fold: the (event_id, cents) pair packs into a
    * single BIGINT (id * 2^17 + cents), sort_array orders the sequence,
    * and the fold carries (level, flags) packed into one accumulator —
    * the q_text_fingerprint rolling-fold pattern with struct state. Per
    * user the state is O(1) and users parallelize independently; only
    * each user's own history must fit an executor (the sessionize
    * caveat).
    */
  def ewmaFlags(events: DataFrame): DataFrame = {
    import graft.functions.PortableSql.{idiv, reduceLong, xform}
    def step(duck: Boolean): String = {
      val e = s"(${idiv("acc", EwmaPack.toString, duck)} - 1)"
      s"""CASE WHEN acc = 0 THEN (c + 1) * $EwmaPack
         | ELSE (${idiv(s"($e + c)", "2", duck)} + 1) * $EwmaPack
         |   + (acc % $EwmaPack)
         |   + (CASE WHEN abs(c - $e) > $EwmaJumpCents THEN 1 ELSE 0 END)
         | END""".stripMargin
    }
    val packed = events.select(col("user_id"),
      (col("event_id") * lit(131072L) +
        expr("CAST(round(value * 100) AS BIGINT)")).as("v"))
    packed.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(col("v"))).as("arr"))
      .withColumn("cents", expr(xform("arr", "v", "v % 131072", duck = false)))
      .withColumn("folded",
        expr(reduceLong("cents", "acc", "c", step(duck = false), duck = false)))
      .select(col("user_id"), col("n_events"),
        expr(s"folded DIV $EwmaPack - 1").as("ewma_cents"),
        expr(s"folded % $EwmaPack").as("n_flags"))
  }

  /** Per-account maximum drawdown — the peak-to-trough exposure metric a
    * risk desk runs over every ledger: running balance (purchases debit,
    * everything else credits), its running peak, and the largest
    * peak-minus-balance gap ever seen. Both running measures share ONE
    * window spec (same partitioning, same (t, event_id) total order), so
    * Catalyst evaluates them in a single Window node after a single
    * shuffle on user_id; the final per-user aggregate reuses that
    * partitioning. Per-user state is two longs; users parallelize
    * independently — the q_running_balance scale shape exactly.
    */
  def drawdown(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), unix_micros(col("ts")).as("t"),
      col("event_id"),
      when(col("event_type") === "purchase", -cents).otherwise(cents).as("delta"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("bal", sum(col("delta")).over(w))
      .withColumn("peak", max(col("bal")).over(w))
      .groupBy(col("user_id")).agg(
        count(lit(1)).as("n_events"),
        max(col("peak")).as("peak_cents"),
        max(col("peak") - col("bal")).as("max_drawdown_cents"),
        sum(col("delta")).as("final_cents"))
  }

  /** Brand-month VWAP off the order book (lineitem as the trade tape:
    * extendedprice = notional-per-line price, quantity = lot size).
    * Exact integers end to end: price in cents, quantity integral by
    * TPC-H construction (CAST is exact), vwap = notional DIV volume on
    * non-negative operands (truncating division identical cross-engine).
    * Shape: broadcast part-dim join (the J3 lookup shape), then ONE hash
    * aggregate on (brand, month) — partial aggregation map-side combines
    * before the only shuffle; nothing here grows beyond |brands|×months.
    */
  def vwap(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_partkey"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_cents"),
      expr("CAST(l_quantity AS BIGINT)").as("qty"),
      expr("CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)").as("ym"))
    li.join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), col("ym"))
      .agg(sum(col("price_cents") * col("qty")).as("notional_cents"),
        sum(col("qty")).as("volume"),
        count(lit(1)).as("n_trades"))
      .withColumn("vwap_cents", expr("notional_cents DIV volume"))
  }

  /** CUSUM packing/threshold constants. Positive-shift CUSUM with
    * allowance [[CusumKCents]] and decision interval [[CusumHCents]]:
    * s' = max(0, s + x - K); crossing H raises an alarm and resets s.
    * Domain check: cents < 2^16 (events.value < $655.36 by generator
    * construction), so s stays < H + 2^16 < 2^17 and (s+1)·2^20 plus a
    * 20-bit alarm count stays far under 2^63.
    */
  val CusumPackBits = 20
  val CusumPack = 1L << CusumPackBits
  val CusumKCents = 10000L // per-step drift allowance ($100)
  val CusumHCents = 40000L // decision interval ($400)

  /** Integer CUSUM positive-shift detector per user — the classic
    * change-point monitor (Page 1954) a fraud pipeline runs on spend
    * streams: alarms when cumulative excess spend over the K-cents
    * allowance crosses H cents, then re-arms. Pure integer state, so the
    * fold is bit-exact cross-engine; like [[ewmaFlags]] it runs as ONE
    * portable sort_array + aggregate fold per user with (s, alarms)
    * packed into a single BIGINT ((s+1) high bits so 0 stays the empty
    * sentinel). Per-user state is O(1); users parallelize independently.
    */
  def cusumFlags(events: DataFrame): DataFrame = {
    import graft.functions.PortableSql.{idiv, reduceLong, xform}
    def step(duck: Boolean): String = {
      val sPrev = s"(CASE WHEN acc = 0 THEN 0 ELSE ${idiv("acc", CusumPack.toString, duck)} - 1 END)"
      val s1 = s"greatest(0, $sPrev + c - $CusumKCents)"
      s"""CASE WHEN $s1 >= $CusumHCents
         | THEN $CusumPack + (acc % $CusumPack) + 1
         | ELSE ($s1 + 1) * $CusumPack + (acc % $CusumPack)
         | END""".stripMargin
    }
    val packed = events.select(col("user_id"),
      (col("event_id") * lit(131072L) +
        expr("CAST(round(value * 100) AS BIGINT)")).as("v"))
    packed.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(col("v"))).as("arr"))
      .withColumn("cents", expr(xform("arr", "v", "v % 131072", duck = false)))
      .withColumn("folded",
        expr(reduceLong("cents", "acc", "c", step(duck = false), duck = false)))
      .select(col("user_id"), col("n_events"),
        expr(s"folded DIV $CusumPack - 1").as("cusum_cents"),
        expr(s"folded % $CusumPack").as("n_alarms"))
  }

  /** Oracle twin of [[cusumFlags]] (DuckDB dialect of the same fold). */
  private def cusumFlagsSql: String = {
    import graft.functions.PortableSql.{idiv, reduceLong, xform}
    val sPrev = s"(CASE WHEN acc = 0 THEN 0 ELSE ${idiv("acc", CusumPack.toString, duck = true)} - 1 END)"
    val s1 = s"greatest(0, $sPrev + c - $CusumKCents)"
    val step =
      s"""CASE WHEN $s1 >= $CusumHCents
         | THEN $CusumPack + (acc % $CusumPack) + 1
         | ELSE ($s1 + 1) * $CusumPack + (acc % $CusumPack)
         | END""".stripMargin
    s"""WITH p AS (SELECT user_id,
       |   event_id * 131072 + CAST(round(value * 100) AS BIGINT) AS v
       |  FROM events),
       | g AS (SELECT user_id, count(*) AS n_events,
       |   list_sort(list(v)) AS arr FROM p GROUP BY user_id),
       | f AS (SELECT user_id, n_events,
       |   ${reduceLong(xform("arr", "v", "v % 131072", duck = true),
            "acc", "c", step, duck = true)} AS folded FROM g)
       |SELECT user_id, n_events,
       | folded // $CusumPack - 1 AS cusum_cents,
       | folded % $CusumPack AS n_alarms
       |FROM f""".stripMargin
  }

  /** Oracle twin of [[ewmaFlags]] (DuckDB dialect of the same fold). */
  private def ewmaFlagsSql: String = {
    import graft.functions.PortableSql.{idiv, reduceLong, xform}
    val e = s"(${idiv("acc", EwmaPack.toString, duck = true)} - 1)"
    val step =
      s"""CASE WHEN acc = 0 THEN (c + 1) * $EwmaPack
         | ELSE (${idiv(s"($e + c)", "2", duck = true)} + 1) * $EwmaPack
         |   + (acc % $EwmaPack)
         |   + (CASE WHEN abs(c - $e) > $EwmaJumpCents THEN 1 ELSE 0 END)
         | END""".stripMargin
    s"""WITH p AS (SELECT user_id,
       |   event_id * 131072 + CAST(round(value * 100) AS BIGINT) AS v
       |  FROM events),
       | g AS (SELECT user_id, count(*) AS n_events,
       |   list_sort(list(v)) AS arr FROM p GROUP BY user_id),
       | f AS (SELECT user_id, n_events,
       |   ${reduceLong(xform("arr", "v", "v % 131072", duck = true),
            "acc", "c", step, duck = true)} AS folded FROM g)
       |SELECT user_id, n_events,
       | folded // $EwmaPack - 1 AS ewma_cents,
       | folded % $EwmaPack AS n_flags
       |FROM f""".stripMargin
  }

  /** Alignment offset for the (possibly negative) Sharpe numerator —
    * the q_corr_daily CorrBig trick (|ratio| bounded, offset dwarfs it).
    */
  val SharpeBig = 100000L

  /** Daily SHARPE ratio per event_type — mean/stddev of the daily cent
    * totals in exact milli units via the portable integer isqrt (the
    * q_corr_daily kernel): sharpe_milli = s*1000*n DIV (n*isqrt(n*q−s²))
    * with the n-scaling folded so mean = s/n and std = isqrt(n·q−s²)/n
    * cancel their denominators — i.e. s * 1000 DIV isqrt(n·q − s²),
    * offset-aligned for negative sums. The risk-adjusted-return tile
    * every transaction-volume dashboard carries next to the raw totals.
    * One groupBy(type, day) + one groupBy(type); |types|-row frames
    * after the first aggregate. Shares the corr kernels' int64 domain
    * bound (daily cents × day-span — den < 2^63/1000).
    */
  def sharpeDaily(events: DataFrame): DataFrame = {
    import graft.functions.PortableSql.isqrtSql
    val d = events
      .select(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"),
        cents.as("c"))
      .groupBy(col("event_type"), col("day")).agg(sum(col("c")).as("v"))
    d.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("q"))
      .withColumn("varn", expr("n_days * q - s * s"))
      .withColumn("den", expr(isqrtSql("varn", duck = false)))
      .filter(col("den") > 0) // constant series carry no ratio
      .select(col("event_type"), col("n_days"), col("s").as("sum_cents"),
        expr(s"(s * 1000 + $SharpeBig * den) DIV den - $SharpeBig")
          .as("sharpe_milli"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sharpe_daily" -> ((s, dir) => sharpeDaily(Tables.events(s, dir))),
    "q_ewma_flags" -> ((s, dir) => ewmaFlags(Tables.events(s, dir))),
    "q_cusum_flags" -> ((s, dir) => cusumFlags(Tables.events(s, dir))),
    "q_drawdown" -> ((s, dir) => drawdown(Tables.events(s, dir))),
    "q_vwap" -> ((s, dir) => vwap(Tables.lineitem(s, dir), Tables.part(s, dir))),
    "q_ohlc_bars" -> ((s, dir) => ohlcBars(Tables.events(s, dir))),
    "q_running_balance" -> ((s, dir) => runningBalance(Tables.events(s, dir))),
    "q_benford" -> ((s, dir) => benfordAudit(Tables.events(s, dir))))

  def oracleSql: Map[String, String] = Map(
    "q_sharpe_daily" -> {
      val isq = graft.functions.PortableSql.isqrtSql("varn", duck = true)
      s"""WITH d AS (SELECT event_type,
         |   epoch_us(ts) // 86400000000 AS day,
         |   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         | m AS (SELECT event_type, count(*) AS n_days,
         |   CAST(sum(v) AS BIGINT) AS s,
         |   CAST(sum(v * v) AS BIGINT) AS q FROM d GROUP BY 1),
         | k AS (SELECT event_type, n_days, s,
         |   n_days * q - s * s AS varn FROM m),
         | z AS (SELECT event_type, n_days, s, $isq AS den FROM k)
         |SELECT event_type, n_days, s AS sum_cents,
         | CAST((s * 1000 + $SharpeBig * den) // den - $SharpeBig AS BIGINT)
         |   AS sharpe_milli
         |FROM z WHERE den > 0""".stripMargin
    },
    "q_ewma_flags" -> ewmaFlagsSql,
    "q_cusum_flags" -> cusumFlagsSql,
    "q_drawdown" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id,
        |   CASE WHEN event_type = 'purchase'
        |     THEN -CAST(round(value * 100) AS BIGINT)
        |     ELSE CAST(round(value * 100) AS BIGINT) END AS delta
        |  FROM events),
        | r AS (SELECT user_id, t, event_id, delta,
        |   sum(delta) OVER (PARTITION BY user_id ORDER BY t, event_id
        |     ROWS UNBOUNDED PRECEDING) AS bal FROM e),
        | p AS (SELECT user_id, delta, bal,
        |   max(bal) OVER (PARTITION BY user_id ORDER BY t, event_id
        |     ROWS UNBOUNDED PRECEDING) AS peak FROM r)
        |SELECT user_id, count(*) AS n_events,
        | CAST(max(peak) AS BIGINT) AS peak_cents,
        | CAST(max(peak - bal) AS BIGINT) AS max_drawdown_cents,
        | CAST(sum(delta) AS BIGINT) AS final_cents
        |FROM p GROUP BY 1""".stripMargin,
    "q_vwap" ->
      """WITH li AS (SELECT l_partkey,
        |   CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
        |   CAST(l_quantity AS BIGINT) AS qty,
        |   CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym
        |  FROM lineitem)
        |SELECT p_brand AS brand, ym,
        | CAST(sum(price_cents * qty) AS BIGINT) AS notional_cents,
        | CAST(sum(qty) AS BIGINT) AS volume,
        | count(*) AS n_trades,
        | CAST(sum(price_cents * qty) AS BIGINT) // CAST(sum(qty) AS BIGINT)
        |   AS vwap_cents
        |FROM li JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2""".stripMargin,
    "q_ohlc_bars" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS t, event_id,
        |   CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        | r AS (SELECT event_type, t // 86400000000 AS day, cents,
        |   row_number() OVER (PARTITION BY event_type, t // 86400000000
        |     ORDER BY t, event_id) AS rn,
        |   count(*) OVER (PARTITION BY event_type, t // 86400000000) AS n
        |  FROM e)
        |SELECT event_type, day,
        | CAST(max(CASE WHEN rn = 1 THEN cents END) AS BIGINT) AS open_cents,
        | CAST(max(cents) AS BIGINT) AS high_cents,
        | CAST(min(cents) AS BIGINT) AS low_cents,
        | CAST(max(CASE WHEN rn = n THEN cents END) AS BIGINT) AS close_cents,
        | CAST(sum(cents) AS BIGINT) AS volume_cents,
        | count(*) AS n_trades
        |FROM r GROUP BY 1, 2""".stripMargin,

    "q_running_balance" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id,
        |   CASE WHEN event_type = 'purchase'
        |     THEN -CAST(round(value * 100) AS BIGINT)
        |     ELSE CAST(round(value * 100) AS BIGINT) END AS delta
        |  FROM events),
        | r AS (SELECT user_id, delta,
        |   sum(delta) OVER (PARTITION BY user_id ORDER BY t, event_id
        |     ROWS UNBOUNDED PRECEDING) AS bal FROM e)
        |SELECT user_id, CAST(sum(delta) AS BIGINT) AS final_cents,
        | CAST(min(bal) AS BIGINT) AS min_cents,
        | CAST(sum(CASE WHEN bal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_overdraft
        |FROM r GROUP BY 1""".stripMargin,

    "q_benford" ->
      s"""WITH d AS (SELECT CAST(substr(CAST(CAST(round(value * 100) AS BIGINT)
         |    AS VARCHAR), 1, 1) AS BIGINT) AS digit
         |  FROM events
         |  WHERE CAST(round(value * 100) AS BIGINT) >= 1),
         | c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
         | t AS (SELECT count(*) AS tot FROM d)
         |SELECT digit, n, n * 1000000 // tot AS observed_ppm,
         | ${benfordCase("digit")} AS expected_ppm,
         | abs(n * 1000000 // tot - ${benfordCase("digit")}) AS deviation_ppm
         |FROM c, t""".stripMargin)
}
