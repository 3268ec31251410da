package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of join — for each left row, the single right row with the greatest
  * time at-or-before the left row's time, per key. The canonical
  * time-series enrichment operator (quote-at-trade-time, feature-at-
  * example-time in a training pipeline); Spark has no built-in.
  *
  * Implementation is the SCALABLE shape, not the obvious one. The obvious
  * plan — a range join (`l.key = r.key AND l.t >= r.t`) + argmax — emits
  * one row per (left, earlier-right) pair before pruning, quadratic in
  * per-key history. Instead both sides are UNIONED, tagged, and sorted
  * per key by (time, side, order), and each left row reads the latest
  * right attributes with `last(_, ignoreNulls) OVER (rows unbounded
  * preceding .. current)`:
  *
  *   - one shuffle on the key, one per-key sort — the same cost as any
  *     windowed query, linear in history length;
  *   - right-before-left at equal times makes the match INCLUSIVE
  *     (t_right = t_left matches);
  *   - ties among right rows at one (key, time) resolve to the greatest
  *     `rightOrder` (the window's last), which is the deterministic
  *     argmax the oracle reproduces by deduplicating before its ASOF.
  *
  * At 100 TB this partitions by key like every windowed operator — only
  * each key's history must fit an executor. The streaming twin is
  * [[graft.streaming.StreamAsof]]: constant latest-right-row state per
  * key via flatMapGroupsWithState, probes emitting on arrival
  * (`q_stream_asof`, same oracle family as this operator).
  */
object AsofJoin {

  /** @param left       left (probe) side
    * @param right      right (history) side
    * @param key        equi-join column, present on both sides
    * @param time       event-time column, present on both sides
    * @param rightCols  right-side columns to carry onto matched left rows
    *                   (null when no right row is at-or-before)
    * @param rightOrder right-side tiebreak column for equal (key, time)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      rightCols: Seq[String],
      rightOrder: String): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == key || c == time).toSeq
    require(leftCols.intersect(rightCols).isEmpty,
      s"asofJoin: rightCols ${leftCols.intersect(rightCols).mkString(", ")} " +
        "collide with left column names — rename the right side first")
    // The matched right row rides as ONE struct: filling each right
    // column with its own last(_, ignoreNulls) would let a null
    // attribute on the matched row backfill from an OLDER right row —
    // a chimera of two rows. A struct is non-null for every right row
    // (even when its fields are null), so last() picks the whole
    // matched row atomically.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    val l2 = left.select(
      Seq(col(key), col(time), lit(1).as("_is_left"),
        lit(null).cast("long").as("_r_ord")) ++
        leftCols.map(col) ++
        Seq(lit(null).cast(rStructType).as("_r")): _*)
    val r2 = right.select(
      Seq(col(key), col(time), lit(0).as("_is_left"),
        col(rightOrder).cast("long").as("_r_ord")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(rightCols.map(col): _*).as("_r")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("_is_left").asc, col("_r_ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .select((col(key) +: col(time) +: leftCols.map(col)) ++
        rightCols.map(c => col(s"_r.$c").as(c)): _*)
  }

  /** Oracle-checked instance: for each purchase event, the user's latest
    * click at-or-before it. Times compared as epoch MICROS (exact integer
    * comparison in both engines; events.ts is micros precision).
    */
  /** The probe/history frames shared by the window-plan and native-exec
    * instances — one definition, so the "identical oracle applies"
    * guarantee between q_asof_join and q_asof_native is structural.
    */
  private def purchasesFrame(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("event_id"), col("value"))

  private def clicksFrame(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("event_id").as("click_event_id"), col("value").as("click_value"))

  def purchaseAsofClick(s: SparkSession, dir: String): DataFrame =
    asofJoin(purchasesFrame(s, dir), clicksFrame(s, dir),
      key = "user_id", time = "t_us",
      rightCols = Seq("click_event_id", "click_value"),
      rightOrder = "click_event_id")

  /** SCD2 dimension lookup — the CONSUMER side of q_scd2_intervals:
    * enrich each fact probe with the dimension version valid at its
    * event time. Versions are a deterministic three-era customer
    * history (base at t=0; +100.00 for keys %5==0 at t=1e6; +250.00
    * for %10==0 at t=2e6 — the q_stream_upsert revision ladder given
    * timestamps); probes spread orders across the eras. The lookup is
    * the SAME linear union+window as-of operator — never the quadratic
    * interval range join the oracle runs (probe x versions BETWEEN),
    * which is the textbook formulation but explodes with history depth.
    */
  def scd2Lookup(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir).select(col("c_custkey").as("k"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal"))
    val versions = base
      .select(col("k"), lit(0L).as("t"), col("bal").as("ver_bal"), lit(0L).as("ver"))
      .unionByName(base.filter(col("k") % 5 === 0)
        .select(col("k"), lit(1000000L).as("t"),
          (col("bal") + 10000L).as("ver_bal"), lit(1L).as("ver")))
      .unionByName(base.filter(col("k") % 10 === 0)
        .select(col("k"), lit(2000000L).as("t"),
          (col("bal") + 25000L).as("ver_bal"), lit(2L).as("ver")))
    val probes = Tables.orders(s, dir).select(col("o_custkey").as("k"),
      (col("o_orderkey") % 3000000L).as("t"), col("o_orderkey").as("order_id"))
    asofJoin(probes, versions, key = "k", time = "t",
      rightCols = Seq("ver", "ver_bal"), rightOrder = "ver")
  }

  /** The same purchase-asof-click instance through the NATIVE physical
    * operator (graft.plans.AsofJoinExec: co-partitioned sorted merge,
    * O(1) task state) — the right side's join columns renamed so the
    * combined output has no collisions, then projected back to the
    * q_asof_join column contract so the identical oracle applies.
    */
  def purchaseAsofClickNative(s: SparkSession, dir: String): DataFrame = {
    val clicks = clicksFrame(s, dir)
      .withColumnRenamed("user_id", "r_user")
      .withColumnRenamed("t_us", "r_t")
    graft.plans.AsofJoinNative.asof(purchasesFrame(s, dir), clicks,
        leftKey = "user_id", rightKey = "r_user",
        leftTime = "t_us", rightTime = "r_t", rightOrder = "click_event_id")
      .select(col("user_id"), col("t_us"), col("event_id"), col("value"),
        col("click_event_id"), col("click_value"))
  }

  /** Calendar gap-fill with last-observation-carried-forward — the
    * time-series regularization step (sparse per-day observations → a
    * dense daily series) every downstream model-feature or charting
    * consumer needs. Per-user daily purchase totals, a generated day
    * spine from each user's first to last active day, and LOCF via the
    * ignore-nulls running `last` — the as-of semantic expressed as one
    * user-partitioned window (never a global sort; spine size is bounded
    * by each user's own date RANGE, not by data volume, the standard
    * calendar-spine caveat). First spine day is always observed by
    * construction, so the carried value is total.
    */
  def gapFillLocf(events: DataFrame): DataFrame = {
    val daily = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("user_id"), col("day")).agg(sum(col("cents")).as("spend_cents"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("is_observed",
        when(col("spend_cents").isNotNull, 1L).otherwise(0L))
      .withColumn("locf_cents", last(col("spend_cents"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("day"), col("is_observed"), col("locf_cents"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> ((s, dir) => purchaseAsofClick(s, dir)),
    "q_asof_native" -> ((s, dir) => purchaseAsofClickNative(s, dir)),
    "q_ts_fill" -> ((s, dir) => gapFillLocf(Tables.events(s, dir))),
    "q_scd2_lookup" -> ((s, dir) => scd2Lookup(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    // generate_series spine + IGNORE NULLS running last == LOCF.
    "q_ts_fill" ->
      """WITH daily AS (SELECT user_id,
        |   epoch_us(ts) // 86400000000 AS day,
        |   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS spend_cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        | bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1),
        | spine AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day
        |  FROM bounds)
        |SELECT s.user_id, s.day,
        | CAST(CASE WHEN d.spend_cents IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |   AS is_observed,
        | last_value(d.spend_cents IGNORE NULLS) OVER (
        |   PARTITION BY s.user_id ORDER BY s.day
        |   ROWS UNBOUNDED PRECEDING) AS locf_cents
        |FROM spine s LEFT JOIN daily d
        |  ON s.user_id = d.user_id AND s.day = d.day""".stripMargin,

    // DuckDB's native ASOF LEFT JOIN, with the right side deduplicated to
    // the max-event_id row per (user, time) so tied timestamps resolve
    // exactly as the union-window plan's last() does.
    "q_asof_join" ->
      """WITH l AS (SELECT user_id, epoch_us(ts) AS t_us, event_id, value
        |  FROM events WHERE event_type = 'purchase'),
        | r0 AS (SELECT user_id, epoch_us(ts) AS t_us,
        |   event_id AS click_event_id, value AS click_value
        |  FROM events WHERE event_type = 'click'),
        | r AS (SELECT user_id, t_us, click_event_id, click_value FROM (
        |   SELECT *, row_number() OVER (PARTITION BY user_id, t_us
        |     ORDER BY click_event_id DESC) AS rn FROM r0) z WHERE rn = 1)
        |SELECT l.user_id, l.t_us, l.event_id, l.value,
        | r.click_event_id, r.click_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.t_us >= r.t_us""".stripMargin,

    // identical semantics through the native physical operator
    "q_asof_native" ->
      """WITH l AS (SELECT user_id, epoch_us(ts) AS t_us, event_id, value
        |  FROM events WHERE event_type = 'purchase'),
        | r0 AS (SELECT user_id, epoch_us(ts) AS t_us,
        |   event_id AS click_event_id, value AS click_value
        |  FROM events WHERE event_type = 'click'),
        | r AS (SELECT user_id, t_us, click_event_id, click_value FROM (
        |   SELECT *, row_number() OVER (PARTITION BY user_id, t_us
        |     ORDER BY click_event_id DESC) AS rn FROM r0) z WHERE rn = 1)
        |SELECT l.user_id, l.t_us, l.event_id, l.value,
        | r.click_event_id, r.click_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.t_us >= r.t_us""".stripMargin,

    // the textbook interval formulation (lead-built validity windows +
    // BETWEEN range join) — an independent plan for the as-of lookup
    "q_scd2_lookup" ->
      """WITH base AS (SELECT c_custkey AS k,
        |   CAST(round(c_acctbal * 100) AS BIGINT) AS bal FROM customer),
        |v AS (
        | SELECT k, CAST(0 AS BIGINT) AS t, bal AS ver_bal, CAST(0 AS BIGINT) AS ver FROM base
        | UNION ALL SELECT k, 1000000, bal + 10000, 1 FROM base WHERE k % 5 = 0
        | UNION ALL SELECT k, 2000000, bal + 25000, 2 FROM base WHERE k % 10 = 0),
        |iv AS (SELECT k, ver, ver_bal, t AS valid_from,
        |   coalesce(lead(t) OVER (PARTITION BY k ORDER BY t),
        |     9223372036854775807) AS valid_to FROM v),
        |p AS (SELECT o_custkey AS k, o_orderkey % 3000000 AS t,
        |   o_orderkey AS order_id FROM orders)
        |SELECT p.k, p.t, p.order_id, iv.ver, iv.ver_bal
        |FROM p JOIN iv ON p.k = iv.k
        | AND p.t >= iv.valid_from AND p.t < iv.valid_to""".stripMargin
  )
}
