package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Warehouse audits over the star schema — the checks a warehouse loader
  * (the reference's BigQuery star schema, README.md:35-49) runs after
  * every load, plus a dominance-frontier catalog audit.
  *
  * All oracle-compared values are integers or exact-decimal comparisons:
  * the z-score outlier test is evaluated as an integer inequality in
  * 128-bit arithmetic (Spark DECIMAL(38,0) / DuckDB HUGEINT), never as
  * floating-point variance — two engines' var_samp differ in low-order
  * bits (Welford vs two-pass), and a threshold comparison on those bits
  * would be flaky by construction.
  */
object AuditOps {

  /** Referential-integrity audit of one FK edge: total fact-side rows,
    * rows whose key misses the dimension, and distinct missing keys —
    * ONE broadcast left-outer join + one conditional aggregate, so the
    * fact side is scanned exactly once per edge and never shuffles
    * (dims are the small side by construction; at 100 TB the fact rows
    * stream through the broadcast probe unchanged). Public so the spec
    * can drive it with an orphaned fixture — the real star data is
    * clean, which would leave the orphan-counting arm untested.
    */
  def fkEdge(name: String, fact: DataFrame, fk: String,
             dim: DataFrame, pk: String): DataFrame =
    fact.select(col(fk).cast("long").as("k"))
      .join(broadcast(dim.select(col(pk).cast("long").as("pk"))),
        col("k") === col("pk"), "left_outer")
      .agg(count(lit(1)).as("fact_rows"),
        count(when(col("pk").isNull, 1)).as("orphan_rows"),
        count_distinct(when(col("pk").isNull, col("k"))).as("orphan_keys"))
      .select(lit(name).as("edge"),
        col("fact_rows"), col("orphan_rows"), col("orphan_keys"))

  /** The audit over every FK edge in the star schema.
    *
    * The three lineitem edges are FUSED into one pass: a single scan of
    * the fact table flows through three chained broadcast left-outer
    * probes (part, supplier, orders key sets) into ONE aggregate that
    * emits all three edges' counts, then `stack` pivots the single row
    * back into the three edge rows. r6 ran the edges independently —
    * three full lineitem scans and seven sequential job launches, 11.1s
    * wall for 10.7 task-seconds; the fused shape pays one scan and one
    * job for the entire fact side. The three distinct-counts share one
    * Expand (4 projections of a 6-column row), still map-side partial.
    * At 100 TB the part/supplier probes stay broadcasts; the orders key
    * set outgrows a broadcast and that edge alone would move to a
    * shuffle join behind a bloom prefilter — the small-dim edges below
    * are unaffected.
    */
  def fkIntegrity(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir); val supp = Tables.supplier(spark, dir)
    val nat = Tables.nation(spark, dir)

    val li = Tables.lineitem(spark, dir).select(
      col("l_partkey").cast("long").as("k_part"),
      col("l_suppkey").cast("long").as("k_supp"),
      col("l_orderkey").cast("long").as("k_ord"))
    val probed = li
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey").cast("long").as("pk_part"))),
        col("k_part") === col("pk_part"), "left_outer")
      .join(broadcast(supp.select(col("s_suppkey").cast("long").as("pk_supp"))),
        col("k_supp") === col("pk_supp"), "left_outer")
      .join(broadcast(ord.select(col("o_orderkey").cast("long").as("pk_ord"))),
        col("k_ord") === col("pk_ord"), "left_outer")
    val fused = probed.agg(
      count(lit(1)).as("n"),
      count(when(col("pk_part").isNull, 1)).as("orph_part"),
      count_distinct(when(col("pk_part").isNull, col("k_part"))).as("keys_part"),
      count(when(col("pk_supp").isNull, 1)).as("orph_supp"),
      count_distinct(when(col("pk_supp").isNull, col("k_supp"))).as("keys_supp"),
      count(when(col("pk_ord").isNull, 1)).as("orph_ord"),
      count_distinct(when(col("pk_ord").isNull, col("k_ord"))).as("keys_ord"))
    val liEdges = fused.selectExpr(
      """stack(3,
        |  'lineitem.partkey->part',      n, orph_part, keys_part,
        |  'lineitem.suppkey->supplier',  n, orph_supp, keys_supp,
        |  'lineitem.orderkey->orders',   n, orph_ord,  keys_ord)
        |AS (edge, fact_rows, orphan_rows, orphan_keys)""".stripMargin)

    Seq(
      liEdges,
      fkEdge("orders.custkey->customer", ord, "o_custkey", cust, "c_custkey"),
      fkEdge("customer.nationkey->nation", cust, "c_nationkey", nat, "n_nationkey"),
      fkEdge("supplier.nationkey->nation", supp, "s_nationkey", nat, "n_nationkey"),
      fkEdge("nation.regionkey->region", nat, "n_regionkey",
        Tables.region(spark, dir), "r_regionkey")
    ).reduce(_ unionByName _)
  }

  /** Per-user 3-sigma outlier counts over event values, decided by the
    * exact integer inequality
    *
    *   (n*x - s)^2 * (n-1)  >  9 * (n*ssq - s^2) * n
    *
    * (the sample z-score |x-mean| > 3*stddev_samp cleared of divisions)
    * over integer cents, evaluated in DECIMAL(38,0). The intermediates
    * reach ~1e18 at sf0.1 — inside int64 but with <10% headroom, so the
    * 128-bit lane is the durable choice; at larger n the same rewrite
    * scales by first dividing s, ssq by gcd-like unit scaling or moving
    * to per-group double stats WITHOUT cross-engine hashing (the audit
    * would then pin only counts, as here).
    *
    * Plan: one shuffle on user_id for the stats, join back on the same
    * key (exchange reuse), flag per event, re-aggregate per user.
    */
  def anomalyZscore(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"),
      expr("CAST(round(value * 100) AS BIGINT)").as("c"))
    val stats = e.groupBy("user_id").agg(
      count(lit(1)).as("n"), sum(col("c")).as("s"),
      sum(col("c") * col("c")).as("ssq"))
    val dec = "DECIMAL(38,0)"
    e.join(stats, "user_id")
      .withColumn("is_out", expr(
        s"""n >= 2 AND
           |pow10 > 0 AND
           |CAST(CAST(n*c - s AS $dec) * CAST(n*c - s AS $dec) AS $dec) * CAST(n - 1 AS $dec)
           |  > 9 * pow10 * CAST(n AS $dec)""".stripMargin
          .replace("pow10", s"(CAST(n AS $dec) * CAST(ssq AS $dec) - CAST(s AS $dec) * CAST(s AS $dec))")))
      .groupBy("user_id")
      .agg(max(col("n")).as("n_events"),
        sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Per-user ROBUST outlier counts via median absolute deviation — the
    * screen that survives what breaks [[anomalyZscore]]: one huge
    * transaction inflates a user's stddev enough to hide its siblings,
    * while the median/MAD pair shrugs off half the data being corrupt.
    * All arithmetic is exact integers at 2x scale (the doubled-median
    * trick from conversionLag, applied twice): med2 = the SUM of the two
    * central order statistics of integer cents (= 2*median; for odd n
    * both ranks select the same element, counted twice by construction),
    * dev = |2c - med2| (= 2*|c - median|), mad2 = dev's doubled median
    * (= 4*MAD in cents), and the 3-sigma-analog flag |c - med| > 3*MAD
    * becomes the division-free 2*dev > 3*mad2. No float enters any
    * compared value.
    *
    * Plan: both ranking windows and all joins partition on user_id — one
    * shuffle establishes the partitioning and every later stage reuses
    * it; groups parallelize independently at any scale.
    */
  def anomalyMad(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"),
      expr("CAST(round(value * 100) AS BIGINT)").as("c"))
    val wu = Window.partitionBy(col("user_id"))
    val ranked = e
      .withColumn("rn", row_number().over(wu.orderBy(col("c").asc)))
      .withColumn("n", count(lit(1)).over(wu))
    val med = ranked.groupBy(col("user_id")).agg(
      max(col("n")).as("n_events"),
      (sum(when(col("rn") === expr("(n + 1) DIV 2"), col("c")).otherwise(0L)) +
        sum(when(col("rn") === expr("(n + 2) DIV 2"), col("c")).otherwise(0L)))
        .as("med2"))
    val dev = e.join(med, "user_id")
      .withColumn("dev", abs(col("c") * 2 - col("med2")))
    val ranked2 = dev.withColumn("rn",
      row_number().over(wu.orderBy(col("dev").asc)))
    val mad = ranked2.groupBy(col("user_id")).agg(
      (sum(when(col("rn") === expr("(n_events + 1) DIV 2"), col("dev")).otherwise(0L)) +
        sum(when(col("rn") === expr("(n_events + 2) DIV 2"), col("dev")).otherwise(0L)))
        .as("mad2"))
    dev.join(mad, "user_id")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"),
        max(col("med2")).as("med2"),
        max(col("mad2")).as("mad2"),
        sum(when(col("dev") * 2 > col("mad2") * 3, 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** 2D Pareto skyline of the part catalog (minimize retail price AND
    * size): a part is on the frontier iff no other part is <= on both
    * dimensions and < on one. Computed without the quadratic self-join
    * AND without any corpus-sized global ordering: per-price-group min
    * size (one shuffle), then the strict-prefix min decomposed with the
    * same bucket two-pass as SampleOps.tokenBudgetSample — prefix-min is
    * associative, so `prev_min(p) = min(prefix min of earlier buckets,
    * within-bucket strict-prefix min)` exactly. The only global window
    * runs over the bucket frame (price DIV [[SkylineBucketWidth]] —
    * monotone in price, so bucket order == price order); the per-price
    * window is partitioned by bucket. A broadcast join back tags
    * frontier rows. At extreme price cardinality the bucket width is the
    * dial; every pass stays parallel.
    */
  val SkylineBucketWidth = 100L

  def skyline(part: DataFrame): DataFrame = {
    val groups = part.groupBy(col("p_retailprice").as("price"))
      .agg(min(col("p_size")).as("min_sz"))
      .withColumn("bucket", expr(s"CAST(floor(price / $SkylineBucketWidth) AS BIGINT)"))
    val bucketPrev = groups.groupBy(col("bucket"))
      .agg(min(col("min_sz")).as("bmin"))
      // deliberate no-partition window: the frame is <= n_buckets rows
      .withColumn("bucket_prev",
        min(col("bmin")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("bucket"), col("bucket_prev"))
    val inBucket = Window.partitionBy(col("bucket")).orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevMin = groups.join(broadcast(bucketPrev), "bucket")
      // least() skips nulls: first price of the first bucket gets NULL
      // (no predecessor), matching the naive global-window definition
      .withColumn("prev_min",
        least(min(col("min_sz")).over(inBucket), col("bucket_prev")))
    part.join(broadcast(prevMin), part("p_retailprice") === prevMin("price"))
      .filter(col("p_size") === col("min_sz") &&
        (col("prev_min").isNull || col("p_size") < col("prev_min")))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
  }

  /** Distribution-drift audit — the PSI-style training/serving screen: the
    * stream splits at its midpoint timestamp into reference and live
    * halves, amounts bin into 10 equi-width buckets sized on the
    * REFERENCE half (out-of-range live values clamp into the end
    * buckets, exactly how a deployed monitor treats novel extremes), and
    * each bucket reports both shares in integer ppm plus the absolute
    * deviation. Everything is integer arithmetic — no libm log (real
    * PSI's ln(p/q) factor) enters a compared value; rank the dev_ppm
    * column for the alert. Clamping also absorbs the one engine
    * difference (Spark DIV truncates, DuckDB // floors) because negative
    * bucket ids only occur below the clamp. Three aggregate passes over
    * the fact (midpoint, reference bounds, bucket counts) and two
    * single-row broadcasts — nothing global, nothing sorted.
    */
  def driftAudit(events: DataFrame): DataFrame = {
    val e = events.select(unix_micros(col("ts")).as("t"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val mid = e.agg(expr("(min(t) + max(t)) DIV 2").as("tmid"))
    val tagged = e.crossJoin(broadcast(mid))
      .select((col("t") <= col("tmid")).as("is_ref"), col("cents"))
    val st = tagged.filter(col("is_ref"))
      .agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
    val b = tagged.crossJoin(broadcast(st))
      .withColumn("bucket",
        expr("least(greatest(((cents - mn) * 10) DIV (mx - mn + 1), 0), 9)"))
      .groupBy(col("bucket")).agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("n_live"))
    driftScores(b)
  }

  /** ppm shares + deviation off a (bucket, n_ref, n_live) count frame —
    * shared by the batch audit and its streaming twin so both score
    * through literally the same arithmetic. A degenerate half (every
    * event on one timestamp puts all rows in the reference half, so
    * tl = 0) yields NULL shares explicitly on BOTH engines — Spark DIV
    * would return NULL but DuckDB // raises division-by-zero, so the
    * guard is what keeps the oracle comparable.
    */
  def driftScores(b: DataFrame): DataFrame = {
    val tot = b.agg(sum(col("n_ref")).as("tr"), sum(col("n_live")).as("tl"))
    b.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_ref"), col("n_live"),
        expr("CASE WHEN tr = 0 THEN NULL ELSE n_ref * 1000000 DIV tr END")
          .as("ref_ppm"),
        expr("CASE WHEN tl = 0 THEN NULL ELSE n_live * 1000000 DIV tl END")
          .as("live_ppm"),
        expr("""CASE WHEN tr = 0 OR tl = 0 THEN NULL
                ELSE abs(n_ref * 1000000 DIV tr - n_live * 1000000 DIV tl)
                END""").as("dev_ppm"))
  }

  /** The (tmid, mn, mx) single-row reference frame the streaming drift
    * monitor broadcasts — identical to the batch audit's derivation.
    */
  def driftRefStats(events: DataFrame): DataFrame = {
    val e = events.select(unix_micros(col("ts")).as("t"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val mid = e.agg(expr("(min(t) + max(t)) DIV 2").as("tmid"))
    e.crossJoin(broadcast(mid)).filter(col("t") <= col("tmid"))
      .groupBy(col("tmid"))
      .agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
  }

  /** SLO error budget (1% = 10000 ppm). */
  val ErrorBudgetPpm = 10000L

  /** Error-budget burn-rate audit — the SRE dashboard over the event
    * stream's dead-letter class: per day the error share, the running
    * cumulative burn since day one, and the over-budget flag against
    * [[ErrorBudgetPpm]]. The cumulative sums run as a theta-join of the
    * per-DAY frame against itself (|days|² rows — calendar-bounded, the
    * rfm-cuts prefix pattern), never a window over events; the event
    * scan contributes one map-side-combined aggregate.
    */
  def errorBudget(events: DataFrame): DataFrame = {
    val d = events.select(expr("unix_micros(ts) DIV 86400000000").as("day"),
        (col("event_type") === "error").cast("long").as("err"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"), sum(col("err")).as("n_err"))
    d.as("a").join(d.as("b"), col("b.day") <= col("a.day"))
      .groupBy(col("a.day").as("day"))
      .agg(max(col("a.n")).as("n"), max(col("a.n_err")).as("n_err"),
        sum(col("b.n")).as("cum_n"), sum(col("b.n_err")).as("cum_err"))
      .select(col("day"), col("n"), col("n_err"),
        expr("n_err * 1000000 DIV n").as("day_err_ppm"),
        col("cum_n"), col("cum_err"),
        expr("cum_err * 1000000 DIV cum_n").as("burn_ppm"),
        expr(s"CAST(CASE WHEN cum_err * 1000000 DIV cum_n > $ErrorBudgetPpm THEN 1 ELSE 0 END AS INT)")
          .as("over_budget"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_error_budget" -> ((s, dir) => errorBudget(Tables.events(s, dir))),
    "q_drift_audit" -> ((s, dir) => driftAudit(Tables.events(s, dir))),
    "q_fk_integrity" -> ((s, dir) => fkIntegrity(s, dir)),
    "q_anomaly_zscore" -> ((s, dir) => anomalyZscore(Tables.events(s, dir))),
    "q_anomaly_mad" -> ((s, dir) => anomalyMad(Tables.events(s, dir))),
    "q_skyline" -> ((s, dir) => skyline(Tables.part(s, dir)))
  )

  def oracleSql: Map[String, String] = Map(
    "q_error_budget" ->
      s"""WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
         |   count(*) AS n,
         |   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
         |     AS BIGINT) AS n_err
         |  FROM events GROUP BY 1),
         | c AS (SELECT a.day, max(a.n) AS n, max(a.n_err) AS n_err,
         |   CAST(sum(b.n) AS BIGINT) AS cum_n,
         |   CAST(sum(b.n_err) AS BIGINT) AS cum_err
         |  FROM d a JOIN d b ON b.day <= a.day GROUP BY 1)
         |SELECT day, n, n_err,
         | n_err * 1000000 // n AS day_err_ppm,
         | cum_n, cum_err,
         | cum_err * 1000000 // cum_n AS burn_ppm,
         | CAST(CASE WHEN cum_err * 1000000 // cum_n > $ErrorBudgetPpm
         |   THEN 1 ELSE 0 END AS INT) AS over_budget
         |FROM c""".stripMargin,

    "q_drift_audit" ->
      """WITH e AS (SELECT epoch_us(ts) AS t,
        |   CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        | mid AS (SELECT (min(t) + max(t)) // 2 AS tmid FROM e),
        | tg AS (SELECT (t <= tmid) AS is_ref, cents FROM e, mid),
        | st AS (SELECT min(cents) AS mn, max(cents) AS mx
        |  FROM tg WHERE is_ref),
        | b AS (SELECT
        |   least(greatest(((cents - mn) * 10) // (mx - mn + 1), 0), 9)
        |     AS bucket,
        |   CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |   CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_live
        |  FROM tg, st GROUP BY 1),
        | tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
        |   CAST(sum(n_live) AS BIGINT) AS tl FROM b)
        |SELECT bucket, n_ref, n_live,
        | CASE WHEN tr = 0 THEN NULL ELSE n_ref * 1000000 // tr END AS ref_ppm,
        | CASE WHEN tl = 0 THEN NULL ELSE n_live * 1000000 // tl END AS live_ppm,
        | CASE WHEN tr = 0 OR tl = 0 THEN NULL
        |  ELSE abs(n_ref * 1000000 // tr - n_live * 1000000 // tl)
        | END AS dev_ppm
        |FROM b, tot""".stripMargin,
    "q_fk_integrity" ->
      """SELECT 'lineitem.partkey->part' AS edge, count(*) AS fact_rows,
        | count(*) FILTER (WHERE p_partkey IS NULL) AS orphan_rows,
        | count(DISTINCT l_partkey) FILTER (WHERE p_partkey IS NULL) AS orphan_keys
        |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        |UNION ALL
        |SELECT 'lineitem.suppkey->supplier', count(*),
        | count(*) FILTER (WHERE s_suppkey IS NULL),
        | count(DISTINCT l_suppkey) FILTER (WHERE s_suppkey IS NULL)
        |FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
        |UNION ALL
        |SELECT 'lineitem.orderkey->orders', count(*),
        | count(*) FILTER (WHERE o_orderkey IS NULL),
        | count(DISTINCT l_orderkey) FILTER (WHERE o_orderkey IS NULL)
        |FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        |UNION ALL
        |SELECT 'orders.custkey->customer', count(*),
        | count(*) FILTER (WHERE c_custkey IS NULL),
        | count(DISTINCT o_custkey) FILTER (WHERE c_custkey IS NULL)
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |UNION ALL
        |SELECT 'customer.nationkey->nation', count(*),
        | count(*) FILTER (WHERE n_nationkey IS NULL),
        | count(DISTINCT c_nationkey) FILTER (WHERE n_nationkey IS NULL)
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        |UNION ALL
        |SELECT 'supplier.nationkey->nation', count(*),
        | count(*) FILTER (WHERE n_nationkey IS NULL),
        | count(DISTINCT s_nationkey) FILTER (WHERE n_nationkey IS NULL)
        |FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
        |UNION ALL
        |SELECT 'nation.regionkey->region', count(*),
        | count(*) FILTER (WHERE r_regionkey IS NULL),
        | count(DISTINCT n_regionkey) FILTER (WHERE r_regionkey IS NULL)
        |FROM nation LEFT JOIN region ON n_regionkey = r_regionkey""".stripMargin,

    "q_anomaly_zscore" ->
      """WITH e AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |st AS (SELECT user_id, count(*) AS n, sum(c) AS s, sum(c*c) AS ssq
        |       FROM e GROUP BY 1)
        |SELECT user_id, max(n) AS n_events,
  | CAST(sum(CASE WHEN n >= 2
        |   AND CAST(n AS HUGEINT)*ssq - CAST(s AS HUGEINT)*s > 0
        |   AND CAST(n*c - s AS HUGEINT) * CAST(n*c - s AS HUGEINT) * (n - 1)
        |     > 9 * (CAST(n AS HUGEINT)*ssq - CAST(s AS HUGEINT)*s) * n
        |  THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM e JOIN st USING (user_id) GROUP BY 1""".stripMargin,

    "q_anomaly_mad" ->
      """WITH e AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |r AS (SELECT user_id, c,
        |       row_number() OVER (PARTITION BY user_id ORDER BY c) AS rn,
        |       count(*) OVER (PARTITION BY user_id) AS n FROM e),
        |m AS (SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
        |       CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN c ELSE 0 END) +
        |            sum(CASE WHEN rn = (n + 2) // 2 THEN c ELSE 0 END) AS BIGINT) AS med2
        |      FROM r GROUP BY 1),
        |d AS (SELECT e.user_id, abs(c * 2 - med2) AS dev, n_events, med2
        |      FROM e JOIN m ON e.user_id = m.user_id),
        |r2 AS (SELECT user_id, dev, n_events, med2,
        |        row_number() OVER (PARTITION BY user_id ORDER BY dev) AS rn FROM d),
        |m2 AS (SELECT user_id,
        |        CAST(sum(CASE WHEN rn = (n_events + 1) // 2 THEN dev ELSE 0 END) +
        |             sum(CASE WHEN rn = (n_events + 2) // 2 THEN dev ELSE 0 END) AS BIGINT) AS mad2
        |       FROM r2 GROUP BY 1)
        |SELECT d.user_id, CAST(max(n_events) AS BIGINT) AS n_events,
        | CAST(max(med2) AS BIGINT) AS med2, CAST(max(mad2) AS BIGINT) AS mad2,
        | CAST(sum(CASE WHEN dev * 2 > mad2 * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM d JOIN m2 ON d.user_id = m2.user_id
        |GROUP BY 1""".stripMargin,

    "q_skyline" ->
      """WITH g AS (SELECT p_retailprice AS price, min(p_size) AS min_sz
        |           FROM part GROUP BY 1),
        |pm AS (SELECT price, min_sz, min(min_sz) OVER (ORDER BY price
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_min
        |       FROM g)
        |SELECT p_partkey, p_retailprice, p_size
        |FROM part JOIN pm ON p_retailprice = price
        |WHERE p_size = min_sz AND (prev_min IS NULL OR p_size < prev_min)""".stripMargin
  )
}
