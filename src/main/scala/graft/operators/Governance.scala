package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-governance operators: keyed purge (right-to-be-forgotten) with a
  * completeness audit.
  *
  * The purge itself is the scalable anti-join shape: deletion requests
  * are small by nature, so the tombstone keys BROADCAST and every
  * affected table drops its rows in one narrow pass — no shuffle of the
  * 100 TB fact side (on a lakehouse table format the same anti-join
  * drives a MERGE DELETE with file pruning). What actually needs to be
  * oracle-checked is the AUDIT a compliance pipeline runs afterwards:
  * tombstone count, survivor counts, and — the referential part — that
  * no surviving fact row references a purged dimension key.
  */
object Governance {

  /** Deterministic deletion-request slice. */
  val TombMod = 97
  val TombRem = 13

  def purgeAudit(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val tomb = cust.filter(col("c_custkey") % TombMod === TombRem)
      .select(col("c_custkey").as("k"))
    val keptC = cust.join(broadcast(tomb), col("c_custkey") === col("k"), "left_anti")
    val keptO = orders.join(broadcast(tomb), col("o_custkey") === col("k"), "left_anti")
    val orphans = keptO.join(keptC.select(col("c_custkey")),
      col("o_custkey") === col("c_custkey"), "left_anti")
    tomb.agg(count(lit(1)).as("n_tombstones"))
      .crossJoin(keptC.agg(count(lit(1)).as("n_customers_left")))
      .crossJoin(keptO.agg(count(lit(1)).as("n_orders_left")))
      .crossJoin(orphans.agg(count(lit(1)).as("n_orphan_orders")))
  }

  private val NumCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
  private val StrCols = Seq("o_orderstatus", "o_orderpriority")

  /** Table profiling — the ANALYZE step a pipeline runs before anything
    * else touches a new drop: per-column null count, exact distinct
    * count, and min/max (numeric as double; lexicographic for strings —
    * kept in separate typed columns so no float-to-string formatting,
    * which differs across engines, ever enters the compare).
    *
    * Shape: one UNION branch per column, each a pruned single-column
    * scan with exactly ONE distinct aggregate — Spark plans a single
    * distinct without the Expand rewrite, so no branch ever multiplies
    * its rows (the earlier all-columns-in-one-agg form paid Expand x
    * (n_distinct_aggs + 1) on every row plus a much larger codegen
    * unit; this plan cut task CPU ~40% — the rest is per-branch plan
    * compilation). Branches run as parallel
    * subtrees of one job. At 100 TB the exact count(DISTINCT) column
    * swaps for approx_count_distinct — same shape, mergeable sketches.
    */
  def profileOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.balanced(spark, Tables.orders(spark, dir), Seq("o_orderkey"))
    def branch(c: String, isNum: Boolean): DataFrame = {
      val minMax =
        if (isNum) Seq(min(col(c)).cast("double").as("min_num"),
          max(col(c)).cast("double").as("max_num"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str"))
        else Seq(lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          min(col(c)).as("min_str"), max(col(c)).as("max_str"))
      val aggs = Seq(count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        countDistinct(col(c)).as("n_distinct")) ++ minMax
      orders.select(col(c))
        .agg(aggs.head, aggs.tail: _*)
        .select(lit(c).as("column_name"), col("n_rows"),
          (col("n_rows") - col("n_nonnull")).as("n_null"), col("n_distinct"),
          col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    }
    (NumCols.map(branch(_, isNum = true)) ++ StrCols.map(branch(_, isNum = false)))
      .reduce(_ unionAll _)
  }

  /** Histogram bucket count for q_histogram (equi-width over the
    * value domain; integer cent arithmetic keeps the bucket function
    * portable — no float division near bucket edges).
    */
  val HistBuckets = 20

  /** Equi-width histogram of order value — the profiling companion to
    * q_profile's min/max: bucket index from integer cents so both
    * engines bin identically even at bucket boundaries (float width
    * division could round a boundary value differently). One narrow
    * pass + one shuffle on [[HistBuckets]] keys; empty buckets are
    * absent rather than zero-filled (a 100 TB histogram join fills them
    * from a generated frame if needed).
    */
  def histogramOrders(spark: SparkSession, dir: String): DataFrame = {
    val cents = "CAST(round(o_totalprice * 100.0) AS BIGINT)"
    Tables.orders(spark, dir)
      .select(expr(cents).as("v"))
      .crossJoin(broadcast(
        Tables.orders(spark, dir).agg(
          expr(s"min($cents)").as("lo"), expr(s"max($cents)").as("hi"))))
      // width rounds UP so bucket index never reaches HistBuckets;
      // integer DIV — Spark's `/` on longs is fractional
      .withColumn("w", expr(s"(hi - lo + $HistBuckets) DIV $HistBuckets"))
      .withColumn("bucket", expr("CAST((v - lo) DIV w AS INT)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("v")).as("min_cents"), max(col("v")).as("max_cents"))
  }

  /** Snapshot reconciliation — the diff a pipeline publishes when a new
    * table version lands: keys added, removed, changed, unchanged. One
    * full outer join on the key, CASE classification, count per status.
    * The revised snapshot here is derived deterministically from the
    * base (updates %10==3, inserts %17==5 re-keyed high, deletes
    * %13==11), so both engines reconstruct the identical pair of
    * versions and the diff is exact.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey").as("k"), col("c_acctbal").as("v"))
    val revised = base
      .filter(col("k") % 13 =!= 11) // deletes
      .withColumn("v", when(col("k") % 10 === 3, col("v") + 1000.0)
        .otherwise(col("v"))) // updates
      .unionByName(base.filter(col("k") % 17 === 5)
        .select((col("k") + 10000000000L).as("k"), lit(0.0).as("v"))) // inserts
    base.as("b").join(revised.as("r"), col("b.k") === col("r.k"), "full_outer")
      .select(
        when(col("b.k").isNull, "added")
          .when(col("r.k").isNull, "removed")
          .when(col("b.v") =!= col("r.v"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
  }

  /** Incremental aggregate-view maintenance: a CDC delta (updates to
    * keys %7==0: +10.00 on the total) maintains a per-priority revenue
    * view by RETRACTION ARITHMETIC — old contribution out, new one in —
    * so only the delta rows aggregate and shuffle; the 100-TB base is
    * never rescanned (at scale the base aggregate is the stored view).
    * The query emits both the incrementally-maintained view and the
    * full recompute over the revised table plus a consistency flag, all
    * in integer cents (exact, order-insensitive). Plan shape: base agg
    * (the "stored view" here), delta agg over the filtered change set,
    * union + re-aggregate on the same grouping key.
    */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("pri"), col("o_orderkey").as("k"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val baseAgg = orders.groupBy("pri")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("rev"))
    // CDC delta: retract old value, insert updated value (+1000 cents)
    val delta = orders.filter(col("k") % 7 === 0)
      .select(col("pri"), lit(0L).as("n"), lit(1000L).as("rev"))
    val incr = baseAgg.select(col("pri"), col("n"), col("rev"))
      .unionByName(delta)
      .groupBy("pri").agg(sum(col("n")).as("n"), sum(col("rev")).as("rev_incr"))
    val full = orders
      .withColumn("cents",
        when(col("k") % 7 === 0, col("cents") + 1000L).otherwise(col("cents")))
      .groupBy("pri").agg(sum(col("cents")).as("rev_full"))
    incr.join(full, "pri")
      .select(col("pri"), col("n"), col("rev_incr"), col("rev_full"),
        (col("rev_incr") === col("rev_full")).cast("int").as("consistent"))
  }

  /** Winsorized revenue per priority — the robust-statistics step a
    * profiling pipeline applies before means: clamp each order's value
    * to the group's exact [p5, p95] ORDER STATISTICS (rank
    * ceil(0.05n)/ceil(0.95n) — integer ranks, integer cents, no
    * interpolated percentile whose ulp differs across engines), then
    * aggregate the clipped values. One shuffle on the group key; the
    * per-group rank window and the clamp/sum reuse it. At 100 TB the
    * exact rank swaps for approx_percentile thresholds — same clamp
    * pass, sketch-derived cut points.
    */
  def winsorized(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir).select(col("o_orderpriority").as("pri"),
      col("o_orderkey").as("k"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val w = Window.partitionBy(col("pri")).orderBy(col("cents").asc, col("k").asc)
    val ranked = o.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("pri"))))
    val cuts = ranked.groupBy("pri").agg(
      max(when(col("rn") === expr("(5 * n + 99) DIV 100"), col("cents"))).as("lo"),
      max(when(col("rn") === expr("(95 * n + 99) DIV 100"), col("cents"))).as("hi"))
    o.join(broadcast(cuts), "pri")
      .select(col("pri"), col("lo"), col("hi"),
        greatest(col("lo"), least(col("hi"), col("cents"))).as("clipped"),
        (col("cents") < col("lo")).cast("long").as("is_lo"),
        (col("cents") > col("hi")).cast("long").as("is_hi"))
      .groupBy("pri")
      .agg(count(lit(1)).as("n"), max(col("lo")).as("lo_cents"),
        max(col("hi")).as("hi_cents"), sum(col("is_lo")).as("n_lo_clipped"),
        sum(col("is_hi")).as("n_hi_clipped"), sum(col("clipped")).as("sum_clipped"))
  }

  /** Equi-DEPTH histogram of order value (the q_histogram equi-width
    * companion): deciles under a deterministic (cents, key) total order —
    * every bucket holds n/10 +-1 rows and the bucket edges are
    * data-adaptive. Integer cents end-to-end.
    *
    * Built WITHOUT a global ntile window (the round-7 named scale-killer:
    * `ntile(10).over(Window.orderBy(...))` sorts the whole frame through
    * one partition): [[SampleOps.withValueRanks]] computes each row's
    * EXACT global rank with only bucket-partitioned windows, and since
    * the (v, k) order is strict (k is a key), ntile is pure rank
    * arithmetic — the first n%10 tiles hold n/10+1 rows, the rest n/10 —
    * so the oracle keeps the ntile form bit-for-bit. The plan's only
    * single-partition exchange is the helper's three-number stats
    * aggregate (pinned in SequencePlanSpec).
    */
  def histogramEquiDepth(spark: SparkSession, dir: String): DataFrame =
    SampleOps.withValueRanks(
        Tables.orders(spark, dir)
          .select(col("o_orderkey").as("k"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v")),
        "v", "k")
      .withColumn("decile", expr(SampleOps.tileExpr(10)))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), min(col("v")).as("min_cents"),
        max(col("v")).as("max_cents"))

  /** One-pass declarative data-quality check suite — the pre-publish
    * gate (great_expectations / dbt-test shape) a warehouse runs before
    * promoting a load: uniqueness, not-null, value-range, date-range
    * checks evaluate in ONE stacked multi-aggregate scan of orders (the
    * q_profile plan shape), and the referential check is one broadcast
    * anti-join against the customer dim (the q_fk_integrity shape —
    * the fact side never shuffles). Output: one row per check with its
    * violation count and pass flag; the suite never fails the query,
    * it reports (the U4/dead-letter philosophy applied to batch loads).
    */
  def dqChecks(orders: DataFrame, customer: DataFrame): DataFrame = {
    val base = orders.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("o_orderkey")).as("k_distinct"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("cust_null"),
      sum(when(expr("CAST(round(o_totalprice * 100) AS BIGINT)") <= 0, 1L)
        .otherwise(0L)).as("price_nonpos"),
      sum(when(expr("CAST(o_orderdate AS DATE) < DATE '1992-01-01' OR " +
        "CAST(o_orderdate AS DATE) > DATE '1998-12-31'"), 1L)
        .otherwise(0L)).as("date_oor"))
    val stacked = base.selectExpr(
      """stack(4,
        | 'orderkey_unique', n_rows - k_distinct,
        | 'custkey_not_null', cust_null,
        | 'totalprice_positive', price_nonpos,
        | 'orderdate_in_range', date_oor) AS (check_name, n_violations)""".stripMargin)
    val fk = orders.join(broadcast(customer.select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("custkey_fk").as("check_name"), col("n_violations"))
    stacked.unionByName(fk)
      .withColumn("passed", (col("n_violations") === 0L).cast("int"))
  }

  /** k-anonymity threshold for the quasi-identifier audit. */
  val KAnonK = 10L

  /** K-ANONYMITY audit over the customer dimension — the re-identification
    * screen a governance pass runs before any dataset leaves the
    * boundary: group by the quasi-identifier tuple (nationkey,
    * mktsegment — the columns an adversary can observe externally) and
    * measure how many rows sit in groups smaller than k ([[KAnonK]]),
    * i.e. rows an attacker could single out. One-row release gate: group
    * counts, the minimum group size, rows at risk, and the at-risk share
    * in ppm. One hash aggregate on the QI key + one 1-row rollup —
    * nothing grows beyond |distinct QI tuples|.
    */
  def kAnonymity(customer: DataFrame): DataFrame =
    kAnonymityFromGroups(
      customer.groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("gn")))

  /** The release-gate rollup over pre-aggregated QI group counts (`gn`
    * rows) — shared by the batch query and the streaming twin (whose
    * group counts accumulate in complete mode and re-derive the gate on
    * readback through THIS arithmetic, so one oracle scores both).
    */
  def kAnonymityFromGroups(groups: DataFrame): DataFrame =
    groups
      .agg(count(lit(1)).as("n_groups"),
        min(col("gn")).as("min_group_size"),
        sum(when(col("gn") < KAnonK, 1L).otherwise(0L)).as("n_small_groups"),
        sum(when(col("gn") < KAnonK, col("gn")).otherwise(0L)).as("n_rows_at_risk"),
        sum(col("gn")).as("n_rows"))
      .select(col("n_groups"), col("min_group_size"), col("n_small_groups"),
        col("n_rows_at_risk"),
        expr("n_rows_at_risk * 1000000 DIV n_rows").as("at_risk_ppm"),
        (col("min_group_size") >= KAnonK).cast("int").as("k_anonymous"))

  val LDivL = 3

  /** l-diversity release gate — k-anonymity's necessary complement: a
    * group can be k-large yet leak its sensitive attribute completely if
    * every member shares one value (the homogeneity attack). Sensitive
    * attribute = order priority, quasi-identifiers = the customer's
    * (nation, segment); a group is weak when it exposes fewer than
    * [[LDivL]] distinct priorities. Fact joins the customer dim
    * broadcast (dim ≪ fact at any scale), then ONE hash aggregate on the
    * QI key carrying count + countDistinct(sensitive) — distinct state
    * is bounded by the 5-value priority domain per group — and a 1-row
    * rollup. Nothing grows beyond |distinct QI tuples|.
    */
  def lDiversity(orders: DataFrame, customer: DataFrame): DataFrame =
    lDiversityFromSensCells(orders
      .select(col("o_custkey"), col("o_orderpriority").as("sens"))
      .join(broadcast(customer.select(
          col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("sens"))
      .agg(count(lit(1)).as("gn")))

  /** The gate rollup over (QI, sensitive) cell counts — shared by the
    * batch query and the streaming twin (streaming aggregation can't
    * countDistinct, but it CAN count (QI, sens) cells exactly; folding
    * the cells gives l = cells-per-group and gn = Σ cell counts with
    * identical integers, so one oracle scores both).
    */
  def lDiversityFromSensCells(cells: DataFrame): DataFrame = {
    val groups = cells
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(sum(col("gn")).as("gn"), count(lit(1)).as("l"))
    groups
      .agg(count(lit(1)).as("n_groups"),
        min(col("l")).as("min_l"),
        sum(when(col("l") < LDivL, 1L).otherwise(0L)).as("n_weak_groups"),
        sum(when(col("l") < LDivL, col("gn")).otherwise(0L)).as("n_rows_at_risk"),
        sum(col("gn")).as("n_rows"))
      .select(col("n_groups"), col("min_l"), col("n_weak_groups"),
        col("n_rows_at_risk"),
        expr("n_rows_at_risk * 1000000 DIV n_rows").as("at_risk_ppm"),
        (col("min_l") >= LDivL).cast("int").as("l_diverse"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_k_anonymity" -> ((s, dir) => kAnonymity(Tables.customer(s, dir))),
    "q_l_diversity" -> ((s, dir) =>
      lDiversity(Tables.orders(s, dir), Tables.customer(s, dir))),
    "q_dq_checks" -> ((s, dir) =>
      dqChecks(Tables.orders(s, dir), Tables.customer(s, dir))),
    "q_winsorize" -> ((s, dir) => winsorized(s, dir)),
    "q_histogram_eqdepth" -> ((s, dir) => histogramEquiDepth(s, dir)),
    "q_incr_agg" -> ((s, dir) => incrementalAgg(s, dir)),
    "q_purge_audit" -> ((s, dir) => purgeAudit(s, dir)),
    "q_profile" -> ((s, dir) => profileOrders(s, dir)),
    "q_snapshot_diff" -> ((s, dir) => snapshotDiff(s, dir)),
    "q_histogram" -> ((s, dir) => histogramOrders(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "q_k_anonymity" ->
      s"""WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS gn
         |  FROM customer GROUP BY 1, 2),
         | t AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
         |   CAST(min(gn) AS BIGINT) AS min_group_size,
         |   CAST(sum(CASE WHEN gn < $KAnonK THEN 1 ELSE 0 END) AS BIGINT)
         |     AS n_small_groups,
         |   CAST(sum(CASE WHEN gn < $KAnonK THEN gn ELSE 0 END) AS BIGINT)
         |     AS n_rows_at_risk,
         |   CAST(sum(gn) AS BIGINT) AS n_rows
         |  FROM g)
         |SELECT n_groups, min_group_size, n_small_groups, n_rows_at_risk,
         | CAST(n_rows_at_risk * 1000000 // n_rows AS BIGINT) AS at_risk_ppm,
         | CAST(CASE WHEN min_group_size >= $KAnonK THEN 1 ELSE 0 END AS INT)
         |   AS k_anonymous
         |FROM t""".stripMargin,
    "q_l_diversity" ->
      s"""WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS gn,
         |   count(DISTINCT o_orderpriority) AS l
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         | t AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
         |   CAST(min(l) AS BIGINT) AS min_l,
         |   CAST(sum(CASE WHEN l < $LDivL THEN 1 ELSE 0 END) AS BIGINT)
         |     AS n_weak_groups,
         |   CAST(sum(CASE WHEN l < $LDivL THEN gn ELSE 0 END) AS BIGINT)
         |     AS n_rows_at_risk,
         |   CAST(sum(gn) AS BIGINT) AS n_rows
         |  FROM g)
         |SELECT n_groups, min_l, n_weak_groups, n_rows_at_risk,
         | CAST(n_rows_at_risk * 1000000 // n_rows AS BIGINT) AS at_risk_ppm,
         | CAST(CASE WHEN min_l >= $LDivL THEN 1 ELSE 0 END AS INT)
         |   AS l_diverse
         |FROM t""".stripMargin,
    "q_dq_checks" ->
      """WITH base AS (SELECT count(*) AS n_rows,
        |   count(DISTINCT o_orderkey) AS k_distinct,
        |   sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS cust_null,
        |   sum(CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) <= 0
        |     THEN 1 ELSE 0 END) AS price_nonpos,
        |   sum(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1992-01-01'
        |     OR CAST(o_orderdate AS DATE) > DATE '1998-12-31'
        |     THEN 1 ELSE 0 END) AS date_oor
        |  FROM orders),
        | rows_ AS (
        |  SELECT 'orderkey_unique' AS check_name,
        |    CAST(n_rows - k_distinct AS BIGINT) AS n_violations FROM base
        |  UNION ALL SELECT 'custkey_not_null', CAST(cust_null AS BIGINT) FROM base
        |  UNION ALL SELECT 'totalprice_positive', CAST(price_nonpos AS BIGINT) FROM base
        |  UNION ALL SELECT 'orderdate_in_range', CAST(date_oor AS BIGINT) FROM base
        |  UNION ALL SELECT 'custkey_fk', CAST(count(*) AS BIGINT) FROM orders
        |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        |SELECT check_name, n_violations,
        | CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INT) AS passed
        |FROM rows_""".stripMargin,
    "q_winsorize" ->
      """WITH o AS (SELECT o_orderpriority AS pri, o_orderkey AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |r AS (SELECT pri, cents,
        |    row_number() OVER (PARTITION BY pri ORDER BY cents, k) AS rn,
        |    count(*) OVER (PARTITION BY pri) AS n FROM o),
        |cuts AS (SELECT pri,
        |    max(CASE WHEN rn = (5 * n + 99) // 100 THEN cents END) AS lo,
        |    max(CASE WHEN rn = (95 * n + 99) // 100 THEN cents END) AS hi
        |   FROM r GROUP BY 1)
        |SELECT pri, count(*) AS n, max(lo) AS lo_cents, max(hi) AS hi_cents,
        | CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo_clipped,
        | CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi_clipped,
        | CAST(sum(greatest(lo, least(hi, cents))) AS BIGINT) AS sum_clipped
        |FROM o JOIN cuts USING (pri) GROUP BY 1""".stripMargin,

    "q_histogram_eqdepth" ->
      """SELECT decile, count(*) AS n, min(v) AS min_cents, max(v) AS max_cents
        |FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |   ntile(10) OVER (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
        |     o_orderkey) AS decile
        |  FROM orders) t
        |GROUP BY 1""".stripMargin,

    // the oracle runs BOTH maintenance paths (retraction vs recompute)
    // relationally; the consistent flag is provably 1
    "q_incr_agg" ->
      """WITH o AS (SELECT o_orderpriority AS pri, o_orderkey AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        | base AS (SELECT pri, count(*) AS n, sum(cents) AS rev FROM o GROUP BY 1),
        | delta AS (SELECT pri, CAST(0 AS BIGINT) AS n, CAST(1000 AS BIGINT) AS rev
        |   FROM o WHERE k % 7 = 0),
        | incr AS (SELECT pri, CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(rev) AS BIGINT) AS rev_incr FROM (
        |    SELECT * FROM base UNION ALL SELECT * FROM delta) u GROUP BY 1),
        | fl AS (SELECT pri, CAST(sum(CASE WHEN k % 7 = 0 THEN cents + 1000
        |    ELSE cents END) AS BIGINT) AS rev_full FROM o GROUP BY 1)
        |SELECT pri, n, rev_incr, rev_full,
        | CAST(rev_incr = rev_full AS INT) AS consistent
        |FROM incr JOIN fl USING (pri)""".stripMargin,

    // per-column scans here too, but over the raw table with DuckDB's
    // own distinct path — still an independent plan
    "q_profile" -> {
      val num = NumCols.map(c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
           | count(*) - count($c) AS n_null,
           | count(DISTINCT $c) AS n_distinct,
           | CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
           | CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
           |FROM orders""".stripMargin)
      val str = StrCols.map(c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
           | count(*) - count($c) AS n_null,
           | count(DISTINCT $c) AS n_distinct,
           | CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           | min($c) AS min_str, max($c) AS max_str
           |FROM orders""".stripMargin)
      (num ++ str).mkString("\nUNION ALL\n")
    },

    "q_histogram" ->
      s"""WITH v AS (SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) AS v
         |   FROM orders),
         | b AS (SELECT min(v) AS lo,
         |   (max(v) - min(v) + $HistBuckets) // $HistBuckets AS w FROM v)
         |SELECT CAST((v - lo) // w AS INT) AS bucket, count(*) AS n,
         | min(v) AS min_cents, max(v) AS max_cents
         |FROM v, b GROUP BY 1""".stripMargin,

    "q_snapshot_diff" ->
      """WITH base AS (SELECT c_custkey AS k, c_acctbal AS v FROM customer),
        | revised AS (
        |  SELECT k, CASE WHEN k % 10 = 3 THEN v + 1000.0 ELSE v END AS v
        |  FROM base WHERE k % 13 <> 11
        |  UNION ALL
        |  SELECT k + 10000000000 AS k, 0.0 AS v FROM base WHERE k % 17 = 5)
        |SELECT CASE WHEN b.k IS NULL THEN 'added'
        |  WHEN r.k IS NULL THEN 'removed'
        |  WHEN b.v <> r.v THEN 'changed'
        |  ELSE 'unchanged' END AS status, count(*) AS n
        |FROM base b FULL OUTER JOIN revised r ON b.k = r.k
        |GROUP BY 1""".stripMargin,

    "q_purge_audit" ->
      s"""WITH tomb AS (SELECT c_custkey FROM customer
         |   WHERE c_custkey % $TombMod = $TombRem),
         | kc AS (SELECT c_custkey FROM customer
         |   WHERE c_custkey NOT IN (SELECT c_custkey FROM tomb)),
         | ko AS (SELECT o_custkey FROM orders
         |   WHERE o_custkey NOT IN (SELECT c_custkey FROM tomb)),
         | orph AS (SELECT o_custkey FROM ko
         |   WHERE o_custkey NOT IN (SELECT c_custkey FROM kc))
         |SELECT (SELECT count(*) FROM tomb) AS n_tombstones,
         | (SELECT count(*) FROM kc) AS n_customers_left,
         | (SELECT count(*) FROM ko) AS n_orders_left,
         | (SELECT count(*) FROM orph) AS n_orphan_orders""".stripMargin
  )
}
