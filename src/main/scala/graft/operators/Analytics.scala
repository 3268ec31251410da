package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core warehouse query surface.
  *
  * Re-expresses the reference's analytical layer (the BigQuery star schema +
  * Power BI dashboard, reference README.md:79-98, SURVEY.md §2.3-§2.7) as
  * idiomatic Spark DataFrame operators over the shared test tables.
  *
  * Determinism discipline (so every query hash-matches its DuckDB oracle):
  *   - money/measure sums go through `DecimalType` (exact, order-independent),
  *     then back to double;
  *   - averages are computed as decimal-sum / count in double (single final
  *     IEEE division, identical in any engine);
  *   - no `rand()`: "random" ladders use a Knuth multiplicative hash of the
  *     row key (same arithmetic in the oracle SQL);
  *   - top-k always carries a unique tiebreaker column.
  *
  * Scale notes are inline per query: the shapes here are the ones that
  * survive 100 TB — partial aggregation before shuffle, broadcast for
  * small dimensions, pushed filters, and single-shuffle group-bys.
  */
object Analytics {

  /** Exact order-independent sum of a double measure: cast to decimal, sum,
    * cast back. Catalyst keeps this inside whole-stage codegen and it stays
    * a partial (map-side) + final aggregate — one shuffle of tiny partials.
    */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** time_dim projection over a `time_id` (second of day, 0..86399)
    * source — shared verbatim by the Spark plan and the DuckDB oracle.
    * period = AM/PM; period_of_day = Morning 05-11 / Afternoon 12-16 /
    * Evening 17-20 / Night otherwise.
    */
  private val timeDimCols: Seq[String] = Seq(
    "time_id",
    "CAST(floor(time_id / 3600) AS INT) AS hour",
    "CAST(floor((time_id % 3600) / 60) AS INT) AS minute",
    "CAST(time_id % 60 AS INT) AS second",
    "(CASE WHEN time_id < 43200 THEN 'AM' ELSE 'PM' END) AS period",
    "(CASE WHEN time_id >= 18000 AND time_id < 43200 THEN 'Morning' " +
      "WHEN time_id >= 43200 AND time_id < 61200 THEN 'Afternoon' " +
      "WHEN time_id >= 61200 AND time_id < 75600 THEN 'Evening' " +
      "ELSE 'Night' END) AS period_of_day",
    "(lpad(CAST(CAST(floor(time_id / 3600) AS INT) AS STRING), 2, '0') || ':' || " +
      "lpad(CAST(CAST(floor((time_id % 3600) / 60) AS INT) AS STRING), 2, '0') || ':' || " +
      "lpad(CAST(CAST(time_id % 60 AS INT) AS STRING), 2, '0')) AS time_str")

  /** TPC-H Q3/Q5 adapted to this schema, as ONE SQL text shared verbatim
    * by `spark.sql` and the DuckDB oracle — the `spark.sql(...)` entry
    * point (SURVEY §1.4) exercised by real multi-join benchmark queries
    * rather than the DataFrame DSL the rest of the registry uses.
    * Catalyst plans these exactly like their DSL twins (same join
    * reorder, same broadcasts — the declarative-plan point). Revenue is
    * per-row integer cents (round(extprice * (1-disc) * 100) — identical
    * IEEE arithmetic text in both engines) so the sums are exact.
    */
  private val tpchQ3Sql =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      | CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
      |   AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue_cents DESC, l_orderkey
      |LIMIT 10""".stripMargin

  private val tpchQ5Sql =
    """SELECT n_name,
      | CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
      |   AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  /** TPC-H Q1 pricing summary adapted to this schema's date span — the
    * single-table scan+aggregate workhorse: every money measure lands in
    * exact per-row integer cents before summing (order-insensitive), the
    * filter reaches the parquet scan as a pushed predicate, and the plan
    * is one partial+final hash aggregate on the 6-group key.
    */
  private val tpchQ1Sql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |   AS sum_base_cents,
      | CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
      |   AS BIGINT)) AS BIGINT) AS sum_disc_cents,
      | CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
      |   * (1.0 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6 forecast-revenue-change — the pure scan/filter/aggregate
    * microbenchmark: three pushed range predicates, one ungrouped sum in
    * exact per-row cents. The query every pushdown regression shows up
    * in first.
    */
  private val tpchQ6Sql =
    """SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100)
      |   AS BIGINT)) AS BIGINT) AS revenue_cents,
      | count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
      |  AND l_discount >= 0.02 AND l_discount <= 0.04
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q4 order-priority checking, adapted to this schema's columns
    * (the reference lineitem has no commit/receipt dates, so "late" is
    * shipped > 60 days after order): a correlated EXISTS that Catalyst
    * plans as a LEFT SEMI hash join — the SQL-surface proof of the J5
    * semi-join family.
    */
  private val tpchQ4Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '2000-04-01 00:00:00'
      |  AND EXISTS (
      |   SELECT * FROM lineitem
      |   WHERE l_orderkey = o_orderkey
      |     AND l_shipdate > o_orderdate + INTERVAL 60 DAYS)
      |GROUP BY o_orderpriority""".stripMargin

  /** TPC-H Q14 promotion-revenue share — conditional aggregation over
    * the part broadcast join, share in exact ppm of exact cents (the
    * spec's 100*promo/total with integer arithmetic).
    */
  private val tpchQ14Sql =
    """SELECT
      | CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
      |   THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
      |   ELSE 0 END) AS BIGINT) AS promo_cents,
      | CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
      |   AS BIGINT)) AS BIGINT) AS total_cents
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '2000-03-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '2000-04-01 00:00:00'""".stripMargin

  /** TPC-H Q18 large-volume customers — the aggregate-subquery stress:
    * the IN over a grouped HAVING plans as a semi join against the
    * re-aggregated lineitem (AQE reuses the exchange), then the
    * three-way join re-groups for the top-20. Quantity threshold scaled
    * to this generator's baskets.
    */
  private val tpchQ18Sql =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
      | CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
      | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(l_quantity) > 250)
      | AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY total_cents DESC, o_orderkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q10 returned-item reporting — the join-heavy top-N: fact
    * filtered on the quarter + return flag, customer/nation dims
    * broadcast, TakeOrderedAndProject for the top 20.
    */
  private val tpchQ10Sql =
    """SELECT c_custkey, c_name, n_name,
      | CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
      |   AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '2000-04-01 00:00:00'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue_cents DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q2 minimum-cost-supplier, adapted to this schema (no partsupp
    * table, so the part↔supplier relationship and the unit cost come from
    * lineitem: unit price = extendedprice/quantity in exact cents). The
    * plan shape under test is the CORRELATED MIN SUBQUERY — Catalyst
    * decorrelates `= (SELECT min(...) WHERE l2.l_partkey = p_partkey)`
    * into a per-part aggregate joined back on the key (never a
    * per-row re-execution); DISTINCT collapses repeat lineitems of the
    * winning (part, supplier) pair.
    */
  private val tpchQ2Sql =
    """SELECT DISTINCT p_partkey, p_name, s_name,
      | CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents,
      | CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT) AS unit_cents
      |FROM part, supplier, lineitem
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND p_size <= 3
      |  AND round(l_extendedprice / l_quantity * 100) = (
      |    SELECT min(round(l2.l_extendedprice / l2.l_quantity * 100))
      |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
      |ORDER BY acctbal_cents DESC, p_partkey, s_name
      |LIMIT 100""".stripMargin

  /** TPC-H Q13 customer order-count distribution — the GROUPED-ON-AGGREGATE
    * shape: a LEFT OUTER join whose non-matches must count as ZERO (an
    * inner join silently drops the 0-order bucket), re-aggregated on the
    * per-customer count. The join-side filter rides IN the join condition,
    * not a WHERE (a WHERE would turn the outer join inner). Filter adapted
    * to this schema's columns (priority instead of the spec's comment).
    */
  private val tpchQ13Sql =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '%URGENT%'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q17 small-quantity-order revenue — the CORRELATED SCALAR AVG
    * subquery: each brand lineitem compares against ITS part's average
    * quantity; Catalyst decorrelates to a broadcast per-part aggregate.
    * The avg is exact in IEEE (integer-valued quantities summed below
    * 2^53), so the filter boundary is deterministic across engines; the
    * spec's /7.0 final division is dropped to keep the output exact
    * integer cents (one shared SQL text, no DIV-syntax divergence).
    */
  private val tpchQ17Sql =
    """SELECT
      | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |   AS total_cents,
      | count(*) AS n_lines
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
      |  AND l_quantity < (
      |    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q21 suppliers-who-kept-orders-waiting — the DOUBLE-NESTED
    * EXISTS / NOT EXISTS stack: the only-late-supplier semantics need one
    * LEFT SEMI (another supplier exists on the order) AND one LEFT ANTI
    * (no OTHER supplier was late) against the same fact, both correlated
    * on l_orderkey with an extra non-equality conjunct. "Late" adapted as
    * in Q4 (shipped > 60 days after order; this lineitem has no
    * commit/receipt dates).
    */
  private val tpchQ21Sql =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAYS
      |  AND EXISTS (
      |    SELECT * FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT * FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAYS)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  /** TPC-H Q22 global-sales-opportunity — NOT EXISTS anti join over a
    * derived scalar threshold: customers above the positive-balance
    * average with no urgent orders (every customer here has SOME order,
    * so the spec's no-orders predicate is sharpened to a filtered anti
    * join; country code derived from nationkey — no phone column). The
    * average is EXACT-INTEGER algebra: `cents * count > sum` multiplies
    * the comparison out instead of dividing, so no engine's floating
    * average sits on the boundary.
    */
  private val tpchQ22Sql =
    """WITH cust AS (
      |  SELECT c_custkey, c_nationkey % 10 AS cntry,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5))
      |SELECT cntry, CAST(count(*) AS BIGINT) AS numcust,
      | CAST(sum(cents) AS BIGINT) AS totacctbal_cents
      |FROM cust
      |WHERE cents * (SELECT count(*) FROM cust WHERE cents > 0)
      |      > (SELECT CAST(sum(cents) AS BIGINT) FROM cust WHERE cents > 0)
      |  AND NOT EXISTS (
      |    SELECT * FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY cntry
      |ORDER BY cntry""".stripMargin

  /** TPC-H Q7 volume shipping — the two-nation bidirectional join: the OR
    * of both (supp, cust) nation orientations rides the join condition
    * over two aliases of the SAME nation dim (both broadcast), revenue
    * grouped by the flow direction and ship year.
    */
  private val tpchQ7Sql =
    """SELECT supp_nation, cust_nation, yr,
      | CAST(sum(vol) AS BIGINT) AS revenue_cents
      |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |   CAST(year(l_shipdate) AS BIGINT) AS yr,
      |   CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS vol
      |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      |   AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      |   AND c_nationkey = n2.n_nationkey
      |   AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |   AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |   AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00') shipping
      |GROUP BY supp_nation, cust_nation, yr
      |ORDER BY supp_nation, cust_nation, yr""".stripMargin

  /** TPC-H Q8 national market share — conditional share-of-total per
    * year in exact ppm over the 7-table star (two nation aliases: the
    * customer side filters the region, the supplier side tags the
    * numerator nation).
    */
  private val tpchQ8Sql =
    """SELECT yr,
      | CAST(sum(CASE WHEN nat = 'NATION_3' THEN vol ELSE 0 END) AS BIGINT)
      |   AS nation_cents,
      | CAST(sum(vol) AS BIGINT) AS total_cents
      |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      |   CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS vol,
      |   n2.n_name AS nat
      |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |   AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      |   AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      |   AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
      |   AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |   AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |   AND p_type = 'PROMO') all_nations
      |GROUP BY yr ORDER BY yr""".stripMargin

  /** TPC-H Q9 product-type profit, adapted to this schema (no partsupp,
    * so cost = p_retailprice × quantity — the same join shape, profit
    * possibly negative): nation × order-year profit over the
    * name-filtered part join, all in exact integer cents.
    */
  private val tpchQ9Sql =
    """SELECT nat, yr, CAST(sum(amount) AS BIGINT) AS profit_cents
      |FROM (SELECT n_name AS nat, CAST(year(o_orderdate) AS BIGINT) AS yr,
      |   CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
      |     - CAST(round(p_retailprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)
      |     AS amount
      |  FROM part, supplier, lineitem, orders, nation
      |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      |   AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |   AND p_name LIKE '%widget%') profit
      |GROUP BY nat, yr ORDER BY nat, yr DESC""".stripMargin

  /** TPC-H Q11 important stock, adapted (no partsupp: a part's held
    * value = its lineitem revenue) — the HAVING-vs-GLOBAL-SCALAR shape:
    * the grouped aggregate compares against an ungrouped aggregate of
    * the same table (multiplied out to exact integers, fraction 1/1600
    * sized to this generator's 2k-part catalog).
    */
  private val tpchQ11Sql =
    """SELECT l_partkey AS p_key,
      | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |   AS value_cents
      |FROM lineitem GROUP BY l_partkey
      |HAVING sum(CAST(round(l_extendedprice * 100) AS BIGINT)) * 1600 >
      | (SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)) FROM lineitem)
      |ORDER BY value_cents DESC, p_key""".stripMargin

  /** TPC-H Q12 shipping-mode priority, adapted (linestatus stands in for
    * the absent shipmode; "late" as in Q4): the conditional-count
    * pivot-by-CASE over a date-windowed join.
    */
  private val tpchQ12Sql =
    """SELECT l_linestatus,
      | CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
      |     OR o_orderpriority = '2-HIGH'
      |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      | CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
      |     AND o_orderpriority <> '2-HIGH'
      |   THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey
      | AND l_shipdate > o_orderdate + INTERVAL 60 DAYS
      | AND l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
      | AND l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** TPC-H Q15 top supplier — the aggregate-then-scalar-max shape: the
    * revenue CTE is consumed twice (once joined, once re-aggregated for
    * the max), which AQE serves from one reused exchange.
    */
  private val tpchQ15Sql =
    """WITH revenue0 AS (
      | SELECT l_suppkey AS supplier_no,
      |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
      |    AS BIGINT)) AS BIGINT) AS total_rev
      | FROM lineitem
      | WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '2000-04-01 00:00:00'
      | GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_rev
      |FROM supplier, revenue0
      |WHERE s_suppkey = supplier_no
      | AND total_rev = (SELECT max(total_rev) FROM revenue0)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q16 parts/supplier relationship count — the NOT IN
    * (null-aware anti join) shape, the one anti-join variant Q21/Q22's
    * NOT EXISTS doesn't exercise (a NULL in the exclusion set would
    * empty the result, so Catalyst plans NullAwareAnti, not plain
    * LeftAnti). Exclusion set = negative-balance suppliers (the
    * complaints analog); supplier-part relation from lineitem.
    */
  private val tpchQ16Sql =
    """SELECT p_brand, p_type, p_size,
      | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      | AND p_brand <> 'Brand#5'
      | AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      | AND l_suppkey NOT IN (
      |   SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q19 discounted revenue — the DISJUNCTIVE join predicate: three
    * OR'd conjunct groups mixing both sides' columns ride the join as a
    * residual condition while the shared p_partkey equality still plans
    * a hash join (size ranges stand in for the absent container column).
    */
  private val tpchQ19Sql =
    """SELECT CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
      |   AS BIGINT)) AS BIGINT) AS revenue_cents,
      | count(*) AS n_lines
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      | AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |    AND l_quantity >= 1 AND l_quantity <= 11)
      |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |    AND l_quantity >= 10 AND l_quantity <= 20)
      |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      |    AND l_quantity >= 20 AND l_quantity <= 30))""".stripMargin

  /** TPC-H Q20 potential part promotion, adapted — IN over a grouped
    * HAVING whose threshold is CORRELATED scalar aggregates (the part's
    * distinct-supplier count and total quantity): "suppliers holding >4×
    * their fair share of a red part". The fair-share form replaces the
    * spec's fixed 50%-of-availqty because a fixed share fraction thins
    * toward uniform as the corpus grows — this predicate is scale-stable
    * (3 hits at sf0.01, 2 at sf0.1). Two correlated scalars decorrelate
    * to per-part aggregates joined back on the group key.
    */
  private val tpchQ20Sql =
    """SELECT s_suppkey, s_name, n_name
      |FROM supplier, nation
      |WHERE s_suppkey IN (
      |  SELECT l1.l_suppkey FROM lineitem l1, part
      |  WHERE p_partkey = l1.l_partkey AND p_name LIKE 'red%'
      |  GROUP BY l1.l_suppkey, l1.l_partkey
      |  HAVING sum(CAST(l1.l_quantity AS BIGINT)) * (
      |     SELECT count(DISTINCT l2.l_suppkey) FROM lineitem l2
      |     WHERE l2.l_partkey = l1.l_partkey)
      |   > 4 * (SELECT sum(CAST(l3.l_quantity AS BIGINT)) FROM lineitem l3
      |     WHERE l3.l_partkey = l1.l_partkey))
      | AND s_nationkey = n_nationkey
      |ORDER BY s_suppkey""".stripMargin

  /** Day-of-week seasonality audit — the order-volume calendar profile
    * (dashboards slice by weekday; a flat profile here is also the
    * load-smoothing assumption capacity planning rides on). Weekday is
    * PORTABLE integer arithmetic (days-since-epoch % 7; engine dow
    * builtins disagree on week start), shares and the deviation from
    * the uniform 1/7 expectation in exact ppm — the q_benford
    * observed-vs-expected shape on the calendar axis. One 7-row hash
    * aggregate + a broadcast total.
    */
  def seasonality(orders: DataFrame): DataFrame = {
    val counts = orders
      .select(expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') % 7 AS BIGINT)").as("dow"))
      .groupBy(col("dow")).agg(count(lit(1)).as("n_orders"))
    val tot = counts.agg(sum(col("n_orders")).as("tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_orders"),
        expr("n_orders * 1000000 DIV tot").as("observed_ppm"),
        expr("abs(n_orders * 1000000 DIV tot - 142857)").as("deviation_ppm"))
  }

  private def withTpchViews(s: SparkSession, dir: String)(sql: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    Tables.supplier(s, dir).createOrReplaceTempView("supplier")
    Tables.nation(s, dir).createOrReplaceTempView("nation")
    Tables.region(s, dir).createOrReplaceTempView("region")
    Tables.part(s, dir).createOrReplaceTempView("part")
    s.sql(sql)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_seasonality" -> ((s, dir) => seasonality(Tables.orders(s, dir))),
    "q_tpch_q1" -> ((s, dir) => withTpchViews(s, dir)(tpchQ1Sql)),
    "q_tpch_q3" -> ((s, dir) => withTpchViews(s, dir)(tpchQ3Sql)),
    "q_tpch_q4" -> ((s, dir) => withTpchViews(s, dir)(tpchQ4Sql)),
    "q_tpch_q6" -> ((s, dir) => withTpchViews(s, dir)(tpchQ6Sql)),
    "q_tpch_q14" -> ((s, dir) => withTpchViews(s, dir)(tpchQ14Sql)),
    "q_tpch_q18" -> ((s, dir) => withTpchViews(s, dir)(tpchQ18Sql)),
    "q_tpch_q5" -> ((s, dir) => withTpchViews(s, dir)(tpchQ5Sql)),
    "q_tpch_q10" -> ((s, dir) => withTpchViews(s, dir)(tpchQ10Sql)),
    "q_tpch_q2" -> ((s, dir) => withTpchViews(s, dir)(tpchQ2Sql)),
    "q_tpch_q13" -> ((s, dir) => withTpchViews(s, dir)(tpchQ13Sql)),
    "q_tpch_q17" -> ((s, dir) => withTpchViews(s, dir)(tpchQ17Sql)),
    "q_tpch_q21" -> ((s, dir) => withTpchViews(s, dir)(tpchQ21Sql)),
    "q_tpch_q22" -> ((s, dir) => withTpchViews(s, dir)(tpchQ22Sql)),
    "q_tpch_q7" -> ((s, dir) => withTpchViews(s, dir)(tpchQ7Sql)),
    "q_tpch_q8" -> ((s, dir) => withTpchViews(s, dir)(tpchQ8Sql)),
    "q_tpch_q9" -> ((s, dir) => withTpchViews(s, dir)(tpchQ9Sql)),
    "q_tpch_q11" -> ((s, dir) => withTpchViews(s, dir)(tpchQ11Sql)),
    "q_tpch_q12" -> ((s, dir) => withTpchViews(s, dir)(tpchQ12Sql)),
    "q_tpch_q15" -> ((s, dir) => withTpchViews(s, dir)(tpchQ15Sql)),
    "q_tpch_q16" -> ((s, dir) => withTpchViews(s, dir)(tpchQ16Sql)),
    "q_tpch_q19" -> ((s, dir) => withTpchViews(s, dir)(tpchQ19Sql)),
    "q_tpch_q20" -> ((s, dir) => withTpchViews(s, dir)(tpchQ20Sql)),

    // wide->tall reshaping via the native unpivot (melt) operator — a
    // generator, not a 3-way self-join; the oracle rebuilds the tall
    // frame with UNION ALL branches (independent plan)
    "q_unpivot" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("ln")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "value")
    }),

    // null-semantics scalar surface over a deterministically nulled
    // column: three-valued logic counts, null-safe equality (<=>),
    // coalesce fallback in exact cents, and null-skipping aggregates
    "q_null_semantics" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_custkey").as("k"),
          when(col("c_custkey") % 7 === 0, lit(null))
            .otherwise(expr("CAST(round(c_acctbal * 100) AS BIGINT)")).as("v"),
          when(col("c_custkey") % 14 === 0, lit(null))
            .otherwise(expr("CAST(round(c_acctbal * 100) AS BIGINT)")).as("w"))
        .agg(count(lit(1)).as("n_rows"), count(col("v")).as("n_nonnull"),
          count(when(col("v").isNull, 1)).as("n_null"),
          count(when(col("v") <=> col("w"), 1)).as("n_nullsafe_eq"),
          count(when(col("v") === col("w"), 1)).as("n_plain_eq"),
          sum(coalesce(col("v"), lit(0L))).as("sum_coalesced"),
          min(col("v")).as("min_nonnull"))
    }),

    // S10-style narrow projection scan: both the filter and the 3-column
    // projection must reach the parquet reader (PushedFilters / ReadSchema).
    "q_projection_filter" -> ((s, dir) => {
      Tables.customer(s, dir)
        .filter(col("c_acctbal") > 1000.0)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // A1-A6 dashboard stat tiles (count / sum / avg / conditional share /
    // threshold count / avg score) in ONE pass over the fact table:
    // single scan, map-side partial agg, one row out. Derived ratios are
    // rounded to 6dp so the hash can never flip on last-ulp float
    // formatting differences between engines.
    "q_stat_tiles" -> ((s, dir) => {
      Tables.lineitem(s, dir).agg(
        count(lit(1)).as("n_txn"),
        dsum(col("l_extendedprice")).as("total_revenue"),
        round(dsum(col("l_extendedprice")) / count(lit(1)), 6).as("avg_amount"),
        round(count(when(col("l_returnflag") === "R", 1)).cast("double") / count(lit(1)), 6)
          .as("return_share"),
        count(when(col("l_discount") >= 0.06, 1)).as("high_discount_cnt"),
        round(dsum(col("l_discount"), 6) / count(lit(1)), 6).as("avg_discount"))
    }),

    // A7 time-series rollup: month-grain revenue + volume. One shuffle on
    // ~tens of month keys; at 100 TB the fact table would be written
    // partitioned by month so this prunes instead of scanning.
    "q_monthly_rollup" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("month"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("volume"))
    }),

    // A8 channel pie: grouped multi-metric + share-of-total. The share is a
    // window over the *aggregated* rows (a handful), so the unpartitioned
    // window is safe at any input scale.
    "q_channel_mix" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .withColumn("share",
          col("n_events").cast("double") / sum(col("n_events")).over(Window.partitionBy()))
    }),

    // J4 star join: fact → 4 dims, filtered, grouped. nation/region are
    // broadcast explicitly (they are tiny at every scale); customer joins
    // shuffle-side and AQE converts to broadcast when it fits.
    "q_star_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      val c = Tables.customer(s, dir)
      val n = broadcast(Tables.nation(s, dir))
      val r = broadcast(Tables.region(s, dir))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"),
          count(lit(1)).as("n_rows"),
          countDistinct(col("o_orderkey")).as("n_orders"))
    }),

    // J5 anti-join: customers with no high-value order (the reference's
    // "new-customer discovery" shape, generate_dim_account_data.py:95-110).
    // The threshold keeps the result non-empty at every SF so the oracle
    // row actually exercises anti-join semantics (NOT IN with a non-null
    // subquery == left_anti).
    "q_anti_join" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_totalprice") > 200000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Semi-join: customers with at least one open order (EXISTS).
    "q_semi_join" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_acctbal"))
    }),

    // J2 range join: equi-key + time-interval predicate (txn within
    // [open_date, open_date+60d] in the reference,
    // generate_fact_transactions_data.py:100-137). The equi key keeps this a
    // hash join; the range predicate is a post-join filter — no quadratic
    // blowup at scale.
    "q_range_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      li.join(o,
          col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_in_window"), dsum(col("l_extendedprice")).as("revenue"))
    }),

    // Top-K by revenue (dashboard "Revenue vs Volume by Merchant",
    // README.md:92): ORDER BY + LIMIT plans as TakeOrderedAndProject —
    // per-partition top-k then a k-row merge on the driver, never a full sort.
    "q_topk_parts" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_partkey"), col("p_name"))
        .agg(dsum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("revenue").desc, col("p_partkey").asc)
        .limit(10)
    }),

    // Ranking window: top-3 customers by balance per nation.
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("n_name"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("n_name"), col("c_custkey"), col("c_acctbal"), col("rnk"))
    }),

    // Top-3 per nation WITHOUT a window: the bounded-heap typed
    // aggregate map-side combines to k rows per group per partition
    // before the exchange, so the shuffle carries k x groups rows where
    // the q_window_rank plan shuffles and sorts every member. Same
    // answer; the oracle runs the window form.
    "q_topk_group" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(graft.functions.TopKAggregate.topKRows(
          struct(col("c_acctbal").cast("double").as("value"),
            col("c_custkey").as("id")), 3).as("top"))
        .select(col("n_name"), posexplode(col("top")))
        .select(col("n_name"), col("col.id").as("c_custkey"),
          col("col.value").as("c_acctbal"), (col("pos") + 1).cast("long").as("rnk"))
    }),

    // Distribution windows: ntile / percent_rank / cume_dist per
    // nation over customer balance — the remaining ranking-family
    // functions next to q_window_rank's row_number. All three are pure
    // rank arithmetic over the same one-shuffle partitioned sort, and
    // round(6) keeps the divisions hash-stable across engines.
    // percent_rank/cume_dist re-derived from row_number + partition count
    // in exact ppm integers: the ORDER BY is total (custkey tiebreak), so
    // pct = (rn-1)/(n-1) and cume = rn/n hold by definition — and the
    // builtin double forms hit round(x, 6) knife edges at sf1 (the r13
    // 10x gate caught 0.065313 vs 0.065312: same double, different
    // round() semantics). Integer DIV truncation is engine-identical.
    "q_window_dist" -> ((s, dir) => {
      val w = Window.partitionBy(col("n_name"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          // row_number() is INT — widen before the ppm multiply or rn *
          // 1000000 overflows 32 bits past ~2.1k rows per partition
          row_number().over(w).cast("long").as("rn"),
          count(lit(1)).over(Window.partitionBy(col("n_name"))).as("n"))
        .select(col("n_name"), col("c_custkey"), col("c_acctbal"),
          col("quartile"),
          expr("CASE WHEN n = 1 THEN 0 ELSE (rn - 1) * 1000000 DIV (n - 1) END")
            .as("pct_rank_ppm"),
          expr("rn * 1000000 DIV n").as("cume_ppm"))
        .filter(col("c_custkey") % 20 === 0)
    }),

    // Set operations: EXCEPT + INTERSECT branches unioned with a tag.
    "q_setops" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val never = c.select(col("c_custkey").as("custkey"))
        .except(o.select(col("o_custkey").as("custkey")))
        .select(lit("never_ordered").as("tag"), col("custkey"))
      val both = o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
        .intersect(o.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("custkey")))
        .select(lit("f_and_o").as("tag"), col("custkey"))
      never.unionAll(both)
    }),

    // U5 PAN masking semantics (pipeline.py:89-90): first 6 + fixed six
    // asterisks + last 4, plus the zfill(16) token shape (pipeline.py:95).
    "q_mask_pan" -> ((s, dir) => {
      val pan = lpad(col("o_orderkey").cast("string"), 16, "4")
      Tables.orders(s, dir)
        .select(col("o_orderkey"), pan.as("pan"))
        .select(
          col("o_orderkey"),
          concat(substring(col("pan"), 1, 6), lit("******"),
            substring(col("pan"), -4, 4)).as("masked_card_number"),
          lpad(substring(col("pan"), -4, 4), 16, "0").as("token_shape"))
    }),

    // U1 Avro-union/JSON unwrap analog: pull a typed value out of a JSON
    // payload column and aggregate it (pipeline.py:57-71).
    "q_json_unwrap" -> ((s, dir) => {
      val k = get_json_object(col("props"), "$.k")
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(k.cast("long")).as("sum_k"),
          (count(lit(1)) - count(k)).as("n_null_k"))
    }),

    // The STRUCTURED parse path next to q_json_unwrap's get_json_object:
    // from_json with an explicit schema (the S3/U1 ingest discipline
    // applied to the props column), then a decade-bucket uniformity
    // audit of k — observed vs the uniform 1/10 expectation in exact
    // ppm, the q_benford shape on the payload axis.
    "q_props_uniformity" -> ((s, dir) => {
      val parsed = Tables.events(s, dir)
        .select(from_json(col("props"), lit("k INT")).as("p"))
        .select(expr("CAST(p.k DIV 10 AS BIGINT)").as("bucket"))
        .filter(col("bucket").isNotNull)
      val counts = parsed.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      counts.crossJoin(broadcast(counts.agg(sum(col("n")).as("tot"))))
        .select(col("bucket"), col("n"),
          expr("n * 1000000 DIV tot").as("observed_ppm"),
          expr("abs(n * 1000000 DIV tot - 100000)").as("deviation_ppm"))
    }),

    // U3 PAN-length validation split: valid iff length in [13,19]
    // (pipeline.py:77-88); invalid rows dead-letter instead of failing.
    "q_pan_validation" -> ((s, dir) => {
      val panLen = (col("o_orderkey") % 10 + 11).cast("int")
      Tables.orders(s, dir)
        .select(lit("9" * 25).substr(lit(1), panLen).as("pan"))
        .select(length(col("pan")).as("pan_len"),
          length(col("pan")).between(13, 19).as("is_valid"))
        .groupBy(col("pan_len"), col("is_valid"))
        .agg(count(lit(1)).as("n"))
    }),

    // date_dim builder semantics (FIXTURES.md §7): date_id = days since
    // 2023-01-01 (generate_fact_transactions_data.py:35,66-67) + calendar
    // attributes. ISO day-of-week (Mon=1).
    "q_date_dim" -> ((s, dir) => {
      val base = to_date(lit("2023-01-01"))
      Tables.orders(s, dir)
        .select(to_date(col("o_orderdate")).as("dt")).distinct()
        .select(
          datediff(col("dt"), base).as("date_id"),
          col("dt").as("date"),
          year(col("dt")).as("year"),
          quarter(col("dt")).as("quarter"),
          month(col("dt")).as("month"),
          dayofmonth(col("dt")).as("day"),
          (weekday(col("dt")) + 1).as("day_of_week"))
    }),

    // time_dim builder (README.md:49): one row per second of day with
    // hour/minute/second/period attributes. The projection fragments are
    // valid verbatim in Spark SQL and DuckDB (floor-div is exact for
    // time_id < 2^53); only the 0..86399 row source is dialect-specific
    // (spark.range vs range()).
    "q_time_dim" -> ((s, dir) =>
      s.range(0, 86400).toDF("time_id").selectExpr(timeDimCols: _*)),

    // §2.7 scalar string surface: email construction
    // (generate_dim_cust_data.py:68), zero-padding, split + element access.
    "q_scalar_strings" -> ((s, dir) => {
      val parts = split(col("c_name"), "#")
      Tables.customer(s, dir).select(
        col("c_custkey"),
        concat(lower(parts.getItem(0)), lit("."), parts.getItem(1),
          lit("@example.com")).as("email"),
        lpad(col("c_custkey").cast("string"), 12, "0").as("padded_id"),
        upper(substring(col("c_mktsegment"), 1, 3)).as("seg3"))
    }),

    // Weighted categorical ladder (generate_fact_transactions_data.py:111-128)
    // made deterministic: a Knuth multiplicative hash of the key replaces
    // random.choices, the CASE ladder encodes the cumulative weights.
    // The key is reduced mod 2^31-1 first so key * 2654435761 stays below
    // 2^63 for any BIGINT key (ANSI-overflow-safe at 100 TB key ranges);
    // identical values for keys < 2^31-1.
    "q_weighted_channel" -> ((s, dir) => {
      // ladder shared with the wire builder (IngestQueries.channelFromR)
      Tables.orders(s, dir)
        .select(col("o_totalprice"),
          graft.ingest.IngestQueries.rHash(col("o_orderkey")).as("r"))
        .select(col("o_totalprice"),
          graft.ingest.IngestQueries.channelFromR(col("r")).as("channel"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("amount"))
    }),

    // S2: bytes → string decode (pipeline.py:166). Text round-trips
    // through an explicit UTF-8 encode/decode pair; byte counts prove the
    // binary representation was actually materialized.
    "q_utf8_decode" -> ((s, dir) => {
      val blob = encode(col("text"), "UTF-8")
      Tables.documents(s, dir).agg(
        count(lit(1)).as("n_docs"),
        count(when(decode(blob, "UTF-8") === col("text"), 1)).as("n_roundtrip_ok"),
        sum(length(blob)).as("total_bytes"))
    }),

    // A10 rollup: subtotal + grand-total rows in one pass (GROUP BY
    // ROLLUP plans as a single Expand + hash aggregate — one shuffle).
    "q_rollup" -> ((s, dir) => {
      Tables.orders(s, dir)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
    }),

    // A10+: explicit GROUPING SETS (finer than rollup/cube — exactly the
    // requested combinations) with grouping_id() to tag each stratum.
    // Still ONE Expand + hash aggregate, one shuffle.
    "q_grouping_sets" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_gs_v")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          | CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
          | count(*) AS n,
          | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          |FROM orders_gs_v
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
    }),

    // §2.5 RANGE frame: trailing-30-day revenue per priority — a VALUE
    // range over the date_id ordering (days since 2023-01-01 ladder), so
    // sparse dates contribute by distance, not row position. State per
    // partition is one sliding frame.
    // the RANGE-frame sum runs over integer CENTS, converted to currency
    // by one division at the end: a ~30-value double accumulation drifts
    // in its low bits between engines once daily sums get sf1-sized (the
    // r13 10x gate caught 983405794.900001 vs .9), while a bigint frame
    // sum is exact and the single final division is engine-identical
    "q_window_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("date_id").asc)
        .rangeBetween(-29, Window.currentRow)
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"),
          datediff(to_date(col("o_orderdate")), to_date(lit("2023-01-01")))
            .cast("long").as("date_id"))
        .agg(dsum(col("o_totalprice")).as("day_revenue"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("day_cents"))
        .withColumn("trailing_30d",
          round(sum(col("day_cents")).over(w).cast("double") / 100.0, 6))
        .drop("day_cents")
    }),

    // §2.5 frame spec: trailing-3-month moving average per priority.
    // Partitioned by priority (5 keys), ordered by month — window state
    // is one frame of 3 rows per partition.
    "q_moving_avg" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("month").asc)
        .rowsBetween(-2, Window.currentRow)
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"),
          to_date(date_trunc("month", col("o_orderdate"))).as("month"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
        .withColumn("moving_avg_3m", round(avg(col("revenue")).over(w), 6))
    }),

    // SCD2 interval build: a change feed (events as per-user state
    // updates) becomes slowly-changing-dimension rows with
    // [valid_from, valid_to) windows via lead() — the versioned-dim shape
    // a point-in-time (as-of) join probes. One shuffle on the entity key;
    // current rows carry a null valid_to.
    "q_scd2_intervals" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t_us").asc, col("event_id").asc)
      Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          col("event_id"), col("event_type"), col("value"))
        .withColumn("valid_to_us", lead(col("t_us"), 1).over(w))
        .withColumn("version", row_number().over(w).cast("long"))
        .select(col("user_id"), col("version"), col("t_us").as("valid_from_us"),
          col("valid_to_us"), col("event_type").as("state"), col("value"))
    }),

    // Pivot (A10-adjacent): status columns per priority. Spark's pivot
    // with an explicit value list plans as ONE hash aggregate with a
    // pivot-expression projection — single shuffle, no per-value scans;
    // absent cells are 0 (na.fill) to match conditional-count semantics.
    "q_pivot" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("F", "O", "P"))
        .select(col("o_orderpriority"), col("F").as("n_f"),
          col("O").as("n_o"), col("P").as("n_p"))
    }),

    // Sessionization: 30-minute-gap sessions per user via lag + running sum.
    // Partitioned window (by user) — scales horizontally; only per-user
    // history must fit an executor.
    "q_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("tms").asc, col("event_id").asc)
      val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("tms"))
        .withColumn("prev", lag(col("tms"), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev").isNull || col("tms") - col("prev") > 1800000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(running))
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // the SAME text spark.sql ran — the whole point of the entry
    "q_tpch_q1" -> tpchQ1Sql,
    "q_seasonality" ->
      """WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
        |   CAST(o_orderdate AS DATE)) % 7 AS dow FROM orders),
        | c AS (SELECT CAST(dow AS BIGINT) AS dow, count(*) AS n_orders
        |  FROM d GROUP BY 1),
        | t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS tot FROM c)
        |SELECT dow, n_orders,
        | n_orders * 1000000 // tot AS observed_ppm,
        | abs(n_orders * 1000000 // tot - 142857) AS deviation_ppm
        |FROM c, t""".stripMargin,
    "q_tpch_q3" -> tpchQ3Sql,
    "q_tpch_q4" -> tpchQ4Sql,
    "q_tpch_q6" -> tpchQ6Sql,
    "q_tpch_q14" -> tpchQ14Sql,
    "q_tpch_q18" -> tpchQ18Sql,
    "q_tpch_q5" -> tpchQ5Sql,
    "q_tpch_q10" -> tpchQ10Sql,
    "q_tpch_q2" -> tpchQ2Sql,
    "q_tpch_q13" -> tpchQ13Sql,
    "q_tpch_q17" -> tpchQ17Sql,
    "q_tpch_q21" -> tpchQ21Sql,
    "q_tpch_q22" -> tpchQ22Sql,
    "q_tpch_q7" -> tpchQ7Sql,
    "q_tpch_q8" -> tpchQ8Sql,
    "q_tpch_q9" -> tpchQ9Sql,
    "q_tpch_q11" -> tpchQ11Sql,
    "q_tpch_q12" -> tpchQ12Sql,
    "q_tpch_q15" -> tpchQ15Sql,
    "q_tpch_q16" -> tpchQ16Sql,
    "q_tpch_q19" -> tpchQ19Sql,
    "q_tpch_q20" -> tpchQ20Sql,
    "q_projection_filter" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_acctbal > 1000.0""",

    "q_stat_tiles" ->
      """SELECT count(*) AS n_txn,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_amount,
        | round(CAST(count_if(l_returnflag = 'R') AS DOUBLE) / count(*), 6) AS return_share,
        | CAST(count_if(l_discount >= 0.06) AS BIGINT) AS high_discount_cnt,
        | round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_discount
        |FROM lineitem""".stripMargin,

    "q_monthly_rollup" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | count(*) AS volume
        |FROM orders GROUP BY 1""".stripMargin,

    "q_channel_mix" ->
      """SELECT event_type, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        | CAST(count(*) AS DOUBLE) / CAST(sum(count(*)) OVER () AS DOUBLE) AS share
        |FROM events GROUP BY event_type""".stripMargin,

    "q_star_join" ->
      """SELECT r_name, n_name,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | count(*) AS n_rows,
        | count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY r_name, n_name""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,

    "q_range_join" ->
      """SELECT o_orderpriority, count(*) AS n_in_window,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderpriority""".stripMargin,

    "q_topk_parts" ->
      """SELECT p_partkey, p_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_partkey, p_name
        |ORDER BY revenue DESC, p_partkey LIMIT 10""".stripMargin,

    "q_topk_group" ->
      """SELECT n_name, c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal,
        | CAST(rnk AS BIGINT) AS rnk FROM (
        | SELECT n_name, c_custkey, c_acctbal,
        |  row_number() OVER (PARTITION BY n_name
        |    ORDER BY c_acctbal DESC, c_custkey) AS rnk
        | FROM customer JOIN nation ON c_nationkey = n_nationkey) t
        |WHERE rnk <= 3""".stripMargin,

    "q_window_dist" ->
      """SELECT n_name, c_custkey, c_acctbal, quartile,
        | CAST(CASE WHEN n = 1 THEN 0
        |   ELSE (rn - 1) * 1000000 // (n - 1) END AS BIGINT) AS pct_rank_ppm,
        | CAST(rn * 1000000 // n AS BIGINT) AS cume_ppm
        |FROM (SELECT n_name, c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  row_number() OVER w AS rn,
        |  count(*) OVER (PARTITION BY n_name) AS n
        | FROM customer JOIN nation ON c_nationkey = n_nationkey
        | WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey)) t
        |WHERE c_custkey % 20 = 0""".stripMargin,

    "q_window_rank" ->
      """SELECT n_name, c_custkey, c_acctbal, rnk FROM (
        | SELECT n_name, c_custkey, c_acctbal,
        |  row_number() OVER (PARTITION BY n_name
        |    ORDER BY c_acctbal DESC, c_custkey) AS rnk
        | FROM customer JOIN nation ON c_nationkey = n_nationkey) t
        |WHERE rnk <= 3""".stripMargin,

    "q_unpivot" ->
      """WITH src AS (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
        |   l_quantity, l_extendedprice, l_discount
        |  FROM lineitem WHERE l_orderkey % 100 = 0)
        |SELECT l_orderkey, ln, 'l_quantity' AS measure, l_quantity AS value FROM src
        |UNION ALL
        |SELECT l_orderkey, ln, 'l_extendedprice', l_extendedprice FROM src
        |UNION ALL
        |SELECT l_orderkey, ln, 'l_discount', l_discount FROM src""".stripMargin,

    "q_null_semantics" ->
      """WITH t AS (SELECT c_custkey AS k,
        |  CASE WHEN c_custkey % 7 = 0 THEN NULL
        |       ELSE CAST(round(c_acctbal * 100) AS BIGINT) END AS v,
        |  CASE WHEN c_custkey % 14 = 0 THEN NULL
        |       ELSE CAST(round(c_acctbal * 100) AS BIGINT) END AS w
        | FROM customer)
        |SELECT count(*) AS n_rows, count(v) AS n_nonnull,
        | count(CASE WHEN v IS NULL THEN 1 END) AS n_null,
        | count(CASE WHEN v IS NOT DISTINCT FROM w THEN 1 END) AS n_nullsafe_eq,
        | count(CASE WHEN v = w THEN 1 END) AS n_plain_eq,
        | CAST(sum(coalesce(v, 0)) AS BIGINT) AS sum_coalesced,
        | min(v) AS min_nonnull
        |FROM t""".stripMargin,

    "q_setops" ->
      """SELECT 'never_ordered' AS tag, custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer
        |  EXCEPT SELECT o_custkey AS custkey FROM orders) a
        |UNION ALL
        |SELECT 'f_and_o' AS tag, custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O') b""".stripMargin,

    "q_mask_pan" ->
      """SELECT o_orderkey,
        | substr(pan, 1, 6) || '******' || substr(pan, length(pan) - 3, 4) AS masked_card_number,
        | lpad(substr(pan, length(pan) - 3, 4), 16, '0') AS token_shape
        |FROM (SELECT o_orderkey,
        |  lpad(CAST(o_orderkey AS VARCHAR), 16, '4') AS pan FROM orders) t""".stripMargin,

    "q_json_unwrap" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | count(*) - count(json_extract_string(props, '$.k')) AS n_null_k
        |FROM events GROUP BY event_type""".stripMargin,

    "q_props_uniformity" ->
      """WITH p AS (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
        |   // 10 AS bucket FROM events),
        | c AS (SELECT bucket, count(*) AS n FROM p
        |  WHERE bucket IS NOT NULL GROUP BY 1),
        | t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
        |SELECT bucket, n,
        | n * 1000000 // tot AS observed_ppm,
        | abs(n * 1000000 // tot - 100000) AS deviation_ppm
        |FROM c, t""".stripMargin,

    "q_pan_validation" ->
      """SELECT length(pan) AS pan_len,
        | length(pan) BETWEEN 13 AND 19 AS is_valid, count(*) AS n
        |FROM (SELECT substr(repeat('9', 25), 1,
        |   CAST(o_orderkey % 10 + 11 AS INT)) AS pan FROM orders) t
        |GROUP BY 1, 2""".stripMargin,

    "q_date_dim" ->
      """SELECT CAST(date_diff('day', DATE '2023-01-01', dt) AS INT) AS date_id,
        | dt AS date,
        | CAST(year(dt) AS INT) AS year, CAST(quarter(dt) AS INT) AS quarter,
        | CAST(month(dt) AS INT) AS month, CAST(day(dt) AS INT) AS day,
        | CAST(isodow(dt) AS INT) AS day_of_week
        |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS dt FROM orders) d""".stripMargin,

    "q_time_dim" ->
      s"SELECT ${timeDimCols.mkString(",\n  ")} FROM range(0, 86400) t(time_id)",

    "q_scalar_strings" ->
      """SELECT c_custkey,
        | lower(string_split(c_name, '#')[1]) || '.' || string_split(c_name, '#')[2]
        |   || '@example.com' AS email,
        | lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_id,
        | upper(substr(c_mktsegment, 1, 3)) AS seg3
        |FROM customer""".stripMargin,

    "q_weighted_channel" ->
      s"""SELECT ${graft.ingest.IngestQueries.channelFromRSql("r")} AS channel,
        | count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS amount
        |FROM (SELECT ${graft.ingest.IngestQueries.rHashSql("o_orderkey")} AS r, o_totalprice
        |      FROM orders) t
        |GROUP BY 1""".stripMargin,

    "q_utf8_decode" ->
      """SELECT count(*) AS n_docs,
        | CAST(count_if(decode(encode(text)) = text) AS BIGINT) AS n_roundtrip_ok,
        | CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents""".stripMargin,

    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
        | count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,

    "q_window_range_frame" ->
      """SELECT o_orderpriority, date_id, day_revenue,
        | round(CAST(sum(day_cents) OVER (PARTITION BY o_orderpriority
        |   ORDER BY date_id RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
        |   AS DOUBLE) / 100.0, 6) AS trailing_30d
        |FROM (SELECT o_orderpriority,
        |   CAST(date_diff('day', DATE '2023-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
        |     AS date_id,
        |   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_revenue,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS day_cents
        |  FROM orders GROUP BY 1, 2) d""".stripMargin,

    "q_moving_avg" ->
      """SELECT o_orderpriority, month, revenue,
        | round(avg(revenue) OVER (PARTITION BY o_orderpriority ORDER BY month
        |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg_3m
        |FROM (SELECT o_orderpriority,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        | FROM orders GROUP BY 1, 2) m""".stripMargin,

    "q_scd2_intervals" ->
      """SELECT user_id,
        | CAST(row_number() OVER w AS BIGINT) AS version,
        | epoch_us(ts) AS valid_from_us,
        | lead(epoch_us(ts)) OVER w AS valid_to_us,
        | event_type AS state, value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        | CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
        | CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
        | CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms FROM events),
        | g AS (SELECT user_id, event_id, tms,
        |   CASE WHEN lag(tms) OVER w IS NULL
        |     OR tms - lag(tms) OVER w > 1800000 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
        | s AS (SELECT user_id,
        |   sum(is_new) OVER (PARTITION BY user_id ORDER BY tms, event_id
        |     ROWS UNBOUNDED PRECEDING) AS session_id FROM g)
        |SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
        | count(*) AS n_events
        |FROM s GROUP BY user_id""".stripMargin
  )
}
