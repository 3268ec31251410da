package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsofJoin, SampleOps}

/** Physical-plan shape assertions for the round-4 operators — the
  * property that matters at 100 TB is the PLAN, not the sf0.001 result:
  *
  *   - the as-of join must stay the one-shuffle union+window plan (a
  *     range-join rewrite would explode quadratically in history);
  *   - the uniform sample must plan as TakeOrderedAndProject
  *     (per-partition top-k + k-row driver merge), never a full sort.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("asofJoin plans ONE hash-partition exchange on the key, no join node") {
    val plan = AsofJoin.purchaseAsofClick(spark, dir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 key exchange:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin")
      && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must be windowed, not a join rewrite:\n$plan")
  }

  test("token-budget sample == naive global running sum; heavy window stays bucket-partitioned") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val fast = SampleOps.tokenBudgetSample(docs)
    // naive single-ordering reference (what the DuckDB oracle runs)
    val naive = docs.select(col("doc_id"),
        expr("(doc_id % 2147483647) * 2654435761 % 1000000007").as("h"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tokens"))
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(Window.orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("tokens_before") < SampleOps.TokenBudget)
      .select(col("doc_id"), col("n_tokens"), col("tokens_before"))
    val a = fast.collect().map(_.toSeq).toSet
    val b = naive.collect().map(_.toSeq).toSet
    assert(a == b, s"bucketed decomposition diverged: ${a.diff(b)} vs ${b.diff(a)}")
    // the only single-partition stage is the B-row bucket-offset window;
    // the doc-count-sized running sum must be hash-partitioned by bucket
    // after execution the adaptive plan prints Final + Initial sections —
    // count exchanges in the final section only
    val plan = fast.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val single = "Exchange SinglePartition".r.findAllIn(plan).length
    assert(single == 1, s"expected exactly 1 tiny single-partition exchange:\n$plan")
    assert("Exchange hashpartitioning\\(bucket".r.findFirstIn(plan).isDefined,
      s"per-doc window must partition by bucket:\n$plan")
  }

  test("pack chunk stats reuse the bucketed cumsum: one tiny single-partition stage") {
    import graft.operators.PackOps
    val df = PackOps.chunkStats(Tables.documents(spark, dir))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val single = "Exchange SinglePartition".r.findAllIn(plan).length
    // the B-row bucket-offset window + the final 1-row aggregate — the
    // corpus-sized running sum itself must never serialize
    assert(single <= 2, s"corpus-sized single-partition stage leaked in:\n$plan")
    assert("Exchange hashpartitioning\\(bucket".r.findFirstIn(plan).isDefined,
      s"per-doc window must partition by bucket:\n$plan")
  }

  test("next-fit packing folds inside a bucket-partitioned sorted group, no extra exchange") {
    import graft.operators.PackOps
    val df = PackOps.nextFitStats(spark, Tables.documents(spark, dir))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // exactly ONE hash exchange: the shuffle on the groupByKey bucket key
    // (printed as `value`), whose shuffle sort feeds the fold directly
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected 1 bucket-key exchange, got $hashEx:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("tfidf rank cut plans as WindowGroupLimit partitioned by doc") {
    val plan = SparkEntry.queries("q_tfidf_terms")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rnk <= k must push into WindowGroupLimit (per-partition top-k):\n$plan")
    // the only nested-loop is the 1-row corpus-count scalar broadcast
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("sorted-neighborhood ranking: the only single-partition window is the offsets frame") {
    val df = SparkEntry.queries("q_er_sn_pairs")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the per-partition row_number runs partitioned by the range-bucket
    // pid; the ONLY SinglePartition exchange may be the #partitions-row
    // count/offset window
    val single = "Exchange SinglePartition".r.findAllIn(plan).length
    assert(single <= 1, s"data-sized single-partition stage leaked in:\n$plan")
    assert("Exchange hashpartitioning\\(pid".r.findFirstIn(plan).isDefined,
      s"local ranks must window by range-partition id:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("TPC-H Q5 via spark.sql plans as hash joins with broadcast dims, no cartesian") {
    val plan = SparkEntry.queries("q_tpch_q5")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"nation/region must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    // the comma-join text must still reach the scan as pushed filters
    assert(plan.contains("PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)"),
      s"r_name filter must push to the region scan:\n$plan")
  }

  test("TPC-H Q2/Q13/Q17/Q21/Q22 decorrelate cartesian-free into join plans") {
    // each of the five exercises a distinct decorrelation: correlated min
    // (Q2), grouped-on-aggregate left join (Q13), correlated scalar avg
    // (Q17), double-nested EXISTS/NOT EXISTS (Q21), NOT EXISTS + derived
    // scalar threshold (Q22). All must plan as hash joins — a
    // CartesianProduct or per-row nested loop means the rewrite failed.
    val plans = Seq("q_tpch_q2", "q_tpch_q13", "q_tpch_q17", "q_tpch_q21",
      "q_tpch_q22").map { q =>
      q -> SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
    }.toMap
    for ((q, plan) <- plans)
      assert(!plan.contains("CartesianProduct"), s"$q planned a cartesian:\n$plan")
    // Q13's outer join must SURVIVE planning (inner would drop 0-order rows)
    assert(plans("q_tpch_q13").contains("LeftOuter"),
      s"Q13 left join lost:\n${plans("q_tpch_q13")}")
    // Q21's EXISTS/NOT EXISTS pair must both land as semi/anti hash joins
    assert(plans("q_tpch_q21").contains("LeftSemi") &&
      plans("q_tpch_q21").contains("LeftAnti"),
      s"Q21 semi/anti stack lost:\n${plans("q_tpch_q21")}")
    // Q22's NOT EXISTS must land as an anti join
    assert(plans("q_tpch_q22").contains("LeftAnti"),
      s"Q22 anti join lost:\n${plans("q_tpch_q22")}")
  }

  test("TPC-H Q7-Q20 batch decorrelates cartesian-free; Q16's NOT IN is null-aware") {
    val plans = Seq("q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q11",
      "q_tpch_q12", "q_tpch_q15", "q_tpch_q16", "q_tpch_q19", "q_tpch_q20")
      .map { q =>
        q -> SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      }.toMap
    for ((q, plan) <- plans)
      assert(!plan.contains("CartesianProduct"), s"$q planned a cartesian:\n$plan")
    // Q16's NOT IN lands as an anti join. NOTE: the null-aware variant
    // (NAAJ / OR-isnull condition) is correctly ABSENT here — both join
    // keys scan from non-nullable parquet fields, so Catalyst proves the
    // exclusion set can't contain NULL and simplifies to a plain
    // LeftAnti with bare equality keys (condition None). If the schema
    // ever went nullable, this assertion would keep passing while the
    // plan gained the isnull disjunct — the semantics, not the variant,
    // are what's pinned.
    assert(plans("q_tpch_q16").contains("LeftAnti"),
      s"Q16 NOT IN must plan an anti join:\n${plans("q_tpch_q16")}")
    // Q19's disjunctive predicate must still ride a HASH join on the
    // shared p_partkey equality, not degrade to a nested loop
    assert(plans("q_tpch_q19").contains("HashJoin") &&
      !plans("q_tpch_q19").contains("BroadcastNestedLoopJoin"),
      s"Q19 must keep the partkey hash join:\n${plans("q_tpch_q19")}")
  }

  test("corpus audits never plan a cartesian or nested-loop join") {
    import graft.operators.CorpusOps
    for (df <- Seq(CorpusOps.boilerplate(Tables.documents(spark, dir)),
      CorpusOps.gramNovelty(Tables.documents(spark, dir)))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  test("bounded-heap top-k per group partial-aggregates before the exchange") {
    val plan = SparkEntry.queries("q_topk_group")(spark, dir)
      .queryExecution.executedPlan.toString
    // partial top_k_rows must appear BELOW the group exchange: the
    // shuffle then carries k rows per group per partition, which is the
    // whole point versus the window plan's full sort
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning(n_name")
    val partialIdx = plan.indexOf("partial_top_k_rows")
    assert(partialIdx >= 0, s"no partial top-k aggregation:\n$plan")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial top-k must sit under the group exchange:\n$plan")
  }

  test("label-outlier rank window group-limits (no full per-label sort) and broadcasts centroids") {
    val plan = SparkEntry.queries("q_emb_outliers")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rnk <= k must push into WindowGroupLimit (per-partition top-k):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the K-row centroid table must broadcast:\n$plan")
  }

  test("bucketed interval join plans as equi hash joins — no nested loop anywhere") {
    val plan = SparkEntry.queries("q_interval_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"the bucket rewrite must keep the range join equi-keyed:\n$plan")
  }

  test("RangeJoinRewrite turns the NAIVE band join into the bucketed equi-join") {
    val plan = SparkEntry.queries("q_interval_join_auto")(spark, dir)
      .queryExecution.executedPlan.toString
    // without the rule this exact query plans BroadcastNestedLoopJoin —
    // the assertion proves the optimizer rule actually fired
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"rule did not fire:\n$plan")
    assert(plan.contains("graft_p_bucket") || plan.contains("graft_i_bucket"),
      s"expected the rewrite's bucket keys in the plan:\n$plan")
  }

  test("RangeJoinRewrite leaves an equi-keyed range join alone") {
    graft.plans.RangeJoinRewrite.ensureInjected(spark)
    val plan = SparkEntry.queries("q_range_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("graft_p_bucket"),
      s"rule must not rewrite a join that already has an equi key:\n$plan")
  }

  test("RangeJoinRewrite falls through on a span wide enough to overflow") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    graft.plans.RangeJoinRewrite.ensureInjected(spark)
    val pts = Seq(1L, 5L, 1000000000000000000L).toDF("p")
    val ivs = Seq(0L, 3L).toDF("lo")
    // a span this wide makes the rewrite's width = c+1 and sequence stop
    // overflow-prone for attainable lo; the guard must leave the original
    // (nested-loop) join in place AND the answer must come out
    val c = Long.MaxValue / 2
    val df = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("lo") + lit(c))
    assert(!df.queryExecution.executedPlan.toString.contains("graft_p_bucket"),
      "an overflow-prone span must not be rewritten")
    assert(df.count() == 5, "band-join answer changed under the span guard")
  }

  test("RangeJoinRewrite survives interval bounds at the top of the long range") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    graft.plans.RangeJoinRewrite.ensureInjected(spark)
    // lo near Long.MaxValue with a small span: the rewrite must still
    // fire and must never form lo + c in the exploded generator — that
    // Add throws under ANSI (where the original nested-loop join
    // evaluates the predicate only per candidate pair) and wraps under
    // non-ANSI into a stop < start Sequence. The huge interval simply
    // matches nothing.
    val pts = Seq(1L, 5L).toDF("p")
    val ivs = Seq(0L, Long.MaxValue - 2L).toDF("lo")
    val df = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("lo") + lit(2L))
    assert(df.queryExecution.executedPlan.toString.contains("graft_p_bucket"),
      "rewrite must fire on a small span regardless of the data domain")
    assert(df.count() == 1, "only p=1 lies in [0, 2]")
  }

  test("star join broadcasts every dim; ingest stays fully pipelined") {
    // the two plans 100 TB depends on hardest: the dashboard star join
    // must never fall back to a shuffled SMJ for its small dims, and the
    // ingest transform chain must stay a shuffle-free narrow pipeline
    val star = SparkEntry.queries("q_star_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!star.contains("SortMergeJoin"),
      s"a dim fell back to a shuffled join:\n$star")
    assert("BroadcastHashJoin".r.findAllIn(star).length >= 4,
      s"expected all star dims broadcast:\n$star")
    val ingest = SparkEntry.queries("q_ingest_valid")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!ingest.contains("Exchange hashpartitioning")
      && !ingest.contains("SortMergeJoin"),
      s"ingest must be a narrow shuffle-free pipeline:\n$ingest")
  }

  test("purge audit anti-joins broadcast the tombstone side") {
    val plan = graft.operators.Governance.purgeAudit(spark, dir)
      .queryExecution.executedPlan.toString
    val bcastAnti = "BroadcastHashJoin .*LeftAnti".r.findAllIn(plan).length
    assert(bcastAnti >= 2,
      s"tombstone purges must broadcast the deletion keys, got $bcastAnti:\n$plan")
  }

  test("bitmap distinct: two-phase aggregate, the word shuffle carries blocks not ids") {
    val plan = graft.operators.ShuffleOps
      .bitmapDistinct(Tables.events(spark, dir))
      .queryExecution.executedPlan.toString
    // two hash-aggregate LEVELS: (key, day, block) bit_or then (key, day)
    // popcount; each with a partial+final pair = map-side combine before
    // BOTH exchanges — the raw user ids never shuffle
    assert(plan.contains("bit_or"), plan)
    assert(plan.contains("bit_count"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      s"expected partial+final pairs for both aggregate levels:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("zipf fit: rank cut plans as WindowGroupLimit partitioned by source") {
    val plan = graft.operators.TextOps
      .zipfFit(Tables.documents(spark, dir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k must group-limit per source, not sort whole partitions:\n$plan")
    assert(!plan.contains("Exchange SinglePartition") ||
      plan.contains("Exchange hashpartitioning"),
      s"the rank window must be source-partitioned:\n$plan")
  }

  test("dq checks: the referential check broadcasts the dim side") {
    val plan = graft.operators.Governance
      .dqChecks(Tables.orders(spark, dir), Tables.customer(spark, dir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"custkey_fk must be a broadcast anti-join (fact side never shuffles):\n$plan")
  }

  test("bucket point lookup scans exactly one bucket") {
    val df = graft.operators.ShuffleOps.bucketPointLookup(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(
      s"SelectedBucketsCount: 1 out of ${graft.operators.ShuffleOps.Buckets}"),
      s"the equality filter must prune to one bucket:\n$plan")
  }

  test("TPC-H Q4's EXISTS plans as a left semi join, never a cartesian") {
    val plan = graft.operators.Analytics
      .queries("q_tpch_q4")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"correlated EXISTS must decorrelate to a semi join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("uniform sample plans TakeOrderedAndProject, not a global sort") {
    val plan = SampleOps.uniformSample(Tables.documents(spark, dir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sample must not range-shuffle the corpus:\n$plan")
  }

  test("asofJoin carries the matched right ROW atomically (null attrs stay null)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // right rows: t=1 has v=5.0, t=2 has v=null; a probe at t=3 must get
    // t=2's (id=20, null) — NOT id=20 with t=1's 5.0 backfilled.
    val left = Seq((1L, 3L, 100L)).toDF("k", "t", "probe_id")
    val right = Seq((1L, 1L, 10L, Some(5.0)), (1L, 2L, 20L, None))
      .toDF("k", "t", "r_id", "r_val")
    val row = AsofJoin.asofJoin(left, right, "k", "t",
      rightCols = Seq("r_id", "r_val"), rightOrder = "r_id").collect().head
    assert(row.getAs[Long]("r_id") == 20L)
    assert(row.isNullAt(row.fieldIndex("r_val")),
      "null attribute on the matched row must not backfill from an older row")
    // and colliding right column names are rejected up front
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right.withColumnRenamed("r_id", "probe_id"),
        "k", "t", rightCols = Seq("probe_id"), rightOrder = "probe_id")
    }
    // unmatched left rows get a fully-null right side
    val none = AsofJoin.asofJoin(
      Seq((2L, 1L, 101L)).toDF("k", "t", "probe_id"), right, "k", "t",
      rightCols = Seq("r_id", "r_val"), rightOrder = "r_id").collect().head
    assert(none.isNullAt(none.fieldIndex("r_id")))
    assert(left.select(col("k")).count() == 1)
  }

  test("q_topk_parts plans broadcast join + TakeOrderedAndProject, no global sort") {
    // r4 bench forensics (Bench.scala header): the driver-side 7.06s was
    // first-hit compilation + environment, not the plan. Pin the plan so
    // a future regression that IS plan-shaped (broadcast falling back to
    // SMJ, limit+sort losing the TakeOrdered rewrite) fails loudly here.
    val plan = SparkEntry.queries("q_topk_parts")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastHashJoin"),
      s"part dim must broadcast, not shuffle:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"top-k must never global-sort:\n$plan")
  }

  test("runtime bloom filter injects on the fact side of a selective shuffle join") {
    import org.apache.spark.sql.functions.col
    // The 100 TB lever this pins: a selective dim filter becomes a bloom
    // might_contain pre-filter on the FACT scan side, cutting shuffle
    // volume before the join. Thresholds are sized for production scans,
    // so the test lowers the application-side floor to let the tiny
    // fixture qualify; broadcast is disabled because the filter targets
    // shuffle joins.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val plan = Tables.lineitem(spark, dir)
        .join(Tables.part(spark, dir).filter(col("p_retailprice") > 1800.0),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_partkey")).count()
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on the fact scan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("stratified sample shuffles once on the stratum key") {
    val plan = SampleOps.stratifiedByLang(Tables.documents(spark, dir))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 stratum exchange:\n$plan")
  }

  test("iterative label propagation keeps O(1) plan depth via localCheckpoint (cache would double per round)") {
    // The exact loop body of DedupOps.clustersFromPairs (shared by
    // q_dedup_clusters / q_phash_clusters / entity resolution), iterated
    // a fixed 6 rounds over a tiny edge frame, measuring the label
    // frame's optimized-plan size per round under the two barrier
    // choices. cache() keeps the previous round's InMemoryRelation
    // inside the plan, and with `labels` referenced twice per round the
    // nested plan DOUBLES every round (AQE re-renders the description
    // per stage — round 8 burned ~200s of driver CPU in
    // generateTreeString on a 2s job). localCheckpoint truncates to a
    // flat LogicalRDD: the plan must be the SAME size every round.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("d1", "d2")
    val edges = pairs.union(pairs.select(col("d2").as("d1"), col("d1").as("d2")))
      .repartition(col("d1")).cache()
    def round(labels: DataFrame): DataFrame = {
      val nbr = edges.join(labels, edges("d2") === labels("doc_id"))
        .select(edges("d1").as("doc_id"), col("cluster_id"), lit(false).as("self"))
      labels.select(col("doc_id"), col("cluster_id"), lit(true).as("self"))
        .unionAll(nbr)
        .groupBy(col("doc_id"))
        .agg(min(col("cluster_id")).as("cluster_id"))
    }
    // Rendering-INDEPENDENT plan measure (ADVICE r10): count true tree
    // nodes, recursing through InMemoryRelation's cached physical plan —
    // that nesting is where cache() hides the previous round (the node
    // is a LEAF of the logical tree, so a naive optimizedPlan node count
    // would read as flat), and it is exactly what generateTreeString
    // re-renders per AQE stage. No dependence on plan-string formatting
    // or maxPlanStringLength.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
    def physNodes(sp: SparkPlan): Long = sp.map {
      // the cached plan is wrapped in its own AQE root whose inner plan
      // is a FIELD, not a child — recurse explicitly or see 1 node
      case a: AdaptiveSparkPlanExec => 1L + physNodes(a.inputPlan)
      case s: InMemoryTableScanExec => 1L + physNodes(s.relation.cachedPlan)
      case _ => 1L
    }.sum
    def planNodes(df: DataFrame): Long = df.queryExecution.optimizedPlan.map {
      case imr: InMemoryRelation => 1L + physNodes(imr.cachedPlan)
      case _ => 1L
    }.sum
    val round0 = edges.groupBy(col("d1"))
      .agg(min(col("d2")).as("nbr_min"))
      .select(col("d1").as("doc_id"), least(col("d1"), col("nbr_min")).as("cluster_id"))
    // localCheckpoint barrier: constant plan size across rounds
    var labels = round0.localCheckpoint()
    val sizes = (1 to 6).map { _ =>
      labels = round(labels).localCheckpoint()
      planNodes(labels.select(col("doc_id"), col("cluster_id")))
    }
    assert(sizes.distinct.size == 1 && sizes.head <= 3,
      s"checkpointed label plan must stay flat; got node counts $sizes")
    // cache barrier: same loop, plan grows strictly every round — the
    // failure mode the invariant guards against (red if someone swaps
    // the barrier back)
    var cached = round0.cache()
    val cachedSizes = (1 to 6).map { _ =>
      cached = round(cached).cache()
      planNodes(cached.select(col("doc_id"), col("cluster_id")))
    }
    // the TRUE tree grows strictly every round (the node count sees
    // through InMemoryRelation, so no rendering cap ever saturates it)
    assert(cachedSizes.sliding(2).forall { case Seq(a, b) => b > a },
      s"expected per-round plan growth under cache(): $cachedSizes")
    assert(cachedSizes.max > 20 * sizes.last,
      s"cache() plan should dwarf the checkpointed one: $cachedSizes vs $sizes")
    cached.unpersist()
    edges.unpersist()
  }
}
