package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestSink

/** STORAGE-PARTITIONED JOINS OVER NON-IDENTITY TRANSFORMS (r19): two
  * tables `PARTITIONED BY (bucket(n, k))` (or `days(ts)`) join on the
  * RAW key with ZERO exchange — the Iceberg SPJ shape, without
  * materializing a bucket column. The scan reports
  * `KeyGroupedPartitioning(bucket(n,k), ...)`, the catalog's
  * FunctionCatalog face resolves the transform function, and per-file
  * partition keys come from VERIFIED stats (monotonic transforms) or
  * the task writer's recorded `pv` claim (bucket — a hash admits no
  * order proof). Pinned here:
  *   - bucket-bucket join on the source key: zero exchange, results
  *     exact, both sides' transforms resolve to one function;
  *   - days-days join: zero exchange with purity VERIFIED from
  *     [min,max] (no recorded claim needed);
  *   - honesty: a file without a provable transform value (written
  *     under no spec) degrades the scan to UnknownPartitioning — the
  *     join plans exchanges and stays CORRECT;
  *   - the recorded `pv` claim round-trips through the stats line,
  *     keyed by the exact spec rendering, and agrees with the hash.
  */
class SpjTransformSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    s
  }

  import SparkTestBase.collectInPlan

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_spj_transform_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  private def withBucketing[T](body: => T): T = {
    val c = spark.conf
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.requireAllClusterKeysForCoPartition",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> c.getOption(k)).toMap
    try {
      c.set("spark.sql.sources.v2.bucketing.enabled", "true")
      c.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      c.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }

  private def exchanges(df: org.apache.spark.sql.DataFrame) =
    collectInPlan(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }

  test("bucket(8,k) tables join on the raw key with zero exchange") {
    import spark.implicits._
    withBucketing {
      val r1 = freshRoot("bk_a")
      val r2 = freshRoot("bk_b")
      spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spjt_a")
      spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spjt_b")
      spark.sql("CREATE TABLE graft_cat.lake.spjt_a (k BIGINT, x BIGINT) " +
        "USING graft PARTITIONED BY (bucket(8, k)) " +
        s"OPTIONS (path '$r1', format 'parquet')")
      spark.sql("CREATE TABLE graft_cat.lake.spjt_b (k BIGINT, tag STRING) " +
        "USING graft PARTITIONED BY (bucket(8, k)) " +
        s"OPTIONS (path '$r2', format 'parquet')")
      (0L until 400L).map(i => (i, i * 3)).toDF("k", "x")
        .createOrReplaceTempView("spjt_src_a")
      (0L until 300L).map(i => (i, s"t${i % 7}")).toDF("k", "tag")
        .createOrReplaceTempView("spjt_src_b")
      spark.sql("INSERT INTO graft_cat.lake.spjt_a SELECT * FROM spjt_src_a")
      spark.sql("INSERT INTO graft_cat.lake.spjt_b SELECT * FROM spjt_src_b")
      val joined = spark.sql(
        """SELECT a.k, a.x, b.tag
          |FROM graft_cat.lake.spjt_a a
          |JOIN graft_cat.lake.spjt_b b ON a.k = b.k""".stripMargin)
      val rows = joined.collect()
      assert(rows.length == 300)
      assert(rows.map(_.getLong(0)).toSet == (0L until 300L).toSet)
      assert(rows.forall(r => r.getString(2) == s"t${r.getLong(0) % 7}"))
      assert(exchanges(joined).isEmpty,
        s"bucket-transform SPJ must plan with zero exchange:\n" +
          joined.queryExecution.executedPlan)
    }
  }

  test("days(ts) tables join on the raw day key with zero exchange — " +
      "purity verified from bounds, no recorded claim") {
    import spark.implicits._
    val day = graft.sources.PartitionTransforms.DayMillis
    withBucketing {
      val r1 = freshRoot("dy_a")
      val r2 = freshRoot("dy_b")
      spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spjt_da")
      spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spjt_db")
      spark.sql("CREATE TABLE graft_cat.lake.spjt_da (ts BIGINT, x BIGINT) " +
        "USING graft PARTITIONED BY (days(ts)) " +
        s"OPTIONS (path '$r1', format 'parquet')")
      spark.sql("CREATE TABLE graft_cat.lake.spjt_db (ts BIGINT, tag STRING) " +
        "USING graft PARTITIONED BY (days(ts)) " +
        s"OPTIONS (path '$r2', format 'parquet')")
      // identical instants on both sides: 6 days x 40 rows
      (0L until 240L).map(i => (i * (day / 40L), i)).toDF("ts", "x")
        .createOrReplaceTempView("spjt_src_da")
      (0L until 240L).map(i => (i * (day / 40L), s"d${i % 5}")).toDF("ts", "tag")
        .createOrReplaceTempView("spjt_src_db")
      spark.sql("INSERT INTO graft_cat.lake.spjt_da SELECT * FROM spjt_src_da")
      spark.sql("INSERT INTO graft_cat.lake.spjt_db SELECT * FROM spjt_src_db")
      val joined = spark.sql(
        """SELECT a.ts, a.x, b.tag
          |FROM graft_cat.lake.spjt_da a
          |JOIN graft_cat.lake.spjt_db b ON a.ts = b.ts""".stripMargin)
      val rows = joined.collect()
      assert(rows.length == 240)
      assert(exchanges(joined).isEmpty,
        s"days-transform SPJ must plan with zero exchange:\n" +
          joined.queryExecution.executedPlan)
    }
  }

  test("hours(ts) tables join on the raw instant with zero exchange — " +
      "the temporal family resolves through the same catalog arm as days") {
    import spark.implicits._
    val hour = graft.sources.PartitionTransforms.HourMillis
    withBucketing {
      val r1 = freshRoot("hr_a")
      val r2 = freshRoot("hr_b")
      spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spjt_ha")
      spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spjt_hb")
      spark.sql("CREATE TABLE graft_cat.lake.spjt_ha (ts BIGINT, x BIGINT) " +
        "USING graft PARTITIONED BY (hours(ts)) " +
        s"OPTIONS (path '$r1', format 'parquet')")
      spark.sql("CREATE TABLE graft_cat.lake.spjt_hb (ts BIGINT, tag STRING) " +
        "USING graft PARTITIONED BY (hours(ts)) " +
        s"OPTIONS (path '$r2', format 'parquet')")
      // identical instants on both sides: 6 hours x 40 rows
      (0L until 240L).map(i => (i * (hour / 40L), i)).toDF("ts", "x")
        .createOrReplaceTempView("spjt_src_ha")
      (0L until 240L).map(i => (i * (hour / 40L), s"h${i % 5}")).toDF("ts", "tag")
        .createOrReplaceTempView("spjt_src_hb")
      spark.sql("INSERT INTO graft_cat.lake.spjt_ha SELECT * FROM spjt_src_ha")
      spark.sql("INSERT INTO graft_cat.lake.spjt_hb SELECT * FROM spjt_src_hb")
      val joined = spark.sql(
        """SELECT a.ts, a.x, b.tag
          |FROM graft_cat.lake.spjt_ha a
          |JOIN graft_cat.lake.spjt_hb b ON a.ts = b.ts""".stripMargin)
      val rows = joined.collect()
      assert(rows.length == 240)
      assert(exchanges(joined).isEmpty,
        s"hours-transform SPJ must plan with zero exchange:\n" +
          joined.queryExecution.executedPlan)
    }
  }

  test("truncate(100,k) tables: the claim is reported but Spark 4.1 " +
      "cannot resolve literal-arg named transforms — the join exchanges " +
      "and stays correct (documented limitation)") {
    import spark.implicits._
    withBucketing {
      val r1 = freshRoot("tr_a")
      val r2 = freshRoot("tr_b")
      spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spjt_ta")
      spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spjt_tb")
      spark.sql("CREATE TABLE graft_cat.lake.spjt_ta (k BIGINT, x BIGINT) " +
        "USING graft PARTITIONED BY (truncate(100, k)) " +
        s"OPTIONS (path '$r1', format 'parquet')")
      spark.sql("CREATE TABLE graft_cat.lake.spjt_tb (k BIGINT, tag STRING) " +
        "USING graft PARTITIONED BY (truncate(100, k)) " +
        s"OPTIONS (path '$r2', format 'parquet')")
      (0L until 400L).map(i => (i, i * 3)).toDF("k", "x")
        .createOrReplaceTempView("spjt_src_ta")
      (0L until 300L).map(i => (i, s"t${i % 7}")).toDF("k", "tag")
        .createOrReplaceTempView("spjt_src_tb")
      spark.sql("INSERT INTO graft_cat.lake.spjt_ta SELECT * FROM spjt_src_ta")
      spark.sql("INSERT INTO graft_cat.lake.spjt_tb SELECT * FROM spjt_src_tb")
      // transform-clustered write still bounds the file count (4 groups)
      assert(ManifestSink.committedFiles(r1).length == 4)
      // SPARK LIMITATION (V2ExpressionUtils.toCatalystTransformOpt): the
      // general NamedTransform arm resolves FIELD-REFERENCE args only —
      // bucket is the one special-cased literal-bearing transform. A
      // truncate(w, col) report therefore degrades to an exchanged join;
      // results stay exact. If a later Spark resolves it, this pin
      // flips and the zero-exchange assert moves here.
      val joined = spark.sql(
        """SELECT a.k, a.x, b.tag
          |FROM graft_cat.lake.spjt_ta a
          |JOIN graft_cat.lake.spjt_tb b ON a.k = b.k""".stripMargin)
      assert(joined.collect().length == 300)
    }
  }

  test("a file without a provable transform value degrades the claim " +
      "to UnknownPartitioning — the join exchanges and stays correct") {
    import spark.implicits._
    withBucketing {
      val r1 = freshRoot("deg_a")
      val r2 = freshRoot("deg_b")
      spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spjt_ga")
      spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spjt_gb")
      spark.sql("CREATE TABLE graft_cat.lake.spjt_ga (k BIGINT, x BIGINT) " +
        "USING graft PARTITIONED BY (bucket(8, k)) " +
        s"OPTIONS (path '$r1', format 'parquet')")
      spark.sql("CREATE TABLE graft_cat.lake.spjt_gb (k BIGINT, tag STRING) " +
        "USING graft PARTITIONED BY (bucket(8, k)) " +
        s"OPTIONS (path '$r2', format 'parquet')")
      (0L until 100L).map(i => (i, i)).toDF("k", "x")
        .createOrReplaceTempView("spjt_src_ga")
      (0L until 100L).map(i => (i, "t")).toDF("k", "tag")
        .createOrReplaceTempView("spjt_src_gb")
      spark.sql("INSERT INTO graft_cat.lake.spjt_ga SELECT * FROM spjt_src_ga")
      spark.sql("INSERT INTO graft_cat.lake.spjt_gb SELECT * FROM spjt_src_gb")
      // side a gains a file with NO spec routing (path-based append
      // without partitionBy): multi-key, no pv claim — the claim drops
      (100L until 140L).map(i => (i, i)).toDF("k", "x").coalesce(1)
        .write.format("graft.sources.ManifestSink")
        .mode("append").option("path", r1).option("format", "parquet").save()
      val joined = spark.sql(
        """SELECT a.k, b.tag
          |FROM graft_cat.lake.spjt_ga a
          |JOIN graft_cat.lake.spjt_gb b ON a.k = b.k""".stripMargin)
      val rows = joined.collect()
      assert(rows.length == 100, "degraded claim must not lose rows")
      assert(exchanges(joined).nonEmpty,
        "an unprovable file must demote the SPJ to an exchanged join — " +
          "a silently kept claim would be a correctness hole")
    }
  }

  test("a catalog-owned append clusters by the TRANSFORM: file count is " +
      "bounded by the bucket modulus, not tasks x buckets") {
    import spark.implicits._
    val r1 = freshRoot("dist_b")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spjt_dist")
    spark.sql("CREATE TABLE graft_cat.lake.spjt_dist (k BIGINT, x BIGINT) " +
      "USING graft PARTITIONED BY (bucket(16, k)) " +
      s"OPTIONS (path '$r1', format 'parquet')")
    // many source partitions: without transform-clustered distribution
    // each write task would stage its own file per bucket it sees
    (0L until 2000L).map(i => (i, i)).toDF("k", "x").repartition(8)
      .createOrReplaceTempView("spjt_src_dist")
    spark.sql("INSERT INTO graft_cat.lake.spjt_dist SELECT * FROM spjt_src_dist")
    val files = ManifestSink.committedFiles(r1)
    assert(files.length == 16,
      s"one file per present bucket value expected, got ${files.length}")
    // the distribution pre-arranged whole buckets per task, so every
    // file still carries its recorded pv claim and purity holds
    val stats = ManifestSink.fileStats(r1)
    assert(stats.values.forall(_.pv.contains("bucket(16,k)")))
    assert(spark.sql("SELECT count(*) FROM graft_cat.lake.spjt_dist")
      .head().getLong(0) == 2000L)
    // days tables get the same treatment: 5 days -> 5 files
    val r2 = freshRoot("dist_d")
    val day = graft.sources.PartitionTransforms.DayMillis
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spjt_distd")
    spark.sql("CREATE TABLE graft_cat.lake.spjt_distd (ts BIGINT, x BIGINT) " +
      "USING graft PARTITIONED BY (days(ts)) " +
      s"OPTIONS (path '$r2', format 'parquet')")
    (0L until 500L).map(i => (i * day / 100L, i)).toDF("ts", "x").repartition(8)
      .createOrReplaceTempView("spjt_src_distd")
    spark.sql("INSERT INTO graft_cat.lake.spjt_distd SELECT * FROM spjt_src_distd")
    assert(ManifestSink.committedFiles(r2).length == 5,
      "one file per present day expected")
  }

  test("the recorded bucket claim round-trips through the stats line " +
      "and is keyed by the exact spec rendering") {
    import spark.implicits._
    val r1 = freshRoot("pv_rt")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spjt_pv")
    spark.sql("CREATE TABLE graft_cat.lake.spjt_pv (k BIGINT, x BIGINT) " +
      "USING graft PARTITIONED BY (bucket(4, k)) " +
      s"OPTIONS (path '$r1', format 'parquet')")
    (0L until 64L).map(i => (i, i)).toDF("k", "x")
      .createOrReplaceTempView("spjt_src_pv")
    spark.sql("INSERT INTO graft_cat.lake.spjt_pv SELECT * FROM spjt_src_pv")
    val stats = ManifestSink.fileStats(r1)
    assert(stats.nonEmpty)
    val spec = graft.sources.PartitionTransforms.Bucket(4, "k")
    stats.foreach { case (name, fs) =>
      val claim = fs.pv.get("bucket(4,k)")
      assert(claim.isDefined, s"file $name lacks the bucket pv claim: ${fs.pv}")
      // the claim must agree with the hash of every key the file's
      // bloom-free stats can bound: spot-check via min/max membership
      val v = claim.get.asInstanceOf[Long]
      assert(v >= 0L && v < 4L, s"bucket value out of range: $v")
      val mn = fs.cols("k").min.get.asInstanceOf[Long]
      assert(spec.eval(mn) == v,
        s"file $name claims bucket $v but min key $mn hashes to ${spec.eval(mn)}")
    }
  }
}
