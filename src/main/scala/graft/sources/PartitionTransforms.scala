package graft.sources

import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** NON-IDENTITY PARTITION TRANSFORMS (r19, VERDICT r18 Next #5): the
  * Iceberg staples — the temporal family `years(ts)` / `months(ts)` /
  * `days(ts)` / `hours(ts)`, plus `bucket(n, col)` and
  * `truncate(w, col)` — as first-class partition specs next to
  * identity columns. A spec
  * renders canonically into the `partitionBy` table property (so the
  * `#ps:` evolution ledger carries transforms unchanged), the writer
  * rolls files on the TRANSFORMED key (transform-pure files by
  * construction, arrival-order-independent), and the read side
  * VERIFIES purity from each file's recorded min/max where the math
  * allows it:
  *
  *   - the temporal transforms and `truncate` are MONOTONIC —
  *     transform(min) == transform(max) proves every row in between
  *     shares the value, so purity stays verified-not-trusted exactly
  *     like identity;
  *   - `bucket` is hash-scattered — no order statistic can verify it,
  *     so bucket specs organize the WRITE (bounded files per task, one
  *     per bucket) and the writer RECORDS each file's bucket value as a
  *     `pv` stats claim (r19 SPJ) — the read side's
  *     KeyGroupedPartitioning stands on that recorded claim (the same
  *     trust tier as the `sorted` claim), falling back to the min==max
  *     degenerate case for files without one.
  *
  * Pruning needs nothing new: a day-pure file's ts-envelope sits
  * inside its day, so the ordinary zone maps prune day predicates to
  * the matching files on every spec vintage.
  *
  * The temporal transforms operate on epoch-MILLIS integral columns
  * (the engine's closed type system carries instants as BIGINT millis
  * throughout): `hours`/`days` floor-divide by a fixed width;
  * `months`/`years` count proleptic-Gregorian UTC calendar ordinals
  * since 1970 (Iceberg's rule — variable-width, so they go through
  * `LocalDate`, still monotonic in the instant). `truncate` on
  * integral columns floors to the bucket origin (Iceberg's rule,
  * exact for negatives) and on strings takes the leading `w` chars
  * (prefix truncation is monotonic in the same binary order the stats
  * record).
  */
object PartitionTransforms {

  val DayMillis: Long = 86400000L
  val HourMillis: Long = 3600000L

  /** Max bucket modulus: the task writer holds one open file per
    * bucket, so the spec must fit the writer's open-file cap — refused
    * at CREATE/ALTER, where the user can fix it, not mid-job in a task
    * (code-review r19).
    */
  val MaxBuckets: Int = 256

  sealed trait Spec {
    /** The schema column the transform reads. */
    def source: String
    /** Canonical rendering for the partitionBy property / #ps: ledger. */
    def render: String
    /** Transform value of a NON-NULL source cell (Long or String). */
    def eval(v: Any): Any
    /** Verified-from-stats purity: the single transform value a file
      * with bounds [min,max] provably holds, when the math can prove
      * it (monotonic transforms; min==max otherwise).
      */
    def pureValue(min: Any, max: Any): Option[Any]
    /** Does the column type support this transform? */
    def accepts(dt: DataType): Boolean
    def withSource(s: String): Spec
    /** Order-preserving in the source column's order? Monotonic
      * transforms roll files on a source-sorted stream (one file per
      * value) and verify purity from [min,max]; a non-monotonic one
      * (bucket) writes through a keyed-writer map instead — rolling on
      * a sorted stream would cut a new file at nearly every distinct
      * source value.
      */
    def monotonic: Boolean
  }

  case class Identity(source: String) extends Spec {
    def render: String = source
    def eval(v: Any): Any = v
    def pureValue(min: Any, max: Any): Option[Any] =
      if (min == max) Some(min) else None
    def accepts(dt: DataType): Boolean =
      dt == LongType || dt == IntegerType || dt == StringType ||
        dt == org.apache.spark.sql.types.DoubleType
    def withSource(s: String): Spec = copy(source = s)
    def monotonic: Boolean = true
  }

  case class Days(source: String) extends Spec {
    def render: String = s"days($source)"
    def eval(v: Any): Any = Math.floorDiv(asLong(v), DayMillis)
    def pureValue(min: Any, max: Any): Option[Any] = {
      val (a, b) = (eval(min), eval(max))
      if (a == b) Some(a) else None
    }
    def accepts(dt: DataType): Boolean = dt == LongType || dt == IntegerType
    def withSource(s: String): Spec = copy(source = s)
    def monotonic: Boolean = true
  }

  case class Hours(source: String) extends Spec {
    def render: String = s"hours($source)"
    def eval(v: Any): Any = Math.floorDiv(asLong(v), HourMillis)
    def pureValue(min: Any, max: Any): Option[Any] = {
      val (a, b) = (eval(min), eval(max))
      if (a == b) Some(a) else None
    }
    def accepts(dt: DataType): Boolean = dt == LongType || dt == IntegerType
    def withSource(s: String): Spec = copy(source = s)
    def monotonic: Boolean = true
  }

  /** Epoch-day of a non-null epoch-millis cell as a UTC calendar date —
    * the shared kernel under the variable-width calendar transforms.
    */
  private def utcDate(v: Any): java.time.LocalDate =
    java.time.LocalDate.ofEpochDay(Math.floorDiv(asLong(v), DayMillis))

  case class Months(source: String) extends Spec {
    def render: String = s"months($source)"
    def eval(v: Any): Any = {
      val d = utcDate(v)
      (d.getYear - 1970).toLong * 12L + (d.getMonthValue - 1).toLong
    }
    def pureValue(min: Any, max: Any): Option[Any] = {
      val (a, b) = (eval(min), eval(max))
      if (a == b) Some(a) else None
    }
    def accepts(dt: DataType): Boolean = dt == LongType || dt == IntegerType
    def withSource(s: String): Spec = copy(source = s)
    def monotonic: Boolean = true
  }

  case class Years(source: String) extends Spec {
    def render: String = s"years($source)"
    def eval(v: Any): Any = (utcDate(v).getYear - 1970).toLong
    def pureValue(min: Any, max: Any): Option[Any] = {
      val (a, b) = (eval(min), eval(max))
      if (a == b) Some(a) else None
    }
    def accepts(dt: DataType): Boolean = dt == LongType || dt == IntegerType
    def withSource(s: String): Spec = copy(source = s)
    def monotonic: Boolean = true
  }

  case class Truncate(width: Long, source: String) extends Spec {
    require(width > 0L, s"truncate width must be positive (got $width)")
    def render: String = s"truncate($width,$source)"
    def eval(v: Any): Any = v match {
      case s: String =>
        if (s.length <= width) s else s.substring(0, width.toInt)
      case u: UTF8String => eval(u.toString)
      case other =>
        val l = asLong(other)
        Math.floorDiv(l, width) * width
    }
    def pureValue(min: Any, max: Any): Option[Any] = {
      val (a, b) = (eval(min), eval(max))
      if (a == b) Some(a) else None
    }
    def accepts(dt: DataType): Boolean =
      dt == LongType || dt == IntegerType || dt == StringType
    def withSource(s: String): Spec = copy(source = s)
    def monotonic: Boolean = true
  }

  case class Bucket(n: Int, source: String) extends Spec {
    require(n > 0, s"bucket count must be positive (got $n)")
    def render: String = s"bucket($n,$source)"
    /** Hash through the SAME splitmix kernels the blooms/KMV use, so
      * one value hashes identically everywhere in the engine.
      */
    def eval(v: Any): Any = {
      val h = v match {
        case s: String => ManifestMeta.Bloom.hashBytes(
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        case u: UTF8String => ManifestMeta.Bloom.hashBytes(u.getBytes)
        case other => ManifestMeta.Bloom.hashLong(asLong(other))
      }
      java.lang.Long.remainderUnsigned(h, n.toLong)
    }
    /** Hash-scattered: order statistics can only prove purity for a
      * CONSTANT column — the general case rides the writer's recorded
      * `pv` claim instead (FileStats.pv, r19 SPJ).
      */
    def pureValue(min: Any, max: Any): Option[Any] =
      if (min == max) Some(eval(min)) else None
    def accepts(dt: DataType): Boolean =
      dt == LongType || dt == IntegerType || dt == StringType
    def withSource(s: String): Spec = copy(source = s)
    def monotonic: Boolean = false
  }

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case n: java.lang.Number => n.longValue()
    case other => throw new IllegalArgumentException(
      s"non-integral partition-transform input $other (${other.getClass})")
  }

  private val YearsRe = """^years\(\s*([^\s(),]+)\s*\)$""".r
  private val MonthsRe = """^months\(\s*([^\s(),]+)\s*\)$""".r
  private val DaysRe = """^days\(\s*([^\s(),]+)\s*\)$""".r
  private val HoursRe = """^hours\(\s*([^\s(),]+)\s*\)$""".r
  private val TruncRe = """^truncate\(\s*(\d+)\s*,\s*([^\s(),]+)\s*\)$""".r
  private val BucketRe = """^bucket\(\s*(\d+)\s*,\s*([^\s(),]+)\s*\)$""".r

  /** Parse one canonical spec string; a bare name is identity. */
  def parse(s: String): Spec = s.trim match {
    case YearsRe(c) => Years(c)
    case MonthsRe(c) => Months(c)
    case DaysRe(c) => Days(c)
    case HoursRe(c) => Hours(c)
    case TruncRe(w, c) => Truncate(w.toLong, c)
    case BucketRe(n, c) => Bucket(n.toInt, c)
    case bare if bare.nonEmpty && !bare.contains("(") => Identity(bare)
    case other => throw new IllegalArgumentException(
      s"unparseable partition spec '$other' — supported: col, years(col), " +
        "months(col), days(col), hours(col), truncate(w,col), bucket(n,col)")
  }

  /** Split a comma-joined spec list WITHOUT breaking inside transform
    * parens — `days(ts),bucket(8,id)` is two specs, not three.
    */
  def splitSpecs(csv: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new java.lang.StringBuilder
    var depth = 0
    csv.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 =>
        if (cur.toString.trim.nonEmpty) out += cur.toString.trim
        cur.setLength(0)
      case c => cur.append(c)
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }

  def parseList(csv: String): Seq[Spec] = splitSpecs(csv).map(parse)

  /** Validate a spec list against a schema: sources exist and the
    * column types support the transform. Returns the canonical
    * renderings (what the table property should store).
    */
  def validate(specs: Seq[Spec], schema: StructType): Seq[String] = {
    specs.map { t =>
      val f = schema.fields.find(_.name == t.source).getOrElse(
        throw new IllegalArgumentException(
          s"partition spec ${t.render} references missing column " +
            s"${t.source} — schema: ${schema.fieldNames.mkString(",")}"))
      require(t.accepts(f.dataType),
        s"partition spec ${t.render} does not support column type " +
          s"${f.dataType} (years/months/days/hours want integral epoch " +
          "millis; truncate/bucket want integral or string)")
      t match {
        case Bucket(n, _) => require(n <= MaxBuckets,
          s"bucket modulus $n exceeds the writer's $MaxBuckets-open-file " +
            "cap — use a smaller modulus")
        case _ => ()
      }
      t.render
    }
  }

  /** The transform as a Catalyst Column over its source — what the
    * partial rewrite pre-clusters by (repartition on the transform
    * value puts each partition value in ONE task). MONOTONIC transforms
    * only: bucket's splitmix hash has no builtin Column form (and
    * bucket tables refuse the per-partition rewrite anyway). The
    * integral arms spell out floorDiv (`div` truncates toward zero;
    * negatives must floor) so the Column agrees with [[Spec.eval]]
    * bit-for-bit.
    */
  def column(t: Spec, schema: StructType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr}
    def floorDivExpr(c: String, d: Long): String =
      s"CAST(CASE WHEN `$c` >= 0 OR `$c` % ${d}L = 0 THEN `$c` div ${d}L " +
        s"ELSE (`$c` div ${d}L) - 1 END AS BIGINT)"
    // the calendar transforms go through DATE functions (tz-free on
    // DateType, proleptic Gregorian — same arithmetic as LocalDate in
    // Spec.eval); epoch-day always fits date_from_unix_date's INT
    def dateExpr(c: String): String =
      s"date_from_unix_date(CAST(${floorDivExpr(c, DayMillis)} AS INT))"
    t match {
      case Identity(c) => col(c)
      case Days(c) => expr(floorDivExpr(c, DayMillis))
      case Hours(c) => expr(floorDivExpr(c, HourMillis))
      case Months(c) => expr(
        s"CAST((year(${dateExpr(c)}) - 1970) * 12 " +
          s"+ month(${dateExpr(c)}) - 1 AS BIGINT)")
      case Years(c) => expr(s"CAST(year(${dateExpr(c)}) - 1970 AS BIGINT)")
      case Truncate(w, c) if schema(c).dataType == StringType =>
        expr(s"substring(`$c`, 1, $w)")
      case Truncate(w, c) => expr(s"(${floorDivExpr(c, w)}) * ${w}L")
      case b: Bucket => throw new IllegalArgumentException(
        s"${b.render} has no Column form — bucket values come from the " +
          "engine's splitmix hash, which only the task writer evaluates")
    }
  }

  /** The spec as a Spark V2 transform expression — what the scan's
    * KeyGroupedPartitioning reports and what a catalog-owned write's
    * required distribution clusters by (r19 SPJ; both resolve through
    * [[TransformFunctions]] via the owning catalog). Caveat: Spark
    * 4.1's `toCatalystTransformOpt` resolves literal-bearing named
    * transforms only for `bucket` (the special-cased arm) — a
    * `truncate(w, col)` report is correct but degrades to
    * UnknownPartitioning at plan time (pinned in SpjTransformSpec).
    */
  def v2Expression(t: Spec):
      org.apache.spark.sql.connector.expressions.Expression = {
    import org.apache.spark.sql.connector.expressions.Expressions
    t match {
      case Identity(c) => Expressions.identity(c)
      case Years(c) => Expressions.years(c)
      case Months(c) => Expressions.months(c)
      case Days(c) => Expressions.days(c)
      case Hours(c) => Expressions.hours(c)
      case Bucket(n, c) => Expressions.bucket(n, c)
      case Truncate(w, c) => Expressions.apply("truncate",
        Expressions.literal(java.lang.Integer.valueOf(w.toInt)),
        Expressions.column(c))
    }
  }

  /** Verified purity of a file on EVERY spec: the transform-value
    * tuple, from recorded (min, max, nulls) per source column — None
    * when any spec can't be proven single-valued.
    */
  def pureTuple(specs: Seq[Spec],
      colStats: String => Option[ManifestMeta.ColStats]): Option[Seq[Any]] = {
    val vs = specs.map { t =>
      colStats(t.source).flatMap { cs =>
        for {
          mn <- cs.min; mx <- cs.max
          if cs.nulls == 0L
          v <- t.pureValue(mn, mx)
        } yield v
      }
    }
    if (vs.forall(_.isDefined)) Some(vs.map(_.get)) else None
  }
}
