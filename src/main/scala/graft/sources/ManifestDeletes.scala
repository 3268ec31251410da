package graft.sources

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MERGE-ON-READ DELETES (VERDICT r15 Next #5): a DELETE can publish a
  * PREDICATE TOMBSTONE — a `#d:` manifest-list ledger line naming the
  * candidate files it applies to plus the serialized predicate —
  * instead of rewriting data files. The write cost is O(predicate)
  * bytes (one manifest line), not O(files touched); the read side
  * filters tombstoned files row-level with SQL DELETE semantics (a row
  * survives unless the predicate is TRUE — UNKNOWN keeps), and
  * compaction folds tombstones into a clean rewrite. This is the
  * lazy-materialization half of the Iceberg v2 MoR shape, expressed as
  * predicates rather than position files so the tombstone stays
  * human-inspectable and needs no read-back of row ordinals at delete
  * time.
  *
  * SCOPING RULE: a tombstone lists the files committed (and stats-
  * overlapping) at delete time — rows appended LATER are never
  * affected, which is what makes `DELETE; INSERT same-key` behave like
  * every other lake.
  *
  * SOUNDNESS INTERACTIONS (each enforced at its site):
  *   - metadata-only aggregates, LIMIT file-prefix truncation, and
  *     exact numRows REFUSE while any tombstone applies (stats
  *     overcount tombstoned rows);
  *   - stats SKIPPING and EXACT filter pushdown stay sound (removing
  *     rows from a file can't widen its value range);
  *   - partition purity / sort-order claims survive (filtering a pure
  *     sorted file keeps it pure and sorted);
  *   - the streaming snapshot feed treats a new tombstone as a
  *     NON-APPEND change and refuses loudly;
  *   - copy-on-write rewrites (DELETE/MERGE/compaction) APPLY standing
  *     tombstones when they read, and a replace commit prunes replaced
  *     names from tombstone file lists (dropping emptied tombstones).
  */
object ManifestDeletes {

  val Prefix = "#d:"

  /** One published tombstone: the predicate applies to exactly `files`. */
  case class Tombstone(files: Set[String], filter: Filter)

  def isDeleteLine(l: String): Boolean = l.startsWith(Prefix)

  def line(t: Tombstone): String =
    Prefix + ManifestMeta.encodeObject(Map(
      "files" -> t.files.toSeq.sorted.mkString(","),
      "filter" -> filterToJson(t.filter)))

  /** Tolerant parse: a damaged tombstone line must FAIL THE READ loudly
    * rather than silently resurrect deleted rows — unlike stats (an
    * optimization), a tombstone is semantics. Returns None only for
    * non-`#d:` lines.
    */
  def parseLine(l: String): Option[Tombstone] =
    if (!isDeleteLine(l)) None
    else {
      val m = ManifestMeta.parse(l.stripPrefix(Prefix)).asInstanceOf[Map[String, Any]]
      Some(Tombstone(
        m("files").asInstanceOf[String].split(",").iterator
          .filter(_.nonEmpty).toSet,
        filterFromJson(m("filter").asInstanceOf[Map[String, Any]])))
    }

  /** All tombstones of a resolved manifest line list. */
  def of(lines: Seq[String]): Seq[Tombstone] = lines.flatMap(parseLine)

  /** Per-file applicable delete predicates for the given file names. */
  def byFile(tombstones: Seq[Tombstone],
      names: Seq[String]): Map[String, Seq[Filter]] =
    if (tombstones.isEmpty) Map.empty
    else names.iterator.map { n =>
      n -> tombstones.filter(_.files.contains(n)).map(_.filter)
    }.filter(_._2.nonEmpty).toMap

  // ---------------------------------------------------------------
  // filter ser/de — the same closed subset deleteWhere translates
  // ---------------------------------------------------------------

  def filterToJson(f: Filter): Map[String, Any] = f match {
    case EqualTo(a, v) => Map("op" -> "eq", "col" -> a, "val" -> jsonVal(v))
    case EqualNullSafe(a, v) => Map("op" -> "eqns", "col" -> a, "val" -> jsonVal(v))
    case GreaterThan(a, v) => Map("op" -> "gt", "col" -> a, "val" -> jsonVal(v))
    case GreaterThanOrEqual(a, v) => Map("op" -> "ge", "col" -> a, "val" -> jsonVal(v))
    case LessThan(a, v) => Map("op" -> "lt", "col" -> a, "val" -> jsonVal(v))
    case LessThanOrEqual(a, v) => Map("op" -> "le", "col" -> a, "val" -> jsonVal(v))
    case In(a, vs) => Map("op" -> "in", "col" -> a,
      "vals" -> vs.toSeq.map(jsonVal))
    case IsNull(a) => Map("op" -> "isnull", "col" -> a)
    case IsNotNull(a) => Map("op" -> "notnull", "col" -> a)
    case StringStartsWith(a, v) => Map("op" -> "startswith", "col" -> a, "val" -> v)
    case And(l, r) => Map("op" -> "and", "l" -> filterToJson(l), "r" -> filterToJson(r))
    case Or(l, r) => Map("op" -> "or", "l" -> filterToJson(l), "r" -> filterToJson(r))
    case Not(c) => Map("op" -> "not", "c" -> filterToJson(c))
    case _: AlwaysTrue => Map("op" -> "true")
    case _: AlwaysFalse => Map("op" -> "false")
    case other => throw new IllegalArgumentException(
      s"unsupported tombstone filter $other")
  }

  private def jsonVal(v: Any): Any = v match {
    case null => null
    case i: java.lang.Integer => i.longValue() // closed grammar: Long
    case l: java.lang.Long => l
    case d: java.lang.Double => finiteOrRefuse(d.doubleValue())
    case f: java.lang.Float => finiteOrRefuse(f.doubleValue())
    case s: String => s
    case u: UTF8String => u.toString
    case other => throw new IllegalArgumentException(
      s"unsupported tombstone literal $other (${other.getClass})")
  }

  /** A non-finite double literal would serialize as a bare `Infinity`/
    * `NaN` token the closed JSON grammar cannot parse back — the
    * published tombstone would then fail EVERY subsequent read of the
    * table, including compact(), the repair path (code-review r16).
    * Refuse BEFORE publishing — the user can rerun the DELETE on a
    * copy-on-write table (or with a finite bound) instead.
    */
  private def finiteOrRefuse(d: Double): Double = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
      throw new IllegalArgumentException(
        s"non-finite double literal $d cannot be recorded in a MoR " +
          "tombstone — use a finite bound or a copy-on-write DELETE")
    d
  }

  def filterFromJson(m: Map[String, Any]): Filter = {
    def col = m("col").asInstanceOf[String]
    def v = m.getOrElse("val", null)
    m("op").asInstanceOf[String] match {
      case "eq" => EqualTo(col, v)
      case "eqns" => EqualNullSafe(col, v)
      case "gt" => GreaterThan(col, v)
      case "ge" => GreaterThanOrEqual(col, v)
      case "lt" => LessThan(col, v)
      case "le" => LessThanOrEqual(col, v)
      case "in" => In(col, m("vals").asInstanceOf[Seq[Any]].toArray)
      case "isnull" => IsNull(col)
      case "notnull" => IsNotNull(col)
      case "startswith" => StringStartsWith(col, m("val").asInstanceOf[String])
      case "and" => And(filterFromJson(m("l").asInstanceOf[Map[String, Any]]),
        filterFromJson(m("r").asInstanceOf[Map[String, Any]]))
      case "or" => Or(filterFromJson(m("l").asInstanceOf[Map[String, Any]]),
        filterFromJson(m("r").asInstanceOf[Map[String, Any]]))
      case "not" => Not(filterFromJson(m("c").asInstanceOf[Map[String, Any]]))
      case "true" => AlwaysTrue()
      case "false" => AlwaysFalse()
      case other => throw new IllegalArgumentException(s"unknown tombstone op $other")
    }
  }

  // ---------------------------------------------------------------
  // row-level evaluation (SQL three-valued logic)
  // ---------------------------------------------------------------

  /** Does the row SURVIVE the delete predicates? SQL DELETE removes
    * rows where the predicate is TRUE; FALSE and UNKNOWN keep. `get`
    * resolves a column to its value (null for SQL NULL; strings may be
    * String or UTF8String).
    */
  def survives(deletes: Seq[Filter], get: String => Any,
      types: Map[String, DataType]): Boolean =
    !deletes.exists(f => java.lang.Boolean.TRUE.equals(eval(f, get, types)))

  /** 3VL evaluation: TRUE / FALSE / null (UNKNOWN). */
  def eval(f: Filter, get: String => Any,
      types: Map[String, DataType]): java.lang.Boolean = {
    def cmpTo(a: String, v: Any): Option[Int] = {
      val x = get(a)
      if (x == null || v == null) None
      else Some(cmp(types(a), x, v))
    }
    def b(v: Boolean): java.lang.Boolean = java.lang.Boolean.valueOf(v)
    f match {
      case EqualTo(a, v) => cmpTo(a, v).map(c => b(c == 0)).orNull
      case EqualNullSafe(a, v) =>
        val x = get(a)
        if (x == null || v == null) b(x == null && v == null)
        else b(cmp(types(a), x, v) == 0)
      case GreaterThan(a, v) => cmpTo(a, v).map(c => b(c > 0)).orNull
      case GreaterThanOrEqual(a, v) => cmpTo(a, v).map(c => b(c >= 0)).orNull
      case LessThan(a, v) => cmpTo(a, v).map(c => b(c < 0)).orNull
      case LessThanOrEqual(a, v) => cmpTo(a, v).map(c => b(c <= 0)).orNull
      case In(a, vs) =>
        val x = get(a)
        if (x == null) null
        else if (vs.exists(v => v != null && cmp(types(a), x, v) == 0)) b(true)
        else if (vs.contains(null)) null
        else b(false)
      case IsNull(a) => b(get(a) == null)
      case IsNotNull(a) => b(get(a) != null)
      case StringStartsWith(a, v) =>
        val x = get(a)
        if (x == null) null else b(x.toString.startsWith(v))
      case And(l, r) =>
        val lv = eval(l, get, types); val rv = eval(r, get, types)
        if (java.lang.Boolean.FALSE.equals(lv) ||
            java.lang.Boolean.FALSE.equals(rv)) b(false)
        else if (lv == null || rv == null) null
        else b(true)
      case Or(l, r) =>
        val lv = eval(l, get, types); val rv = eval(r, get, types)
        if (java.lang.Boolean.TRUE.equals(lv) ||
            java.lang.Boolean.TRUE.equals(rv)) b(true)
        else if (lv == null || rv == null) null
        else b(false)
      case Not(c) =>
        val v = eval(c, get, types)
        if (v == null) null else b(!v.booleanValue())
      case _: AlwaysTrue => b(true)
      case _: AlwaysFalse => b(false)
      case other => throw new IllegalArgumentException(
        s"unevaluable tombstone filter $other")
    }
  }

  /** Spark-semantics typed comparison over reader-shaped values
    * (Long/Int boxed numerics, Double, String or UTF8String).
    */
  private def cmp(dt: DataType, a: Any, b: Any): Int = dt match {
    case LongType | IntegerType =>
      java.lang.Long.compare(asLong(a), asLong(b))
    case DoubleType => java.lang.Double.compare(
      a.asInstanceOf[Number].doubleValue(), b.asInstanceOf[Number].doubleValue())
    case StringType =>
      utf8(a).compareTo(utf8(b))
    case other => throw new IllegalArgumentException(s"uncomparable $other")
  }
  private def asLong(v: Any): Long = v.asInstanceOf[Number].longValue()
  private def utf8(v: Any): UTF8String = v match {
    case u: UTF8String => u
    case s => UTF8String.fromString(s.toString)
  }

  /** Column names a predicate reads — what the parquet reader must add
    * to its projection to evaluate the tombstone.
    */
  def referencedCols(deletes: Seq[Filter]): Set[String] =
    deletes.iterator.flatMap(_.references).toSet
}
