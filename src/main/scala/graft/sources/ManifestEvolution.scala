package graft.sources

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** SCHEMA EVOLUTION beyond ADD COLUMN (r17): `ALTER TABLE RENAME
  * COLUMN` and `DROP COLUMN` as METADATA-ONLY commits — no data file is
  * ever rewritten. Committed files keep the column names they were
  * written with; the manifest carries an evolution LEDGER that maps
  * every historical name to its live one:
  *
  *   - `#rn:{"to":"new","from":"old"}` — a rename; readers resolve a
  *     requested live column against each file by walking its prior
  *     names (the Iceberg field-id trick, expressed as an explicit
  *     name-alias chain so the manifest stays inspectable);
  *   - `#dc:{"col":"name"}` — a drop; purely a schema shrink, but the
  *     name stays RESERVED (see below).
  *
  * NAME-REUSE GUARD (the resurrection hazard Iceberg solves with field
  * ids): a prior or dropped name may still exist physically inside
  * committed files, so re-introducing it as a live column would make
  * old files' stale cells read back as the NEW column's data. ADD and
  * RENAME therefore refuse any name in [[reservedNames]] until a
  * rewrite (compaction / full overwrite) has materialized every file
  * under live names — replace-shaped commits drop the ledger, clearing
  * the reservations (spec-pinned).
  *
  * SOUNDNESS INTERACTIONS:
  *   - per-file STATS and SEGMENT ENVELOPES were written under
  *     then-current names: every consumer remaps keys prior→current at
  *     parse ([[remapStats]]), so pruning, covering aggregates, blooms,
  *     partition purity and sort claims keep working across renames;
  *   - TOMBSTONE predicates written pre-rename reference prior names:
  *     remapped at parse ([[remapFilter]]) into the live space the
  *     readers evaluate in;
  *   - DROP refuses while a live tombstone references the column (the
  *     predicate could no longer be evaluated — compact first);
  *   - the COLUMNAR parquet path demotes to rows while any alias is
  *     live (per-file constant-vector wiring resolves by name);
  *     compaction restores it;
  *   - both STREAMING feeds (snapshot + CDF) refuse loudly when an
  *     evolution line lands inside a consumed range: their schemas were
  *     fixed at query start, so a restart (which re-resolves the live
  *     schema) is the only honest continuation.
  */
object ManifestEvolution {

  val RenamePrefix = "#rn:"
  val DropPrefix = "#dc:"

  def isLine(l: String): Boolean =
    l.startsWith(RenamePrefix) || l.startsWith(DropPrefix)

  def renameLine(from: String, to: String): String =
    RenamePrefix + ManifestMeta.encodeObject(Map("to" -> to, "from" -> from))

  def dropLine(col: String): String =
    DropPrefix + ManifestMeta.encodeObject(Map("col" -> col))

  /** prior name → live name, cumulative across the ledger in commit
    * order (a→b then b→c yields {a→c, b→c}).
    */
  def priorToCurrent(lines: Seq[String]): Map[String, String] =
    lines.foldLeft(Map.empty[String, String]) { (m, l) =>
      if (!l.startsWith(RenamePrefix)) m
      else {
        val o = ManifestMeta.parse(l.stripPrefix(RenamePrefix))
          .asInstanceOf[Map[String, Any]]
        val from = o("from").asInstanceOf[String]
        val to = o("to").asInstanceOf[String]
        m.view.mapValues(v => if (v == from) to else v).toMap + (from -> to)
      }
    }

  /** live name → its prior names (newest rename first is not guaranteed
    * nor needed: any committed file holds at most ONE name of a chain).
    */
  def currentToPriors(lines: Seq[String]): Map[String, Seq[String]] =
    priorToCurrent(lines).toSeq.groupBy(_._2)
      .view.mapValues(_.map(_._1)).toMap

  /** Names dropped by the ledger (still physically present in files). */
  def droppedCols(lines: Seq[String]): Set[String] =
    lines.iterator.filter(_.startsWith(DropPrefix)).map { l =>
      ManifestMeta.parse(l.stripPrefix(DropPrefix))
        .asInstanceOf[Map[String, Any]]("col").asInstanceOf[String]
    }.toSet

  /** Names that must not be (re)introduced while the ledger is live:
    * every prior name of a rename chain and every dropped name.
    */
  def reservedNames(lines: Seq[String]): Set[String] =
    priorToCurrent(lines).keySet ++ droppedCols(lines)

  /** Remap a stats/envelope map's column keys (and sort claims) from
    * the names they were written under to live names. Post-evolution
    * stats carry no prior keys (reuse is refused), so remapping is a
    * no-op on them by construction.
    */
  def remapStats(fs: ManifestMeta.FileStats,
      p2c: Map[String, String]): ManifestMeta.FileStats =
    if (p2c.isEmpty) fs
    else fs.copy(
      cols = fs.cols.map { case (k, v) => p2c.getOrElse(k, k) -> v },
      sorted = fs.sorted.map(c => p2c.getOrElse(c, c)),
      zorder = fs.zorder.map(c => p2c.getOrElse(c, c)))

  /** Rewrite a filter tree's attribute references prior→current. */
  def remapFilter(f: Filter, p2c: Map[String, String]): Filter = {
    if (p2c.isEmpty) return f
    def r(a: String): String = p2c.getOrElse(a, a)
    f match {
      case EqualTo(a, v) => EqualTo(r(a), v)
      case EqualNullSafe(a, v) => EqualNullSafe(r(a), v)
      case GreaterThan(a, v) => GreaterThan(r(a), v)
      case GreaterThanOrEqual(a, v) => GreaterThanOrEqual(r(a), v)
      case LessThan(a, v) => LessThan(r(a), v)
      case LessThanOrEqual(a, v) => LessThanOrEqual(r(a), v)
      case In(a, vs) => In(r(a), vs)
      case IsNull(a) => IsNull(r(a))
      case IsNotNull(a) => IsNotNull(r(a))
      case StringStartsWith(a, v) => StringStartsWith(r(a), v)
      case StringEndsWith(a, v) => StringEndsWith(r(a), v)
      case StringContains(a, v) => StringContains(r(a), v)
      case And(l, rr) => And(remapFilter(l, p2c), remapFilter(rr, p2c))
      case Or(l, rr) => Or(remapFilter(l, p2c), remapFilter(rr, p2c))
      case Not(c) => Not(remapFilter(c, p2c))
      case t: AlwaysTrue => t
      case fl: AlwaysFalse => fl
      case other => throw new IllegalArgumentException(
        s"cannot remap renamed columns inside filter $other")
    }
  }

  /** Accumulate the evolution ledger ACROSS a snapshot chain (r17
    * code-review): a compaction's replace commit legitimately clears
    * the live ledger, but retained pre-compaction snapshots still
    * reference files written under prior names — a change-feed replay
    * needs the union. Tails ascend by generation; lines keep their
    * first-seen order (each manifest carries its surviving predecessors
    * in order, so first-seen-append reconstructs the global publication
    * order). A cleared line reappearing verbatim is refused (a definite
    * name-reuse vintage clash).
    *
    * Also returns the RETIRED names of cleared lines — the rename
    * priors and dropped columns whose reservation a rewrite released. A
    * feed must refuse when such a name is a live output column again
    * (the catalog legally reintroduced it after the clear, so one
    * global name map cannot distinguish the two vintages a replay
    * spans): see the callers' ambiguity checks.
    */
  def accumulate(tailsAscending: Seq[Seq[String]]): Seq[String] =
    accumulateWithRetired(tailsAscending)._1

  def accumulateWithRetired(
      tailsAscending: Seq[Seq[String]]): (Seq[String], Set[String]) = {
    val acc = Seq.newBuilder[String]
    var known = Vector.empty[String]   // accumulated lines, in order
    var cleared = Set.empty[String]    // lines that vanished from a tail
    tailsAscending.foreach { tail =>
      val evo = tail.filter(isLine)
      val present = evo.toSet
      // lines that disappeared from this tail (a rewrite cleared them)
      cleared ++= known.filterNot(present.contains)
      // a cleared line reappearing verbatim is a name-reuse vintage clash
      if (evo.exists(cleared.contains))
        throw new IllegalStateException(
          "ambiguous evolution history: an evolution line reappeared " +
            "after a rewrite cleared it — start the feed after the " +
            "rewrite's generation")
      evo.foreach { l =>
        if (!known.contains(l)) {
          known :+= l
          acc += l
        }
      }
    }
    // names whose reservation the clears released: rename PRIORS and
    // dropped columns (a rename's TO-name is the same column continuing
    // — never retired by the clear itself)
    val retired = cleared.flatMap { l =>
      if (l.startsWith(RenamePrefix))
        Some(ManifestMeta.parse(l.stripPrefix(RenamePrefix))
          .asInstanceOf[Map[String, Any]]("from").asInstanceOf[String])
      else if (l.startsWith(DropPrefix))
        Some(ManifestMeta.parse(l.stripPrefix(DropPrefix))
          .asInstanceOf[Map[String, Any]]("col").asInstanceOf[String])
      else None
    }
    (acc.result(), retired)
  }

  /** Guard shared by ADD and RENAME targets. */
  def requireUnreserved(name: String, schema: StructType,
      lines: Seq[String]): Unit = {
    require(!schema.fieldNames.contains(name),
      s"column $name already exists")
    val reserved = reservedNames(lines)
    require(!reserved.contains(name),
      s"column name $name is reserved by a prior rename/drop — committed " +
        "files may still hold cells under it; compact the table (or " +
        "overwrite it) to materialize live names, then retry")
  }
}
