package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A v2 `TableCatalog` over the engine's two connectors — the TABLE
  * half of the catalog tier next to [[graft.functions.GraftFunctionCatalog]]:
  * register once (`spark.sql.catalog.graft_cat = graft.sources.GraftCatalog`)
  * and plain SQL reaches both connectors through standard identifier
  * resolution, DDL included:
  *
  *   - namespace `synth`: VIRTUAL tables addressed by their generator
  *     spec — `graft_cat.synth.r60000_s32` is the 60000-row 32-slice
  *     synthetic table, `r60000_b2000` its bucket-aligned variant. No
  *     state: the identifier IS the table definition, so every SQL
  *     consumer gets the full pushdown/partitioning surface of
  *     [[SynthTable]] with zero setup.
  *   - namespace `lake`: manifest tables created by SQL DDL
  *     (`CREATE TABLE graft_cat.lake.t (...) OPTIONS (path '...')`),
  *     then written by `INSERT INTO` (append) / `INSERT OVERWRITE`
  *     (truncate) and read by `SELECT` — the full catalog-resolved
  *     DDL+DML+query cycle over the two-phase-commit manifest table.
  *     Definitions live in this catalog instance (session-scoped, like
  *     an in-memory metastore); the DATA is wherever `path` points, so
  *     re-creating the table over an existing path re-attaches it.
  *
  * At 100 TB the catalog is what makes the connector tier consumable:
  * analysts address tables by name, and every capability the connector
  * declares (pushdown, key-grouped partitioning, commit protocol) rides
  * along for free.
  */
object GraftCatalog {
  /** Both rows register the catalog at runtime (a plain session conf —
    * catalogs instantiate lazily) and then speak ONLY SQL: identifier
    * resolution, DDL, DML and scan planning all flow through the
    * catalog, nothing through DataFrame reader options.
    */
  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map(
    // the VIRTUAL synth table by name: the full pushdown surface (the
    // id-range filter reaches the generator) behind a bare SQL
    // identifier
    "q_catalog_table" -> ((s, _) => {
      s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
      s.sql(
        """SELECT channel, CAST(count(*) AS BIGINT) AS n,
          | CAST(sum(amount_cents) AS BIGINT) AS cents
          |FROM graft_cat.synth.r60000_s32
          |WHERE id >= 1000 AND id < 50000
          |GROUP BY channel""".stripMargin)
    }),

    // the full catalog DDL+DML+query cycle over the manifest table:
    // CREATE TABLE, two INSERT INTO appends (each a committed snapshot
    // through the two-phase manifest protocol), SELECT back through the
    // connector read scan — the reassembled dim must equal the source
    "q_catalog_insert" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_catalog_lake_").toFile.getAbsolutePath
      graft.Tables.nation(s, dir).createOrReplaceTempView("nation_src_cat")
      s.sql("DROP TABLE IF EXISTS graft_cat.lake.nations")
      s.sql(
        s"""CREATE TABLE graft_cat.lake.nations
           | (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)
           | USING graft OPTIONS (path '$tmp')""".stripMargin)
      s.sql(
        """INSERT INTO graft_cat.lake.nations
          |SELECT CAST(n_nationkey AS BIGINT), n_name,
          | CAST(n_regionkey AS BIGINT)
          |FROM nation_src_cat WHERE n_regionkey < 2""".stripMargin)
      s.sql(
        """INSERT INTO graft_cat.lake.nations
          |SELECT CAST(n_nationkey AS BIGINT), n_name,
          | CAST(n_regionkey AS BIGINT)
          |FROM nation_src_cat WHERE n_regionkey >= 2""".stripMargin)
      s.sql("SELECT * FROM graft_cat.lake.nations")
    }),

    // ROW-LEVEL DELETE: SQL DELETE FROM with a compound predicate — the
    // sink rewrites the table distributed (keep-rows job + atomic
    // snapshot republish; the pre-delete generation stays time-travel
    // readable until vacuum). The surviving set must equal the oracle's
    // complement exactly — a filter translated wrong deletes the wrong
    // rows and fails the hash.
    "q_sink_delete" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_lake_delete_").toFile.getAbsolutePath
      graft.Tables.customer(s, dir)
        .select(col("c_custkey").cast("long").as("c_custkey"),
          col("c_mktsegment"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_cents"))
        .write.format("graft.sources.ManifestSink")
        .mode("overwrite").option("path", tmp).save()
      s.sql("DROP TABLE IF EXISTS graft_cat.lake.cust_del")
      s.sql(
        s"""CREATE TABLE graft_cat.lake.cust_del
           | (c_custkey BIGINT, c_mktsegment STRING, bal_cents BIGINT)
           | USING graft OPTIONS (path '$tmp')""".stripMargin)
      s.sql(
        """DELETE FROM graft_cat.lake.cust_del
          |WHERE bal_cents < 0 OR c_mktsegment = 'BUILDING'""".stripMargin)
      s.sql("SELECT * FROM graft_cat.lake.cust_del")
    }),

    // SCHEMA EVOLUTION: ALTER TABLE ADD COLUMN is metadata-only — files
    // committed before the ALTER lack the field and read back as null
    // (by-name resolution), files after carry it; no rewrite anywhere.
    "q_sink_evolution" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_lake_evo_").toFile.getAbsolutePath
      graft.Tables.nation(s, dir).createOrReplaceTempView("nation_src_evo")
      s.sql("DROP TABLE IF EXISTS graft_cat.lake.evo")
      s.sql(s"CREATE TABLE graft_cat.lake.evo (k BIGINT, v STRING) " +
        s"USING graft OPTIONS (path '$tmp')")
      s.sql("INSERT INTO graft_cat.lake.evo " +
        "SELECT CAST(n_nationkey AS BIGINT), n_name FROM nation_src_evo")
      s.sql("ALTER TABLE graft_cat.lake.evo ADD COLUMN r BIGINT")
      s.sql("INSERT INTO graft_cat.lake.evo " +
        "SELECT CAST(n_nationkey AS BIGINT) + 1000, n_name, " +
        "CAST(n_regionkey AS BIGINT) FROM nation_src_evo")
      s.sql("SELECT * FROM graft_cat.lake.evo")
    }),

    // COPY-ON-WRITE MERGE: keyed upsert — updated balances replace,
    // new keys insert, untouched rows survive byte-exact; the oracle is
    // the algebraic merge over the source
    "q_sink_upsert" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_lake_merge_").toFile.getAbsolutePath
      def base = graft.Tables.customer(s, dir)
        .select(col("c_custkey").cast("long").as("c_custkey"),
          col("c_mktsegment"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_cents"))
      base.write.format("graft.sources.ManifestSink")
        .mode("overwrite").option("path", tmp).save()
      val updates = base.filter(col("c_custkey") % 10 === 0L)
        .withColumn("bal_cents", col("bal_cents") + 7L)
        .unionByName(base.filter(col("c_custkey") % 997 === 0L)
          .withColumn("c_custkey", col("c_custkey") + 10000000L))
      ManifestSink.merge(s, tmp, updates, Seq("c_custkey"))
      ManifestSink.readCommitted(s, tmp)
    }),

    // LINEAGE METADATA COLUMNS: a 3-epoch streaming write lands in the
    // lake table, then catalog SQL groups by the virtual `_epoch` column
    // the reader serves from file provenance (never stored) — the
    // per-epoch rollup must equal the admission-control id ranges
    // exactly, proving both the metadata surface and the epoch
    // attribution.
    "q_sink_lineage" -> ((s, _) => {
      import org.apache.spark.sql.functions._
      s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_lake_lineage_").toFile.getAbsolutePath
      val q = s.readStream.format("graft.sources.SynthDataSource")
        .option("rows", "60000").option("slices", "8")
        .option("rowsPerBatch", "20000").load()
        .select(col("id"), col("channel"), col("amount_cents"))
        .writeStream.format("graft.sources.ManifestSink")
        .option("path", tmp)
        .option("checkpointLocation", s"$tmp/_checkpoint")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.sql("DROP TABLE IF EXISTS graft_cat.lake.lineage")
      s.sql(
        s"""CREATE TABLE graft_cat.lake.lineage
           | (id BIGINT, channel STRING, amount_cents BIGINT)
           | USING graft OPTIONS (path '$tmp')""".stripMargin)
      s.sql(
        """SELECT _epoch, CAST(count(*) AS BIGINT) AS n,
          | CAST(sum(amount_cents) AS BIGINT) AS cents
          |FROM graft_cat.lake.lineage GROUP BY _epoch""".stripMargin)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_catalog_table" ->
      s"""WITH g AS (SELECT i AS id, ${SynthDataSource.oracleCells("i")}
         |  FROM (SELECT unnest(generate_series(1000, 49999)) AS i) t)
         |SELECT channel, CAST(count(*) AS BIGINT) AS n,
         | CAST(sum(amount_cents) AS BIGINT) AS cents
         |FROM g GROUP BY channel""".stripMargin,

    // two appends must reassemble the dim exactly once
    "q_catalog_insert" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        | CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation""".stripMargin,

    // the survivors of the delete are exactly the predicate's complement
    "q_sink_delete" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment,
        | CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |FROM customer
        |WHERE NOT (CAST(round(c_acctbal * 100) AS BIGINT) < 0
        |           OR c_mktsegment = 'BUILDING')""".stripMargin,

    // pre-ALTER rows read the added column as NULL; post-ALTER rows
    // carry it
    "q_sink_evolution" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS v,
        | CAST(NULL AS BIGINT) AS r
        |FROM nation
        |UNION ALL
        |SELECT CAST(n_nationkey AS BIGINT) + 1000 AS k, n_name AS v,
        | CAST(n_regionkey AS BIGINT) AS r
        |FROM nation""".stripMargin,

    // the algebraic merge: updated balances replace, new keys insert,
    // everything else survives
    "q_sink_upsert" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment,
        | CAST(round(c_acctbal * 100) AS BIGINT)
        |   + CASE WHEN c_custkey % 10 = 0 THEN 7 ELSE 0 END AS bal_cents
        |FROM customer
        |UNION ALL
        |SELECT CAST(c_custkey AS BIGINT) + 10000000 AS c_custkey,
        | c_mktsegment,
        | CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |FROM customer WHERE c_custkey % 997 = 0""".stripMargin,

    // epoch attribution = the admission-control id ranges: epoch e
    // committed exactly ids [20000e, 20000(e+1))
    "q_sink_lineage" ->
      s"""WITH g AS (SELECT i AS id, ${SynthDataSource.oracleCells("i")}
         |  FROM (SELECT unnest(generate_series(0, 59999)) AS i) t)
         |SELECT CAST(id // 20000 AS BIGINT) AS _epoch,
         | CAST(count(*) AS BIGINT) AS n,
         | CAST(sum(amount_cents) AS BIGINT) AS cents
         |FROM g GROUP BY 1""".stripMargin
  )
}

class GraftCatalog extends TableCatalog {

  private var catalogName: String = "graft_cat"
  private val lake = new ConcurrentHashMap[String, (StructType, Map[String, String])]()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private def isLake(ns: Array[String]) = ns.sameElements(Array("lake"))
  private def isSynth(ns: Array[String]) = ns.sameElements(Array("synth"))

  /** `r<rows>[_s<slices>][_b<bucketWidth>]` → a SynthTable. */
  private def parseSynth(name: String): Option[SynthTable] = {
    val parts = name.split("_")
    if (parts.isEmpty || !parts(0).startsWith("r")) return None
    try {
      val rows = parts(0).drop(1).toLong
      var slices = 8
      var bucketWidth = 0L
      parts.drop(1).foreach {
        case s if s.startsWith("s") => slices = s.drop(1).toInt
        case b if b.startsWith("b") => bucketWidth = b.drop(1).toLong
        case _ => return None
      }
      Some(new SynthTable(rows, slices, bucketWidth))
    } catch { case _: NumberFormatException => None }
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (isLake(namespace))
      lake.keySet().toArray(Array.empty[String])
        .map(Identifier.of(Array("lake"), _))
    else Array.empty // synth tables are virtual — unbounded, not listable

  override def loadTable(ident: Identifier): Table = {
    if (isSynth(ident.namespace()))
      parseSynth(ident.name()).getOrElse(
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident))
    else if (isLake(ident.namespace())) {
      val entry = lake.get(ident.name().toLowerCase(java.util.Locale.ROOT))
      if (entry == null)
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
      val (schema, props) = entry
      new ManifestTable(props("path"), schema,
        clusterBy = props.get("clusterBy").toSeq
          .flatMap(_.split(",").map(_.trim)).filter(_.nonEmpty),
        orderBy = props.get("orderBy").toSeq
          .flatMap(_.split(",").map(_.trim)).filter(_.nonEmpty))
    } else
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (!isLake(ident.namespace()))
      throw new UnsupportedOperationException(
        s"only the lake namespace supports CREATE TABLE (got $ident)")
    // OPTIONS arrive both bare and under the option. prefix depending on
    // the DDL path — accept either
    def opt(k: String): Option[String] =
      Option(properties.get(k)).orElse(Option(properties.get(s"option.$k")))
    // the DDL path surfaces OPTIONS(path ...) as the canonical
    // `location` property in URI form — accept path, option.path, or
    // location (stripping the file: scheme back to a local path)
    val path = opt("path")
      .orElse(opt("location").map { loc =>
        if (loc.contains(":")) new java.net.URI(loc).getPath else loc
      })
      .getOrElse(throw new IllegalArgumentException(
        s"CREATE TABLE $ident requires OPTIONS (path '...')"))
    val props = Map("path" -> path) ++
      opt("clusterBy").map("clusterBy" -> _) ++
      opt("orderBy").map("orderBy" -> _)
    val key = ident.name().toLowerCase(java.util.Locale.ROOT)
    if (lake.putIfAbsent(key, (schema, props)) != null)
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (ident.namespace() :+ ident.name()).toSeq)
    new ManifestTable(path, schema)
  }

  /** SCHEMA EVOLUTION, lake-style: ALTER TABLE ADD COLUMN widens the
    * catalog schema; existing committed files simply lack the field and
    * the manifest reader resolves columns BY NAME (absent key = null),
    * so no data rewrite happens — old snapshots keep their own DDL and
    * stay readable as written. Only top-level nullable adds: anything
    * else would need a rewrite this metadata-only path can't honestly
    * claim.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!isLake(ident.namespace()))
      throw new UnsupportedOperationException(
        s"only lake tables support ALTER TABLE (got $ident)")
    val key = ident.name().toLowerCase(java.util.Locale.ROOT)
    val entry = lake.get(key)
    if (entry == null)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val (schema, props) = entry
    val widened = changes.foldLeft(schema) {
      case (s, add: TableChange.AddColumn)
          if add.fieldNames().length == 1 && add.isNullable =>
        StructType(s.fields :+ org.apache.spark.sql.types.StructField(
          add.fieldNames()(0), add.dataType(), nullable = true))
      case (_, other) => throw new UnsupportedOperationException(
        s"only top-level nullable ADD COLUMN is supported (got $other)")
    }
    lake.put(key, (widened, props))
    new ManifestTable(props("path"), widened)
  }

  override def dropTable(ident: Identifier): Boolean =
    isLake(ident.namespace()) &&
      lake.remove(ident.name().toLowerCase(java.util.Locale.ROOT)) != null

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported")
}
