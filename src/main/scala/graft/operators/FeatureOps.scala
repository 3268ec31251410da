package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableSql.{strHash, P}

/** ML feature-preparation operators — the encode/vectorize step between a
  * cleaned corpus and model training (the reference pipeline stops at
  * warehouse tables; a training pipeline continues into features, so the
  * engine carries that tier too):
  *
  *   - TARGET ENCODING (m-estimate smoothed): replace a categorical
  *     column by the smoothed per-category mean of a binary target —
  *     the standard high-cardinality-categorical encoder. Integer-exact
  *     in ppm with the m-estimate prior pulling small categories toward
  *     the global rate (the leakage-control knob).
  *   - FEATURE HASHING (hashing trick): project an unbounded token
  *     vocabulary into a FIXED bucket space via a deterministic string
  *     hash — the streaming-friendly vectorizer that needs no vocabulary
  *     pass, no dictionary state, and no re-fit on vocabulary drift.
  *
  * Both are one-or-two hash aggregates at any scale: target encoding
  * shuffles |categories| rows, feature hashing |buckets| rows — never the
  * corpus.
  */
object FeatureOps {

  /** m-estimate smoothing weight: a category with n rows is blended
    * n:(n+M) toward its own rate and M:(n+M) toward the global rate.
    */
  val TargetM = 100L

  /** Feature-hash bucket count (the fixed feature-space dimension). */
  val HashBuckets = 64L

  /** Smoothed target encoding of order priority against the binary
    * target "order fully shipped" (o_orderstatus = 'F'). The global rate
    * is a 1-row aggregate broadcast onto the |categories|-row table —
    * the only data-sized operation is one map-side-combined groupBy on
    * the category key. enc_ppm = (sum_t·1e6 + M·global_ppm) DIV (n + M),
    * every step integer, so truncation points are deterministic and the
    * oracle reproduces them exactly.
    */
  def targetEncode(orders: DataFrame): DataFrame =
    targetEncodeFromCells(orders
      .select(col("o_orderpriority").as("category"),
        (col("o_orderstatus") === "F").cast("long").as("t"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("sum_t")))

  /** The encode arithmetic over pre-aggregated (category, n, sum_t)
    * cells — shared by the batch query and the streaming twin (whose
    * cells accumulate in complete mode and re-derive the encoding on
    * readback through THIS arithmetic, so one oracle scores both). The
    * global rate folds from the cells themselves: sum(sum_t)·1e6 DIV
    * sum(n) is integer-identical to computing it on the raw rows.
    */
  def targetEncodeFromCells(cells: DataFrame): DataFrame = {
    val glob = cells.agg(
      expr("sum(sum_t) * 1000000 DIV sum(n)").as("global_ppm"))
    cells
      .crossJoin(broadcast(glob))
      .select(col("category"), col("n"), col("sum_t"),
        expr("sum_t * 1000000 DIV n").as("raw_ppm"),
        expr(s"(sum_t * 1000000 + $TargetM * global_ppm) DIV (n + $TargetM)")
          .as("enc_ppm"),
        col("global_ppm"))
  }

  /** The hashing trick over document tokens: every token maps to bucket
    * strHash(w) % B with the engine-wide portable polynomial hash (same
    * arithmetic in DuckDB — [[graft.functions.PortableSql.strHash]]), so
    * the feature space is fixed at B regardless of vocabulary size.
    * Per bucket: occurrence count, document frequency, and the number of
    * distinct tokens that collided into it (the collision diagnostic
    * that tells you whether B is too small). One explode + two hash
    * aggregates; df via (bucket, doc) distinct before the count —
    * everything bounded by B once aggregated.
    */
  def featureHash(docs: DataFrame): DataFrame = {
    // One tokenize+hash pass, one aggregate (r19 optimization): the
    // original form computed the exploded token frame THREE times — once
    // per face (occurrence, document frequency, vocabulary collision),
    // each re-running split+explode and the 16-substr symbolic strHash
    // per token, then re-joined the three B-row aggregates (plan: 3
    // Generates, 5 Exchanges, 2 joins). Here the hash runs once per DOC
    // through the fused array kernel (StrHashArrayExpression — identical
    // arithmetic to PortableSql.strHash on this ASCII corpus, the dedup
    // family's standing equivalence), tokens explode once zipped with
    // their hashes, and all three faces fold in ONE multi-distinct
    // aggregate (plan: 1 Generate, 2 Exchanges via the Expand path, 0
    // joins). Same answer — the oracle still evaluates the symbolic form.
    val hashed = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        graft.functions.StrHashArrayExpression.hashes(col("toks")).as("hs"))
    val tok = hashed
      .select(col("doc_id"), explode(arrays_zip(col("toks"), col("hs"))).as("p"))
      .select(col("doc_id"), col("p.toks").as("w"),
        (col("p.hs") % HashBuckets).as("bucket"))
    tok.groupBy(col("bucket")).agg(
      count(lit(1)).as("n_tokens"),
      countDistinct(col("doc_id")).as("n_docs"),
      countDistinct(col("w")).as("n_terms"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_target_encode" -> ((s, dir) => targetEncode(Tables.orders(s, dir))),
    "q_feat_hash" -> ((s, dir) => featureHash(Tables.documents(s, dir)))
  )

  def oracleSql: Map[String, String] = Map(
    "q_target_encode" ->
      s"""WITH o AS (SELECT o_orderpriority AS category,
         |   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS t
         |  FROM orders),
         | g AS (SELECT CAST(sum(t) AS BIGINT) * 1000000 // count(*)
         |   AS global_ppm FROM o),
         | c AS (SELECT category, CAST(count(*) AS BIGINT) AS n,
         |   CAST(sum(t) AS BIGINT) AS sum_t FROM o GROUP BY 1)
         |SELECT category, n, sum_t,
         | CAST(sum_t * 1000000 // n AS BIGINT) AS raw_ppm,
         | CAST((sum_t * 1000000 + $TargetM * global_ppm) // (n + $TargetM)
         |   AS BIGINT) AS enc_ppm,
         | CAST(global_ppm AS BIGINT) AS global_ppm
         |FROM c, g""".stripMargin,

    "q_feat_hash" ->
      s"""WITH tok AS (SELECT doc_id, w, ${strHash("w")} % $HashBuckets AS bucket
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |        FROM documents) t)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens,
         | CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         | CAST(count(DISTINCT w) AS BIGINT) AS n_terms
         |FROM tok GROUP BY bucket""".stripMargin
  )
}
