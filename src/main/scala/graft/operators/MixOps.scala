package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableSql._

/** Domain-mixture planning and resampling over the `documents` corpus —
  * the data-mixing step of a training-data pipeline (DoReMi-style static
  * reweighting: given per-domain target shares, compute each domain's
  * over/under-sampling factor, then materialize the epoch plan as
  * deterministic per-document repeat counts).
  *
  * All mixture math is INTEGER (ppm shares, millis factors, Knuth-hash
  * fractional draws), so the DuckDB oracle reproduces the realized sample
  * bit-for-bit — no RNG, no float accumulation.
  *
  * Scale shape: the stats pass is one groupBy(source) over per-doc token
  * counts (tiny result — one row per domain); the resample pass re-scans
  * documents once and probes the broadcast factor table. Two scans of the
  * text column total; a deployment materializes `n_tokens` as a column in
  * the ingest pass (tokenStats already computes it) and both passes become
  * metadata-narrow. Nothing here shuffles the documents themselves.
  */
object MixOps {

  /** Target weight of a source: sources are named srcN, weight N+1 —
    * derived from the data so the mix table needs no hard-coded domain
    * list (a real deployment feeds an explicit table; the DERIVATION is
    * irrelevant to the plan shape, which only sees a small keyed frame).
    */
  private def weightSql: String = "(CAST(substr(source, 4) AS BIGINT) + 1)"

  /** Per-doc fractional draw in [0, 1000): the Knuth ladder the
    * generators use, reduced to millis. Identical text in both dialects.
    */
  private def draw1000Sql: String =
    "((((doc_id % 2147483647) * 2654435761 + 283521) % 1000000007) % 1000)"

  private def docTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      expr(alen(tokens("text", duck = false), duck = false)).cast("long").as("n_toks"))

  /** Per-source mixture plan: corpus share vs target share in exact ppm,
    * and the resampling factor in millis (1000 = keep as-is, 2500 = 2.5x
    * oversample, 400 = keep 40%).
    */
  def domainMix(docs: DataFrame): DataFrame = {
    val stats = docTokens(docs).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("toks"))
      .withColumn("w", expr(weightSql))
    val totals = stats.agg(sum(col("toks")).as("tt"), sum(col("w")).as("tw"))
    stats.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("toks").as("total_tokens"),
        expr("(toks * 1000000) DIV tt").as("actual_ppm"),
        expr("(w * 1000000) DIV tw").as("target_ppm"),
        expr("""CASE WHEN (toks * 1000000) DIV tt > 0
          THEN (((w * 1000000) DIV tw) * 1000) DIV ((toks * 1000000) DIV tt)
          END""").as("factor_milli"))
  }

  /** The realized epoch plan: every document's repeat count under its
    * source's factor (floor(f) copies + one more when the doc's hash
    * draw falls under the fractional part), rolled up per source. A
    * factor under 1000 yields {0,1} — downsampling; over 1000 yields
    * floor thereof plus the Bernoulli top-up — oversampling.
    */
  def domainResample(docs: DataFrame): DataFrame = {
    val factors = domainMix(docs).select(col("source"), col("factor_milli"))
    docTokens(docs)
      .join(broadcast(factors), "source")
      .withColumn("repeats",
        expr(s"""factor_milli DIV 1000 +
          (CASE WHEN $draw1000Sql < factor_milli % 1000 THEN 1 ELSE 0 END)"""))
      .groupBy(col("source"))
      .agg(sum(col("repeats")).as("kept_docs"),
        sum(col("repeats") * col("n_toks")).as("kept_tokens"),
        sum(when(col("repeats") === 0, 1L).otherwise(0L)).as("dropped_docs"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_domain_mix" -> ((s, dir) => domainMix(Tables.documents(s, dir))),
    "q_domain_resample" -> ((s, dir) => domainResample(Tables.documents(s, dir)))
  )

  def oracleSql: Map[String, String] = {
    val toksD = alen(tokens("text", duck = true), duck = true)
    val mixCte =
      s"""dt AS (SELECT doc_id, source, CAST($toksD AS BIGINT) AS n_toks
         |  FROM documents),
         |st AS (SELECT source, count(*) AS n_docs, sum(n_toks) AS toks,
         |   $weightSql AS w
         |  FROM dt GROUP BY source),
         |tot AS (SELECT sum(toks) AS tt, sum(w) AS tw FROM st),
         |mix AS (SELECT source, n_docs, toks AS total_tokens,
         |   (toks * 1000000) // tt AS actual_ppm,
         |   (w * 1000000) // tw AS target_ppm,
         |   CASE WHEN (toks * 1000000) // tt > 0
         |     THEN (((w * 1000000) // tw) * 1000) // ((toks * 1000000) // tt)
         |   END AS factor_milli
         |  FROM st CROSS JOIN tot)""".stripMargin
    Map(
      "q_domain_mix" ->
        s"""WITH $mixCte
           |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           | CAST(total_tokens AS BIGINT) AS total_tokens,
           | CAST(actual_ppm AS BIGINT) AS actual_ppm,
           | CAST(target_ppm AS BIGINT) AS target_ppm,
           | CAST(factor_milli AS BIGINT) AS factor_milli
           |FROM mix""".stripMargin,

      "q_domain_resample" ->
        s"""WITH $mixCte,
           |rep AS (SELECT dt.source, dt.n_toks,
           |   factor_milli // 1000 +
           |     (CASE WHEN $draw1000Sql < factor_milli % 1000 THEN 1 ELSE 0 END)
           |     AS repeats
           |  FROM dt JOIN mix ON dt.source = mix.source)
           |SELECT source, CAST(sum(repeats) AS BIGINT) AS kept_docs,
           | CAST(sum(repeats * n_toks) AS BIGINT) AS kept_tokens,
           | CAST(sum(CASE WHEN repeats = 0 THEN 1 ELSE 0 END) AS BIGINT)
           |   AS dropped_docs
           |FROM rep GROUP BY 1""".stripMargin
    )
  }
}
