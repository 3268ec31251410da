package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sequence packing — the step between a cleaned corpus and a training
  * run: documents are laid into fixed-length context windows (here
  * [[CtxLen]] = 128 tokens) and the pipeline reports how many windows the
  * corpus fills and how much capacity is wasted. Two standard packing
  * disciplines, each as one oracle-audited summary row:
  *
  *  - '''concat-and-chunk''' ([[chunkStats]]): all documents are
  *    concatenated in a deterministic hash order and the stream is cut
  *    every C tokens (GPT-style pretraining). Zero padding except the
  *    final window, but documents straddle window boundaries — the audit
  *    counts those fragmented documents, the quality cost of this mode.
  *  - '''whole-doc next-fit''' ([[nextFitStats]]): a document is never
  *    split (docs longer than C are clamped — counted upstream by the
  *    token-stats op); if it doesn't fit in the current window's
  *    remainder, a new window opens. No fragmentation, but windows carry
  *    padding — the audit reports total padding and the fill rate in
  *    basis points (integers end-to-end, so the cross-engine compare is
  *    exact).
  *
  * Scale shape: both modes avoid any global ordering materialization.
  * Chunk mode rides [[SampleOps.bucketedRunningBefore]] (the exact
  * two-pass bucketed running sum: the only global window is over the B
  * bucket rows). Next-fit is inherently sequential PER WINDOW STREAM —
  * the distributed answer is per-bucket independence: each of the B
  * hash-buckets packs its own documents into its own windows, so the
  * fold runs B-way parallel with O(1) state (current fill + window
  * count) and one shuffle on the bucket key. At 100 TB, B dials up with
  * the cluster; the per-task state stays two longs. This per-shard
  * packing is exactly what a multi-worker data loader does — each worker
  * packs its own shard; nobody packs across shards.
  *
  * The fold itself uses `flatMapSortedGroups` (Spark supplies each
  * group's rows already sorted by the secondary key, via the shuffle's
  * sort — no per-group buffering or re-sort), the idiomatic home for
  * genuinely order-dependent per-group logic that window functions
  * cannot express (running sum WITH RESET is not a frame aggregate).
  * The DuckDB oracle recomputes the same fold as a recursive CTE that
  * advances every bucket one row per iteration.
  *
  * Reference anchor: the reference pipeline has no training-data step;
  * this extends its warehouse toward the LLM-pipeline operator set the
  * build brief mandates (packing sits beside the token-budget sample,
  * `SampleOps.tokenBudgetSample`).
  */
object PackOps {

  /** Context window length in whitespace tokens. */
  val CtxLen = 128L
  /** Pack-shard count (the parallelism dial; == SampleOps.BudgetBuckets
    * so chunk mode can share the bucketed running sum unchanged).
    */
  val Buckets: Int = SampleOps.BudgetBuckets

  import graft.functions.PortableSql.{alen, seedLadderSql, tokens}

  private def hashKey(c: String): String = seedLadderSql(c, mod = 1000000007L)

  /** doc_id, h (portable hash order key), tok (whitespace token count
    * clamped to C so a single document always fits one window).
    */
  private def base(duck: Boolean, c: Long = CtxLen): String =
    s"""SELECT doc_id, ${hashKey("doc_id")} AS h,
       | LEAST(${alen(tokens("text", duck), duck)}, $c) AS tok
       |FROM documents""".stripMargin

  private def sparkBase(docs: DataFrame, c: Long = CtxLen): DataFrame =
    docs.select(col("doc_id"), expr(hashKey("doc_id")).as("h"),
      expr(s"CAST(LEAST(${alen(tokens("text", duck = false), duck = false)}, $c) AS BIGINT)")
        .as("tok"))

  /** Concat-and-chunk packing audit: window count, boundary-fragmented
    * document count, and final-window padding, from the exact bucketed
    * running token sum (never a global sort).
    */
  def chunkStats(docs: DataFrame, c: Long = CtxLen): DataFrame =
    SampleOps.bucketedRunningBefore(sparkBase(docs, c), "tok", "tks_before")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok")).as("total_tokens"),
        expr(s"sum(CASE WHEN tks_before DIV $c <> (tks_before + tok - 1) DIV $c " +
          "THEN 1 ELSE 0 END)").as("n_split_docs"))
      .withColumn("n_windows", expr(s"(total_tokens + ${c - 1}) DIV $c"))
      .withColumn("tail_pad", expr(s"n_windows * $c - total_tokens"))

  /** Whole-doc next-fit packing audit: per-bucket sequential fold
    * (current fill + window count — O(1) state), summed across buckets.
    * fill_bp = filled capacity in basis points, integer arithmetic.
    */
  def nextFitStats(spark: SparkSession, docs: DataFrame, c: Long = CtxLen): DataFrame = {
    import spark.implicits._
    val bucketed = SampleOps.withBucket(sparkBase(docs, c))
      .select(col("bucket"), col("h"), col("doc_id"), col("tok"))
      .as[(Int, Long, Long, Long)]
    val perBucket = bucketed
      .groupByKey(_._1)
      .flatMapSortedGroups(col("h").asc, col("doc_id").asc) { (b, it) =>
        var fill = 0L; var wins = 0L; var docs = 0L; var toks = 0L
        it.foreach { case (_, _, _, tok) =>
          docs += 1; toks += tok
          if (wins == 0L || fill + tok > c) { wins += 1; fill = tok }
          else fill += tok
        }
        Iterator((b, docs, toks, wins))
      }
      .toDF("bucket", "n_docs", "toks", "wins")
    perBucket.agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("toks")).as("total_tokens"),
      sum(col("wins")).as("n_windows"))
      .withColumn("total_pad", expr(s"n_windows * $c - total_tokens"))
      .withColumn("fill_bp", expr(s"total_tokens * 10000 DIV (n_windows * $c)"))
  }

  /** Whole-doc BEST-FIT-DECREASING packing audit — the quality upgrade
    * over next-fit (Johnson 1973: BFD wastes at most 11/9 OPT + 1 bins;
    * next-fit can waste 2x): docs sort DECREASING by size within their
    * bucket and each lands in the fullest already-open window it still
    * fits (first such window on load ties), else opens a new one. The
    * per-bucket fold keeps the open-window load list as state — bounded
    * by windows-per-bucket, the flatMapSortedGroups discipline of
    * next-fit with a list instead of a scalar. The oracle replays the
    * fold as a linear recursive CTE whose state column IS the load list
    * (list_filter/list_max pick the bin, an indexed list_transform
    * applies it). Same summary row as q_pack_nextfit, so the two
    * disciplines read side by side; the spec pins BFD fill >= next-fit
    * fill.
    */
  def bfdStats(spark: SparkSession, docs: DataFrame, c: Long = CtxLen): DataFrame = {
    import spark.implicits._
    val bucketed = SampleOps.withBucket(sparkBase(docs, c))
      .select(col("bucket"), col("h"), col("doc_id"), col("tok"))
      .as[(Int, Long, Long, Long)]
    val perBucket = bucketed
      .groupByKey(_._1)
      .flatMapSortedGroups(col("tok").desc, col("h").asc, col("doc_id").asc) {
        (b, it) =>
          val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
          var nDocs = 0L; var toks = 0L
          it.foreach { case (_, _, _, tok) =>
            nDocs += 1; toks += tok
            // best fit: FIRST bin carrying the maximal load that fits
            var best = -1; var bestLoad = -1L
            var i = 0
            while (i < bins.length) {
              if (bins(i) + tok <= c && bins(i) > bestLoad) {
                best = i; bestLoad = bins(i)
              }
              i += 1
            }
            if (best >= 0) bins(best) += tok else bins += tok
          }
          Iterator((b, nDocs, toks, bins.length.toLong))
      }
      .toDF("bucket", "n_docs", "toks", "wins")
    perBucket.agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("toks")).as("total_tokens"),
      sum(col("wins")).as("n_windows"))
      .withColumn("total_pad", expr(s"n_windows * $c - total_tokens"))
      .withColumn("fill_bp", expr(s"total_tokens * 10000 DIV (n_windows * $c)"))
  }

  /** Candidate context lengths for the planning audit. */
  val CtxCandidates = Seq(64L, 128L, 256L, 512L)

  /** Context-length planning audit — the table a team reads BEFORE
    * picking the packing discipline above: for each candidate window
    * length, what truncate-at-L costs (tokens lost, docs cut) versus
    * what document-level chunking costs (padding in the last chunk of
    * every doc), in integer basis points. One narrow scan of the corpus
    * exploded ×|candidates|, one grouped aggregate — no ordering, no
    * join; at 100 TB this is a single map-side-combined pass. (Empty
    * text still tokenizes to one empty token, so tok >= 1 and the
    * ratio denominators are never zero.)
    */
  def ctxPlan(docs: DataFrame): DataFrame =
    docs.select(
        expr(s"CAST(${alen(tokens("text", duck = false), duck = false)} AS BIGINT)")
          .as("tok"),
        explode(expr(s"array(${CtxCandidates.mkString(",")})")).as("ctx0"))
      .select(expr("CAST(ctx0 AS BIGINT)").as("ctx"), col("tok"))
      .groupBy("ctx")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("total_tokens"),
        sum(least(col("tok"), col("ctx"))).as("kept_tokens"),
        sum((col("tok") > col("ctx")).cast("long")).as("n_truncated"),
        sum(expr("(tok + ctx - 1) DIV ctx")).as("n_chunks"))
      .withColumn("trunc_loss_bp",
        expr("(total_tokens - kept_tokens) * 10000 DIV total_tokens"))
      .withColumn("chunk_pad_bp",
        expr("(n_chunks * ctx - total_tokens) * 10000 DIV (n_chunks * ctx)"))

  /** Sliding-window size and stride for the RAG chunking audit (overlap
    * = CtxLen - ChunkStride = 32 tokens of context carried across
    * boundaries).
    */
  val ChunkStride = 96L

  /** Sliding-window (overlapping) chunking audit — the RAG-ingest twin
    * of [[ctxPlan]]: retrieval corpora chunk documents into L-token
    * windows advancing by a stride S < L so no boundary loses context,
    * and the price is every overlap token embedded and stored twice.
    * Per source: chunk count (ceil((tok-L)/S)+1 for docs over one
    * window), emitted tokens (tok + (n_chunks-1)·(L-S) — the closed
    * form of summing the clipped windows), and the duplication overhead
    * in basis points. Pure per-doc integer arithmetic + one grouped
    * aggregate; nothing orders or joins.
    */
  def chunkOverlap(docs: DataFrame, c: Long = CtxLen,
      s: Long = ChunkStride): DataFrame =
    docs.select(col("source"),
        expr(s"CAST(${alen(tokens("text", duck = false), duck = false)} AS BIGINT)")
          .as("tok"))
      .withColumn("n_chunks",
        expr(s"CASE WHEN tok <= $c THEN 1L ELSE (tok - $c + $s - 1) DIV $s + 1 END"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("total_tokens"),
        sum(col("n_chunks")).as("n_chunks"),
        sum(expr(s"tok + (n_chunks - 1) * ${c - s}")).as("emitted_tokens"))
      .withColumn("overlap_bp",
        expr("(emitted_tokens - total_tokens) * 10000 DIV total_tokens"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_chunk" -> ((s, dir) => chunkStats(Tables.documents(s, dir))),
    "q_ctx_plan" -> ((s, dir) => ctxPlan(Tables.documents(s, dir))),
    "q_chunk_overlap" -> ((s, dir) => chunkOverlap(Tables.documents(s, dir))),
    "q_pack_nextfit" -> ((s, dir) => nextFitStats(s, Tables.documents(s, dir))),
    "q_pack_bfd" -> ((s, dir) => bfdStats(s, Tables.documents(s, dir))))

  def oracleSql: Map[String, String] = {
    val c = CtxLen
    Map(
      "q_chunk_overlap" -> {
        val s = ChunkStride
        s"""WITH b AS (SELECT source,
           |  CAST(${alen(tokens("text", duck = true), duck = true)} AS BIGINT) AS tok
           |  FROM documents),
           |x AS (SELECT source, tok,
           |  CASE WHEN tok <= $c THEN 1 ELSE (tok - $c + $s - 1) // $s + 1 END
           |    AS n_chunks FROM b)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           | CAST(sum(tok) AS BIGINT) AS total_tokens,
           | CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
           | CAST(sum(tok + (n_chunks - 1) * ${c - s}) AS BIGINT) AS emitted_tokens,
           | CAST((sum(tok + (n_chunks - 1) * ${c - s}) - sum(tok)) * 10000
           |   // sum(tok) AS BIGINT) AS overlap_bp
           |FROM x GROUP BY 1""".stripMargin
      },

      "q_ctx_plan" ->
        s"""WITH b AS (SELECT ${alen(tokens("text", duck = true), duck = true)} AS tok
           |  FROM documents),
           |x AS (SELECT CAST(tok AS BIGINT) AS tok, CAST(ctx AS BIGINT) AS ctx
           |  FROM b CROSS JOIN
           |    (SELECT unnest([${CtxCandidates.mkString(",")}]) AS ctx) l)
           |SELECT ctx, CAST(count(*) AS BIGINT) AS n_docs,
           | CAST(sum(tok) AS BIGINT) AS total_tokens,
           | CAST(sum(least(tok, ctx)) AS BIGINT) AS kept_tokens,
           | CAST(sum(CASE WHEN tok > ctx THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
           | CAST(sum((tok + ctx - 1) // ctx) AS BIGINT) AS n_chunks,
           | CAST((sum(tok) - sum(least(tok, ctx))) * 10000 // sum(tok) AS BIGINT)
           |   AS trunc_loss_bp,
           | CAST((sum((tok + ctx - 1) // ctx) * ctx - sum(tok)) * 10000
           |   // (sum((tok + ctx - 1) // ctx) * ctx) AS BIGINT) AS chunk_pad_bp
           |FROM x GROUP BY 1""".stripMargin,
      "q_pack_chunk" ->
        s"""WITH b AS (${base(duck = true)}),
           |t AS (SELECT *, coalesce(sum(tok) OVER (ORDER BY h, doc_id
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tks_before FROM b)
           |SELECT CAST(count(*) AS BIGINT) AS n_docs,
           | CAST(sum(tok) AS BIGINT) AS total_tokens,
           | CAST(sum(CASE WHEN tks_before // $c <> (tks_before + tok - 1) // $c
           |   THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
           | CAST((sum(tok) + ${c - 1}) // $c AS BIGINT) AS n_windows,
           | CAST(((sum(tok) + ${c - 1}) // $c) * $c - sum(tok) AS BIGINT) AS tail_pad
           |FROM t""".stripMargin,
      "q_pack_bfd" -> {
        // the per-bucket BFD fold as a LINEAR recursive CTE: the state
        // column is the open-window load list; m = fullest fitting load,
        // the indexed list_transform applies the placement
        val m = s"list_max(list_filter(s.bins, x -> x + o.tok <= $c))"
        s"""WITH RECURSIVE b AS (${base(duck = true)}),
           |o AS (SELECT tok, CAST(h * $Buckets // 1000000007 AS INT) AS bucket,
           |  row_number() OVER (PARTITION BY CAST(h * $Buckets // 1000000007 AS INT)
           |    ORDER BY tok DESC, h, doc_id) AS rn FROM b),
           |s AS (
           |  SELECT bucket, rn, [tok] AS bins FROM o WHERE rn = 1
           |  UNION ALL
           |  SELECT o.bucket, o.rn,
           |    CASE WHEN $m IS NULL THEN list_append(s.bins, o.tok)
           |    ELSE list_transform(s.bins, (x, i) ->
           |      CASE WHEN i = list_position(s.bins, $m) THEN x + o.tok
           |           ELSE x END) END
           |  FROM o JOIN s ON o.bucket = s.bucket AND o.rn = s.rn + 1),
           |f AS (SELECT bucket, max(rn) AS mrn FROM s GROUP BY bucket),
           |fin AS (SELECT CAST(sum(len(s.bins)) AS BIGINT) AS wins
           |        FROM s JOIN f ON s.bucket = f.bucket AND s.rn = f.mrn)
           |SELECT CAST(count(*) AS BIGINT) AS n_docs,
           | CAST(sum(o.tok) AS BIGINT) AS total_tokens,
           | (SELECT wins FROM fin) AS n_windows,
           | CAST((SELECT wins FROM fin) * $c - sum(o.tok) AS BIGINT) AS total_pad,
           | CAST(sum(o.tok) * 10000 // ((SELECT wins FROM fin) * $c) AS BIGINT) AS fill_bp
           |FROM o""".stripMargin
      },

      "q_pack_nextfit" ->
        s"""WITH RECURSIVE b AS (${base(duck = true)}),
           |o AS (SELECT tok, CAST(h * $Buckets // 1000000007 AS INT) AS bucket,
           |  row_number() OVER (PARTITION BY CAST(h * $Buckets // 1000000007 AS INT)
           |    ORDER BY h, doc_id) AS rn FROM b),
           |s AS (
           |  SELECT bucket, rn, tok AS fill, CAST(1 AS BIGINT) AS w FROM o WHERE rn = 1
           |  UNION ALL
           |  SELECT o.bucket, o.rn,
           |    CASE WHEN s.fill + o.tok <= $c THEN s.fill + o.tok ELSE o.tok END,
           |    s.w + CASE WHEN s.fill + o.tok <= $c THEN 0 ELSE 1 END
           |  FROM o JOIN s ON o.bucket = s.bucket AND o.rn = s.rn + 1),
           |f AS (SELECT bucket, max(rn) AS mrn FROM s GROUP BY bucket),
           |fin AS (SELECT CAST(sum(s.w) AS BIGINT) AS wins
           |        FROM s JOIN f ON s.bucket = f.bucket AND s.rn = f.mrn)
           |SELECT CAST(count(*) AS BIGINT) AS n_docs,
           | CAST(sum(o.tok) AS BIGINT) AS total_tokens,
           | (SELECT wins FROM fin) AS n_windows,
           | CAST((SELECT wins FROM fin) * $c - sum(o.tok) AS BIGINT) AS total_pad,
           | CAST(sum(o.tok) * 10000 // ((SELECT wins FROM fin) * $c) AS BIGINT) AS fill_bp
           |FROM o""".stripMargin)
  }
}
