package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.DotProductExpression.{dot => dotCol}
import graft.functions.PortableSql._

/** Similarity search over the `embeddings` table (`Array[Float]` column).
  *
  * Two tiers, as a 100 TB pipeline needs them:
  *   - brute-force cosine top-k against one query vector: a broadcast of the
  *     single query row + one narrow pass over the corpus, finished by
  *     TakeOrderedAndProject (per-partition top-k, k-row driver merge) —
  *     linear scan, zero shuffle of the corpus;
  *   - multi-table sign-random-projection LSH: `NTables` independent
  *     tables of `BitsPerTable` hyperplane sign bits each. Candidate pairs
  *     come from an equi-join on (table, bucket) — a pair is a candidate
  *     if it collides in ANY table, which keeps recall high while each
  *     table's bucket stays small. Per-vector norms are computed ONCE
  *     (unit-normalizing before the join), so the verify step is a single
  *     dot product per candidate pair instead of three.
  *
  * Scale story: bucket count per table is 2^BitsPerTable; to hold bucket
  * occupancy (and therefore per-bucket quadratic work) constant as the
  * corpus grows, BitsPerTable should grow like log2(N) — it is FIXED here
  * so the DuckDB oracle is a static query, and the constants are sized for
  * the bench scale. Recall is tuned independently via NTables (union over
  * tables), the standard multi-probe trade.
  *
  * Hyperplane components are pseudo-random from integer arithmetic
  * (PortableSql.pseudoUniform) so the DuckDB oracle reproduces bucket
  * assignments and cosines exactly. All float math is widened to double
  * before any arithmetic; dot products fold left-to-right in both engines.
  */
object VectorOps {

  val NTables = 4
  val BitsPerTable = 10
  val Dim = 64
  val AnnMinCosine = 0.3

  /** Bucket-width dial for the LSH tables. With hash-uniform buckets the
    * expected occupancy is N / 2^bits, so holding occupancy — and with it
    * the per-bucket quadratic candidate work — constant as the corpus
    * grows means bits ≈ log2(N / targetOccupancy): ONE MORE BIT PER
    * CORPUS DOUBLING. `BitsPerTable` pins the bench/oracle constant
    * (static DuckDB SQL); a deployment sizes `bits = bitsForCorpusSize(
    * corpusRows)` and passes it through `lshBuckets`/`annPairs`/
    * `embDedupDrops`. Recall is tuned independently via NTables.
    */
  def bitsForCorpusSize(n: Long, targetOccupancy: Long = 32L): Int = {
    val cells = math.max(1L, (n + targetOccupancy - 1) / targetOccupancy)
    // exact ceil(log2(cells)) in integer arithmetic (no fp wobble at 2^k)
    val ceilLog2 = if (cells <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(cells - 1)
    math.max(4, ceilLog2)
  }

  private def vcol: String = toDoubleArr("embedding", duck = false)

  private def cosineExpr(a: String, b: String, duck: Boolean): String =
    s"round(${dot(a, b, duck)} / (sqrt(${dot(a, a, duck)}) * sqrt(${dot(b, b, duck)})), 6)"

  /** Hyperplane p as a symbolic double-array expression — ORACLE side
    * only; the Spark side computes buckets natively
    * (SrpBucketsExpression, same integer recurrence → identical doubles).
    */
  private def plane(p: Int, duck: Boolean): String =
    xform(seqIncl("0", (Dim - 1).toString, duck), "i",
      pseudoUniform(s"$p * 97 + i"), duck)

  /** Bucket id of table t over the unit-normalized vector column `vn`:
    * bit j = sign(vn . plane_{t*BitsPerTable+j}).
    */
  private def bucketExpr(t: Int, duck: Boolean): String = {
    val terms = (0 until BitsPerTable).map { j =>
      val p = t * BitsPerTable + j
      s"(CASE WHEN ${dot("vn", plane(p, duck), duck)} > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
    s"CAST($terms AS BIGINT)"
  }

  /** vec_id, label?, unit-normalized vector. Zero vectors are dropped
    * (cosine undefined; also guards ANSI divide-by-zero).
    */
  private def normalized(emb: DataFrame, withLabel: Boolean): DataFrame = {
    val base = if (withLabel) emb.select(col("vec_id"), col("label"), expr(vcol).as("v"))
               else emb.select(col("vec_id"), expr(vcol).as("v"))
    base
      .withColumn("nrm", sqrt(dotCol(col("v"), col("v"))))
      .filter(col("nrm") > 0)
      .withColumn("vn", expr("transform(v, x -> x / nrm)"))
      .drop("v", "nrm")
  }

  /** Brute-force cosine top-k neighbours of `queryId`. */
  def cosineTopK(emb: DataFrame, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"), expr(vcol).as("v"))
    val q = e.filter(col("vec_id") === queryId).select(col("v").as("qv"))
    e.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(dotCol(col("v"), col("qv")) /
          (sqrt(dotCol(col("v"), col("v"))) * sqrt(dotCol(col("qv"), col("qv")))), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** All table buckets in one native pass (see SrpBucketsExpression). */
  private def withAllBuckets(df: DataFrame, bits: Int): DataFrame = {
    val all = df.withColumn("bks",
      graft.functions.SrpBucketsExpression.buckets(col("vn"), NTables, bits, Dim))
    (0 until NTables).foldLeft(all) { (d, t) =>
      d.withColumn(s"bucket_$t", element_at(col("bks"), t + 1))
    }.drop("bks")
  }

  /** Per-vector LSH bucket ids, one column per table.
    * @param bits bucket width; size with [[bitsForCorpusSize]] at scale
    */
  def lshBuckets(emb: DataFrame, bits: Int = BitsPerTable): DataFrame =
    withAllBuckets(normalized(emb, withLabel = true), bits).drop("vn")

  /** ANN candidate pairs: same bucket in ANY table, verified
    * cosine >= threshold via a single dot of the pre-normalized vectors.
    */
  def annPairs(emb: DataFrame, bits: Int = BitsPerTable): DataFrame = {
    // cached: one narrow (vec_id, vn, buckets) materialization feeds the
    // explode and both self-join sides; lifecycle is caller-owned
    // (Bench/Verify clearCache() after each query)
    val withBuckets = withAllBuckets(normalized(emb, withLabel = false), bits).cache()
    // pre-materialize before the fan-out: both band arms and both vector
    // broadcasts consume this in one action (r19, the pqCodes lesson)
    withBuckets.count()
    // The band self-join runs over BARE ids and candidates are deduped
    // BEFORE vectors are fetched: clustered corpora collide in many
    // tables at once, so the raw band join emits each hot pair up to
    // NTables times — carrying the 64-double arrays through that
    // explosion (and dotting every duplicate) dominated the query. The
    // deduped candidates then pick their vectors off two broadcasts of
    // the (small, cached) vector side and verify with ONE dot per
    // distinct pair. Same result set; the oracle's algebra (distinct at
    // the end) is order-insensitive to where the dedup happens.
    val bands = withBuckets.select(col("vec_id"), explode(array(
        (0 until NTables).map(t =>
          struct(lit(t).as("t"), col(s"bucket_$t").as("bk"))): _*)).as("b"))
      .select(col("vec_id"), col("b.t").as("t"), col("b.bk").as("bk"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.t") === col("b.t") && col("a.bk") === col("b.bk") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
      .distinct()
    // verify join left to AQE: broadcast at test scale, shuffle-on-id
    // when the corpus outgrows a broadcast
    val vecs = withBuckets.select(col("vec_id"), col("vn"))
    cand
      .join(vecs.select(col("vec_id").as("v1"), col("vn").as("vn1")), "v1")
      .join(vecs.select(col("vec_id").as("v2"), col("vn").as("vn2")), "v2")
      .select(col("v1"), col("v2"),
        round(dotCol(col("vn1"), col("vn2")), 6).as("cosine"))
      .filter(col("cosine") >= AnnMinCosine)
  }

  /** Occupancy target for the q_emb_lsh_scaling oracle row (8 rather
    * than bitsForCorpusSize's default 32 so the bench corpora are big
    * enough for bits to actually move between the two sizes).
    */
  val ScalingTargetOccupancy = 8L

  /** Oracle row for the bits = f(N) dial (VERDICT r4 ask #6): bucket
    * occupancy statistics at TWO corpus sizes — the full table and the
    * lower-half of vec_ids — each hashed at its own
    * `bitsForCorpusSize(n, 8)` width. Because bit j of a bucket comes
    * from plane j, a narrower table-0 bucket is exactly the low-bits
    * MASK of the full-width one, so one bucket pass at BitsPerTable
    * serves every width <= BitsPerTable (the cap below) and the whole
    * query stays declarative — n, bits, and the mask are computed
    * in-plan, no driver-side count. The pinned invariant is the
    * occupancy RATIO between the two sizes: absolute occupancy tracks
    * how clustered the corpus is (uniform-hash expectation is the
    * target; clustered data sits above it), but if bits grows one per
    * doubling, occupancy is SIZE-INVARIANT — `ratio_in_band` asserts
    * occ_full/occ_half in [0.5, 2] while the cell count doubles.
    */
  def lshOccupancyScaling(emb: DataFrame): DataFrame = {
    val bkt = withAllBuckets(normalized(emb, withLabel = false), BitsPerTable)
      .select(col("vec_id"), col("bucket_0")).cache()
    // materialize before the fan-out (full/half occupancy stats + the
    // max-id probe all consume bkt in one action — r20 sweep)
    bkt.count()
    val half = bkt.crossJoin(bkt.agg(max(col("vec_id")).as("mxid")))
      .filter(expr("vec_id <= mxid DIV 2"))
      .select(col("vec_id"), col("bucket_0"))
    val ratio = col("f.avg_occupancy") / col("h.avg_occupancy")
    occupancyStats(bkt, "full").as("f")
      .crossJoin(occupancyStats(half, "half_ids").as("h"))
      .select(
        col("f.n").as("n_full"), col("f.bits").as("bits_full"),
        col("f.n_buckets").as("buckets_full"), col("f.avg_occupancy").as("occ_full"),
        col("h.n").as("n_half"), col("h.bits").as("bits_half"),
        col("h.n_buckets").as("buckets_half"), col("h.avg_occupancy").as("occ_half"),
        ratio.as("occ_ratio"),
        (ratio >= 0.5 && ratio <= 2.0).cast("int").as("ratio_in_band"))
  }

  private def occupancyStats(bkt: DataFrame, label: String): DataFrame = {
    bkt.crossJoin(bkt.agg(count(lit(1)).as("n")))
      // exact Scala bitsForCorpusSize(n, 8) in-plan: ceil/log2/greatest
      // agree across engines (log2 hits exact doubles at powers of two,
      // and non-integer values sit ulps away from any ceil boundary);
      // LEAST(.., BitsPerTable) is the mask-trick bound — planes above
      // BitsPerTable-1 were never hashed
      .withColumn("bits", least(
        greatest(lit(4L), ceil(log2(ceil(col("n") / ScalingTargetOccupancy.toDouble)))),
        lit(BitsPerTable.toLong)))
      .withColumn("bk", col("bucket_0") % expr("CAST(round(pow(2.0, bits)) AS BIGINT)"))
      .groupBy(col("n"), col("bits"))
      .agg(countDistinct(col("bk")).as("n_buckets"))
      .select(col("n"), col("bits"), col("n_buckets"),
        (col("n").cast("double") / col("n_buckets")).as("avg_occupancy"))
  }

  val IvfCells = 16
  val IvfProbes = 2
  val IvfIters = 2

  /** One Lloyd's iteration as DataFrame ops, deterministic across engines:
    *
    *   1. assign: nearest centroid by cosine (dot of unit vectors; the
    *      doubles are bit-identical in both engines because every dot
    *      folds left-to-right — see PortableSql.dot);
    *   2. update: the new centroid is the renormalized component-wise sum
    *      of its members. Components are quantized to integer micro-units
    *      BEFORE summation — an integer sum is exact and order-insensitive,
    *      where a double sum would pick up the aggregation order and break
    *      the DuckDB oracle's bit-parity. Renormalization then cancels the
    *      1/n mean factor (cv = s / ||s||), so no division precision enters.
    *
    * Empty cells keep their previous centroid (LEFT JOIN + CASE). The
    * shape is the scalable one: K centroids broadcast, one narrow pass to
    * assign, a 64-column partial-aggregated sum (map-side combine) — the
    * classic distributed k-means step.
    */
  private def lloydIter(vecs: DataFrame, cents: DataFrame): DataFrame = {
    // Nearest centroid as a partial-aggregatable argmax (max_by over a
    // (cos, -centroid_id) struct — identical ordering to the row_number
    // window it replaced: highest cosine wins, ties to the LOWEST id).
    // The window shuffled all N×K crossJoin rows carrying the 64-double
    // vn array; max_by map-side-combines to N narrow rows before the
    // exchange, and vn is re-fetched from the cached `vecs` by a join
    // only for the rows that survive. Same argmax, ~K× less exchanged.
    val asg = vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("centroid_id"),
        dotCol(col("vn"), col("cv")).as("cos"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("centroid_id"),
        struct(col("cos"), (-col("centroid_id")).as("nid"))).as("centroid_id"))
    // component sums via the native vector-sum aggregate: one mutable
    // Array[Long] buffer per centroid, map-side partial + merge — ONE
    // shuffle of K×dim-long buffers. (A 64-column sum compiled a huge
    // codegen unit; posexplode multiplied rows by dim and needed a
    // second groupBy to rebuild the array.) Integer sums are exact and
    // order-insensitive, so the oracle's per-component sums still match.
    val sums = asg.join(vecs, "vec_id")
      .select(col("centroid_id"),
        expr("transform(vn, x -> CAST(round(x * 1000000.0) AS BIGINT))").as("mv"))
      .groupBy(col("centroid_id"))
      .agg(graft.functions.VectorAggregates.vecSumLong(col("mv"), Dim).as("sv_long"))
    val upd = sums
      .select(col("centroid_id"), expr("transform(sv_long, x -> CAST(x AS DOUBLE))").as("sv"))
      .withColumn("nrm", sqrt(dotCol(col("sv"), col("sv"))))
    cents.join(upd, Seq("centroid_id"), "left")
      .select(col("centroid_id"),
        when(col("nrm").isNull || col("nrm") === 0, col("cv"))
          .otherwise(expr("transform(sv, x -> x / nrm)")).as("cv"))
  }

  /** K-means centroids: seeds are the vectors with vec_id < K, refined by
    * `IvfIters` Lloyd's iterations (round-3 ask #8 — the placeholder
    * seeds are now only the INIT, as in a real index build).
    */
  private def lloydCentroids(vecs: DataFrame): DataFrame = {
    val seeds = vecs.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("centroid_id"), col("vn").as("cv"))
    // each iteration's K-row centroid frame crosses a localCheckpoint
    // barrier — the SAME barrier the dedup propagation loop uses, for the
    // same reason: a lazy cache leaves round k's plan nesting all k-1
    // prior rounds (3.8M-char spec plan strings, VERDICT r10 #2), and
    // even an eagerly-filled cache still RENDERS the cached child plan
    // inside every consumer (InMemoryTableScanExec inner children), so
    // only lineage truncation makes per-round plans O(1). Eager by
    // default; losing an executor recomputes K rows from the cached vecs.
    (1 to IvfIters).foldLeft(seeds)((c, _) => lloydIter(vecs, c).localCheckpoint())
  }

  /** IVF coarse assignment: each vector goes to its nearest of K k-means
    * cells (seeded from vec_id < K, Lloyd-refined — see lloydCentroids).
    * The partitioning shape is what matters at 100 TB: one broadcast of K
    * centroids, one narrow pass, then the corpus is laid out
    * cell-partitioned so a query touches only its probed cells.
    */
  /** Nearest-refined-centroid assignment of every vector (the shared
    * tail of ivfAssign and ivfTopK — both must see the SAME centroids).
    */
  private def assignTo(vecs: DataFrame, cents: DataFrame): DataFrame = {
    // same argmax-as-aggregation shape as lloydIter: the max_by partial
    // combines N×K assignment candidates down to N rows map-side, where
    // the row_number window it replaced exchanged all N×K rows
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("centroid_id"),
        round(dotCol(col("vn"), col("cv")), 6).as("cos"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("centroid_id"), col("cos")),
        struct(col("cos"), (-col("centroid_id")).as("nid"))).as("m"))
      .select(col("vec_id"), col("m.centroid_id").as("centroid_id"),
        col("m.cos").as("centroid_cos"))
  }

  def ivfAssign(emb: DataFrame): DataFrame = {
    // one narrow materialization feeds seeds, both Lloyd's iterations and
    // the final assignment pass (lifecycle caller-owned, as throughout)
    val vecs = normalized(emb, withLabel = false).cache()
    vecs.count() // pre-materialize before fan-out (r19, the pqCodes lesson)
    assignTo(vecs, lloydCentroids(vecs))
  }

  /** IVF probe search: evaluate the query vector only against vectors
    * whose cell is one of the `IvfProbes` nearest centroids — the
    * recall/cost dial of a 100 TB ANN index (cells not probed are never
    * scanned; with cell-partitioned storage that is partition pruning).
    * Probe selection and assignment use the SAME Lloyd-refined
    * centroids: probing the raw seeds against refined assignments would
    * scan cells that are not actually the query's nearest.
    */
  def ivfTopK(emb: DataFrame, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val vecs = normalized(emb, withLabel = false).cache()
    vecs.count() // pre-materialize before fan-out (r19, the pqCodes lesson)
    val cents = lloydCentroids(vecs)
    val assign = assignTo(vecs, cents)
    val q = vecs.filter(col("vec_id") === queryId).select(col("vn").as("qv"))
    val probed = cents.crossJoin(broadcast(q))
      .select(col("centroid_id"), dotCol(col("cv"), col("qv")).as("qcos"))
      .orderBy(col("qcos").desc, col("centroid_id").asc)
      .limit(IvfProbes)
      .select(col("centroid_id"))
    vecs.join(assign, "vec_id")
      .join(broadcast(probed), "centroid_id")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("centroid_id"),
        round(dotCol(col("vn"), col("qv")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF accuracy audit: recall@k of the probe search against the
    * brute-force top-k for the standard query vector — the dial every
    * ANN deployment monitors when trading probes for latency. Both
    * rankings are deterministic here (left-fold dots, fixed tiebreaks),
    * so the overlap count is an exact oracle-checkable value, not a
    * statistical one.
    */
  /** nprobe sweep for the recall audit (1 = cheapest, 4 = quarter of
    * the cells).
    */
  val IvfSweepProbes: Seq[Int] = Seq(1, 2, 4)

  /** IVF nprobe→recall SWEEP — the tuning table an ANN deployment reads
    * before fixing its probe count: one row per nprobe ∈
    * [[IvfSweepProbes]] with recall@k vs the exact cosine top-k. The
    * index builds ONCE (vecs/centroids/assignment shared across sweep
    * points — not one Lloyd run per row); each sweep point differs only
    * in how many ranked centroids it probes, exactly how a server would
    * re-tune nprobe without rebuilding the index. The centroid rank
    * window runs over the K-row centroid frame, never data.
    */
  def ivfProbeSweep(emb: DataFrame, k: Int = 10,
      probes: Seq[Int] = IvfSweepProbes): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = normalized(emb, withLabel = false).cache()
    vecs.count() // pre-materialize before fan-out (r19, the pqCodes lesson)
    val cents = lloydCentroids(vecs)
    val assign = assignTo(vecs, cents).cache()
    assign.count() // pre-materialize: every probe branch consumes it (r19)
    val q = vecs.filter(col("vec_id") === 0L).select(col("vn").as("qv"))
    val crank = cents.crossJoin(broadcast(q))
      .select(col("centroid_id"), dotCol(col("cv"), col("qv")).as("qcos"))
      .withColumn("crnk",
        row_number().over(Window.orderBy(col("qcos").desc, col("centroid_id").asc)))
    val exact = cosineTopK(emb, k = k).select(col("vec_id")).cache()
    exact.count() // pre-materialize: every probe branch consumes it (r19)
    probes.map { p =>
      val probed = crank.filter(col("crnk") <= p).select(col("centroid_id"))
      val approx = vecs.join(assign, "vec_id")
        .join(broadcast(probed), "centroid_id")
        .filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), round(dotCol(col("vn"), col("qv")), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(k).select(col("vec_id"))
      exact.join(approx, "vec_id")
        .agg(count(lit(1)).as("n_overlap"))
        .select(lit(p.toLong).as("nprobe"), lit(k.toLong).as("k"), col("n_overlap"),
          round(col("n_overlap").cast("double") / k, 6).as("recall"))
    }.reduce(_.unionByName(_))
  }

  def ivfRecall(emb: DataFrame, k: Int = 10): DataFrame = {
    val exact = cosineTopK(emb, k = k).select(col("vec_id"))
    val approx = ivfTopK(emb, k = k).select(col("vec_id"))
    exact.join(approx, "vec_id")
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(k).as("k"), col("n_overlap"),
        round(col("n_overlap").cast("double") / k, 6).as("recall"))
  }

  /** Hybrid retrieval scoring — the RAG-serving pattern: rank documents
    * for a query vector by a weighted blend of semantic similarity and
    * content quality (cosine to the query embedding + the TextOps
    * quality heuristic), top-k by the blended score. One broadcast of
    * the query row, one narrow similarity pass, one equi-join to the
    * quality projection, TakeOrderedAndProject — never a global sort.
    * Both components are already oracle-deterministic (round(6) cosines,
    * round(6) quality), and the blend is IEEE double arithmetic both
    * engines execute identically.
    */
  val HybridCosWeight = 0.7
  val HybridQualWeight = 0.3

  /** Reciprocal-rank-fusion constant (the standard 60 of Cormack et al.
    * SIGIR'09).
    */
  val RrfC = 60L

  /** RRF fusion of the lexical and vector retrievers — the OTHER hybrid
    * pattern next to [[hybridSearch]]'s score blend: instead of mixing
    * raw scores (which need calibration), fuse the RANKS:
    * rrf = Σ_rankers floor(1e6 / (C + rank)), docs absent from a ranker
    * contributing 0. Rank arithmetic is pure integers, so every compared
    * value is exact. Each retriever's pool is a TakeOrderedAndProject
    * top-k; the rank windows ride on those k-row frames (bounded size,
    * never a data-sized global window), and the fuse is one full-outer
    * equi-join of two k-row frames.
    */
  def rrfFusion(emb: DataFrame, docs: DataFrame, queryId: Long = 0L,
      pool: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = TextOps.bm25Search(docs, pool)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("score_micro").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    val vec = cosineTopK(emb, queryId, pool)
      .withColumn("vec_rank", row_number().over(
        Window.orderBy(col("cosine").desc, col("vec_id").asc)).cast("long"))
      .select(col("vec_id").as("doc_id"), col("vec_rank"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0L)).as("vec_rank"))
      .withColumn("rrf_micro",
        expr(s"CASE WHEN lex_rank > 0 THEN 1000000 DIV ($RrfC + lex_rank) ELSE CAST(0 AS BIGINT) END") +
        expr(s"CASE WHEN vec_rank > 0 THEN 1000000 DIV ($RrfC + vec_rank) ELSE CAST(0 AS BIGINT) END"))
  }

  def hybridSearch(emb: DataFrame, docs: DataFrame, queryId: Long = 0L,
      k: Int = 10): DataFrame = {
    val e = emb.select(col("vec_id"), expr(vcol).as("v"))
    val q = e.filter(col("vec_id") === queryId).select(col("v").as("qv"))
    val sims = e.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dotCol(col("v"), col("qv")) /
          (sqrt(dotCol(col("v"), col("v"))) * sqrt(dotCol(col("qv"), col("qv")))), 6)
          .as("cosine"))
    val qual = TextOps.qualityScore(docs).select(col("doc_id"), col("quality"))
    sims.join(qual, sims("vec_id") === qual("doc_id"))
      .select(col("doc_id"), col("cosine"), col("quality"),
        round(lit(HybridCosWeight) * col("cosine") +
          lit(HybridQualWeight) * col("quality"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Topic-mix audit: the unsupervised twin of the domain-mixture plan —
    * cluster every embedding into its Lloyd-refined IVF cell ("topic")
    * and cross-tab against the document's SOURCE: per source, how many
    * distinct topics it spans and how concentrated it is on its dominant
    * topic (basis points). A source whose mass collapses onto one topic
    * is a single-subject crawl; a curation team reads this next to
    * q_mix_plan before setting sampling weights. Shape at 100 TB: rides
    * the ivfAssign machinery (broadcast-K centroid argmax — no new
    * corpus-scale shuffle beyond the assignment itself), one doc-keyed
    * equi-join to the source dim, |sources x cells| rows after. Reuses
    * the q_emb_ivf_assign oracle CTEs verbatim, so both engines derive
    * topics from the identical centroid arithmetic.
    */
  def topicMix(emb: DataFrame, docs: DataFrame): DataFrame =
    topicRollup(ivfAssign(emb)
      .join(docs.select(col("doc_id").as("vec_id"), col("source")), "vec_id")
      .groupBy(col("source"), col("centroid_id"))
      .agg(count(lit(1)).as("n")))

  /** The per-source rollup of a (source, topic, n) contingency frame —
    * shared by [[topicMix]] and the streaming twin's readback.
    */
  private[graft] def topicRollup(st: DataFrame): DataFrame =
    st.groupBy(col("source"))
      .agg(sum(col("n")).as("n_docs"),
        count(lit(1)).as("n_topics"),
        max(col("n")).as("n_top"))
      .withColumn("top_share_bp", expr("n_top * 10000 DIV n_docs"))

  /** The Lloyd-refined centroids folded into ONE row holding an array of
    * (centroid_id, cv) structs — the frozen model a deployed per-row
    * scorer broadcasts (see the streaming twin q_stream_topics).
    */
  private[graft] def frozenCentroidArray(emb: DataFrame): DataFrame = {
    val vecs = normalized(emb, withLabel = false).cache()
    vecs.count() // pre-materialize before fan-out (r19, the pqCodes lesson)
    lloydCentroids(vecs)
      .agg(collect_list(struct(col("centroid_id"), col("cv"))).as("cl"))
  }

  /** Per-ROW topic assignment against a frozen centroid array — the
    * streaming-safe form of assignTo: the argmax runs INSIDE one row
    * (array_max over a transform of the broadcast centroid array), so a
    * stream can assign topics with zero keyed state where assignTo's
    * groupBy(vec_id) would accumulate a row per document. Identical
    * arithmetic and tie-break (rounded cosine desc, centroid_id asc) to
    * the batch path: same normalization exprs, same native dot, same
    * round(…, 6) entering the comparison — so replaying a corpus
    * reproduces ivfAssign's assignments exactly.
    */
  private[graft] def topicAssignRowwise(rows: DataFrame,
      centsArr: DataFrame): DataFrame =
    rows
      .withColumn("v", expr(vcol))
      .withColumn("nrm", sqrt(dotCol(col("v"), col("v"))))
      .filter(col("nrm") > 0)
      .withColumn("vn", expr("transform(v, x -> x / nrm)"))
      .crossJoin(broadcast(centsArr))
      .withColumn("best", array_max(transform(col("cl"), c =>
        struct(round(dotCol(col("vn"), c.getField("cv")), 6).as("cos"),
          (-c.getField("centroid_id")).as("nid"),
          c.getField("centroid_id").as("cid")))))
      .select(col("source"), col("best").getField("cid").as("topic"))

  /** K-means convergence audit: per-centroid movement across the two
    * Lloyd's iterations of the index build — the monitoring row an index
    * pipeline alarms on (movement should shrink; a centroid still moving
    * at the last iteration means the build stopped early). Movement is
    * computed with the dot identity ||a-b||^2 = a.a - 2 a.b + b.b, so
    * only left-fold dots enter the value and the oracle (which rebuilds
    * c0/c1/c2 from the same CTEs) reproduces it bit-for-bit.
    */
  def centroidDrift(emb: DataFrame): DataFrame = {
    val vecs = normalized(emb, withLabel = false).cache()
    vecs.count() // pre-materialize before fan-out (r19, the pqCodes lesson)
    val c0 = vecs.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("centroid_id"), col("vn").as("cv"))
    // same flat-lineage barrier as lloydCentroids: c2 must hang off c1's
    // materialized rows, not re-nest (and re-render) c1's join+agg chain
    val c1 = lloydIter(vecs, c0).localCheckpoint()
    val c2 = lloydIter(vecs, c1).localCheckpoint()
    def movement(a: DataFrame, b: DataFrame, out: String): DataFrame =
      a.select(col("centroid_id"), col("cv").as("a"))
        .join(b.select(col("centroid_id"), col("cv").as("b")), "centroid_id")
        .select(col("centroid_id"),
          round(sqrt(dotCol(col("a"), col("a")) -
            lit(2.0) * dotCol(col("a"), col("b")) +
            dotCol(col("b"), col("b"))), 6).as(out))
    movement(c0, c1, "move_1")
      .join(movement(c1, c2, "move_2"), "centroid_id")
      .select(col("centroid_id"), col("move_1"), col("move_2"),
        (col("move_2") <= col("move_1")).cast("int").as("shrinking"))
  }

  /** INCREMENTAL IVF maintenance (VERDICT r10 ask #6) — the vector-side
    * sibling of the dedup family's incremental cluster labels: centroids
    * are FROZEN at yesterday's index build (Lloyd over the STANDING
    * slice; an index rebuild is the expensive, occasional event), and the
    * arriving batch (vec_id % IncrMod == IncrRem, the dedup family's
    * slice convention) is only ASSIGNED — one broadcast of K frozen
    * centroids, one narrow pass over the batch. Per-cell occupancy stats
    * (count + exact integer-micro component checksum) are maintained as a
    * FOLD: standing stats + batch stats, re-aggregated per cell. Because
    * per-cell stats are additive over any partition of the vectors, the
    * folded snapshot provably equals a full re-assignment of the whole
    * corpus against the same frozen centroids — which is exactly what the
    * oracle computes (the q_incr_agg / q_dedup_clusters_incr proof
    * pattern: different plan, identical answer). In production the
    * standing side's stats come off the stored snapshot; here they are
    * recomputed (same values by construction), as throughout the
    * incremental family.
    */
  // exact per-vector checksum of the integer-micro components: additive,
  // order-insensitive, and bounded (|Dim x 1e6| << 2^63) — the same
  // arithmetic discipline as the Lloyd sums
  private def cellStats(vecs: DataFrame, cents: DataFrame): DataFrame =
    assignTo(vecs, cents)
      .join(vecs.select(col("vec_id"), expr(
        "aggregate(vn, CAST(0 AS BIGINT), (a, x) -> a + CAST(round(x * 1000000.0) AS BIGINT))")
        .as("chk")), "vec_id")
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("chk")).as("sum_chk"))

  def ivfIncrementalStats(emb: DataFrame): DataFrame = {
    val all = normalized(emb, withLabel = false).cache()
    all.count() // pre-materialize before fan-out (r19, the pqCodes lesson)
    val standing = all.filter(col("vec_id") % DedupOps.IncrMod =!= DedupOps.IncrRem)
    val batch = all.filter(col("vec_id") % DedupOps.IncrMod === DedupOps.IncrRem)
    val cents = lloydCentroids(standing)
    cellStats(standing, cents).unionAll(cellStats(batch, cents))
      .groupBy(col("centroid_id"))
      .agg(sum(col("n_vecs")).as("n_vecs"), sum(col("sum_chk")).as("sum_chk"))
  }

  /** Single-pass re-assignment of the WHOLE corpus against the same
    * frozen standing-slice centroids — the full restart the fold must
    * equal (spec-pinned in VectorOpsSpec; the DuckDB oracle recomputes
    * this same shape independently).
    */
  private[graft] def ivfFullRestartStats(emb: DataFrame): DataFrame = {
    val all = normalized(emb, withLabel = false).cache()
    all.count() // pre-materialize before fan-out (r19, the pqCodes lesson)
    val standing = all.filter(col("vec_id") % DedupOps.IncrMod =!= DedupOps.IncrRem)
    cellStats(all, lloydCentroids(standing))
  }

  /** Parquet root of the PERSISTED frozen-centroid index — the vector
    * sibling of the dedup family's persisted band index: a real daily
    * assignment job reads yesterday's K centroids off storage, it does
    * not re-run Lloyd. Built once per testdata content key from the
    * standing slice; K rows, one file.
    */
  def ivfCentroidIndexRoot(s: SparkSession, dir: String): String = {
    val root = graft.streaming.StreamQueries.fixtureDir("ivfcents", dir, "embeddings")
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_SUCCESS"))) {
      val standing = normalized(Tables.embeddings(s, dir), withLabel = false)
        .filter(col("vec_id") % DedupOps.IncrMod =!= DedupOps.IncrRem).cache()
      lloydCentroids(standing).coalesce(1).write.mode("overwrite").parquet(root)
      standing.unpersist(false)
    }
    root
  }

  /** [[ivfIncrementalStats]] with the frozen centroids READ BACK from the
    * persisted index instead of re-run: no Lloyd anywhere in the plan —
    * one K-row parquet scan broadcast onto the two assignment passes.
    * Same answer, same oracle (the centroid VALUES are identical by
    * construction: the index build is the same standing-slice Lloyd).
    */
  def ivfIncrementalStatsPersisted(s: SparkSession, dir: String): DataFrame = {
    val cents = s.read.parquet(ivfCentroidIndexRoot(s, dir))
    val all = normalized(Tables.embeddings(s, dir), withLabel = false).cache()
    all.count() // pre-materialize before fan-out (r19, the pqCodes lesson)
    val standing = all.filter(col("vec_id") % DedupOps.IncrMod =!= DedupOps.IncrRem)
    val batch = all.filter(col("vec_id") % DedupOps.IncrMod === DedupOps.IncrRem)
    cellStats(standing, cents).unionAll(cellStats(batch, cents))
      .groupBy(col("centroid_id"))
      .agg(sum(col("n_vecs")).as("n_vecs"), sum(col("sum_chk")).as("sum_chk"))
  }

  val DedupMinCosine = 0.9

  /** Embedding-cosine near-dup dedup: among LSH-candidate pairs with
    * cosine >= 0.9, drop the larger vec_id of each pair — the embedding
    * flavor of the dedup family (DedupOps covers the text flavors).
    * Emitting the DROP list keeps the operator composable (anti-join it
    * against the corpus to materialize the deduped set).
    */
  def embDedupDrops(emb: DataFrame, bits: Int = BitsPerTable): DataFrame =
    annPairs(emb, bits)
      .filter(col("cosine") >= DedupMinCosine)
      .select(col("v2").as("drop_vec_id"))
      .distinct()

  /** SemDeDup-style cluster-scoped semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): pair candidates are generated WITHIN k-means
    * cells only — pairs never cross cells, so the pair volume scales
    * with Σ cell² under a bounded cell size (K dials up with corpus
    * size), not corpus². Reuses the Lloyd-refined IVF assignment
    * (same centroids as q_emb_ivf_*), then drops the larger vec_id of
    * every within-cell pair with cosine >= [[SemDedupMinCosine]]
    * (looser than the 0.9 near-dup dial: SemDeDup prunes SEMANTIC
    * redundancy, not just byte-level twins — this corpus's nearest
    * pairs sit around 0.5).
    *
    * Complements q_emb_dedup_drops (SRP-LSH candidates): LSH recalls
    * near-dups that straddle cell boundaries, the cell scope gives the
    * cheaper one-assignment-pass plan — production pipelines run the
    * cell pass first and an LSH pass on the survivors.
    */
  val SemDedupMinCosine = 0.4

  /** Hot-cell cap: a cell larger than this is split by ceil(log2(n/cap))
    * extra SRP sign bits before the within-cell self-join, so per-cell
    * pair work is bounded by ~cap² however skewed the cell distribution
    * gets — THE scale guard for the one quadratic arm in this family
    * (a 100 TB corpus with a hot "empty document" cell would otherwise
    * hand one task a trillion-pair self-join). Pairs that straddle
    * sub-buckets are forgone — the standard SemDeDup engineering trade
    * (recall inside a hot cell for boundedness), and the same dial as
    * lshBuckets' one-bit-per-doubling occupancy rule. The default sits
    * far above any bench-SF cell size (2000 vectors total at sf0.1), so
    * the oracle-matched q_emb_semdedup output is byte-identical with the
    * cap armed; VectorOpsSpec drives the cap path directly with a tiny
    * threshold and pins the subset relation to the uncapped answer.
    */
  val SemDedupHotCellCap = 1024
  private val SemDedupMaxSubBits = 16

  def semDedupDrops(emb: DataFrame,
      hotCellCap: Int = SemDedupHotCellCap): DataFrame = {
    val vecs = normalized(emb, withLabel = false).cache()
    // pre-materialize before the fan-out (Lloyd + assignment + member
    // join all consume vecs in one action — r19, the pqCodes lesson)
    vecs.count()
    val member = assignTo(vecs, lloydCentroids(vecs))
      .select(col("vec_id"), col("centroid_id"))
      .join(vecs, "vec_id")
      .select(col("centroid_id"), col("vec_id"), col("vn"))
    // one K-row aggregate broadcast back: cells at/below the cap keep
    // sub_key 0 (the common case — NO extra work on a balanced corpus);
    // hot cells mask just enough SRP bits to get expected sub-cells
    // under the cap.
    val sizes = member.groupBy("centroid_id").agg(count(lit(1)).as("cell_n"))
    val keyed = member.join(broadcast(sizes), "centroid_id")
      // ceil(log2(cell_n / cap)) in PURE INTEGER form — bitLen(ceil(n/cap)
      // - 1) — because the r13 sf1 gate proved the cap ENGAGES at scale
      // (200k vectors push cells past 1024) and an oracle-compared value
      // must never pass through libm log2; bitLen's ladder caps at
      // SemDedupMaxSubBits by construction
      .withColumn("sub_bits",
        when(col("cell_n") > hotCellCap,
          expr(graft.functions.PortableSql.bitLen(
            s"((cell_n + ${hotCellCap - 1}) DIV $hotCellCap) - 1",
            SemDedupMaxSubBits)))
          .otherwise(0L).cast("int"))
      .withColumn("srp", graft.functions.SrpBucketsExpression.buckets(
        col("vn"), 1, SemDedupMaxSubBits, Dim))
      .withColumn("sub_key",
        expr("element_at(srp, 1) & (shiftleft(CAST(1 AS BIGINT), sub_bits) - 1)"))
      .select(col("centroid_id"), col("sub_key"), col("vec_id"), col("vn"))
      // cached + materialized (r19): the within-cell self-join below
      // consumes keyed on BOTH arms — uncached, the whole assignment +
      // SRP-bucket pipeline executed twice, once per arm
      .cache()
    keyed.count()
    keyed.as("a").join(keyed.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col("a.sub_key") === col("b.sub_key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.centroid_id").as("centroid_id"),
        col("b.vec_id").as("drop_vec_id"),
        round(dotCol(col("a.vn"), col("b.vn")), 6).as("cosine"))
      .filter(col("cosine") >= SemDedupMinCosine)
      .groupBy(col("centroid_id"), col("drop_vec_id"))
      .agg(max(col("cosine")).as("max_cosine"))
  }

  /** Int8 scalar quantization — the compression step an embedding store
    * applies before indexing (4x smaller, SIMD-friendly dot products):
    * per-vector symmetric scale = max|x| / 127, code = floor(x / scale).
    * Quantization is pure elementwise arithmetic on doubles both engines
    * compute identically (divisions and floor — no accumulation), so
    * unlike the sketch rows this has EXACT integer parity: the oracle
    * recomputes every vector's code sums bit-for-bit. Zero vectors keep
    * scale 0 and all-zero codes. Narrow one-pass projection; floor (not
    * round) because round-half behavior is the one elementwise op the
    * engines disagree on.
    */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    // m and q are projected ONCE per row: higher-order functions are
    // interpreted (no loop-invariant hoisting), so inlining m into the
    // transform lambda would rescan the vector per element
    val q = "transform(v, x -> CAST(floor(x / (m / 127.0D)) AS BIGINT))"
    embeddings
      .select(col("vec_id"), expr(vcol).as("v"))
      .withColumn("m", expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("q", expr(s"CASE WHEN m > 0.0D THEN $q ELSE NULL END"))
      .select(col("vec_id"),
        expr("CAST(floor(m / 127.0D * 1000000.0D) AS BIGINT)").as("scale_micro"),
        expr(s"""CASE WHEN m > 0.0D
          THEN ${reduceLong("q", "a", "x", "a + x", duck = false)}
          ELSE CAST(0 AS BIGINT) END""").as("sum_q"),
        expr(s"""CASE WHEN m > 0.0D
          THEN ${reduceLong("q", "a", "x", "a + x * x", duck = false)}
          ELSE CAST(0 AS BIGINT) END""").as("sum_q2"))
  }

  // ---- Product quantization (IVF+PQ is the standard 100 TB ANN layout;
  //      int8 covers storage, IVF covers partitioning, PQ covers in-cell
  //      distance compression: Dim doubles -> PqM one-byte codes) ----

  val PqM = 8                 // subspaces
  val PqSubDim: Int = Dim / PqM
  val PqK = 16                // codes per subspace codebook
  val PqIters = 1             // Lloyd refinement rounds per codebook
  val PqCoarseK = 16          // coarse (IVF-tier) cells
  val PqCoarseIters = 1       // Lloyd rounds for the coarse quantizer

  /** ALL PQ arithmetic is integer-valued: vectors land as round(x*1e6)
    * micros (held in doubles — every intermediate stays far under 2^53,
    * so double arithmetic IS integer arithmetic), squared distances are
    * exact, and the codebook mean uses the offset-floor-division trick
    * `(s + cnt*OFF) DIV cnt - OFF` so Spark's truncating DIV and DuckDB's
    * flooring // agree on negative sums. That makes seeds, one Lloyd
    * round, code assignment, and the ADC table bit-identical cross-engine
    * — a float PQ would drift at the argmin boundaries.
    */
  private def pqD2(a: String, b: String, duck: Boolean): String =
    s"(${dot(a, a, duck)} - 2 * ${dot(a, b, duck)} + ${dot(b, b, duck)})"

  /** pqD2 through the NATIVE dot kernel (r19): the symbolic form above is
    * three interpreted aggregate(zip_with(..)) folds per evaluation, each
    * allocating the zipped array — and pqAssign evaluates it once per
    * (vector, subspace, code) candidate, the PQ family's hottest loop.
    * Bit-identical to the symbolic form the oracle keeps evaluating:
    * every operand is an integer-valued double (micro quantization), so
    * all products/sums are EXACT integers far below 2^53, and the kernel
    * folds left-to-right exactly like the SQL aggregate.
    */
  private def pqD2Col(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    dotCol(a, a) - lit(2.0) * dotCol(a, b) + dotCol(b, b)

  /** Component-wise difference a - b (integer-valued doubles stay exact). */
  private def residExpr(a: String, b: String, dim: Int, duck: Boolean): String =
    xform(seqIncl("1", dim.toString, duck), "i",
      s"${elem(a, "i", duck)} - ${elem(b, "i", duck)}", duck)

  /** (vec_id, vm): the integer-micro full vector of every row. */
  private def microVecs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), expr(
      s"transform($vcol, y -> CAST(CAST(round(y * 1000000.0) AS BIGINT) AS DOUBLE))")
      .as("vm"))

  /** Nearest-code assignment: broadcast the codebook, one argmin
    * aggregate per (vec, subspace) — map-side combined like assignTo.
    */
  private def pqAssign(subs: DataFrame, cb: DataFrame): DataFrame =
    subs.join(broadcast(cb), "m")
      .withColumn("d2", pqD2Col(col("xs"), col("cs")))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(struct(col("code"), col("d2")),
        struct(col("d2"), col("code"))).as("s"))
      .select(col("vec_id"), col("m"),
        col("s.code").as("code"), col("s.d2").as("d2"))

  private def pqSeeds(subs: DataFrame, k: Int): DataFrame =
    subs.filter(col("vec_id") < k)
      .select(col("m"), col("vec_id").as("code"), col("xs").as("cs"))

  private def pqIter(subs: DataFrame, cb: DataFrame, subDim: Int): DataFrame = {
    val sums = pqAssign(subs, cb).join(subs, Seq("vec_id", "m"))
      .select(col("m"), col("code"),
        expr("transform(xs, x -> CAST(x AS BIGINT))").as("mv"))
      .groupBy(col("m"), col("code"))
      .agg(graft.functions.VectorAggregates.vecSumLong(col("mv"), subDim).as("sv"),
        count(lit(1)).as("cnt"))
      // offset-floor division: see the arithmetic note above
      .select(col("m"), col("code"),
        expr("transform(sv, s -> CAST((s + cnt * 10000000) DIV cnt - 10000000 AS DOUBLE))")
          .as("cs2"))
    cb.join(sums, Seq("m", "code"), "left_outer")
      .select(col("m"), col("code"),
        coalesce(col("cs2"), col("cs")).as("cs"))
  }

  private def pqCodebookOver(subs: DataFrame, subDim: Int, k: Int,
      iters: Int): DataFrame =
    (1 to iters).foldLeft(pqSeeds(subs, k)) { (c, _) =>
      // localCheckpoint each round's K×M-row codebook: flat lineage, so
      // downstream plans neither re-optimize nor re-RENDER the grown
      // join+agg chain (see lloydCentroids) — codebooks are the tiny
      // frames here, the corpus-sized `subs` is cached by the caller once
      pqIter(subs, c, subDim).localCheckpoint()
    }

  /** Coarse quantizer (the IVF tier of IVF+PQ): K cells over the FULL
    * integer-micro vectors, seeds + one Lloyd round, all in the same
    * exact arithmetic — one "subspace" of width Dim.
    */
  private def pqCoarse(vm: DataFrame): DataFrame =
    pqCodebookOver(vm.select(col("vec_id"), lit(0).as("m"), col("vm").as("xs")),
      Dim, PqCoarseK, PqCoarseIters)

  /** (vec_id, cell, m, xs): RESIDUAL subvectors — each vector minus its
    * coarse cell centroid, sliced into PqM subspaces. Encoding residuals
    * is what makes PQ work on clustered corpora: raw-vector codebooks
    * spend their whole budget separating clusters (measured: recall@10 of
    * 0.0-0.3 on this corpus), while residual codebooks only have to
    * describe the within-cell spread — ‖q-x‖² = ‖(q-c)-(x-c)‖² exactly,
    * so ADC stays unbiased.
    */
  private def pqResidualSubs(vm: DataFrame, coarseCb: DataFrame): DataFrame = {
    val casg = pqAssign(
      vm.select(col("vec_id"), lit(0).as("m"), col("vm").as("xs")), coarseCb)
      .select(col("vec_id"), col("code").as("cell"))
    val res = vm.join(casg, "vec_id")
      .join(broadcast(coarseCb.select(col("code").as("cell"), col("cs"))), "cell")
      .select(col("vec_id"), col("cell"),
        expr(residExpr("vm", "cs", Dim, duck = false)).as("rv"))
    // ONE posexplode over the array of slices, not a PqM-way union: the
    // union form multiplied the whole upstream tree into every branch and
    // Catalyst re-optimized it per reference — 18-28s of pure planning/
    // codegen per PQ query at sf0.001 (7s of actual task time). The
    // generator form is a single plan branch. (Oracle keeps UNION ALL —
    // CTE references are cheap there.)
    res.select(col("vec_id"), col("cell"),
      posexplode(expr(sliceArrayExpr("rv"))).as(Seq("m", "xs")))
  }

  /** array(slice(v,1,d), slice(v,d+1,d), ...) — the PqM subvector slices. */
  private def sliceArrayExpr(v: String): String =
    (0 until PqM).map(m => s"slice($v, ${m * PqSubDim + 1}, $PqSubDim)")
      .mkString("array(", ", ", ")")

  /** Per-vector IVF+PQ encoding: coarse cell + PqM residual codes + the
    * exact squared quantization error (micro²).
    */
  def pqCodes(emb: DataFrame): DataFrame = {
    // materialize each cache BEFORE its fan-out (r19): the coarse
    // quantizer and the residual slicer both consume vm, and the
    // codebook build + assignment + cell projection all consume subs —
    // racing branches otherwise serialize on the block write locks (the
    // q_gen_constraints lesson; measured here as task_run 28s on 6.5s
    // of task CPU with an idle probe)
    val vm = microVecs(emb).cache()
    vm.count()
    val subs = pqResidualSubs(vm, pqCoarse(vm)).cache()
    subs.count()
    val enc = pqAssign(subs, pqCodebookOver(subs, PqSubDim, PqK, PqIters))
      .join(subs.select(col("vec_id"), col("cell")).distinct(), "vec_id")
    val codeCols = (0 until PqM).map(m =>
      max(when(col("m") === m, col("code"))).as(s"code_$m"))
    enc.groupBy(col("vec_id"))
      .agg(max(col("cell")).as("cell"),
        codeCols :+ sum(col("d2")).cast("long").as("err_sq"): _*)
  }

  /** ADC serving audit: per-CELL lookup tables of query-residual-to-code
    * distances (cells × PqM × PqK rows, built once per query — the whole
    * point of PQ serving: a scan then costs PqM table lookups per vector,
    * never a Dim-wide dot), approximate top-k from summing each vector's
    * PqM cells, and the row reports exact-L2-top-k overlap — recall@k,
    * the same audit shape as q_emb_ivf_recall.
    */
  def pqRecall(emb: DataFrame, queryId: Long = 0L, k: Int = 10): DataFrame = {
    // pre-materialized caches before fan-out, as in pqCodes (r19)
    val vm = microVecs(emb).cache()
    vm.count()
    val coarseCb = pqCoarse(vm)
    val subs = pqResidualSubs(vm, coarseCb).cache()
    subs.count()
    val cb = pqCodebookOver(subs, PqSubDim, PqK, PqIters)
    val enc = pqAssign(subs, cb)
      .join(subs.select(col("vec_id"), col("cell")).distinct(), "vec_id")
      .filter(col("vec_id") =!= queryId)
    // query residual PER CELL (q - c_cell), sliced like the corpus
    val qres = coarseCb.crossJoin(
        broadcast(vm.filter(col("vec_id") === queryId)
          .select(col("vm").as("qv"))))
      .select(col("code").as("cell"),
        expr(residExpr("qv", "cs", Dim, duck = false)).as("qrv"))
    val qslices = qres.select(col("cell"),
      posexplode(expr(sliceArrayExpr("qrv"))).as(Seq("m", "qxs")))
    val table = qslices.join(cb, "m")
      .select(col("cell"), col("m"), col("code"),
        pqD2Col(col("qxs"), col("cs")).as("dq"))
    val approx = enc.join(broadcast(table), Seq("cell", "m", "code"))
      .groupBy(col("vec_id")).agg(sum(col("dq")).as("adc_d2"))
      .orderBy(col("adc_d2").asc, col("vec_id").asc).limit(k)
    val exact = vm.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(vm.filter(col("vec_id") === queryId)
        .select(col("vm").as("qv"))))
      .select(col("vec_id"), pqD2Col(col("vm"), col("qv")).as("d2"))
      .orderBy(col("d2").asc, col("vec_id").asc).limit(k)
    exact.select("vec_id").join(approx.select("vec_id"), "vec_id")
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(k).as("k"), col("n_overlap"),
        round(col("n_overlap").cast("double") / k, 6).as("recall"))
  }

  /** Outliers to keep per label in q_emb_outliers. */
  val OutlierK = 5

  /** Embedding-space outlier screen per label — the "distance to class
    * centroid" quality filter a curation pipeline runs before training:
    * vectors far from their own label's centroid are mislabeled or noisy
    * candidates. ALL arithmetic is exact integers (the engine's
    * micro-unit convention): components quantize to round(x*1e6) BEFORE
    * the centroid mean (integer sums commute, so the distributed
    * aggregation order cannot perturb the result), the mean uses the
    * positive-shift floor division that agrees between Spark DIV and
    * DuckDB //, and distances are integer sums of squares (≤ 64 · (2.4e6)²
    * ≈ 4e14 « 2^63). Shape at 100 TB: one vecSumLong aggregate (K×dim
    * longs shuffled), a broadcast of the K-row centroid table, one
    * narrow distance pass, and a rank-limited window (WindowGroupLimit
    * keeps per-partition top-K, never a full per-label sort).
    */
  def labelOutliers(emb: DataFrame): DataFrame = {
    val mv = emb.select(col("vec_id"), col("label").cast("long").as("label"),
      expr(s"transform($vcol, y -> CAST(round(y * 1000000.0) AS BIGINT))").as("mv"))
    val cents = mv.groupBy(col("label"))
      .agg(graft.functions.VectorAggregates.vecSumLong(col("mv"), Dim).as("sv"),
        count(lit(1)).as("cnt"))
      .select(col("label"),
        expr("transform(sv, s -> (s + cnt * 10000000) DIV cnt - 10000000)").as("cv"))
    val d = mv.join(broadcast(cents), Seq("label"))
      .select(col("label"), col("vec_id"),
        expr("""aggregate(zip_with(mv, cv, (x, y) -> (x - y) * (x - y)),
               |CAST(0 AS BIGINT), (acc, z) -> acc + z)""".stripMargin).as("dist2_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("dist2_micro").desc, col("vec_id"))
    d.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= OutlierK)
  }

  /** The corpus Gram matrix XᵀX over integer-micro embedding components —
    * the one distributed pass behind PCA, whitening, and closed-form
    * linear probes (the normal equations' left side). Each row
    * contributes its 64×64 outer product; the native long-vector
    * aggregate folds them map-side, so the shuffle carries ONE
    * 4096-long buffer per partition regardless of row count, and the
    * driver never sees data rows. Exact integer parity: products ≤
    * (5.8e5)² ≈ 3.4e11, so sums stay in int64 up to ~2.7e7 rows per
    * cell magnitude — beyond that a 100 TB run widens the buffer to
    * DECIMAL(38) or block-partitions the sum; the PLAN (narrow outer
    * product + mergeable vector aggregate) is unchanged.
    */
  /** Power-iteration rounds and the fixed-point scales: the Gram frame
    * is down-shifted micro²→micro before the matvec so a 64-term
    * dot against a milli-scaled vector stays well under 2^63 at any
    * corpus size, and each round max-abs-normalizes back to ±1000
    * milli-units with SIGN-SPLIT truncating division (abs value before
    * dividing — truncation toward zero on non-negative operands is the
    * one integer division both engines agree on).
    */
  val PowerIters = 4

  /** Top principal direction of the embedding corpus by POWER ITERATION
    * over the [[gramMatrix]] — the PCA building block q_emb_gram's
    * scaladoc promises, run to a usable answer: 4 matvec rounds, each
    * one equi-join of the 64²-row Gram frame with the broadcast 64-row
    * vector + one aggregate on the row index (the PageRank plan shape on
    * a constant-size graph), `localCheckpoint` per round for O(1) plan
    * depth. All integer arithmetic — bit-exact cross-engine. Output: the
    * 64 eigvec components in milli-units plus the final pre-normalize
    * max |component| (`growth`, the eigenvalue-scale witness).
    */
  def powerIteration(emb: DataFrame): DataFrame = {
    val g = gramMatrix(emb)
      .select(col("i"), col("j"), expr("gram_micro2 DIV 1000000").as("g"))
      .cache()
    g.count() // materialize before the iteration DAG fans out over it
    var v = g.select(col("j")).distinct()
      .select(col("j").as("vj"), lit(1000L).as("v"), lit(0L).as("growth"))
    for (_ <- 1 to PowerIters) {
      val w = g.join(broadcast(v), g("j") === v("vj"))
        .groupBy(g("i")).agg(sum(col("g") * col("v")).as("w"))
      val mx = w.agg(max(abs(col("w"))).as("mx"))
      v = w.crossJoin(broadcast(mx))
        .select(col("i").as("vj"),
          expr("CASE WHEN w < 0 THEN -(((-w) * 1000) DIV mx) ELSE (w * 1000) DIV mx END").as("v"),
          col("mx").as("growth"))
        .localCheckpoint()
    }
    v.select(col("vj").as("dim"), col("v").as("eig_milli"), col("growth"))
  }

  def gramMatrix(emb: DataFrame): DataFrame = {
    val mv = emb.select(
      expr(s"transform($vcol, y -> CAST(round(y * 1000000.0) AS BIGINT))").as("mv"))
    mv.select(expr("flatten(transform(mv, x -> transform(mv, y -> x * y)))").as("op"))
      .agg(graft.functions.VectorAggregates.vecSumLong(col("op"), Dim * Dim).as("g"))
      .select(posexplode(col("g")).as(Seq("pos", "gram_micro2")))
      .select(expr(s"CAST(pos DIV $Dim AS BIGINT)").as("i"),
        expr(s"CAST(pos % $Dim AS BIGINT)").as("j"), col("gram_micro2"))
  }

  /** Deterministic audit-sample modulus for the LSH recall audit. */
  val LshRecallMod = 4L

  /** SRP-LSH pair RECALL audit — the companion of q_emb_ivf_recall for
    * the banded pair miner: on a deterministic fixed-size sample
    * (vec_id % [[LshRecallMod]] == 0) compute the EXACT cosine pair set
    * at the ANN threshold by brute force and measure what fraction the
    * banded join recovers (precision is 1 by construction — every
    * emitted pair is exact-verified; recall is the quantity LSH trades).
    * The exact sweep broadcasts the sample against itself — quadratic
    * ON THE SAMPLE only, which is the audit contract at any corpus
    * size: the sample is a dial, the full-corpus path stays banded.
    * One summary row: sample size, exact pairs, LSH-found pairs among
    * them, recall in exact ppm (-1 when the sample has no exact pair).
    */
  /** Table counts for the recall sweep (prefixes of the NTables bank —
    * adding tables only ever ADDS pairs, so the sweep is monotone by
    * construction, which the spec can pin).
    */
  val LshSweepTables: Seq[Int] = Seq(1, 2, 4)

  /** SRP-LSH table-count→recall SWEEP — the NTables dial q_emb_lsh_recall
    * measures at one point, swept: pair recall (vs the sample-bounded
    * exact sweep) using only the first t hash tables, t ∈
    * [[LshSweepTables]]. The bucket bank and the exact truth compute
    * ONCE; each sweep point restricts the band join to table indices
    * < t — more tables, more collisions, higher recall, linearly more
    * index cost: exactly the curve that prices a recall target.
    */
  def lshTableSweep(emb: DataFrame): DataFrame = {
    val wb = withAllBuckets(normalized(emb, withLabel = false), BitsPerTable).cache()
    // materialize before the fan-out (bands + vecs + the sample slice all
    // consume wb; exact's crossJoin reads sample twice — r20 sweep)
    wb.count()
    val sample = wb.filter(col("vec_id") % LshRecallMod === 0)
      .select(col("vec_id"), col("vn")).cache()
    val exact = sample.select(col("vec_id").as("v1"), col("vn").as("vn1"))
      .crossJoin(broadcast(sample.select(col("vec_id").as("v2"), col("vn").as("vn2"))))
      .filter(col("v1") < col("v2"))
      .filter(round(dotCol(col("vn1"), col("vn2")), 6) >= AnnMinCosine)
      .select(col("v1"), col("v2")).cache()
    exact.count() // materialize before the per-sweep-point fan-out (r20)
    val bands = wb.select(col("vec_id"), explode(array(
        (0 until NTables).map(t =>
          struct(lit(t).as("t"), col(s"bucket_$t").as("bk"))): _*)).as("b"))
      .select(col("vec_id"), col("b.t").as("t"), col("b.bk").as("bk"))
    val vecs = wb.select(col("vec_id"), col("vn"))
    LshSweepTables.map { nt =>
      val cand = bands.filter(col("t") < nt).as("a")
        .join(bands.filter(col("t") < nt).as("b"),
          col("a.t") === col("b.t") && col("a.bk") === col("b.bk") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
        .distinct()
      val found = cand
        .join(vecs.select(col("vec_id").as("v1"), col("vn").as("vn1")), "v1")
        .join(vecs.select(col("vec_id").as("v2"), col("vn").as("vn2")), "v2")
        .filter(round(dotCol(col("vn1"), col("vn2")), 6) >= AnnMinCosine)
        .filter(col("v1") % LshRecallMod === 0 && col("v2") % LshRecallMod === 0)
        .select(col("v1"), col("v2"))
      val hits = exact.join(found, Seq("v1", "v2"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hit"))))
        .select(lit(nt.toLong).as("n_tables"), col("n_exact"), col("n_hit"),
          expr("CASE WHEN n_exact = 0 THEN -1 " +
            "ELSE n_hit * 1000000 DIV n_exact END").as("recall_ppm"))
    }.reduce(_.unionByName(_))
  }

  def lshRecall(emb: DataFrame): DataFrame = {
    val sample = normalized(emb, withLabel = false)
      .filter(col("vec_id") % LshRecallMod === 0).cache()
    val exact = sample.select(col("vec_id").as("v1"), col("vn").as("vn1"))
      .crossJoin(broadcast(sample.select(col("vec_id").as("v2"), col("vn").as("vn2"))))
      .filter(col("v1") < col("v2"))
      .select(col("v1"), col("v2"),
        round(dotCol(col("vn1"), col("vn2")), 6).as("cosine"))
      .filter(col("cosine") >= AnnMinCosine)
      .select(col("v1"), col("v2"))
    val found = annPairs(emb)
      .filter(col("v1") % LshRecallMod === 0 && col("v2") % LshRecallMod === 0)
      .select(col("v1"), col("v2"))
    val hits = exact.join(found, Seq("v1", "v2"), "left_semi")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hit"))))
      .crossJoin(broadcast(sample.agg(count(lit(1)).as("n_sample"))))
      .select(col("n_sample"), col("n_exact"), col("n_hit"),
        expr("CASE WHEN n_exact = 0 THEN -1 " +
          "ELSE n_hit * 1000000 DIV n_exact END").as("recall_ppm"))
  }

  /** DBSCAN core threshold: a point with >= this many graph neighbours
    * is a core point.
    */
  val DbscanMinPts = 3

  /** PRODUCTION DBSCAN eps in cosine (the near-duplicate-cluster
    * threshold a curation pipeline actually deploys — SemDeDup-class).
    * The 10x probe showed the 0.3 stress threshold's pair set is
    * quadratic BY DATA PROPERTY (random-cosine tail: 102x pairs for 10x
    * docs); at 0.9 the pair set is sparse and the engine scales with its
    * true output (VERDICT r12 Next #5).
    */
  val DbscanProdMinCosine = 0.9

  /** DBSCAN (Ester et al., KDD'96) over the LSH neighbour graph — true
    * density-based clustering, the missing shape between IVF/k-means
    * (fixed K, convex cells) and SemDeDup (per-cell dedup): clusters of
    * ANY shape emerge from density, outliers become first-class noise.
    * The eps-neighbourhood is the verified SRP-LSH pair set (cosine >=
    * AnnMinCosine over banded candidates — never all-pairs, the
    * q_emb_ann_pairs graph), so the neighbour search scales exactly like
    * the pair mining it reuses. Core points have >= [[DbscanMinPts]]
    * neighbours; clusters are connected components of the core-core
    * subgraph (the shared min-label propagation — same O(diameter)
    * rounds, localCheckpointed); border points attach to their minimum
    * core-neighbour cluster (a deterministic tie-break); everything else
    * is noise. Output: every vector labelled core/border/noise with its
    * cluster id (-1 for noise).
    */
  def dbscan(emb: DataFrame): DataFrame =
    dbscanFromPairs(emb, annPairs(emb).select(col("v1"), col("v2")))

  /** Eval-slice membership modulus for [[semDecontaminate]]. */
  val DecontamMod = 20L

  /** SEMANTIC decontamination — the embedding-space sibling of the
    * n-gram `q_decontaminate`: eval-set examples leak into training data
    * as PARAPHRASES that shingle overlap can't see, so the standard
    * pipeline check is "no train vector too close to any eval vector in
    * embedding space" (the SemDeDup/D4 line of work applies the same
    * primitive). The eval slice is vec_id % [[DecontamMod]] = 0; the
    * candidate search is the banded SRP-LSH pair set (never all-pairs —
    * the same scale story as the dedup family), filtered to cross-split
    * pairs at the ANN threshold; output is the one-row audit a release
    * gate reads: slice sizes, hit pairs, distinct contaminated train
    * vectors, and the contamination rate in ppm of train.
    */
  def semDecontaminate(emb: DataFrame): DataFrame = {
    val isEval = (c: org.apache.spark.sql.Column) => c % DecontamMod === 0L
    val cross = annPairs(emb)
      .filter(isEval(col("v1")) =!= isEval(col("v2")))
      .select(when(isEval(col("v1")), col("v2")).otherwise(col("v1")).as("tv"))
    val hits = cross.agg(count(lit(1)).as("n_cross_pairs"),
      count_distinct(col("tv")).as("n_contaminated"))
    emb.agg(
        sum(isEval(col("vec_id")).cast("long")).as("n_eval"),
        sum((!isEval(col("vec_id"))).cast("long")).as("n_train"))
      .crossJoin(broadcast(hits))
      .select(col("n_eval"), col("n_train"), col("n_cross_pairs"),
        col("n_contaminated"),
        // eval-only corpus (n_train = 0): rate undefined — -1 sentinel on
        // BOTH engines (DuckDB `//` errors on zero where Spark DIV nulls;
        // ADVICE r12)
        expr("CASE WHEN n_train = 0 THEN -1 " +
          "ELSE n_contaminated * 1000000 DIV n_train END").as("contam_ppm"))
  }

  /** Parquet root of the PERSISTED ANN neighbour graph — the verified
    * (v1, v2, cosine) pair set `q_emb_ann_pairs` computes, materialized
    * once per testdata content key (VERDICT r11 Next #5): at 100 TB the
    * neighbour graph is the expensive artifact and a real pipeline
    * builds it once, then runs every consumer (DBSCAN, recall audits,
    * dedup drops) off the stored copy. Hive-partitioned on v1 % 16 so a
    * consumer probing one vector's neighbourhood prunes to one shard.
    */
  def annPairsRoot(s: SparkSession, dir: String): String = {
    val root = graft.streaming.StreamQueries.fixtureDir("annpairs", dir, "embeddings")
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_SUCCESS"))) {
      annPairs(Tables.embeddings(s, dir))
        .withColumn("shard", col("v1") % 16)
        .write.mode("overwrite").partitionBy("shard").parquet(root)
      s.catalog.clearCache()
    }
    root
  }

  /** [[dbscan]] off the PERSISTED neighbour graph: no LSH banding, no
    * bucket self-join, no cosine verification anywhere in the plan — one
    * parquet scan of the stored pair set feeds the degree aggregate and
    * the propagation. Same answer, same oracle (the stored pairs ARE
    * annPairs' output), mirroring q_dedup_clusters_incr_persisted's
    * read-yesterday's-index shape.
    */
  def dbscanPersisted(s: SparkSession, dir: String): DataFrame =
    dbscanFromPairs(Tables.embeddings(s, dir),
      s.read.parquet(annPairsRoot(s, dir)).select(col("v1"), col("v2")))

  /** The HEADLINE DBSCAN (r12 Next #5): production path AND production
    * threshold — scan the persisted neighbour graph, keep only the
    * near-duplicate-tight edges (stored cosine is round(·,6), so the
    * [[DbscanProdMinCosine]] cut is engine-exact), cluster those. One
    * stored 0.3-threshold graph serves EVERY threshold >= 0.3 as a
    * pruned scan — the 100 TB shape: the expensive artifact builds
    * once, every downstream eps is a filter, not a recompute. The
    * recompute-at-0.3 form lives on as the explicitly-named stress row
    * `q_emb_dbscan_stress`.
    */
  def dbscanProd(s: SparkSession, dir: String): DataFrame =
    dbscanFromPairs(Tables.embeddings(s, dir),
      s.read.parquet(annPairsRoot(s, dir))
        .filter(col("cosine") >= DbscanProdMinCosine)
        .select(col("v1"), col("v2")))

  /** Deterministic slice modulus for the sf1 slice-proof rows. */
  val SliceMod = 37L

  /** The vec_id % [[SliceMod]] = 0 sub-corpus — the deterministic
    * hash-slice behind the `*_slice` rows (VERDICT r13 Next #3): the
    * four heavy embedding pipelines whose FULL oracles are
    * DuckDB-infeasible at sf1 (102× banded-pair blowup / >60 GB spill)
    * run END-TO-END on this slice too, where the oracle cost shrinks
    * ~SliceMod² and DuckDB replays the whole pipeline even at sf1 over
    * the REAL sf1 data values. The full-corpus rows keep their sf0.1
    * full-output hash gates; the slice rows close the residual sf1 risk.
    */
  private def sliceEmb(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % SliceMod === 0)

  /** IVF+PQ over the slice, ids DENSIFIED (vec_id DIV 37 — exact: slice
    * members are the multiples of 37) so the shared vec_id < K seed rule
    * sees a contiguous prefix, then mapped back for the output.
    */
  def pqSliceCodes(emb: DataFrame): DataFrame =
    pqCodes(sliceEmb(emb).select(expr(s"vec_id DIV $SliceMod").as("vec_id"),
        col("embedding")))
      .withColumn("vec_id", col("vec_id") * SliceMod)

  /** ADC recall audit over the slice (query = slice member 0). */
  def pqSliceRecall(emb: DataFrame): DataFrame =
    pqRecall(sliceEmb(emb).select(expr(s"vec_id DIV $SliceMod").as("vec_id"),
      col("embedding")))

  /** Stress-threshold DBSCAN over the slice — banding, verification and
    * clustering identical to q_emb_dbscan_stress, ids unchanged (no
    * seed-prefix dependence in DBSCAN).
    */
  def dbscanSlice(s: SparkSession, dir: String): DataFrame =
    dbscan(sliceEmb(Tables.embeddings(s, dir)))

  /** The slice's persisted ANN pair graph (the q_emb_dbscan_persisted
    * machinery at slice scale): built once per testdata content key,
    * shard-partitioned like the full graph.
    */
  def annPairsSliceRoot(s: SparkSession, dir: String): String = {
    val root = graft.streaming.StreamQueries.fixtureDir("annpairsslice", dir, "embeddings")
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_SUCCESS"))) {
      annPairs(sliceEmb(Tables.embeddings(s, dir)))
        .withColumn("shard", col("v1") % 16)
        .write.mode("overwrite").partitionBy("shard").parquet(root)
      s.catalog.clearCache()
    }
    root
  }

  /** [[dbscanSlice]] off the stored slice pair graph. Schema is pinned
    * explicitly: a sparse slice (sf0.01: 14 vectors) can legitimately
    * store ZERO pairs, and an empty parquet root has nothing to infer
    * from — everything is then noise, exactly what the oracle computes.
    */
  def dbscanPersistedSlice(s: SparkSession, dir: String): DataFrame =
    dbscanFromPairs(sliceEmb(Tables.embeddings(s, dir)),
      s.read.schema("v1 LONG, v2 LONG, cosine DOUBLE")
        .parquet(annPairsSliceRoot(s, dir)).select(col("v1"), col("v2")))

  /** The DBSCAN core, generic in the eps-neighbourhood pair source. */
  private def dbscanFromPairs(emb: DataFrame, pairs0: DataFrame): DataFrame = {
    val pairs = pairs0.cache()
    // materialize BEFORE the fan-out (r20; the r19 block-write-lock
    // lesson): the undirected union's two branches, corePairs' probe
    // side, and the propagation's pair cache all consume `pairs` inside
    // one action — racing AQE stage futures otherwise serialize on the
    // cache block write locks (this row's measured task_run was 2.4x its
    // task CPU with an idle probe).
    pairs.count()
    val und = pairs.unionAll(pairs.select(col("v2").as("v1"), col("v1").as("v2")))
    val core = und.groupBy(col("v1").as("vec_id")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= DbscanMinPts).select(col("vec_id")).cache()
    // same reason: corePairs consumes core on both join arms, and the
    // propagation's node list is a third consumer
    core.count()
    val corePairs = pairs
      .join(core.select(col("vec_id").as("v1")), "v1")
      .join(core.select(col("vec_id").as("v2")), "v2")
      .select(col("v1").as("d1"), col("v2").as("d2"))
    val coreLabels = graft.operators.DedupOps.clustersFromPairs(
        core.select(col("vec_id").as("doc_id")), corePairs)
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
    val borderLab = und
      .join(coreLabels.select(col("vec_id").as("v2"), col("cluster_id")), "v2")
      .groupBy(col("v1").as("vec_id")).agg(min(col("cluster_id")).as("bc"))
    emb.select(col("vec_id"))
      .join(coreLabels.withColumnRenamed("cluster_id", "cc"), Seq("vec_id"), "left")
      .join(borderLab, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("cc").isNotNull, lit("core"))
          .when(col("bc").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("cc"), col("bc"), lit(-1L)).as("cluster_id"))
  }

  /** JL reduced dimension, and the plane-seed offset that keeps the RP
    * plane family disjoint from the SRP-LSH planes (those use seed
    * indices 0..NTables*BitsPerTable-1).
    */
  val RpDim = 16
  val RpPlaneOffset = 1000

  /** RP plane component at seed s = p*97 + i, as a dialect-shared
    * fragment. NOT the SRP plane ladder: pseudoUniform is AFFINE in its
    * seed mod M, so distinct planes are mutual translates — harmless
    * when only the dot-product SIGN feeds a bucket bit, but a JL
    * projection needs (near-)independent planes or pairwise cosines
    * distort far beyond the 1/sqrt(RpDim) JL floor (measured: 0.59 mean
    * abs error with the affine ladder vs 0.215 with this quadratic mix
    * vs 0.186 for true Gaussian planes at RpDim=16). The seed enters
    * QUADRATICALLY (s*s mod M) before the multiplier, breaking the
    * translate structure; all intermediates stay under 2^63.
    */
  private[graft] def rpPlane(p: Int, duck: Boolean): String = {
    // seed cast to BIGINT up front: s*s at p~1000 is ~1e10, past int32
    val s = s"CAST(${p * 97} + i AS BIGINT)"
    // division by an EXPLICIT double: the bare literal 1000003.0 parses
    // as DECIMAL in Spark SQL, silently routing the plane through
    // decimal division (~1e-9 quantization) while DuckDB's
    // list_dot_product context keeps doubles — the one-ulp-per-engine
    // mismatch class the round-6 compare can't absorb
    xform(seqIncl("0", (Dim - 1).toString, duck), "i",
      s"(((($s * $s % 1000003) * 2654435761 + $s * 48271) % 1000003)" +
        " / CAST(1000003 AS DOUBLE) - 0.5)", duck)
  }

  /** Random-projection (Johnson-Lindenstrauss) dimensionality reduction
    * with a cosine-distortion audit — the storage/compute dial BETWEEN
    * int8 quantization (q_emb_quantize: same dim, smaller cells) and PQ
    * (q_emb_pq: codebook compression): project Dim=64 doubles onto
    * [[RpDim]]=16 pseudo-random hyperplanes and measure what pairwise
    * cosine loses. The audit scores every consecutive-id pair with the
    * cosine in BOTH spaces plus the signed error in micro-units — the
    * distribution a pipeline consults before switching its ANN
    * candidate stage to the cheap space. Planes come from the shared
    * deterministic pseudoUniform ladder (the SRP-LSH family at a
    * disjoint seed offset), so the oracle replays the projection
    * bit-for-bit; both engines fold dots in element order, making even
    * the doubles identical.
    *
    * Shape at 100 TB: the projection is a per-row map (RpDim x Dim
    * multiply-adds, whole-stage codegen'd, no shuffle); the audit pairs
    * by consecutive vec_id — one narrow equi-join — and at deployment
    * scale the same audit runs on any pair sample (e.g. the LSH
    * candidate pairs) without changing shape.
    */
  /** [[rpPlane]] CONSTANT-FOLDED driver-side: the plane is per-QUERY
    * constant, but the symbolic form re-evaluates its 64-element
    * quadratic-mod transform per ROW per side inside interpreted
    * higher-order functions (~10 task-cpu-s at sf0.1 for what is a
    * constant). Integer ops are exact and the final /M - 0.5 is one
    * IEEE double op, so these literals equal the oracle's symbolic
    * values bit-for-bit (spec-pinned).
    */
  private[graft] def rpPlaneConst(p: Int): Array[Double] = Array.tabulate(Dim) { i =>
    val s0 = p.toLong * 97 + i
    (((s0 * s0 % 1000003L) * 2654435761L + s0 * 48271L) % 1000003L) / 1000003.0 - 0.5
  }

  def rpDistortion(emb: DataFrame): DataFrame = {
    val e = normalized(emb, withLabel = false)
    // literal planes + the native dot kernel (same fold order as the
    // SQL form); ONE cached projection feeds both join sides
    val yCols = (0 until RpDim).map(j =>
      dotCol(col("vn"), typedLit(rpPlaneConst(RpPlaneOffset + j))))
    val proj = e.select(col("vec_id"), col("vn"), array(yCols: _*).as("y")).cache()
    proj.count() // materialize before the two join arms fan out (r20 sweep)
    val a = proj.select(col("vec_id").as("v1"), col("vn").as("vn1"), col("y").as("y1"))
    val b = proj.select((col("vec_id") - 1).as("v1"), col("vec_id").as("v2"),
      col("vn").as("vn2"), col("y").as("y2"))
    a.join(b, "v1")
      // degenerate projections (zero y) would divide by zero in the
      // reduced-space cosine; both dialects drop them identically
      .filter(dotCol(col("y1"), col("y1")) > 0 && dotCol(col("y2"), col("y2")) > 0)
      .select(col("v1"), col("v2"),
        round(dotCol(col("vn1"), col("vn2")), 6).as("cos_full"),
        round(dotCol(col("y1"), col("y2")) /
          (sqrt(dotCol(col("y1"), col("y1"))) * sqrt(dotCol(col("y2"), col("y2")))), 6)
          .as("cos_rp"))
      .withColumn("err_micro",
        expr("CAST(round((cos_rp - cos_full) * 1000000.0) AS BIGINT)"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_emb_rp_distortion" -> ((s, dir) => rpDistortion(Tables.embeddings(s, dir))),
    "q_emb_gram" -> ((s, dir) => gramMatrix(Tables.embeddings(s, dir))),
    "q_emb_power_iter" -> ((s, dir) => powerIteration(Tables.embeddings(s, dir))),
    "q_emb_outliers" -> ((s, dir) => labelOutliers(Tables.embeddings(s, dir))),
    "q_emb_pq" -> ((s, dir) => pqCodes(Tables.embeddings(s, dir))),
    "q_emb_pq_recall" -> ((s, dir) => pqRecall(Tables.embeddings(s, dir))),
    "q_emb_quantize" -> ((s, dir) => quantizeInt8(Tables.embeddings(s, dir))),
    "q_emb_cosine_topk" -> ((s, dir) => cosineTopK(Tables.embeddings(s, dir))),
    "q_emb_lsh_buckets" -> ((s, dir) => lshBuckets(Tables.embeddings(s, dir))),
    "q_emb_ann_pairs" -> ((s, dir) => annPairs(Tables.embeddings(s, dir))),
    "q_emb_dbscan" -> ((s, dir) => dbscanProd(s, dir)),
    "q_emb_dbscan_stress" -> ((s, dir) => dbscan(Tables.embeddings(s, dir))),
    "q_emb_dbscan_persisted" -> ((s, dir) => dbscanPersisted(s, dir)),
    "q_emb_dbscan_slice" -> ((s, dir) => dbscanSlice(s, dir)),
    "q_emb_dbscan_persisted_slice" -> ((s, dir) => dbscanPersistedSlice(s, dir)),
    "q_emb_pq_slice" -> ((s, dir) => pqSliceCodes(Tables.embeddings(s, dir))),
    "q_emb_pq_recall_slice" -> ((s, dir) => pqSliceRecall(Tables.embeddings(s, dir))),
    "q_emb_decontam" -> ((s, dir) => semDecontaminate(Tables.embeddings(s, dir))),
    "q_emb_lsh_recall" -> ((s, dir) => lshRecall(Tables.embeddings(s, dir))),
    "q_emb_lsh_sweep" -> ((s, dir) => lshTableSweep(Tables.embeddings(s, dir))),
    "q_emb_dedup_drops" -> ((s, dir) => embDedupDrops(Tables.embeddings(s, dir))),
    "q_emb_ivf_assign" -> ((s, dir) => ivfAssign(Tables.embeddings(s, dir))),
    "q_emb_ivf_topk" -> ((s, dir) => ivfTopK(Tables.embeddings(s, dir))),
    "q_emb_lsh_scaling" -> ((s, dir) => lshOccupancyScaling(Tables.embeddings(s, dir))),
    "q_emb_semdedup" -> ((s, dir) => semDedupDrops(Tables.embeddings(s, dir))),
    "q_emb_ivf_recall" -> ((s, dir) => ivfRecall(Tables.embeddings(s, dir))),
    "q_emb_ivf_sweep" -> ((s, dir) => ivfProbeSweep(Tables.embeddings(s, dir))),
    "q_emb_drift" -> ((s, dir) => centroidDrift(Tables.embeddings(s, dir))),
    "q_hybrid_search" -> ((s, dir) =>
      hybridSearch(Tables.embeddings(s, dir), Tables.documents(s, dir))),
    "q_rrf_fusion" -> ((s, dir) =>
      rrfFusion(Tables.embeddings(s, dir), Tables.documents(s, dir))),
    "q_topic_mix" -> ((s, dir) =>
      topicMix(Tables.embeddings(s, dir), Tables.documents(s, dir))),
    "q_emb_ivf_incr" -> ((s, dir) => ivfIncrementalStats(Tables.embeddings(s, dir))),
    "q_emb_ivf_incr_persisted" -> ((s, dir) => ivfIncrementalStatsPersisted(s, dir))
  )

  def oracleSql: Map[String, String] = {
    val v = toDoubleArr("embedding", duck = true)
    val cos = cosineExpr("v", "qv", duck = true)
    val bucketCols = (0 until NTables)
      .map(t => s"${bucketExpr(t, duck = true)} AS bucket_$t").mkString(",\n   ")
    val normCte =
      s"""e0 AS (SELECT vec_id, label, $v AS v FROM embeddings),
         | e1 AS (SELECT vec_id, label, v,
         |   sqrt(${dot("v", "v", duck = true)}) AS nrm FROM e0),
         | e AS (SELECT vec_id, label,
         |   list_transform(v, x -> x / nrm) AS vn FROM e1 WHERE nrm > 0)""".stripMargin
    val unionAll = (0 until NTables)
      .map(t => s"SELECT vec_id, vn, $t AS t, bucket_$t AS bk FROM bkt")
      .mkString("\n  UNION ALL ")
    val cosineTopkSql =
      s"""WITH q AS (SELECT $v AS qv FROM embeddings WHERE vec_id = 0),
         | c AS (SELECT vec_id, label, $v AS v FROM embeddings WHERE vec_id <> 0)
         |SELECT vec_id, label, $cos AS cosine
         |FROM c, q
         |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin
    def ivfTopkSqlP(probes: Int) =
      s"""WITH $normCte,
         |$ivfAsgCte,
         | q AS (SELECT vn AS qv FROM e WHERE vec_id = 0),
         | probed AS (SELECT centroid_id FROM (
         |   SELECT c.centroid_id, ${dot("c.cv", "q.qv", duck = true)} AS qcos
         |   FROM c, q
         |   ORDER BY qcos DESC, centroid_id LIMIT $probes) p)
         |SELECT e.vec_id, asg.centroid_id,
         |  round(${dot("e.vn", "q.qv", duck = true)}, 6) AS cosine
         |FROM e
         | JOIN asg ON e.vec_id = asg.vec_id
         | JOIN probed ON asg.centroid_id = probed.centroid_id, q
         |WHERE e.vec_id <> 0
         |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin
    val ivfTopkSql = ivfTopkSqlP(IvfProbes)
    // ---- PQ oracle CTEs (mirror microVecs/pqCoarse/pqResidualSubs/
    //      pqSeeds/pqIter/pqAssign; the d2/argmin expressions repeat
    //      verbatim in the window ORDER BY, the lloydCte discipline) ----
    val pqD2d = (a: String, b: String) => pqD2(a, b, duck = true)
    // generic Lloyd step over a subspace frame: assignment CTE + sums CTE
    // + mean-update CTE (offset-floor division, see the engine note)
    def pqAssignSql(subsCte: String, cbCte: String): String =
      s"""SELECT vec_id, m, code, d2 FROM (
         |   SELECT s.vec_id, s.m, c.code, ${pqD2d("s.xs", "c.cs")} AS d2,
         |     row_number() OVER (PARTITION BY s.vec_id, s.m
         |       ORDER BY ${pqD2d("s.xs", "c.cs")} ASC, c.code) AS rnk
         |   FROM $subsCte s JOIN $cbCte c ON s.m = c.m) z WHERE rnk = 1""".stripMargin
    def pqIterSql(tag: String, i: Int, subsCte: String, subDim: Int): String = {
      val prev = s"$tag${i - 1}"
      val sums = (0 until subDim)
        .map(j => s"sum(CAST(s.xs[${j + 1}] AS BIGINT)) AS s_$j").mkString(",\n    ")
      val meanList = (0 until subDim)
        .map(j => s"CAST((s_$j + cnt * 10000000) // cnt - 10000000 AS DOUBLE)")
        .mkString("[", ", ", "]")
      s"""${tag}a$i AS (${pqAssignSql(subsCte, prev)}),
         |${tag}m$i AS (SELECT a.m, a.code, count(*) AS cnt,
         |    $sums
         |  FROM ${tag}a$i a JOIN $subsCte s ON a.vec_id = s.vec_id AND a.m = s.m
         |  GROUP BY a.m, a.code),
         |$tag$i AS (SELECT p.m, p.code,
         |   CASE WHEN u.cnt IS NULL THEN p.cs ELSE $meanList END AS cs
         |  FROM $prev p LEFT JOIN ${tag}m$i u ON p.m = u.m AND p.code = u.code)"""
        .stripMargin
    }
    val qResid = residExpr("e.vm", "c.cs", Dim, duck = true)
    val pqSubsUnion = (0 until PqM).map { m =>
      val lo = m * PqSubDim + 1; val hi = (m + 1) * PqSubDim
      s"SELECT vec_id, cell, $m AS m, rv[$lo:$hi] AS xs FROM res"
    }.mkString("\n  UNION ALL ")
    val coarseIters = (1 to PqCoarseIters)
      .map(i => pqIterSql("cc", i, "fullv", Dim)).mkString(",\n")
    val pqItersSql = (1 to PqIters)
      .map(i => pqIterSql("pc", i, "subs", PqSubDim)).mkString(",\n")
    val pqCte =
      s"""em AS (SELECT vec_id,
         |   list_transform($v, y -> CAST(CAST(round(y * 1000000.0) AS BIGINT) AS DOUBLE)) AS vm
         |  FROM embeddings),
         |fullv AS (SELECT vec_id, 0 AS m, vm AS xs FROM em),
         |cc0 AS (SELECT m, vec_id AS code, xs AS cs FROM fullv WHERE vec_id < $PqCoarseK),
         |$coarseIters,
         |casg AS (SELECT vec_id, code AS cell FROM
         |  (${pqAssignSql("fullv", s"cc$PqCoarseIters")}) z0),
         |res AS (SELECT e.vec_id, a.cell, $qResid AS rv
         |  FROM em e JOIN casg a ON e.vec_id = a.vec_id
         |  JOIN cc$PqCoarseIters c ON c.code = a.cell),
         |subs AS (
         |  $pqSubsUnion),
         |pc0 AS (SELECT m, vec_id AS code, xs AS cs FROM subs WHERE vec_id < $PqK),
         |$pqItersSql,
         |enc AS (SELECT z1.vec_id, a2.cell, z1.m, z1.code, z1.d2
         |  FROM (${pqAssignSql("subs", s"pc$PqIters")}) z1
         |  JOIN casg a2 ON z1.vec_id = a2.vec_id)""".stripMargin

    val outlierSql = {
      val sumCols = (0 until Dim)
        .map(i => s"sum(mv[${i + 1}]) AS s_$i").mkString(",\n   ")
      val centCols = (0 until Dim)
        .map(i => s"CAST((s_$i + cnt * 10000000) // cnt - 10000000 AS BIGINT) AS c_$i")
        .mkString(",\n   ")
      val dist = (0 until Dim)
        .map(i => s"(mv[${i + 1}] - c_$i) * (mv[${i + 1}] - c_$i)")
        .mkString("(", " + ", ")")
      s"""WITH mv AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |   list_transform($v, y -> CAST(round(y * 1000000.0) AS BIGINT)) AS mv
         |  FROM embeddings),
         | s AS (SELECT label, count(*) AS cnt,
         |   $sumCols
         |  FROM mv GROUP BY 1),
         | c AS (SELECT label,
         |   $centCols
         |  FROM s),
         | d AS (SELECT m.label, m.vec_id, $dist AS dist2_micro
         |  FROM mv m JOIN c USING (label))
         |SELECT label, vec_id, dist2_micro, rnk FROM (
         | SELECT *, row_number() OVER (PARTITION BY label
         |   ORDER BY dist2_micro DESC, vec_id) AS rnk FROM d) z
         |WHERE rnk <= $OutlierK""".stripMargin
    }

    val gramSql =
      s"""WITH mv AS (SELECT
         |   list_transform($v, y -> CAST(round(y * 1000000.0) AS BIGINT)) AS mv
         |  FROM embeddings)
         |SELECT CAST(i.i AS BIGINT) AS i, CAST(j.j AS BIGINT) AS j,
         | CAST(sum(mv[i.i + 1] * mv[j.j + 1]) AS BIGINT) AS gram_micro2
         |FROM mv, generate_series(0, ${Dim - 1}) i(i),
         | generate_series(0, ${Dim - 1}) j(j)
         |GROUP BY 1, 2""".stripMargin

    // the DBSCAN oracle, parametrized by the eps threshold on the
    // rounded cosine — one relational text serves the production 0.9
    // headline and the AnnMinCosine stress recompute
    def dbscanSql(minCos: Double): String =
      s"""WITH RECURSIVE $normCte,
         | bkt AS (SELECT vec_id, vn,
         |   $bucketCols
         |  FROM e),
         | x AS ($unionAll),
         | p AS (SELECT DISTINCT v1, v2 FROM (
         |   SELECT a.vec_id AS v1, b.vec_id AS v2,
         |    round(${dot("a.vn", "b.vn", duck = true)}, 6) AS cosine
         |   FROM x a JOIN x b ON a.t = b.t AND a.bk = b.bk
         |    AND a.vec_id < b.vec_id) q0
         |  WHERE cosine >= $minCos),
         | u AS (SELECT v1, v2 FROM p UNION ALL SELECT v2 AS v1, v1 AS v2 FROM p),
         | core AS (SELECT v1 AS vec_id FROM u GROUP BY v1
         |   HAVING count(*) >= $DbscanMinPts),
         | ce AS (SELECT v1 AS d1, v2 AS d2 FROM p
         |   WHERE v1 IN (SELECT vec_id FROM core)
         |     AND v2 IN (SELECT vec_id FROM core)),
         | e2 AS (SELECT d1, d2 FROM ce UNION ALL SELECT d2 AS d1, d1 AS d2 FROM ce),
         | reach(a, b) AS (
         |   SELECT vec_id AS a, vec_id AS b FROM core
         |   UNION
         |   SELECT r.a, e2.d2 AS b FROM reach r JOIN e2 ON r.b = e2.d1),
         | lab AS (SELECT a AS vec_id, CAST(min(b) AS BIGINT) AS cc
         |  FROM reach GROUP BY a),
         | bord AS (SELECT u.v1 AS vec_id, CAST(min(l.cc) AS BIGINT) AS bc
         |  FROM u JOIN lab l ON u.v2 = l.vec_id GROUP BY u.v1)
         |SELECT em.vec_id,
         | CASE WHEN l.vec_id IS NOT NULL THEN 'core'
         |      WHEN b.vec_id IS NOT NULL THEN 'border'
         |      ELSE 'noise' END AS role,
         | coalesce(l.cc, b.bc, -1) AS cluster_id
         |FROM embeddings em
         | LEFT JOIN lab l ON em.vec_id = l.vec_id
         | LEFT JOIN bord b ON em.vec_id = b.vec_id""".stripMargin

    // force-materialize every CTE of a generated text: DuckDB re-inlines
    // deep CTE chains per reference, and on the multi-file sf1 fixture
    // that mis-plans the symbolic Lloyd/ADC oracles into a >60 GB spill
    // (the r13 "oracle-infeasible" verdict) — materialized, the same
    // texts run in single-digit SECONDS at sf1 (r14 measurement). The
    // q_emb_power_iter MATERIALIZED discipline, applied mechanically.
    def materializeCtes(sql: String): String = sql
      .replaceAll("(?m)^(\\w+) AS \\(", "$1 AS MATERIALIZED (")
      .replace("WITH em AS (", "WITH em AS MATERIALIZED (")

    val base = Map(
      "q_emb_gram" -> gramSql,

      "q_emb_power_iter" -> {
        val iters = (1 to PowerIters).map { t =>
          val p = t - 1
          s"""w$t AS MATERIALIZED (SELECT gp.i, CAST(sum(gp.g * v$p.v) AS BIGINT) AS w
             |  FROM gp JOIN v$p ON gp.j = v$p.vj GROUP BY 1),
             |mx$t AS (SELECT max(abs(w)) AS mx FROM w$t),
             |v$t AS MATERIALIZED (SELECT i AS vj,
             |   CASE WHEN w < 0 THEN -(((-w) * 1000) // mx)
             |        ELSE (w * 1000) // mx END AS v,
             |   mx AS growth
             |  FROM w$t, mx$t)""".stripMargin
        }.mkString(",\n")
        s"""WITH gp AS MATERIALIZED (SELECT i, j, gram_micro2 // 1000000 AS g
           |  FROM ($gramSql) z),
           | v0 AS (SELECT DISTINCT j AS vj, CAST(1000 AS BIGINT) AS v,
           |   CAST(0 AS BIGINT) AS growth FROM gp),
           |$iters
           |SELECT vj AS dim, v AS eig_milli, growth
           |FROM v$PowerIters""".stripMargin
      },
      "q_emb_outliers" -> outlierSql,
      "q_emb_pq" -> {
        val codeCols = (0 until PqM)
          .map(m => s"max(CASE WHEN m = $m THEN code END) AS code_$m")
          .mkString(",\n ")
        materializeCtes(
          s"""WITH $pqCte
             |SELECT vec_id, max(cell) AS cell,
             | $codeCols,
             | CAST(sum(d2) AS BIGINT) AS err_sq
             |FROM enc GROUP BY 1""".stripMargin)
      },

      "q_emb_pq_recall" -> {
        val qSliceUnion = (0 until PqM).map { m =>
          val lo = m * PqSubDim + 1; val hi = (m + 1) * PqSubDim
          s"SELECT cell, $m AS m, qrv[$lo:$hi] AS qxs FROM qres"
        }.mkString("\n  UNION ALL ")
        val qResidQ = residExpr("q.vm", "c.cs", Dim, duck = true)
        materializeCtes(
          s"""WITH $pqCte,
           |qv AS (SELECT vm FROM em WHERE vec_id = 0),
           |exact AS (SELECT e2.vec_id FROM em e2, qv
           |  WHERE e2.vec_id <> 0
           |  ORDER BY ${pqD2d("e2.vm", "qv.vm")} ASC, e2.vec_id LIMIT 10),
           |qres AS (SELECT c.code AS cell, $qResidQ AS qrv
           |  FROM cc$PqCoarseIters c, (SELECT vm FROM em WHERE vec_id = 0) q),
           |qsl AS (
           |  $qSliceUnion),
           |tbl AS (SELECT q.cell, c.m, c.code, ${pqD2d("q.qxs", "c.cs")} AS dq
           |  FROM pc$PqIters c JOIN qsl q ON c.m = q.m),
           |adc AS (SELECT e.vec_id, sum(t.dq) AS adc_d2
           |  FROM enc e JOIN tbl t
           |    ON e.cell = t.cell AND e.m = t.m AND e.code = t.code
           |  WHERE e.vec_id <> 0 GROUP BY 1),
           |approx AS (SELECT vec_id FROM adc
           |  ORDER BY adc_d2 ASC, vec_id LIMIT 10)
           |SELECT CAST(10 AS INT) AS k, count(*) AS n_overlap,
           | round(count(*) / 10.0, 6) AS recall
           |FROM exact JOIN approx USING (vec_id)""".stripMargin)
      },

      "q_emb_quantize" -> {
        val m = s"list_max(list_transform(v, x -> abs(x)))"
        val q = s"list_transform(v, x -> CAST(floor(x / (m / 127.0)) AS BIGINT))"
        s"""WITH e AS (SELECT vec_id, $v AS v FROM embeddings),
           | s AS (SELECT vec_id, v, $m AS m FROM e)
           |SELECT vec_id,
           | CAST(floor(m / 127.0 * 1000000.0) AS BIGINT) AS scale_micro,
           | CASE WHEN m > 0
           |  THEN ${reduceLong(q, "a", "x", "a + x", duck = true)}
           |  ELSE CAST(0 AS BIGINT) END AS sum_q,
           | CASE WHEN m > 0
           |  THEN ${reduceLong(q, "a", "x", "a + x * x", duck = true)}
           |  ELSE CAST(0 AS BIGINT) END AS sum_q2
           |FROM s""".stripMargin
      },

      "q_emb_rp_distortion" -> {
        val yArrDuck = (0 until RpDim)
          .map(j => dot("vn", rpPlane(RpPlaneOffset + j, duck = true), duck = true))
          .mkString("[", ", ", "]")
        s"""WITH $normCte,
           | p AS (SELECT vec_id, vn, $yArrDuck AS y FROM e)
           |SELECT v1, v2, cos_full, cos_rp,
           | CAST(round((cos_rp - cos_full) * 1000000.0) AS BIGINT) AS err_micro
           |FROM (SELECT a.vec_id AS v1, b.vec_id AS v2,
           |   round(${dot("a.vn", "b.vn", duck = true)}, 6) AS cos_full,
           |   ${cosineExpr("a.y", "b.y", duck = true)} AS cos_rp
           |  FROM p a JOIN p b ON b.vec_id = a.vec_id + 1
           |  WHERE ${dot("a.y", "a.y", duck = true)} > 0
           |    AND ${dot("b.y", "b.y", duck = true)} > 0) t""".stripMargin
      },

      "q_emb_cosine_topk" -> cosineTopkSql,

      "q_rrf_fusion" -> {
        val bm25 = graft.operators.TextOps.oracleSql("q_bm25_search")
        s"""WITH lexs AS ($bm25),
           | lex AS (SELECT doc_id, row_number() OVER (
           |    ORDER BY score_micro DESC, doc_id) AS lex_rank FROM lexs),
           | vecs AS ($cosineTopkSql),
           | vec AS (SELECT vec_id AS doc_id, row_number() OVER (
           |    ORDER BY cosine DESC, vec_id) AS vec_rank FROM vecs),
           | f AS (SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
           |    coalesce(lex_rank, 0) AS lex_rank,
           |    coalesce(vec_rank, 0) AS vec_rank
           |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
           |SELECT doc_id, lex_rank, vec_rank,
           | (CASE WHEN lex_rank > 0 THEN 1000000 // ($RrfC + lex_rank) ELSE 0 END)
           | + (CASE WHEN vec_rank > 0 THEN 1000000 // ($RrfC + vec_rank) ELSE 0 END)
           |   AS rrf_micro
           |FROM f""".stripMargin
      },

      "q_hybrid_search" -> {
        // quality fragment shared with TextOps' own oracle — one
        // definition, no drift between the two parity checks
        val qualitySql = TextOps.qualityDocOracleSql
        s"""WITH q AS (SELECT $v AS qv FROM embeddings WHERE vec_id = 0),
           | sims AS (SELECT vec_id, $cos AS cosine
           |   FROM (SELECT vec_id, $v AS v FROM embeddings WHERE vec_id <> 0) c, q),
           | qual AS ($qualitySql)
           |SELECT doc_id, cosine, quality,
           | round($HybridCosWeight * cosine + $HybridQualWeight * quality, 6) AS score
           |FROM sims JOIN qual ON sims.vec_id = qual.doc_id
           |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
      },

      "q_emb_drift" ->
        s"""WITH $normCte,
           | c0 AS (SELECT vec_id AS centroid_id, vn AS cv FROM e
           |   WHERE vec_id < $IvfCells),
           |${(1 to IvfIters).map(lloydCte).mkString(",\n")},
           | d1 AS (SELECT a.centroid_id,
           |   round(sqrt(list_dot_product(a.cv, a.cv) - 2 * list_dot_product(a.cv, b.cv) + list_dot_product(b.cv, b.cv)), 6)
           |     AS move_1
           |  FROM c0 a JOIN c1 b ON a.centroid_id = b.centroid_id),
           | d2 AS (SELECT a.centroid_id,
           |   round(sqrt(list_dot_product(a.cv, a.cv) - 2 * list_dot_product(a.cv, b.cv) + list_dot_product(b.cv, b.cv)), 6)
           |     AS move_2
           |  FROM c1 a JOIN c2 b ON a.centroid_id = b.centroid_id)
           |SELECT d1.centroid_id, move_1, move_2,
           | CAST(move_2 <= move_1 AS INT) AS shrinking
           |FROM d1 JOIN d2 ON d1.centroid_id = d2.centroid_id""".stripMargin,

      "q_emb_ivf_recall" ->
        s"""SELECT CAST(10 AS INT) AS k, count(*) AS n_overlap,
           | round(count(*) / 10.0, 6) AS recall
           |FROM ($cosineTopkSql) e JOIN ($ivfTopkSql) i
           | ON e.vec_id = i.vec_id""".stripMargin,

      "q_emb_ivf_sweep" -> IvfSweepProbes.map { p =>
        s"""SELECT CAST($p AS BIGINT) AS nprobe, CAST(10 AS BIGINT) AS k,
           | count(*) AS n_overlap, round(count(*) / 10.0, 6) AS recall
           |FROM ($cosineTopkSql) e JOIN (${ivfTopkSqlP(p)}) i
           | ON e.vec_id = i.vec_id""".stripMargin
      }.mkString("\nUNION ALL\n"),

      "q_emb_lsh_buckets" ->
        s"""WITH $normCte
           |SELECT vec_id, label,
           |   $bucketCols
           |FROM e""".stripMargin,

      "q_emb_ann_pairs" ->
        s"""WITH $normCte,
           | bkt AS (SELECT vec_id, vn,
           |   $bucketCols
           |  FROM e),
           | x AS ($unionAll)
           |SELECT DISTINCT v1, v2, cosine FROM (
           | SELECT a.vec_id AS v1, b.vec_id AS v2,
           |  round(${dot("a.vn", "b.vn", duck = true)}, 6) AS cosine
           | FROM x a JOIN x b ON a.t = b.t AND a.bk = b.bk AND a.vec_id < b.vec_id) p
           |WHERE cosine >= $AnnMinCosine""".stripMargin,

      "q_emb_lsh_sweep" -> {
        val branches = LshSweepTables.map { nt =>
          s"""SELECT CAST($nt AS BIGINT) AS n_tables,
             | (SELECT count(*) FROM exact) AS n_exact,
             | (SELECT count(*) FROM exact e2
             |   WHERE EXISTS (SELECT 1 FROM f$nt f
             |     WHERE f.v1 = e2.v1 AND f.v2 = e2.v2)) AS n_hit,
             | CASE WHEN (SELECT count(*) FROM exact) = 0 THEN -1
             |  ELSE (SELECT count(*) FROM exact e2
             |    WHERE EXISTS (SELECT 1 FROM f$nt f
             |      WHERE f.v1 = e2.v1 AND f.v2 = e2.v2)) * 1000000
             |    // (SELECT count(*) FROM exact) END AS recall_ppm""".stripMargin
        }.mkString("\nUNION ALL\n")
        val founds = LshSweepTables.map { nt =>
          s"""f$nt AS MATERIALIZED (SELECT DISTINCT v1, v2 FROM (
             |   SELECT a.vec_id AS v1, b.vec_id AS v2,
             |    round(${dot("a.vn", "b.vn", duck = true)}, 6) AS cosine
             |   FROM x a JOIN x b ON a.t = b.t AND a.bk = b.bk
             |    AND a.t < $nt AND a.vec_id < b.vec_id) p
             |  WHERE cosine >= $AnnMinCosine
             |    AND v1 % $LshRecallMod = 0 AND v2 % $LshRecallMod = 0)""".stripMargin
        }.mkString(",\n")
        s"""WITH $normCte,
           | smp AS (SELECT vec_id, vn FROM e WHERE vec_id % $LshRecallMod = 0),
           | exact AS MATERIALIZED (SELECT a.vec_id AS v1, b.vec_id AS v2
           |  FROM smp a JOIN smp b ON a.vec_id < b.vec_id
           |  WHERE round(${dot("a.vn", "b.vn", duck = true)}, 6) >= $AnnMinCosine),
           | bkt AS (SELECT vec_id, vn,
           |   $bucketCols
           |  FROM e),
           | x AS MATERIALIZED ($unionAll),
           |$founds
           |$branches""".stripMargin
      },

      "q_emb_lsh_recall" ->
        s"""WITH $normCte,
           | smp AS (SELECT vec_id, vn FROM e WHERE vec_id % $LshRecallMod = 0),
           | exact AS (SELECT a.vec_id AS v1, b.vec_id AS v2
           |  FROM smp a JOIN smp b ON a.vec_id < b.vec_id
           |  WHERE round(${dot("a.vn", "b.vn", duck = true)}, 6) >= $AnnMinCosine),
           | bkt AS (SELECT vec_id, vn,
           |   $bucketCols
           |  FROM e),
           | x AS ($unionAll),
           | found AS (SELECT DISTINCT v1, v2 FROM (
           |   SELECT a.vec_id AS v1, b.vec_id AS v2,
           |    round(${dot("a.vn", "b.vn", duck = true)}, 6) AS cosine
           |   FROM x a JOIN x b ON a.t = b.t AND a.bk = b.bk
           |    AND a.vec_id < b.vec_id) p
           |  WHERE cosine >= $AnnMinCosine
           |    AND v1 % $LshRecallMod = 0 AND v2 % $LshRecallMod = 0),
           | m AS (SELECT
           |   (SELECT count(*) FROM smp) AS n_sample,
           |   (SELECT count(*) FROM exact) AS n_exact,
           |   (SELECT count(*) FROM exact e2
           |     WHERE EXISTS (SELECT 1 FROM found f
           |       WHERE f.v1 = e2.v1 AND f.v2 = e2.v2)) AS n_hit)
           |SELECT CAST(n_sample AS BIGINT) AS n_sample,
           | CAST(n_exact AS BIGINT) AS n_exact, CAST(n_hit AS BIGINT) AS n_hit,
           | CAST(CASE WHEN n_exact = 0 THEN -1
           |   ELSE n_hit * 1000000 // n_exact END AS BIGINT) AS recall_ppm
           |FROM m""".stripMargin,

      // the LSH pair set replayed at the given eps, then DBSCAN
      // relationally: degree -> core flags -> recursive-CTE components
      // over core-core edges -> min-cluster border attachment ->
      // full-corpus role/label rollup. One text parametrized by
      // threshold: 0.9 = the production headline (persisted-graph
      // pruned scan), AnnMinCosine = the stress recompute.
      "q_emb_dbscan" -> dbscanSql(DbscanProdMinCosine),
      "q_emb_dbscan_stress" -> dbscanSql(AnnMinCosine),

      // cross-split pairs over the SAME banded pair set as the engine;
      // eval slice = vec_id % DecontamMod = 0
      "q_emb_decontam" ->
        s"""WITH $normCte,
           | bkt AS (SELECT vec_id, vn,
           |   $bucketCols
           |  FROM e),
           | x AS ($unionAll),
           | p AS (SELECT DISTINCT v1, v2 FROM (
           |   SELECT a.vec_id AS v1, b.vec_id AS v2,
           |    round(${dot("a.vn", "b.vn", duck = true)}, 6) AS cosine
           |   FROM x a JOIN x b ON a.t = b.t AND a.bk = b.bk
           |    AND a.vec_id < b.vec_id) q0
           |  WHERE cosine >= $AnnMinCosine),
           | cr AS (SELECT CASE WHEN v1 % $DecontamMod = 0 THEN v2 ELSE v1 END AS tv
           |  FROM p WHERE (v1 % $DecontamMod = 0) <> (v2 % $DecontamMod = 0)),
           | h AS (SELECT CAST(count(*) AS BIGINT) AS n_cross_pairs,
           |   CAST(count(DISTINCT tv) AS BIGINT) AS n_contaminated FROM cr),
           | t AS (SELECT
           |   CAST(sum(CASE WHEN vec_id % $DecontamMod = 0 THEN 1 ELSE 0 END) AS BIGINT)
           |     AS n_eval,
           |   CAST(sum(CASE WHEN vec_id % $DecontamMod = 0 THEN 0 ELSE 1 END) AS BIGINT)
           |     AS n_train
           |  FROM embeddings)
           |SELECT n_eval, n_train, n_cross_pairs, n_contaminated,
           | CAST(CASE WHEN n_train = 0 THEN -1
           |   ELSE n_contaminated * 1000000 // n_train END AS BIGINT) AS contam_ppm
           |FROM t, h""".stripMargin,

      "q_emb_dedup_drops" ->
        s"""WITH $normCte,
           | bkt AS (SELECT vec_id, vn,
           |   $bucketCols
           |  FROM e),
           | x AS ($unionAll)
           |SELECT DISTINCT v2 AS drop_vec_id FROM (
           | SELECT a.vec_id AS v1, b.vec_id AS v2,
           |  round(${dot("a.vn", "b.vn", duck = true)}, 6) AS cosine
           | FROM x a JOIN x b ON a.t = b.t AND a.bk = b.bk AND a.vec_id < b.vec_id) p
           |WHERE cosine >= $DedupMinCosine""".stripMargin,

      "q_emb_lsh_scaling" -> {
        val t = ScalingTargetOccupancy
        val stats = (src: String) =>
          s"""SELECT p.n, p.bits,
             |  count(DISTINCT b.bucket_0 % CAST(round(pow(2.0, p.bits)) AS BIGINT)) AS n_buckets,
             |  CAST(p.n AS DOUBLE) / count(DISTINCT b.bucket_0 % CAST(round(pow(2.0, p.bits)) AS BIGINT)) AS avg_occupancy
             | FROM $src b, (SELECT n,
             |     LEAST(GREATEST(4, CAST(ceil(log2(ceil(n / $t.0))) AS BIGINT)), $BitsPerTable) AS bits
             |   FROM (SELECT count(*) AS n FROM $src) z) p
             | GROUP BY p.n, p.bits""".stripMargin
        s"""WITH $normCte,
           | bkt AS (SELECT vec_id, ${bucketExpr(0, duck = true)} AS bucket_0 FROM e),
           | half AS (SELECT vec_id, bucket_0 FROM bkt,
           |   (SELECT max(vec_id) AS mxid FROM bkt) m WHERE vec_id <= mxid // 2),
           | f AS (${stats("bkt")}),
           | h AS (${stats("half")})
           |SELECT f.n AS n_full, f.bits AS bits_full,
           | f.n_buckets AS buckets_full, f.avg_occupancy AS occ_full,
           | h.n AS n_half, h.bits AS bits_half,
           | h.n_buckets AS buckets_half, h.avg_occupancy AS occ_half,
           | f.avg_occupancy / h.avg_occupancy AS occ_ratio,
           | CAST(f.avg_occupancy / h.avg_occupancy >= 0.5
           |   AND f.avg_occupancy / h.avg_occupancy <= 2.0 AS INT) AS ratio_in_band
           |FROM f, h""".stripMargin
      },

      "q_emb_ivf_assign" ->
        s"""WITH $normCte,
           |$ivfAsgCte
           |SELECT vec_id, centroid_id, centroid_cos FROM asg""".stripMargin,

      "q_topic_mix" ->
        s"""WITH $normCte,
           |$ivfAsgCte,
           | st AS (SELECT d.source, asg.centroid_id AS topic,
           |   CAST(count(*) AS BIGINT) AS n
           |  FROM asg JOIN documents d ON asg.vec_id = d.doc_id
           |  GROUP BY 1, 2)
           |SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
           | CAST(count(*) AS BIGINT) AS n_topics,
           | CAST(max(n) AS BIGINT) AS n_top,
           | CAST(max(n) * 10000 // sum(n) AS BIGINT) AS top_share_bp
           |FROM st GROUP BY 1""".stripMargin,

      // models the HOT-CELL CAP too (r13: the sf1 gate proved cells pass
      // 1024 at 200k vectors, so the cap is live behavior, not a latent
      // guard): cells over the cap sub-bucket by the low bitLen(ceil(
      // n/cap)-1) SRP bits (planes j=0..15 — table 0 of the shared
      // recurrence), and pairs must share the sub-bucket
      "q_emb_semdedup" -> {
        val sub16 = (0 until SemDedupMaxSubBits).map { j =>
          s"(CASE WHEN ${dot("vn", plane(j, duck = true), duck = true)} > 0 THEN ${1L << j} ELSE 0 END)"
        }.mkString("(", " + ", ")")
        val q = s"((cell_n + ${SemDedupHotCellCap - 1}) // $SemDedupHotCellCap) - 1"
        s"""WITH $normCte,
           |$ivfAsgCte,
           | m AS (SELECT asg.centroid_id, e.vec_id, e.vn
           |   FROM asg JOIN e ON asg.vec_id = e.vec_id),
           | cs AS (SELECT centroid_id, count(*) AS cell_n FROM m GROUP BY 1),
           | mk AS MATERIALIZED (SELECT m.centroid_id, m.vec_id, m.vn,
           |   CAST($sub16 AS BIGINT) &
           |     ((CAST(1 AS BIGINT) << (CASE WHEN cs.cell_n > $SemDedupHotCellCap
           |       THEN ${graft.functions.PortableSql.bitLen(q, SemDedupMaxSubBits)}
           |       ELSE 0 END)) - 1) AS sub_key
           |  FROM m JOIN cs ON m.centroid_id = cs.centroid_id)
           |SELECT centroid_id, drop_vec_id, max(cosine) AS max_cosine FROM (
           | SELECT a.centroid_id, b.vec_id AS drop_vec_id,
           |  round(${dot("a.vn", "b.vn", duck = true)}, 6) AS cosine
           | FROM mk a JOIN mk b
           |  ON a.centroid_id = b.centroid_id AND a.sub_key = b.sub_key
           |   AND a.vec_id < b.vec_id) p
           |WHERE cosine >= $SemDedupMinCosine
           |GROUP BY centroid_id, drop_vec_id""".stripMargin
      },

      "q_emb_ivf_topk" -> ivfTopkSql,

      // the FULL RESTART the incremental fold must equal: centroids
      // frozen on the standing slice (e), every vector re-assigned
      // against them in one pass, per-cell count + exact micro-checksum
      "q_emb_ivf_incr" -> ivfIncrSql,

      // identical oracle on purpose: reading the frozen centroids off the
      // persisted parquet index instead of re-running Lloyd is a plan
      // swap — the centroid doubles round-trip bit-exactly
      "q_emb_ivf_incr_persisted" -> ivfIncrSql
    )
    // SLICE-PROOF oracles (VERDICT r13 Next #3): the same oracle texts
    // with the source restricted to the vec_id % SliceMod slice by
    // deterministic surgery — every `FROM embeddings` (the e0/em source
    // CTEs and the final all-vectors join) gains the slice predicate,
    // and the PQ texts additionally densify ids on the way in
    // (vec_id // 37, exact on multiples of 37) and rescale on the way
    // out, mirroring the engine's pqSliceCodes. The surgery targets are
    // unique strings in the generated texts; a drifted target produces
    // invalid SQL the selfcheck gate rejects, never a silent mismatch.
    val dbscanSliceSqlText = dbscanSql(AnnMinCosine)
      .replace("FROM embeddings",
        s"FROM (SELECT * FROM embeddings WHERE vec_id % $SliceMod = 0)")
    // the PQ base texts are already CTE-materialized (see materializeCtes
    // above); the slice surgery only adds the slice predicate + the id
    // densify/rescale
    def pqSliceSurgery(sql: String): String = sql
      .replace("FROM embeddings",
        s"FROM embeddings WHERE vec_id % $SliceMod = 0")
      .replace("em AS MATERIALIZED (SELECT vec_id,",
        s"em AS MATERIALIZED (SELECT vec_id // $SliceMod AS vec_id,")
    // identical oracle on purpose: DBSCAN off the persisted neighbour
    // graph is a plan swap — the stored pairs ARE annPairs' output
    // (long ids round-trip parquet exactly), so the clustering equals
    // the recompute by construction
    // the persisted form scans the FULL stored graph, i.e. the
    // AnnMinCosine pair set — its oracle is the stress threshold's
    base ++ Map(
      "q_emb_dbscan_persisted" -> base("q_emb_dbscan_stress"),
      "q_emb_dbscan_slice" -> dbscanSliceSqlText,
      "q_emb_dbscan_persisted_slice" -> dbscanSliceSqlText,
      "q_emb_pq_slice" -> pqSliceSurgery(base("q_emb_pq"))
        .replace("SELECT vec_id, max(cell) AS cell,",
          s"SELECT vec_id * $SliceMod AS vec_id, max(cell) AS cell,"),
      "q_emb_pq_recall_slice" -> pqSliceSurgery(base("q_emb_pq_recall")))
  }

  /** Full-restart oracle shared by q_emb_ivf_incr and its persisted-index
    * twin (see those entries for the plan-swap rationale).
    */
  private lazy val ivfIncrSql: String = {
    val v = toDoubleArr("embedding", duck = true)
    val chk = reduceLong("vn", "a", "x",
      "a + CAST(round(x * 1000000.0) AS BIGINT)", duck = true)
    s"""WITH ea0 AS (SELECT vec_id, $v AS v FROM embeddings),
           | ea1 AS (SELECT vec_id, v, sqrt(${dot("v", "v", duck = true)}) AS nrm FROM ea0),
           | ea AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn
           |   FROM ea1 WHERE nrm > 0),
           | e AS (SELECT * FROM ea
           |   WHERE vec_id % ${DedupOps.IncrMod} <> ${DedupOps.IncrRem}),
           | c0 AS (SELECT vec_id AS centroid_id, vn AS cv FROM e WHERE vec_id < $IvfCells),
           |${(1 to IvfIters).map(lloydCte).mkString(",\n")},
           | c AS (SELECT centroid_id, cv FROM c$IvfIters),
           | asg0 AS (SELECT ea.vec_id, c.centroid_id,
           |   round(${dot("ea.vn", "c.cv", duck = true)}, 6) AS cos FROM ea, c),
           | asg AS (SELECT vec_id, centroid_id FROM (
           |   SELECT vec_id, centroid_id, cos,
           |     row_number() OVER (PARTITION BY vec_id
           |       ORDER BY cos DESC, centroid_id) AS rnk
           |   FROM asg0) z WHERE rnk = 1),
           | chk AS (SELECT vec_id, $chk AS chk FROM ea)
           |SELECT asg.centroid_id, CAST(count(*) AS BIGINT) AS n_vecs,
           | CAST(sum(chk.chk) AS BIGINT) AS sum_chk
           |FROM asg JOIN chk ON asg.vec_id = chk.vec_id
           |GROUP BY asg.centroid_id""".stripMargin
  }

  /** One Lloyd's-iteration CTE group (oracle mirror of lloydIter): assign
    * by unrounded cosine (bit-identical doubles — left-fold dot), sum
    * integer micro-unit components (exact, order-insensitive), renormalize
    * in double, keep the previous centroid for empty cells.
    */
  private def lloydCte(k: Int): String = {
    val duck = true
    val prev = s"c${k - 1}"
    val sumExprs = (0 until Dim).map(i =>
      s"sum(CAST(round(${elem("e.vn", (i + 1).toString, duck)} * 1000000.0) AS BIGINT)) AS s_$i")
      .mkString(",\n    ")
    val svList = (0 until Dim).map(i => s"CAST(s_$i AS DOUBLE)").mkString("[", ", ", "]")
    s""" a$k AS (SELECT vec_id, centroid_id FROM (
       |   SELECT e.vec_id, c.centroid_id,
       |     row_number() OVER (PARTITION BY e.vec_id
       |       ORDER BY ${dot("e.vn", "c.cv", duck)} DESC, c.centroid_id) AS rnk
       |   FROM e, $prev c) z WHERE rnk = 1),
       | m$k AS (SELECT a.centroid_id,
       |    $sumExprs
       |  FROM a$k a JOIN e ON a.vec_id = e.vec_id GROUP BY a.centroid_id),
       | u$k AS (SELECT centroid_id, sv, sqrt(${dot("sv", "sv", duck)}) AS nrm
       |  FROM (SELECT centroid_id, $svList AS sv FROM m$k) s0),
       | c$k AS (SELECT p.centroid_id,
       |   CASE WHEN u.nrm IS NULL OR u.nrm = 0 THEN p.cv
       |        ELSE ${xform("u.sv", "x", "x / u.nrm", duck)} END AS cv
       |  FROM $prev p LEFT JOIN u$k u ON p.centroid_id = u.centroid_id)""".stripMargin
  }

  /** Shared IVF assignment CTEs (over the `e` normalized CTE): k-means
    * seeds (vec_id < K) + IvfIters Lloyd's iterations + final assignment.
    */
  private def ivfAsgCte: String =
    s""" c0 AS (SELECT vec_id AS centroid_id, vn AS cv FROM e WHERE vec_id < $IvfCells),
       |${(1 to IvfIters).map(lloydCte).mkString(",\n")},
       | c AS (SELECT centroid_id, cv FROM c$IvfIters),
       | asg0 AS (SELECT e.vec_id, c.centroid_id,
       |   round(${dot("e.vn", "c.cv", duck = true)}, 6) AS cos FROM e, c),
       | asg AS (SELECT vec_id, centroid_id, cos AS centroid_cos FROM (
       |   SELECT vec_id, centroid_id, cos,
       |     row_number() OVER (PARTITION BY vec_id
       |       ORDER BY cos DESC, centroid_id) AS rnk
       |   FROM asg0) z
       |  WHERE rnk = 1)""".stripMargin
}
