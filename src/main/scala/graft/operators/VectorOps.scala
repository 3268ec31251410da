package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableSql._

/** Similarity search over the `embeddings` table (`Array[Float]` column).
  *
  * Two tiers, as a 100 TB pipeline needs them:
  *   - brute-force cosine top-k against one query vector: a broadcast of the
  *     single query row + one narrow pass over the corpus, finished by
  *     TakeOrderedAndProject (per-partition top-k, k-row driver merge) —
  *     linear scan, zero shuffle of the corpus;
  *   - sign-random-projection LSH: 8 deterministic hyperplanes → 8 sign bits
  *     → 256 buckets; candidate pairs come from an equi-join on the bucket
  *     id. At scale you re-partition by bucket and never form a cross
  *     product (the quadratic work is confined to a bucket).
  *
  * Hyperplane components are pseudo-random from integer arithmetic
  * (PortableSql.pseudoUniform) so the DuckDB oracle reproduces bucket
  * assignments and cosines exactly. All float math is widened to double
  * before any arithmetic; dot products fold left-to-right in both engines.
  */
object VectorOps {

  val NPlanes = 8
  val Dim = 64
  val AnnMinCosine = 0.3

  private def vcol: String = toDoubleArr("embedding", duck = false)

  private def cosineExpr(a: String, b: String, duck: Boolean): String =
    s"round(${dot(a, b, duck)} / (sqrt(${dot(a, a, duck)}) * sqrt(${dot(b, b, duck)})), 6)"

  /** Hyperplane j as an inline double-array expression. */
  private def plane(j: Int, duck: Boolean): String =
    xform(seqIncl("0", (Dim - 1).toString, duck), "i",
      pseudoUniform(s"$j * 97 + i"), duck)

  /** Brute-force cosine top-k neighbours of `queryId`. */
  def cosineTopK(emb: DataFrame, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"), expr(vcol).as("v"))
    val q = e.filter(col("vec_id") === queryId).select(col("v").as("qv"))
    e.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        expr(cosineExpr("v", "qv", duck = false)).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Sign-random-projection bucket per vector: bit j = sign(v . plane_j). */
  def lshBuckets(emb: DataFrame): DataFrame = {
    val bucketTerms = (0 until NPlanes).map { j =>
      s"(CASE WHEN ${dot("v", plane(j, duck = false), duck = false)} > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
    emb.select(col("vec_id"), col("label"), expr(vcol).as("v"))
      .select(col("vec_id"), col("label"),
        expr(s"CAST($bucketTerms AS BIGINT)").as("bucket"))
  }

  /** ANN candidate pairs: same LSH bucket, verified cosine >= threshold. */
  def annPairs(emb: DataFrame): DataFrame = {
    val b = lshBuckets(emb)
      .join(emb.select(col("vec_id"), expr(vcol).as("v")), "vec_id")
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        expr(cosineExpr("a.v", "b.v", duck = false)).as("cosine"))
      .filter(col("cosine") >= AnnMinCosine)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_emb_cosine_topk" -> ((s, dir) => cosineTopK(Tables.embeddings(s, dir))),
    "q_emb_lsh_buckets" -> ((s, dir) => lshBuckets(Tables.embeddings(s, dir))),
    "q_emb_ann_pairs" -> ((s, dir) => annPairs(Tables.embeddings(s, dir)))
  )

  def oracleSql: Map[String, String] = {
    val v = toDoubleArr("embedding", duck = true)
    val cos = cosineExpr("v", "qv", duck = true)
    val cosAb = cosineExpr("a.v", "b.v", duck = true)
    val bucketTerms = (0 until NPlanes).map { j =>
      s"(CASE WHEN ${dot("v", plane(j, duck = true), duck = true)} > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
    Map(
      "q_emb_cosine_topk" ->
        s"""WITH q AS (SELECT $v AS qv FROM embeddings WHERE vec_id = 0),
           | c AS (SELECT vec_id, label, $v AS v FROM embeddings WHERE vec_id <> 0)
           |SELECT vec_id, label, $cos AS cosine
           |FROM c, q
           |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,

      "q_emb_lsh_buckets" ->
        s"""SELECT vec_id, label, CAST($bucketTerms AS BIGINT) AS bucket
           |FROM (SELECT vec_id, label, $v AS v FROM embeddings) e""".stripMargin,

      "q_emb_ann_pairs" ->
        s"""WITH b AS (SELECT vec_id, CAST($bucketTerms AS BIGINT) AS bucket, v
           |  FROM (SELECT vec_id, $v AS v FROM embeddings) e)
           |SELECT a.vec_id AS v1, b.vec_id AS v2, $cosAb AS cosine
           |FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |WHERE $cosAb >= $AnnMinCosine""".stripMargin
    )
  }
}
