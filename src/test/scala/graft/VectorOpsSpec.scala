package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** LSH sizing-dial invariants (the bench/oracle behavior of the vector
  * operators themselves is covered by the q_emb_* oracle rows).
  */
class VectorOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("lsh recall audit: hits bounded by exact pairs, ppm well-formed") {
    val r = VectorOps.lshRecall(Tables.embeddings(spark, dir)).collect().head
    val (n, ex, hit, ppm) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0 && hit <= ex)
    if (ex == 0) assert(ppm == -1L)
    else assert(ppm == hit * 1000000L / ex && ppm >= 0L && ppm <= 1000000L)
    spark.catalog.clearCache()
  }

  test("dbscan roles are consistent: noise<->-1, border attaches to core clusters") {
    val rows = VectorOps.dbscan(Tables.embeddings(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byRole = rows.groupBy(_._2)
    assert(byRole.keySet.subsetOf(Set("core", "border", "noise")))
    rows.foreach { case (_, role, c) =>
      if (role == "noise") assert(c == -1L) else assert(c >= 0L)
    }
    val coreClusters = byRole.getOrElse("core", Array.empty).map(_._3).toSet
    // a cluster id is the min core member's vec_id — itself a core row
    val coreIds = byRole.getOrElse("core", Array.empty).map(_._1).toSet
    assert(coreClusters.subsetOf(coreIds))
    byRole.getOrElse("border", Array.empty).foreach { case (_, _, c) =>
      assert(coreClusters.contains(c))
    }
    spark.catalog.clearCache()
  }

  test("literal RP planes equal the symbolic oracle planes bit-for-bit") {
    (0 until VectorOps.RpDim).foreach { j =>
      val p = VectorOps.RpPlaneOffset + j
      val sym = spark.range(1)
        .select(expr(VectorOps.rpPlane(p, duck = false)).as("pl"))
        .collect()(0).getSeq[Double](0)
      val const = VectorOps.rpPlaneConst(p)
      assert(sym.length == const.length)
      sym.zip(const).zipWithIndex.foreach { case ((a, b), i) =>
        assert(java.lang.Double.doubleToLongBits(a) ==
          java.lang.Double.doubleToLongBits(b), s"plane $p elem $i: $a vs $b")
      }
    }
  }

  test("rp distortion audit: cosines bounded, err column consistent, JL holds") {
    val rows = VectorOps.rpDistortion(Tables.embeddings(spark, dir)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.000001 && math.abs(r.getDouble(3)) <= 1.000001)
      assert(math.abs(r.getLong(4) - (r.getDouble(3) - r.getDouble(2)) * 1e6) <= 1.0)
    }
    // JL sanity at RpDim=16: the AVERAGE absolute cosine distortion must
    // stay well under the all-signal-lost level
    val meanAbs = rows.map(r => math.abs(r.getLong(4))).sum.toDouble / rows.length / 1e6
    assert(meanAbs < 0.35, s"meanAbs=$meanAbs")
    spark.catalog.clearCache()
  }

  test("bitsForCorpusSize: +1 bit per corpus doubling, floored at 4") {
    assert(VectorOps.bitsForCorpusSize(1L) == 4)
    assert(VectorOps.bitsForCorpusSize(32L) == 4)
    assert(VectorOps.bitsForCorpusSize(2048L) == 6)
    assert(VectorOps.bitsForCorpusSize(4096L) == 7)
    // doubling the corpus adds exactly one bit once past the floor
    (12 to 40).foreach { k =>
      val n = 1L << k
      assert(VectorOps.bitsForCorpusSize(2 * n) ==
        VectorOps.bitsForCorpusSize(n) + 1)
    }
  }

  test("semDedupDrops honors the threshold and never crosses cells") {
    val emb = Tables.embeddings(spark, dir)
    val drops = VectorOps.semDedupDrops(emb).cache()
    assert(drops.filter(col("max_cosine") < VectorOps.SemDedupMinCosine).count() == 0)
    // a dropped vector's reported cell must be its OWN IVF assignment —
    // i.e. candidate pairs were generated strictly within cells
    val asg = VectorOps.ivfAssign(emb)
      .select(col("vec_id").as("drop_vec_id"), col("centroid_id").as("own_cid"))
    val crossed = drops.join(asg, "drop_vec_id")
      .filter(col("centroid_id") =!= col("own_cid")).count()
    assert(crossed == 0, "semdedup pair crossed a k-means cell")
    spark.catalog.clearCache()
  }

  test("semDedup hot-cell cap: sub-bucketing bounds pair work, drops stay a subset") {
    val emb = Tables.embeddings(spark, dir)
    // the skew case the cap exists for: EVERY cell is "hot" at cap=4, so
    // every cell sub-buckets (ceil(log2(n/4)) SRP bits); with the default
    // cap no bench-SF cell is hot, so the paths must agree exactly
    val uncapped = VectorOps.semDedupDrops(emb).cache()
    val capped = VectorOps.semDedupDrops(emb, hotCellCap = 4).cache()
    val defaulted = VectorOps.semDedupDrops(emb, VectorOps.SemDedupHotCellCap)
    try {
      // capped pairs are generated within (cell, sub_key) — a strict
      // refinement of within-cell, so the drop set can only shrink
      val extra = capped.select("centroid_id", "drop_vec_id")
        .exceptAll(uncapped.select("centroid_id", "drop_vec_id")).count()
      assert(extra == 0, "capped run invented a drop outside the uncapped set")
      assert(capped.count() <= uncapped.count())
      // default cap unhit at this SF: byte-identical answer
      assert(defaulted.exceptAll(uncapped).count() == 0 &&
        uncapped.exceptAll(defaulted).count() == 0,
        "default cap must not change the bench-SF answer")
    } finally spark.catalog.clearCache()
  }

  test("PQ: codes bounded by the codebook, errors non-negative, recall sane") {
    val emb = Tables.embeddings(spark, dir)
    val codes = VectorOps.pqCodes(emb).cache()
    try {
      assert(codes.count() > 0)
      (0 until VectorOps.PqM).map(m => s"code_$m").foreach { c =>
        assert(codes.filter(col(c) < 0 || col(c) >= VectorOps.PqK).count() == 0,
          s"$c outside [0, ${VectorOps.PqK})")
      }
      assert(codes.filter(col("err_sq") < 0).count() == 0)
      val r = VectorOps.pqRecall(emb).collect()(0)
      val overlap = r.getLong(1)
      assert(overlap >= 0 && overlap <= 10)
      // this synthetic corpus is PQ's adversarial case — residuals are
      // near-iid noise with no inter-dim correlation to exploit, so
      // recall@10 sits at 0.2-0.5 across SFs and configs (measured: raw
      // encoding 0.0-0.3, residual 0.2-0.5; M∈{4,8,16}, K∈{16,32} move
      // it at most one hit). The audit row exists to QUANTIFY that trade;
      // the floor here pins "far better than random" (random recall@10 of
      // 500 vectors ≈ 0.02, P(X>=2) < 1e-3), not production recall.
      assert(overlap >= 2, s"ADC recall@10 at random-guess level: $overlap/10")
    } finally spark.catalog.clearCache()
  }

  test("lshBuckets honors the bits dial: bucket ids stay under 2^bits") {
    val emb = Tables.embeddings(spark, dir)
    val narrow = VectorOps.lshBuckets(emb, bits = 4)
    val wide = VectorOps.lshBuckets(emb)
    (0 until VectorOps.NTables).foreach { t =>
      assert(narrow.filter(col(s"bucket_$t") >= (1 << 4)).count() == 0)
      assert(wide.filter(col(s"bucket_$t") >= (1 << VectorOps.BitsPerTable)).count() == 0)
    }
    // narrower tables never partition finer than wider ones. (>= not >:
    // a tiny or clustered corpus can legitimately occupy <= 16 distinct
    // buckets even at 10 bits, so strict inequality is corpus-dependent.)
    val nNarrow = narrow.select("bucket_0").distinct().count()
    val nWide = wide.select("bucket_0").distinct().count()
    assert(nNarrow <= 16 && nWide >= nNarrow)
  }

  test("incremental IVF fold equals a full restart against the frozen centroids") {
    // q_emb_ivf_incr's proof obligation: per-cell (count, checksum) stats
    // are additive over any partition of the vectors, so folding standing
    // + batch stats must reproduce the single-pass reassignment of the
    // whole corpus against the SAME frozen standing-slice centroids.
    val emb = Tables.embeddings(spark, dir)
    val fold = VectorOps.ivfIncrementalStats(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.catalog.clearCache()
    val full = VectorOps.ivfFullRestartStats(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.catalog.clearCache()
    assert(fold == full)
    assert(fold.nonEmpty && fold.values.map(_._1).sum > 0)
  }

  test("persisted centroid index reproduces the in-memory incremental IVF stats") {
    val emb = Tables.embeddings(spark, dir)
    val inMem = VectorOps.ivfIncrementalStats(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.catalog.clearCache()
    val persisted = VectorOps.ivfIncrementalStatsPersisted(spark, dir)
    val plan = persisted.queryExecution.executedPlan.toString
    assert(plan.contains("graft_stream_ivfcents"),
      s"expected the persisted parquet centroid index in the plan:\n$plan")
    val got = persisted.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.catalog.clearCache()
    assert(got == inMem)
  }

  test("lsh table sweep: recall is monotone in the table count (prefix property)") {
    val rows = VectorOps.lshTableSweep(Tables.embeddings(spark, dir)).collect()
      .map(r => r.getAs[Long]("n_tables") ->
        ((r.getAs[Long]("n_hit"), r.getAs[Long]("n_exact")))).sortBy(_._1)
    try {
      assert(rows.map(_._1).toSeq == VectorOps.LshSweepTables.map(_.toLong))
      // same truth set at every point, hits never shrink as tables add
      assert(rows.map(_._2._2).distinct.length == 1)
      val hits = rows.map(_._2._1)
      assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
        s"hits must be monotone in n_tables: ${hits.toSeq}")
    } finally spark.catalog.clearCache()
  }

  test("topic mix: every embedding lands in exactly one source's tally") {
    import org.apache.spark.sql.functions._
    val embs = Tables.embeddings(spark, dir)
    val docs = Tables.documents(spark, dir)
    val rows = graft.operators.VectorOps.topicMix(embs, docs).collect()
    assert(rows.map(_.getLong(1)).sum == embs.count(),
      "per-source doc counts must conserve the embedding count")
    rows.foreach { r =>
      val (nDocs, nTopics, nTop, shareBp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nTopics >= 1 && nTopics <= graft.operators.VectorOps.IvfCells)
      assert(nTop >= 1 && nTop <= nDocs)
      // dominant-topic share is consistent with the pigeonhole bound
      assert(shareBp >= 10000L / nTopics && shareBp <= 10000L, s"share: $r")
    }
  }

  test("rowwise topic assignment replays the batch argmax exactly") {
    import org.apache.spark.sql.functions._
    val embs = Tables.embeddings(spark, dir)
    val batch = graft.operators.VectorOps.ivfAssign(embs)
      .select(col("vec_id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cents = graft.operators.VectorOps.frozenCentroidArray(embs)
    // the oracle pins the (source, topic) contingency; this pins the
    // STRONGER per-vector property by keying "source" with the vec_id
    val keyed = graft.operators.VectorOps
      .topicAssignRowwise(embs.withColumn("source",
        col("vec_id").cast("string")), cents)
      .collect().map(r => r.getString(0).toLong -> r.getLong(1)).toMap
    assert(keyed == batch, "rowwise argmax must equal assignTo per vector")
  }

  test("int8 quantization: codes bounded, reconstruction within one scale step") {
    import org.apache.spark.sql.functions._
    val embs = Tables.embeddings(spark, dir)
    val rows = embs.select(col("vec_id"), col("embedding")).collect()
    val got = graft.operators.VectorOps.quantizeInt8(embs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.foreach { r =>
      val xs = r.getSeq[Float](1).map(_.toDouble)
      val m = xs.map(math.abs).max
      val (sm, sq, sq2) = got(r.getLong(0))
      if (m == 0.0) assert(sm == 0L && sq == 0L && sq2 == 0L)
      else {
        val scale = m / 127.0
        val qs = xs.map(x => math.floor(x / scale).toLong)
        assert(qs.forall(q => q >= -128L && q <= 127L), s"code out of range: $qs")
        assert(sq == qs.sum && sq2 == qs.map(q => q * q).sum)
        // floor quantization: x - q*scale in [0, scale)
        xs.zip(qs).foreach { case (x, q) =>
          val d = x - q * scale
          assert(d >= -1e-12 && d < scale + 1e-12, s"recon error $d vs scale $scale")
        }
      }
    }
  }
}
