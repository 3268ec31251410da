package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, Phash, SampleOps, TextOps}

/** Degenerate-input robustness for the round-6 operators: an empty (or
  * dup-free) corpus must yield an empty result, never a crash — at
  * 100 TB a partition-pruned read producing zero rows is an everyday
  * plan, not an edge case.
  */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def emptyDocs = {
    import spark.implicits._
    Seq.empty[(Long, String, String, Long)].toDF("doc_id", "text", "lang", "n_chars")
  }

  test("tfidf/pmi/FS-linkage operators survive empty inputs") {
    import spark.implicits._
    assert(TextOps.tfidfTerms(emptyDocs).count() == 0)
    assert(TextOps.pmiCollocations(emptyDocs).count() == 0)
    val emptyPart = Seq.empty[(Long, String, String, String, Int)]
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size")
    assert(graft.operators.StringSimOps.fsLinkage(emptyPart).count() == 0)
  }

  test("text/sampling/dedup operators survive an empty corpus") {
    assert(TextOps.repetitionStats(emptyDocs).count() == 0)
    assert(TextOps.unigramSurprisal(emptyDocs).count() == 0)
    assert(TextOps.bm25Search(emptyDocs).count() == 0)
    assert(TextOps.winnowStats(emptyDocs).count() == 0)
    assert(SampleOps.tokenBudgetSample(emptyDocs).count() == 0)
    assert(DedupOps.decontaminate(emptyDocs).count() == 0)
    assert(DedupOps.incrementalClusters(emptyDocs).count() == 0)
    assert(Phash.phashPairs(spark, emptyDocs).count() == 0)
    spark.catalog.clearCache()
  }

  private def emptyEvents = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long, String, Double, String)]
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
  }

  test("finance/time-series/order-stat operators survive an empty stream") {
    import graft.operators.{AsofJoin, FinanceOps}
    assert(FinanceOps.ohlcBars(emptyEvents).count() == 0)
    assert(FinanceOps.runningBalance(emptyEvents).count() == 0)
    assert(FinanceOps.benfordAudit(emptyEvents).count() == 0)
    assert(AsofJoin.gapFillLocf(emptyEvents).count() == 0)
    assert(SampleOps.groupOrderStats(emptyEvents).count() == 0)
    assert(DedupOps.dupSpanStats(emptyDocs).count() == 0)
  }

  test("round-11 operators survive empty inputs") {
    import spark.implicits._
    import graft.operators.{FinanceOps, SequenceOps, ShuffleOps}
    assert(FinanceOps.drawdown(emptyEvents).count() == 0)
    assert(FinanceOps.cusumFlags(emptyEvents).count() == 0)
    assert(ShuffleOps.bitmapDistinct(emptyEvents).count() == 0)
    assert(SequenceOps.attributionPosition(emptyEvents).count() == 0)
    assert(TextOps.postingsDelta(emptyDocs).count() == 0)
    assert(TextOps.zipfFit(emptySourcedDocs).count() == 0)
    val emptyLi = Seq.empty[(Long, Double, Double, Long)]
      .toDF("l_partkey", "l_extendedprice", "l_quantity", "us")
      .withColumn("l_shipdate", timestamp_micros(col("us"))).drop("us")
    val emptyPart = Seq.empty[(Long, String)].toDF("p_partkey", "p_brand")
    assert(FinanceOps.vwap(emptyLi, emptyPart).count() == 0)
    assert(ShuffleOps.skewAudit(emptyLi.withColumn("l_orderkey", lit(1L))).count() == 0)
  }

  private def emptySourcedDocs = {
    import spark.implicits._
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("split/pack/corpus operators survive an empty corpus") {
    import graft.operators.{CorpusOps, PackOps, SplitOps}
    assert(SplitOps.splitAssign(emptySourcedDocs).count() == 0)
    val leak = SplitOps.splitLeakage(emptySourcedDocs).collect()
    assert(leak.length == 1 && leak(0).getAs[Long]("n_pairs") == 0L)
    // empty corpus: single agg row of NULL/0 counts, identically in DuckDB
    val chunk = PackOps.chunkStats(emptySourcedDocs).collect()
    assert(chunk.length == 1 && chunk(0).getAs[Long]("n_docs") == 0L)
    val nf = PackOps.nextFitStats(spark, emptySourcedDocs).collect()
    assert(nf.length == 1 && nf(0).getAs[Long]("n_docs") == 0L)
    assert(CorpusOps.dupSourceMatrix(emptySourcedDocs).count() == 0)
    assert(CorpusOps.splitBalance(emptySourcedDocs).count() == 0)
    assert(CorpusOps.boilerplate(emptySourcedDocs).count() == 0)
    assert(CorpusOps.gramNovelty(emptySourcedDocs).count() == 0)
    assert(DedupOps.containmentPairs(emptySourcedDocs).count() == 0)
    assert(CorpusOps.dsirWeights(emptySourcedDocs).count() == 0)
    assert(CorpusOps.dsirLogRatios(emptySourcedDocs).count() == 0)
    assert(TextOps.tokenizerFertility(emptySourcedDocs).count() == 0)
    assert(DedupOps.dedupRetention(emptySourcedDocs).count() == 0)
    spark.catalog.clearCache()
  }

  test("topic mix survives an empty embedding table") {
    import spark.implicits._
    val emptyEmb = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(graft.operators.VectorOps
      .topicMix(emptyEmb, emptySourcedDocs).count() == 0)
    spark.catalog.clearCache()
  }

  test("round-11 incremental operators survive an empty corpus") {
    import spark.implicits._
    val emptyEmb = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(graft.operators.VectorOps.ivfIncrementalStats(emptyEmb).count() == 0)
    // empty name vocabulary: no pairs, no labels — empty result, no crash
    val emptyPart = Seq.empty[(Long, String)].toDF("p_partkey", "p_name")
    assert(graft.operators.StringSimOps
      .entityClustersIncremental(emptyPart).count() == 0)
    spark.catalog.clearCache()
  }

  test("round-12 operators survive empty inputs") {
    import spark.implicits._
    import graft.operators.{EvalOps, FinanceOps, Governance, MixOps, VectorOps}
    val emptyEmb = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    // semantic decontamination: one audit row with zero slices/hits
    val dec = VectorOps.semDecontaminate(emptyEmb).collect()
    assert(dec.length == 1 && dec(0).getAs[Long]("n_cross_pairs") == 0L)
    assert(VectorOps.dbscan(emptyEmb).count() == 0)
    // rank-sum AUC over zero cells: the aggregate row exists but n_pos=0
    // would divide by zero — cells empty ⇒ sums are NULL ⇒ NULL ppm row,
    // which a caller filters; the point is no crash
    val emptyCells = Seq.empty[(Long, Long, Long)].toDF("s", "cnt", "pos")
    assert(EvalOps.aucFromCells(emptyCells).count() == 1)
    val emptyCounts = Seq.empty[(String, Long)].toDF("source", "toks")
    assert(MixOps.waterfillFromCounts(emptyCounts).count() == 0)
    val emptyEvents2 = emptyEvents
    assert(FinanceOps.sharpeDaily(emptyEvents2).count() == 0)
    val emptyCust = Seq.empty[(Long, Int, String)]
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
    // zero customers: the single rollup row reports 0 groups
    val ka = Governance.kAnonymity(emptyCust).collect()
    assert(ka.length == 1 && ka(0).getAs[Long]("n_groups") == 0L)
    spark.catalog.clearCache()
  }

  test("budget sample on a single tiny doc keeps it (crossing doc included)") {
    import spark.implicits._
    val one = Seq((1L, "a b c", "en", 5L)).toDF("doc_id", "text", "lang", "n_chars")
    val got = SampleOps.tokenBudgetSample(one).collect()
    assert(got.length == 1 && got(0).getLong(got(0).fieldIndex("tokens_before")) == 0L)
  }
}
