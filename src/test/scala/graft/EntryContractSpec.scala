package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: every query has an oracle row (a missing
  * one silently downgrades the driver's check to rows-only), and no
  * oracle row is orphaned (a typo'd key would never be compared at all).
  */
class EntryContractSpec extends AnyFunSuite {

  test("queries and oracleSql cover exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing an oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"orphaned oracle rows: ${o -- q}")
  }

  test("no duplicate query names across module maps") {
    val maps = Seq(
      graft.operators.Analytics.queries, graft.operators.AsofJoin.queries,
      graft.operators.AuditOps.queries, graft.operators.SequenceOps.queries,
      graft.operators.StringSimOps.queries, graft.operators.MiningOps.queries,
      graft.operators.Governance.queries, graft.operators.LayoutOps.queries,
      graft.operators.SampleOps.queries, graft.operators.TextOps.queries,
      graft.operators.DedupOps.queries, graft.operators.VectorOps.queries,
      graft.operators.Multimodal.queries, graft.operators.Audio.queries,
      graft.operators.Bmp.queries, graft.operators.Phash.queries,
      graft.operators.ImageIoCodec.queries, graft.operators.EvalOps.queries,
      graft.sources.SynthDataSource.queries, graft.sources.ManifestSink.queries,
      graft.sources.GraftCatalog.queries,
      graft.ingest.AvroWire.queries, graft.ingest.IngestQueries.queries,
      graft.streaming.StreamIngest.queries, graft.streaming.StreamQueries.queries,
      graft.streaming.StreamAsof.queries, graft.streaming.StreamTws.queries,
      graft.load.DimLoader.queries,
      graft.gen.Generators.queries, graft.operators.ShuffleOps.queries,
      graft.operators.TypedAgg.queries, graft.operators.MixOps.queries,
      graft.operators.GraphOps.queries, graft.operators.FinanceOps.queries,
      graft.operators.SplitOps.queries, graft.operators.PackOps.queries,
      graft.operators.CorpusOps.queries, graft.operators.FeatureOps.queries,
      graft.functions.GraftFunctionCatalog.queries)
    val all = maps.flatMap(_.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"query name collision (later map would shadow): $dups")
    assert(all.size == SparkEntry.queries.size,
      "a module map is missing from SparkEntry.queries")
  }
}
