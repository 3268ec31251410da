package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** Edge-case coverage for the dedup operators, in particular documents with
  * fewer than 3 tokens: `trigramShingles` must yield an EMPTY array there
  * (Spark's `sequence(1, n-2)` would otherwise produce a descending range
  * and crash under ANSI — see PortableSql.trigramShingles).
  */
class DedupOpsSpec extends AnyFunSuite {

  test("bag dedup catches word-order permutations that exact dedup misses") {
    val sp = SparkTestBase.spark
    import sp.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "gamma alpha beta"), // permuted pair
      (3L, "alpha beta"), (4L, "alpha beta"),             // exact pair
      (5L, "alpha alpha beta"), (6L, "alpha beta beta")   // multiset differs
    ).toDF("doc_id", "text")
    val bag = graft.operators.DedupOps.bagDuplicates(docs).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(bag == Map(1L -> 2L, 3L -> 2L), s"got $bag")
    val exact = graft.operators.DedupOps.exactDuplicates(docs)
      .filter($"n_copies" > 1).collect()
    assert(exact.length == 1, "exact dedup must only see the verbatim pair")
  }

  private lazy val spark = SparkTestBase.spark

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  private val shortAndLong = docs(
    (1L, "one", "s1"),
    (2L, "just two", "s1"),
    (3L, "exactly three tokens", "s1"),
    (4L, "a b c d e f g h", "s1"),
    (5L, "a b c d e f g h", "s1"))

  test("minhash signatures survive <3-token docs (null minima, no crash)") {
    val sig = DedupOps.minhashSignatures(shortAndLong).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(sig.size == 5)
    // short docs have no shingles -> array_min(empty) is null
    assert(sig(1L).isNullAt(sig(1L).fieldIndex("mh_0")))
    assert(sig(2L).isNullAt(sig(2L).fieldIndex("mh_0")))
    assert(!sig(3L).isNullAt(sig(3L).fieldIndex("mh_0")))
  }

  test("simhash signatures survive <3-token docs") {
    val sig = DedupOps.simhashSignatures(shortAndLong).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sig.size == 5)
    assert(sig(1L) == 0L) // no shingles -> no majority bits
    assert(sig(4L) == sig(5L)) // identical docs -> identical sketch
  }

  test("ngram Jaccard pairs: short docs never pair, identical docs hit 1.0") {
    val pairs = DedupOps.ngramJaccardPairs(shortAndLong).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("d1") == 4L)
    assert(pairs.head.getAs[Long]("d2") == 5L)
    assert(pairs.head.getAs[Double]("jaccard") == 1.0)
  }

  test("minhash dup pairs find identical docs, skip short docs") {
    val pairs = DedupOps.minhashDupPairs(shortAndLong).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Double]("jaccard") == 1.0)
  }

  test("cluster propagation collapses chains that pairwise drop-lists split") {
    import spark.implicits._
    // 1-2, 2-3 chained (1 never pairs with 3 directly); 4-5 separate; 6 alone
    val nodes = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("d1", "d2")
    val out = DedupOps.clustersFromPairs(nodes, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("star-contraction CC equals min-label propagation on chains, cliques, isolates") {
    val sp = SparkTestBase.spark
    import sp.implicits._
    // a 50-node chain (propagation's worst case), a clique, an isolated
    // pair, and isolates with no edges at all
    val chain = (1L until 50L).map(i => (i, i + 1))
    val clique = for (a <- 100L to 104L; b <- (a + 1) to 104L) yield (a, b)
    val pairs = (chain ++ clique ++ Seq((200L, 201L))).toDF("d1", "d2")
    val nodes = ((1L to 50L) ++ (100L to 104L) ++ Seq(200L, 201L, 300L, 301L))
      .toDF("doc_id")
    val prop = DedupOps.clustersFromPairs(nodes, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stars = DedupOps.clustersFromPairsStars(nodes, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stars == prop)
    assert(stars(50L) == 1L && stars(104L) == 100L && stars(300L) == 300L)
    sp.catalog.clearCache()
  }

  test("cluster propagation on an empty pair set short-circuits to self-labels") {
    import spark.implicits._
    val nodes = (1L to 4L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("d1", "d2")
    val out = DedupOps.clustersFromPairs(nodes, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("incremental cluster maintenance equals the full recompute on the corpus") {
    // The core invariant behind q_dedup_clusters_incr: star edges from
    // yesterday's labels + today's batch-touching pairs reconnect exactly
    // the components the full pair set would, with the same minima —
    // including a batch doc that MERGES two standing clusters.
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val full = DedupOps.dupClusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val incr = DedupOps.incrementalClusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incr == full)
    spark.catalog.clearCache()
  }

  test("persisted band index reproduces the in-memory incremental pairs") {
    // q_dedup_incr_persisted's whole claim: swapping the recomputed
    // standing bands for the parquet round-trip changes the plan, never
    // the answer — and the index really is READ (the executed plan scans
    // the bandindex fixture path; the standing slice's signature build
    // appears nowhere).
    val dir = "/root/testdata/sf0.001"
    val inMem = DedupOps.incrementalDupPairs(Tables.documents(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.catalog.clearCache()
    val persisted = DedupOps.incrementalDupPairsPersisted(spark, dir)
    val plan = persisted.queryExecution.executedPlan.toString
    assert(plan.contains("graft_stream_bandindex"),
      s"expected the persisted parquet index in the plan:\n$plan")
    val got = persisted.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.catalog.clearCache()
    assert(got == inMem)
    assert(got.nonEmpty, "fixture corpus should contain batch-touching near-dups")
  }

  test("fully storage-backed incremental clusters equal the full recompute") {
    val dir = "/root/testdata/sf0.001"
    val full = DedupOps.dupClusters(Tables.documents(spark, dir)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    val persisted = DedupOps.incrementalClustersPersisted(spark, dir)
    val got = persisted.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    assert(got == full)
  }

  test("label maintenance composes across two consecutive batches") {
    // Day-2 fold over day-1's MAINTAINED labels must equal the full
    // recompute — the invariant that lets a daily job run forever without
    // periodic full rebuilds. Three slices: standing (0), day-1 batch (1),
    // day-2 batch (2) by doc_id % 3 over a chain-heavy toy corpus.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val n = 30L
    val nodes = (0L until n).toDF("doc_id")
    // chain edges i—(i+1): every batch doc touches standing components
    val allPairs = (0L until n - 1).map(i => (i, i + 1))
    def slice(k: Long) = nodes.filter(col("doc_id") % 3 === k)
    def pairsTouching(ids: Set[Long], within: Set[Long]) =
      allPairs.filter { case (a, b) =>
        (ids.contains(a) || ids.contains(b)) &&
          within.contains(a) && within.contains(b)
      }.toDF("d1", "d2")
    val day0 = (0L until n).filter(_ % 3 == 0).toSet
    val day1 = (0L until n).filter(_ % 3 == 1).toSet
    val day2 = (0L until n).filter(_ % 3 == 2).toSet
    // yesterday-0: standing-only propagation (no edges among %3==0 nodes)
    val labels0 = DedupOps.clustersFromPairs(slice(0),
      pairsTouching(day0, day0))
    // day 1: fold batch-1-touching pairs within day0+day1
    val labels1 = DedupOps.maintainLabels(labels0,
      pairsTouching(day1, day0 ++ day1), slice(1))
    // day 2: fold batch-2-touching pairs over the MAINTAINED labels
    val labels2 = DedupOps.maintainLabels(labels1,
      pairsTouching(day2, day0 ++ day1 ++ day2), slice(2))
    val got = labels2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = DedupOps.clustersFromPairs(nodes, allPairs.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    assert(got == full)
    // the full chain is one component labelled by the global minimum
    assert(got.values.toSet == Set(0L) && got.size == n)
  }

  test("cluster propagation converges on a cycle") {
    import spark.implicits._
    val nodes = (1L to 3L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("d1", "d2")
    val out = DedupOps.clustersFromPairs(nodes, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSet == Set(1L))
  }

  test("decontamination flags the train doc sharing an eval passage") {
    val common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = docs(
      (7L, common, "s1"), // eval slice: 7 % 50 == 7
      (58L, "PREFIX " + common, "s1"), // train, contains the passage
      (9L, "completely different words here with no overlap at all", "s1"))
    val res = DedupOps.decontaminate(d).collect()
    spark.catalog.clearCache()
    assert(res.length == 1)
    val r = res(0)
    assert(r.getLong(r.fieldIndex("train_doc")) == 58L)
    assert(r.getLong(r.fieldIndex("eval_doc")) == 7L)
    // all 8 of the eval doc's distinct trigrams appear in the train doc
    assert(r.getLong(r.fieldIndex("n_shared")) == 8L)
  }

  test("containment flags an embedded excerpt that low jaccard hides") {
    val excerpt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val filler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed " +
      "tempor incididunt labore dolore magna aliqua enim minim veniam quis"
    val d = docs(
      (11L, excerpt, "s1"),                       // the short doc: 8 shingles
      (12L, filler + " " + excerpt, "s1"),        // long doc embedding it whole
      (13L, "totally unrelated words that never appear anywhere else", "s1"))
    val res = DedupOps.containmentPairs(d).collect()
    spark.catalog.clearCache()
    assert(res.length == 1, s"exactly the embedded pair: ${res.mkString(";")}")
    val r = res(0)
    assert(r.getLong(r.fieldIndex("d1")) == 11L)
    assert(r.getLong(r.fieldIndex("d2")) == 12L)
    // every shingle of the excerpt appears in the long doc except the two
    // straddling the filler|excerpt seam (which are new grams) — n1 = 8,
    // all 8 present in h2, so containment = 1.0
    assert(r.getLong(r.fieldIndex("n_inter")) == r.getLong(r.fieldIndex("n1")))
    assert(r.getDouble(r.fieldIndex("containment")) == 1.0)
    // and jaccard over the union would be well under the minhash
    // threshold: n2 >> n1
    assert(r.getLong(r.fieldIndex("n2")) > 2 * r.getLong(r.fieldIndex("n1")))
  }

  test("incremental pairs == full pair set filtered to batch-touching rows") {
    // ids 9, 19 are in the % 10 == 9 batch slice; 1, 2, 11 are standing
    // corpus. Dup groups: {1, 2} (corpus-only — must NOT appear),
    // {9, 11} (batch x corpus), {19, 12} (batch x corpus).
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "one two three four five six seven eight nine ten eleven twelve"
    val c = "red orange yellow green blue indigo violet ultra infra deep"
    val d = docs(
      (1L, a, "s1"), (2L, a, "s1"),
      (9L, b, "s1"), (11L, b, "s1"),
      (19L, c, "s1"), (12L, c, "s1"),
      (3L, "nothing like any other document in this corpus at all", "s1"))
    val incr = DedupOps.incrementalDupPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val full = DedupOps.minhashDupPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(incr == Set((9L, 11L), (12L, 19L)), s"got $incr")
    assert(incr == full.filter { case (x, y) => x % 10 == 9 || y % 10 == 9 })
    assert(full.contains((1L, 2L)) && !incr.contains((1L, 2L)),
      "corpus-internal pairs must never be re-derived")
  }

  test("containment yields nothing when overlap stays under the shared-gram floor") {
    val d = docs(
      (21L, "alpha beta gamma completely different tail words here", "s1"),
      (22L, "alpha beta gamma another unrelated ending of the text", "s1"))
    val res = DedupOps.containmentPairs(d).collect()
    spark.catalog.clearCache()
    assert(res.isEmpty, s"only 1 shared gram (< ${DedupOps.ContainMinShared}): ${res.mkString(";")}")
  }

  test("rare-first prefix filtering returns exactly the value-ordered result set") {
    // skewed corpus: every doc opens with the same hot boilerplate (those
    // shingles are the FREQUENT ones the rare-first order keeps out of
    // prefixes), dups share rare tails, a near-dup pair sits at J ~= 0.5,
    // and a cross-source twin must never pair
    val skewed = docs(
      (1L, "terms of service apply to all users of this site foo bar baz qux", "s1"),
      (2L, "terms of service apply to all users of this site foo bar baz qux", "s1"),
      (3L, "terms of service apply to all users of this site alpha beta gamma delta", "s1"),
      (4L, "terms of service apply to all users of this site unrelated words here now", "s1"),
      (5L, "terms of service apply to all users of this site foo bar baz qux", "s2"),
      (6L, "wholly different content with nothing shared at all anywhere", "s1"))
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toSet
    val byValue = pairs(DedupOps.ngramJaccardPairs(skewed))
    val byFreq = pairs(DedupOps.ngramJaccardPairsRareFirst(skewed))
    assert(byValue == byFreq,
      "prefix order is a plan-side dial: it must never change the answer")
    assert(byValue.exists { case (a, b, _) => a == 1L && b == 2L },
      "exact dups must pair")
    assert(!byValue.exists { case (a, b, _) => b == 5L || a == 5L },
      "cross-source docs must not pair")
    spark.catalog.clearCache()
  }
}
