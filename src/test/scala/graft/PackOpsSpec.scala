package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PackOps

/** Packing audits vs a brute-force Scala mirror: the chunk stats must
  * equal the global-cumsum definition and the next-fit stats must equal
  * a sequential per-bucket fold over the same deterministic order.
  */
class PackOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val C = PackOps.CtxLen
  private def h(id: Long): Long = id % 2147483647L * 2654435761L % 1000000007L
  private def bucket(id: Long): Int = (h(id) * PackOps.Buckets / 1000000007L).toInt

  /** (doc_id, text) fixtures with exact whitespace token counts. */
  private def mkDocs(rows: Seq[(Long, Int)]) = {
    import spark.implicits._
    rows.map { case (id, nTok) =>
      (id, Seq.fill(nTok)("w").mkString(" "), "en", "s1", nTok.toLong * 2)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Brute-force mirrors over hash order. */
  private def mirror(rows: Seq[(Long, Int)]): (Long, Long, Long, Long) = {
    // chunk: split docs = boundary crossings of the global cumsum
    val ordered = rows.sortBy { case (id, _) => (h(id), id) }
      .map { case (id, n) => (id, math.min(n, C)) }
    var before = 0L; var splits = 0L
    ordered.foreach { case (_, tok) =>
      if (before / C != (before + tok - 1) / C) splits += 1
      before += tok
    }
    val nWindowsChunk = (before + C - 1) / C
    // next-fit: independent fold per bucket in (h, id) order
    var winsTotal = 0L
    ordered.groupBy { case (id, _) => bucket(id) }.foreach { case (_, ds) =>
      var fill = 0L; var wins = 0L
      ds.foreach { case (_, tok) =>
        if (wins == 0L || fill + tok > C) { wins += 1; fill = tok }
        else fill += tok
      }
      winsTotal += wins
    }
    (before, splits, nWindowsChunk, winsTotal)
  }

  test("chunk stats match the brute-force global cumsum") {
    val rows = (1L to 200L).map(id => (id, (id % 37 + 1).toInt))
    val (total, splits, nWin, _) = mirror(rows)
    val r = PackOps.chunkStats(mkDocs(rows)).collect().head
    assert(r.getAs[Long]("n_docs") == 200L)
    assert(r.getAs[Long]("total_tokens") == total)
    assert(r.getAs[Long]("n_split_docs") == splits)
    assert(r.getAs[Long]("n_windows") == nWin)
    assert(r.getAs[Long]("tail_pad") == nWin * C - total)
  }

  test("next-fit stats match the sequential per-bucket fold; windows bound below by chunk") {
    val rows = (1L to 200L).map(id => (id, (id * 7 % 150 + 1).toInt))
    val (total, _, nWinChunk, nWinNext) = mirror(rows)
    val r = PackOps.nextFitStats(spark, mkDocs(rows)).collect().head
    assert(r.getAs[Long]("n_docs") == 200L)
    assert(r.getAs[Long]("total_tokens") == total)
    assert(r.getAs[Long]("n_windows") == nWinNext)
    assert(r.getAs[Long]("total_pad") == nWinNext * C - total)
    assert(r.getAs[Long]("fill_bp") == total * 10000L / (nWinNext * C))
    // whole-doc packing can never beat the fragmenting lower bound
    assert(nWinNext >= nWinChunk)
    assert(r.getAs[Long]("fill_bp") <= 10000L)
  }

  test("best-fit-decreasing never uses more windows than next-fit") {
    val rows = (1L to 200L).map(id => (id, (id * 7 % 150 + 1).toInt))
    val nf = PackOps.nextFitStats(spark, mkDocs(rows)).collect().head
    val bfd = PackOps.bfdStats(spark, mkDocs(rows)).collect().head
    assert(bfd.getAs[Long]("n_docs") == nf.getAs[Long]("n_docs"))
    assert(bfd.getAs[Long]("total_tokens") == nf.getAs[Long]("total_tokens"))
    // within every bucket BFD opens <= next-fit's windows, so the sums obey it
    assert(bfd.getAs[Long]("n_windows") <= nf.getAs[Long]("n_windows"))
    assert(bfd.getAs[Long]("fill_bp") >= nf.getAs[Long]("fill_bp"))
    assert(bfd.getAs[Long]("fill_bp") <= 10000L)
  }

  test("over-length docs clamp to one full window each") {
    // 3 docs of 1000 tokens: clamped to C, each exactly fills one window
    val rows = Seq((5L, 1000), (6L, 1000), (7L, 1000))
    val r = PackOps.nextFitStats(spark, mkDocs(rows)).collect().head
    assert(r.getAs[Long]("total_tokens") == 3 * C)
    assert(r.getAs[Long]("n_windows") == 3L)
    assert(r.getAs[Long]("total_pad") == 0L)
    assert(r.getAs[Long]("fill_bp") == 10000L)
    val rc = PackOps.chunkStats(mkDocs(rows)).collect().head
    assert(rc.getAs[Long]("n_windows") == 3L)
    assert(rc.getAs[Long]("n_split_docs") == 0L)
  }

  test("randomized: next-fit never splits, fill accounting is exact") {
    val rnd = new scala.util.Random(4242)
    val rows = (1L to 300L).map(id => (id, rnd.nextInt(200) + 1))
    val (total, _, nWinChunk, nWinNext) = mirror(rows)
    val r = PackOps.nextFitStats(spark, mkDocs(rows)).collect().head
    assert(r.getAs[Long]("n_windows") == nWinNext)
    assert(nWinNext >= nWinChunk)
    assert(r.getAs[Long]("total_pad") + total == nWinNext * C)
  }
}
