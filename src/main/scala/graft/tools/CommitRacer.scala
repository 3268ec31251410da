package graft.tools

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{ManifestBatchWrite, ManifestDataWriter, StagedFileSet}

/** CROSS-PROCESS COMMIT TORTURE driver (r19, VERDICT r18 Next #3): a
  * standalone main a SECOND JVM runs to contest one lake root against
  * the test JVM — `_commit.lock` is a FileChannel lock, which is
  * per-PROCESS by design, so only a real second process exercises the
  * cross-process arm of the exclusion (the in-JVM monitor covers the
  * rest and ConcurrencySpec already races threads).
  *
  * Deliberately SPARK-FREE: each append drives the REAL task-writer +
  * driver-commit code path (stage → lock → move → CAS → atomic manifest
  * swap) through direct [[ManifestDataWriter]]/[[ManifestBatchWrite]]
  * calls — the identical classes a Spark job invokes — without paying a
  * second SparkSession's startup inside the spec's wall clock.
  *
  * Args: `<root> <writerId> <nCommits>`. Each commit appends ONE row
  * `(w = writerId, i)` in its own snapshot; the parent asserts every
  * row accounted and the generation sequence gapless afterward.
  */
object CommitRacer {
  val Ddl = "w STRING, i BIGINT"

  def main(args: Array[String]): Unit = {
    val root = args(0)
    val writerId = args(1)
    val n = args(2).toInt
    val schema = StructType.fromDDL(Ddl)
    var i = 0
    while (i < n) {
      val token = java.util.UUID.randomUUID().toString.take(8)
      val dw = new ManifestDataWriter(root, schema,
        s"racer-$writerId-$i-$token", "json")
      dw.write(InternalRow(UTF8String.fromString(writerId), i.toLong))
      val msg = dw.commit().asInstanceOf[StagedFileSet]
      new ManifestBatchWrite(root, schema, replace = false, format = "json")
        .commit(Array(msg))
      i += 1
    }
    // the parent greps this marker to distinguish success from a JVM
    // that died mid-race
    println(s"racer-done $writerId $n")
  }
}
