package graft.tools

/** Driver-shape repro (VERDICT r10 ask #1): run Verify's full oracle dump
  * and THEN Bench inside ONE JVM, the stacking the r10 judge hypothesized
  * for the driver's archived 380.7s run (vs the 201.3s quiet Bench-only
  * anchor). The two mains each build and stop their own SparkSession; what
  * they share — and what this repro measures — is the JVM-global state:
  * the JIT code cache (thousands of extra whole-stage-codegen classes from
  * the 213 oracle dumps), C2 profile pollution, and metaspace. Bench's
  * per-query `jit_s`/`cc_mb` telemetry then shows directly whether the
  * stacked shape drives the code cache toward its reserve and re-creates
  * the task-CPU inflation class (q_ingest_valid 456 task-cpu-s et al).
  *
  * Usage: runMain graft.tools.VerifyThenBench <sfDir> <verifyOutDir>
  * (Bench reads SPARK_GRAFT_SF_DIR itself, as always.)
  */
object VerifyThenBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "target/verify_shape"
    val t0 = System.nanoTime()
    graft.Verify.main(Array(sfDir, outDir))
    val tVerify = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[shape] Verify done in $tVerify%.1f s — starting Bench in same JVM")
    graft.Bench.main(Array.empty)
  }
}
