ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "realtime_financial_transactions_data_pipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked program stdout passes through UNPREFIXED (no sbt "[info] ")
// so graft.Bench's JSON line is machine-parseable from the sbt output.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A 210-query single-JVM bench janino-compiles + C2-JITs thousands of
  // whole-stage-codegen classes; the JDK 17 default 240 MB code cache
  // fills mid-run, and the resulting flush churn / disabled compiler
  // makes later queries run INTERPRETED (measured: q_emb_pq task-cpu
  // 91s late in a full run vs 3.7s in any short run, same code+data —
  // the round-9/10 "inflation" class). Reserved is virtual memory;
  // committed grows on demand.
  "-XX:ReservedCodeCacheSize=1g",
  // Round-11 root cause of the REMAINING driver inflation (VERDICT r10 #1,
  // 380.7s driver vs 201.3s quiet, 9 rows >=5x at task-CPU level): the
  // driver stacks Verify's 213 oracle dumps and Bench in one JVM
  // (reproduced locally: 333s, per-query jit_s telemetry showing 1-5s of
  // re-JIT per bench query, code cache only 186 MB of the 1 GB reserve —
  // NOT exhaustion). Spark's whole-stage-codegen class cache is a static
  // 100-entry LRU keyed by generated source; 213 distinct queries evict
  // everything, so the Bench phase re-generates, re-janino-compiles and
  // re-C2-JITs every class it just ran in Verify, with compiler threads
  // stealing CPU from the 32 task threads (mid-run probe 1.009s vs 0.65
  // idle). Sized to hold both phases' classes, the repeat pass reuses the
  // SAME already-JIT'd Class objects. Static conf, so it must arrive
  // before the first SparkSession — a -D system property does that for
  // every entry point (sbt forks all runs).
  "-Dspark.sql.codegen.cache.maxEntries=4096",
)
