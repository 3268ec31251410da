package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print `.explain("formatted")` for a comma-separated
  * SPARK_GRAFT_ONLY list of SparkEntry queries — the plan-audit loop the
  * build prompt asks for, runnable without executing the queries.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q_star_join")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
      finally {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
