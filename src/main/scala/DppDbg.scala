import org.apache.spark.sql.SparkSession
object DppDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.operators.LayoutOps.dppStarJoin(spark, "/root/testdata/sf0.001")
    df.collect()
    println("=== FORMATTED ===")
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(4000))
  }
}
