package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc executed-plan printer: `runMain graft.tools.ExplainQ <query>` runs
  * the named [[graft.SparkEntry.queries]] entry at sf0.01 and prints its
  * post-AQE physical plan — the fastest way to check exchange reuse,
  * broadcast choices, and codegen spans for one query. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01")
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
