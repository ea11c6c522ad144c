package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: `runMain graft.tools.QTime q1 q2 ...` over
  * SPARK_GRAFT_SF_DIR (defaults sf0.1), local[32] like the bench. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      (0 until 2).foreach { run =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        println(f"$name%-24s run$run ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      }
    }
    spark.stop()
  }
}
