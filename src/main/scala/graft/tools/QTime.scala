package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: `runMain graft.tools.QTime q1 q2 ...` over
  * SPARK_GRAFT_SF_DIR (defaults sf0.1), local[32] like the bench. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.cleaner.referenceTracking",
        sys.env.getOrElse("SPARK_GRAFT_REFTRACK", "true"))
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_STAGE_LOG"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = e.stageInfo
          val secs = (for (a <- i.completionTime; b <- i.submissionTime) yield (a - b) / 1e3)
            .getOrElse(-1.0)
          if (secs > 1.0) {
            val tm = i.taskMetrics
            println(f"[stage] ${i.stageId}%4d ${secs}%7.2f s tasks=${i.numTasks} " +
              f"in=${tm.inputMetrics.recordsRead} sr=${tm.shuffleReadMetrics.recordsRead} " +
              f"sw=${tm.shuffleWriteMetrics.recordsWritten} " +
              f"cpu=${tm.executorCpuTime / 1e9}%6.2f gc=${tm.jvmGCTime / 1e3}%5.2f ${i.name.take(70)}")
          }
        }
      })
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
