package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** One-off diagnostic: per-stage wall time / task time / max task for the
  * flagship extraction job at a given core count. Not part of the driver
  * contract — used to find which stage stops scaling. */
object DiagBench {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 16
    val corpus = if (args.length > 1) args(1) else "/tmp/graft_bench_corpus_2000000_50000"
    // mirror graft.Bench's scaling-phase session exactly
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.hadoop.parquet.block.size", (32 * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SCAN_BYTES", (128 * 1024 * 1024).toString))
      .config("spark.shuffle.file.buffer",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_BUF", "1m"))
      .config("spark.shuffle.unsafe.file.output.buffer",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_BUF", "1m"))
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4"))
      // lz4 block size for the shuffle streams (stock 32k): bigger blocks
      // cut per-block overhead and improve ratio — matters most when the
      // exchange crosses process boundaries (cluster mode loopback)
      .config("spark.io.compression.lz4.blockSize",
        sys.env.getOrElse("SPARK_GRAFT_LZ4_BLOCK", "32k"))
      .config("spark.reducer.maxSizeInFlight",
        sys.env.getOrElse("SPARK_GRAFT_REDUCER_MB", "48") + "m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val stages = ArrayBuffer.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        val m = si.taskMetrics
        stages += f"stage ${si.stageId}%3d wall=$wall%7.2fs taskTime=${m.executorRunTime / 1000.0}%8.2fs " +
          f"gc=${m.jvmGCTime / 1000.0}%6.2fs cpu=${m.executorCpuTime / 1e9}%8.2fs " +
          f"serde=${(m.executorDeserializeTime + m.resultSerializationTime) / 1000.0}%6.2fs " +
          f"fetchWait=${m.shuffleReadMetrics.fetchWaitTime / 1000.0}%6.2fs " +
          f"shWrite=${m.shuffleWriteMetrics.writeTime / 1e9}%6.2fs " +
          f"shWrB=${m.shuffleWriteMetrics.bytesWritten / 1e9}%6.3fGB " +
          f"shRdB=${m.shuffleReadMetrics.totalBytesRead / 1e9}%6.3fGB " +
          f"spill=${m.memoryBytesSpilled / 1e9}%.2fGB tasks=${si.numTasks}%4d"
      }
    })

    // warm
    val salt = sys.env.getOrElse("SPARK_GRAFT_SALT", "16").toInt
    val cfg = graft.model.ExtractConfig.default.copy(saltBuckets = salt)
    val t = spark.read.parquet(corpus).as[graft.model.Turn]
    graft.pipe.ExtractPipeline.run(spark, t, cfg).write.mode("overwrite").parquet("/tmp/diag_out")
    stages.clear()
    val t0 = System.nanoTime()
    graft.pipe.ExtractPipeline.run(spark, t, cfg).write.mode("overwrite").parquet("/tmp/diag_out")
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"TOTAL $sec%.2f s at $cores cores")
    stages.sorted.foreach(println)
    spark.stop()
  }
}
