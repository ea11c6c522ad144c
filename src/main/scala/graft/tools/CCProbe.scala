package graft.tools
import org.apache.spark.HashPartitioner
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.rdd.RDD

object CCProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (run <- 0 until 2) {
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        println(f"run$run $tag%-20s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        t0 = System.nanoTime()
      }
      val edges = graft.SparkEntry.queries("q_simhash_pairs")(spark, sfDir)
        .select(col("id_a"), col("id_b"))
      val undRaw = edges.as[(Long, Long)].rdd
        .flatMap { case (a, b) => Iterator((b, a), (a, b)) }.cache()
      val nE = undRaw.count()
      lap(s"edges+count(nE=$nE)")
      val lp = math.max(1, math.min(undRaw.getNumPartitions, math.ceil(nE / 250000.0).toInt))
      val part = new HashPartitioner(lp)
      val und = undRaw.partitionBy(part).cache()
      und.foreachPartition(_ => ())
      undRaw.unpersist(false)
      lap(s"partitionBy(lp=$lp)")
      var labels: RDD[(Long, Long)] = und
        .map { case (p, t) => (t, p) }
        .reduceByKey(part, math.min(_, _))
        .map { case (id, m) => (id, math.min(id, m)) }.cache()
      labels.foreachPartition(_ => ())
      lap("labels1")
      def jump(l: RDD[(Long, Long)]): RDD[(Long, Long)] =
        l.map { case (id, c) => (c, id) }.join(l, part).map { case (_, (id, cc)) => (id, cc) }
      var converged = false
      var rounds = 0
      while (!converged) {
        rounds += 1
        val prop = und.join(labels, part)
          .map { case (_, (target, c)) => (target, c) }
          .reduceByKey(part, math.min(_, _))
        val merged = labels.union(prop).reduceByKey(part, math.min(_, _)).cache()
        val next = (if (rounds % 2 == 0) jump(merged) else merged).cache()
        converged = next.join(labels, part)
          .filter { case (_, (n, o)) => n != o }.count() == 0L
        labels.unpersist(false)
        if (next ne merged) merged.unpersist(false)
        labels = next
        lap(s"round$rounds")
      }
      val out = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"))
        .join(labels.toDF("doc_id", "comp"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp"))
        .withColumn("keep", col("doc_id") === col("comp"))
      val n = out.count()
      lap(s"output(n=$n)")
    }
    spark.stop()
  }
}
