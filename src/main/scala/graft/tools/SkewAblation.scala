package graft.tools

import graft.gen.TranscriptGen
import graft.model.ExtractConfig
import graft.pipe.ExtractPipeline
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Skew ablation: the same kernel stage over a skew-dominated corpus
  * (hottest conversation ≈ 15% of all turns) with salting OFF (salt=1 →
  * the hot conversation is one kernel task) vs ON (salt=32 → fanned out).
  * Times ONLY scan → gates → salted exchange → kernel (count(), no sink),
  * isolating the stage salting exists for. Writes BENCH/SKEW.md.
  */
object SkewAblation {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val nConvs = 400000
    val hotBase = 1200000
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = s"/tmp/graft_skew_corpus_${nConvs}_$hotBase"
    if (!Files.exists(Paths.get(corpus, "_SUCCESS"))) {
      TranscriptGen.dataset(spark, 42L, nConvs, hotBase, partitions = cores * 8)
        .write.mode("overwrite").parquet(corpus)
    }
    val turns = TranscriptGen.totalTurns(nConvs, hotBase)
    val hot = TranscriptGen.turnCount(0, hotBase)

    def timeKernel(salt: Int): Double = {
      val ds = spark.read.parquet(corpus).as[graft.model.Turn]
      val t0 = System.nanoTime()
      ExtractPipeline.extract(spark, ds, ExtractConfig.default.copy(saltBuckets = salt)).count()
      (System.nanoTime() - t0) / 1e9
    }
    timeKernel(32); timeKernel(1); timeKernel(0) // warm all paths
    val off1 = timeKernel(1); val on1 = timeKernel(32); val fu1 = timeKernel(0)
    val off2 = timeKernel(1); val on2 = timeKernel(32); val fu2 = timeKernel(0)
    val off = math.min(off1, off2); val on = math.min(on1, on2)
    val fused = math.min(fu1, fu2)

    def f(d: Double) = "%.2f".formatLocal(java.util.Locale.US, d)
    println(s"""{"skew":{"turns":$turns,"hotConvTurns":$hot,"cores":$cores,"sec_fused":${f(fused)},"sec_salt1":${f(off)},"sec_salt32":${f(on)}}}""")
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/SKEW.md"),
      s"""# Skew ablation (auto-written by graft.tools.SkewAblation)
         |
         |Corpus: $turns turns, hottest conversation = $hot turns (~${100 * hot / turns}%
         |of the corpus in ONE conv_id). Kernel stage only (scan → gates →
         |[optional repartition] → mapPartitions extract → count),
         |local[$cores], best-of-2 warmed runs.
         |
         || config | wall sec |
         ||---|---|
         || FUSED (salt = 0: kernel on size-bounded scan splits, no exchange) | ${f(fused)} |
         || salt = 1 (partition by conv_id — hot conv is ONE kernel task) | ${f(off)} |
         || salt = 32 (conv_id × hash(turn_idx)%32 — hot conv fans out) | ${f(on)} |
         |
         |Two findings: (1) against a conv_id-partitioned kernel stage,
         |salting defuses the hot-key task (${f(off / on)}× here); (2) the
         |stronger move is to not shuffle before a per-row kernel at all —
         |scan splits are size-bounded by files.maxPartitionBytes, so no
         |conversation can concentrate more than one split's bytes in one
         |task, and the raw payloads never cross the network. The fused plan
         |is the pipeline default; salt > 0 remains for kernels with
         |unbounded per-row cost. Result invariance across all three
         |configurations is asserted by PipelineE2ESpec.
         |""".stripMargin)
    spark.stop()
  }
}
