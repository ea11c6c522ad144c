package graft.tools

import graft.gen.TranscriptGen
import graft.pipe.ExtractPipeline
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Measures the storage-partitioned join against the shuffled baseline:
  * two co-bucketed snapshot tables (same conv_id layout, numBuckets=32)
  * joined on conv_id, with `spark.sql.sources.v2.bucketing.enabled`
  * on vs off — same host, back-to-back, interleaved reps, so the RELATIVE
  * number holds even on a noisy window. Results land in BENCH/TUNING.md
  * by hand (this prints one JSON line).
  *
  * Why it matters at 100 TB: the "off" plan shuffles BOTH full tables on
  * conv_id before the merge join; the "on" plan does per-bucket merge IO
  * with zero exchange — the difference grows linearly with table size.
  */
object SpjProbe {
  private def session(cores: Int, spj: Boolean): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-spj-$spj")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.sources.v2.bucketing.enabled", spj.toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      // SPJ needs the FunctionCatalog that proves the bucket layouts equal
      .config("spark.sql.catalog.graft", "graft.connector.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", "/tmp/graft_spj_wh")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_SPJ_CONVS", "800000").toInt
    val wh = "/tmp/graft_spj_wh"

    // ---- one-time fixture: two co-bucketed tables from the real pipeline
    if (!Files.exists(Paths.get(wh, "t2", "CURRENT"))) {
      val s = session(cores, spj = false)
      // hotBase=4: near-uniform conversations — the probe measures JOIN
      // shape, not skew (SKEW.md covers that); conv-level join stays ~1:1
      val turns = TranscriptGen.dataset(s, 42L, nConvs, hotBase = 4, partitions = cores * 4)
      val extracted = ExtractPipeline.run(s, turns)
      extracted.write.format("graft-snapshot").mode("append")
        .option("numBuckets", "32").option("runId", "w1").save(s"$wh/t1")
      extracted.write.format("graft-snapshot").mode("append")
        .option("numBuckets", "32").option("runId", "w1").save(s"$wh/t2")
      s.stop()
    }

    def timeJoin(spj: Boolean): (Double, Int) = {
      val s = session(cores, spj)
      try {
        val a = s.table("graft.t1")
        val b = s.table("graft.t2")
        // conv_id-only join: exactly the partition key, so the co-partition
        // check needs no subset handling (turns-per-conv ≈ 2 ⇒ bounded pair
        // expansion; skew is SKEW.md's topic, not this probe's)
        val joined = a.join(b.withColumnRenamed("text", "text_b"), Seq("conv_id"))
          .selectExpr("count(*) AS n", "sum(length(text) + length(text_b)) AS bytes")
        val shuffles = joined.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }.size
        val t0 = System.nanoTime()
        joined.collect()
        ((System.nanoTime() - t0) / 1e9, shuffles)
      } finally s.stop()
    }

    // warm both paths once, then interleave timed reps
    timeJoin(spj = true); timeJoin(spj = false)
    val reps = 3
    val on = Array.fill(reps)(0.0); val off = Array.fill(reps)(0.0)
    var shufOn = -1; var shufOff = -1
    for (r <- 0 until reps) {
      val (tOn, sOn) = timeJoin(spj = true); on(r) = tOn; shufOn = sOn
      val (tOff, sOff) = timeJoin(spj = false); off(r) = tOff; shufOff = sOff
    }
    def f(d: Double) = f"$d%.3f"
    println(s"""{"probe":"spj","convs":$nConvs,"cores":$cores,""" +
      s""""spj_sec_best":${f(on.min)},"shuffled_sec_best":${f(off.min)},""" +
      s""""spj_shuffles":$shufOn,"shuffled_shuffles":$shufOff,""" +
      s""""speedup":${f(off.min / on.min)}}""")
  }
}
