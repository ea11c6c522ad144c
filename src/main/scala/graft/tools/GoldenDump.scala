package graft.tools

import graft.gen.TranscriptGen
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Writes the golden-parquet oracle fixtures for the extraction queries
  * (see [[graft.SparkEntry.GoldenDir]]). Each fixture is a pure function of
  * the SPEC-derived generator goldens ([[TranscriptGen.GoldenTurn]]: expected
  * text/spans authored while assembling the payload, never by running the
  * kernels), so the driver's DuckDB hash compare against them IS the north
  * rule's per-turn text-equality check. Deterministic: same bytes every run
  * (single sorted parquet file, no timestamps) — committed to git and
  * re-derived on every `sbt test` by GoldenParquetSpec.
  *
  * Run: `sbt "runMain graft.tools.GoldenDump [outDir]"`.
  */
object GoldenDump {

  /** (query name, golden rows builder) — shared with GoldenParquetSpec so the
    * spec asserts the exact artifact this tool writes. */
  def goldenFrames(spark: SparkSession): Seq[(String, DataFrame)] = {
    import spark.implicits._

    // x_extract_flagship: corpus(42, 80, 200); all generator turns name their
    // dialect in `tool` → classifyScore 1.0, and no gate drops anything
    // (payloads are non-empty and far under maxTextLen) — asserted e2e by
    // PipelineE2ESpec ("row count" + per-turn equality).
    val flagship = TranscriptGen.corpus(42L, 80, 200).map { g =>
      (g.turn.conv_id, g.turn.turn_idx, g.turn.role, g.turn.tool,
        g.expText, g.expKept, g.expDropped, g.expText.length, 1.0)
    }.toSeq.toDF("conv_id", "turn_idx", "role", "tool", "text",
      "blocksKept", "blocksDropped", "charsEmitted", "classifyScore")

    // x_extract_spans: corpus(42, 40, 100), one row per expected span.
    val spans = TranscriptGen.corpus(42L, 40, 100).flatMap { g =>
      g.expSpans.map(sp => (g.turn.conv_id, g.turn.turn_idx,
        sp.blockIdx, sp.start, sp.end, sp.kind, sp.text))
    }.toSeq.toDF("conv_id", "turn_idx", "blockIdx", "start", "end", "kind", "text")

    // x_sql_extract: corpus(42, 30, 60), html turns only (the query's WHERE
    // filters empty payloads; generator html payloads are never empty).
    // html_main_text(payload) == kernel text == expText (the native
    // expression is pinned kernel-identical by NativeExprEquivalenceSpec).
    val sqlExtract = TranscriptGen.corpus(42L, 30, 60)
      .filter(g => g.turn.tool == "html" && g.turn.text.nonEmpty)
      .map(g => (g.turn.conv_id, g.turn.turn_idx, g.expText))
      .toSeq.toDF("conv_id", "turn_idx", "text")

    // x_extract_fields: corpus(42, 40, 100), layout turns; fields extracted
    // from the GOLDEN text (not pipeline output) with the same broadcast
    // template — so the oracle still independently checks the pipeline's
    // text path end-to-end.
    val templates = graft.kernel.TemplateStore.parse(graft.kernel.TemplateStore.DefaultJson)
    val fields = TranscriptGen.corpus(42L, 40, 100)
      .filter(_.turn.tool == "layout")
      .flatMap { g =>
        templates.get(g.turn.tool).toSeq.flatMap { tpl =>
          graft.kernel.FieldExtractor.extract(g.expText.split("\n").toIndexedSeq, tpl)
            .toSeq.sortBy(_._1)
            .map { case (f, v) => (g.turn.conv_id, g.turn.turn_idx, f, v) }
        }
      }.toSeq.toDF("conv_id", "turn_idx", "field", "value")

    Seq(
      "x_extract_flagship" -> flagship,
      "x_extract_spans" -> spans,
      "x_sql_extract" -> sqlExtract,
      "x_extract_fields" -> fields)
  }

  /** Write `df` as exactly ONE parquet file at `target` (a file path, not a
    * directory): single-partition write to a temp dir, then move the part
    * file. Stable bytes for git. */
  def writeSingleFile(df: DataFrame, target: String): Unit = {
    val tmp = Files.createTempDirectory("graft_golden").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/out")
    val part = Files.list(Paths.get(s"$tmp/out")).iterator()
    var src: java.nio.file.Path = null
    while (part.hasNext) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) src = p
    }
    require(src != null, s"no parquet part written for $target")
    Files.createDirectories(Paths.get(target).getParent)
    Files.move(src, Paths.get(target), StandardCopyOption.REPLACE_EXISTING)
    // clean the temp dir
    val w = Files.walk(Paths.get(tmp))
    try {
      import scala.jdk.CollectionConverters._
      w.iterator.asScala.toSeq.reverseIterator.foreach(Files.deleteIfExists(_))
    } finally w.close()
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("src/test/resources/golden")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-golden-dump")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    goldenFrames(spark).foreach { case (name, df) =>
      writeSingleFile(df, s"$outDir/$name.parquet")
      println(s"[golden] wrote $outDir/$name.parquet")
    }
    spark.stop()
  }
}
