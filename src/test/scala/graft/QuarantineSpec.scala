package graft

import graft.gen.TranscriptGen
import graft.kernel.{Extractor, ExtractorContext}
import graft.model.{ExtractConfig, ExtractedTurn, Turn}
import graft.pipe.ExtractPipeline
import org.apache.spark.SparkException
import org.scalatest.funsuite.AnyFunSuite

/** Poison-row quarantine (ExtractConfig.failFast): at 10^12-turn scale one
  * pathological payload must not kill a multi-hour job, so a kernel
  * exception quarantines the turn (dropped by the F2 gate, alarmed via
  * Metrics.turnsFailed) instead of failing the task. The shipped kernels
  * are total functions — no input makes them throw — so these tests inject
  * a throwing kernel through the seam ExtractPipeline.extract exposes. */
class QuarantineSpec extends AnyFunSuite with SparkTestBase {

  /** Delegates to the real kernel except for one marked conversation. */
  private val poisoned: (Turn, ExtractConfig, ExtractorContext) => ExtractedTurn =
    (t, c, ctx) =>
      if (t.conv_id == "poison") throw new IllegalStateException("kernel bug")
      else Extractor.extractTurn(t, c, ctx)

  private def corpusWithPoison(): org.apache.spark.sql.Dataset[Turn] = {
    import testImplicits._
    val clean = TranscriptGen.dataset(spark, 44L, nConvs = 10, hotBase = 20)
    val bad = Seq(
      Turn("poison", 0, "user", "any payload", "plain", new java.sql.Timestamp(1000L)),
      Turn("poison", 1, "user", "another payload", "plain", new java.sql.Timestamp(2000L))).toDS()
    clean.unionByName(bad)
  }

  test("default: poisoned rows are quarantined, counted, and dropped; " +
    "clean rows are untouched") {
    val acc = ExtractPipeline.newMetrics(spark)
    val goldens = TranscriptGen.corpus(44L, nConvs = 10, hotBase = 20).toVector
    val out = ExtractPipeline.orderRestore(ExtractPipeline.extract(
      spark, corpusWithPoison(), metrics = Some(acc), kernel = poisoned))
      .collect()
    assert(!out.exists(_.conv_id == "poison"), "quarantined rows must not reach the sink")
    assert(out.length == goldens.size, "every clean turn survives")
    assert(acc.turnsFailed.value == 2L)
    assert(acc.turnsGated.value == 0L, "quarantined rows are not double-counted as gated")
    assert(acc.turnsOut.value == goldens.size.toLong)
    // clean rows' texts are byte-identical to the spec goldens
    val byKey = out.map(e => (e.conv_id, e.turn_idx) -> e.text).toMap
    goldens.foreach(g => assert(byKey((g.turn.conv_id, g.turn.turn_idx)) == g.expText))
  }

  test("failFast=true: the kernel exception propagates and fails the job") {
    val ex = intercept[SparkException] {
      ExtractPipeline.extract(spark, corpusWithPoison(),
        cfg = ExtractConfig.default.copy(failFast = true), kernel = poisoned)
        .collect()
    }
    assert(ex.getMessage.contains("kernel bug") ||
      Option(ex.getCause).exists(_.getMessage.contains("kernel bug")))
  }
}
