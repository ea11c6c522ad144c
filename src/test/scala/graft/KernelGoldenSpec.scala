package graft

import graft.gen.TranscriptGen
import graft.kernel.Extractor
import graft.model.ExtractConfig
import org.scalatest.funsuite.AnyFunSuite

/** The primary golden suite (FIXTURES.md §3, north-rule invariant): the
  * extraction kernels must reproduce, per turn, the spec-derived expected
  * text, span offsets, and keep/drop metrics of the deterministic corpus —
  * exact equality, every turn, across all three dialects. No SparkSession:
  * kernels are pure (this is what makes the goldens an oracle rather than a
  * snapshot).
  */
class KernelGoldenSpec extends AnyFunSuite {

  private val cfg = ExtractConfig.default

  test("per-turn text + span + metric equality on the seed-42 corpus (100 convs)") {
    var turns = 0
    var byTool = Map.empty[String, Int].withDefaultValue(0)
    TranscriptGen.corpus(seed = 42L, nConvs = 100, hotBase = 400).foreach { g =>
      val out = Extractor.extractTurn(g.turn, cfg)
      val id = s"${g.turn.conv_id}/${g.turn.turn_idx} (${g.turn.tool})"
      assert(out.text == g.expText, s"text mismatch at $id\npayload:\n${g.turn.text}")
      assert(out.spans == g.expSpans, s"spans mismatch at $id\npayload:\n${g.turn.text}")
      assert(out.blocksKept == g.expKept, s"kept mismatch at $id")
      assert(out.blocksDropped == g.expDropped, s"dropped mismatch at $id")
      assert(out.charsEmitted == g.expText.length, s"charsEmitted mismatch at $id")
      turns += 1
      byTool = byTool.updated(g.turn.tool, byTool(g.turn.tool) + 1)
    }
    // corpus actually exercises all three dialects and is non-trivial
    assert(turns > 1000, s"corpus too small: $turns")
    assert(byTool("html") > 50 && byTool("layout") > 30 && byTool("plain") > 20, byTool.toString)
  }

  test("generation is deterministic and order-independent (pure function of ids)") {
    val a = TranscriptGen.genTurn(42L, 7, 3)
    val b = TranscriptGen.genTurn(42L, 7, 3)
    assert(a == b)
    val c = TranscriptGen.genTurn(43L, 7, 3)
    assert(a.turn.text != c.turn.text) // seed actually matters
  }

  test("span offsets are in-bounds, sorted, and non-overlapping (html dialect)") {
    TranscriptGen.corpus(42L, 50, 32)
      .filter(_.turn.tool == "html").foreach { g =>
        val out = Extractor.extractTurn(g.turn, cfg)
        var prevEnd = -1
        out.spans.foreach { s =>
          assert(s.start >= 0 && s.end <= g.turn.text.length && s.start < s.end)
          assert(s.start >= prevEnd, s"overlap in ${g.turn.conv_id}/${g.turn.turn_idx}")
          prevEnd = s.end
        }
        // the span's source slice must contain its first and last clean chars
        out.spans.foreach { s =>
          val slice = g.turn.text.substring(s.start, s.end)
          assert(slice.nonEmpty && !Character.isWhitespace(slice.head)
            && !Character.isWhitespace(slice.last))
        }
      }
  }
}
