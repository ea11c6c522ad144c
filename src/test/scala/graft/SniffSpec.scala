package graft

import graft.gen.TranscriptGen
import graft.kernel.{Extractor, HtmlExtractor, LayoutExtractor, PlainExtractor}
import graft.model.{ExtractConfig, Turn}
import org.scalatest.funsuite.AnyFunSuite

/** Scored dialect classification (F2): the sniffer emits a confidence the
  * pipeline gates on (reference classify score + `< 0.3` gate,
  * `idcardprocesser.py:133-137`). */
class SniffSpec extends AnyFunSuite {

  test("known tools classify with full confidence") {
    val g = TranscriptGen.genTurn(42L, 3, 1)
    val out = Extractor.extractTurn(g.turn, ExtractConfig.default)
    assert(out.classifyScore == 1.0)
  }

  test("sniff scores: html from tags, layout from int-led lines, plain fallback") {
    val (eh, sh) = Extractor.sniffScored("<p>one</p><p>two</p><p>three</p><p>four</p>")
    assert(eh == HtmlExtractor && sh == 1.0)
    val (eh2, sh2) = Extractor.sniffScored("before <b>bold</b> after")
    assert(eh2 == HtmlExtractor && sh2 == 0.5)

    val (el, sl) = Extractor.sniffScored("3 0 alpha beta\n5 20 gamma\nnot spans\n9 40 delta")
    assert(el == LayoutExtractor && sl == 0.75)

    val (ep, sp) = Extractor.sniffScored("just ordinary prose with no markup")
    assert(ep == PlainExtractor && sp == 0.4)

    val (_, sEmpty) = Extractor.sniffScored("   \n \t ")
    assert(sEmpty == 0.0)
  }

  test("pipeline F2 gate drops unconfident sniffed turns, keeps named tools") {
    // an unknown tool with a whitespace-ish payload scores 0.0 → gated; but
    // the length gate already removes empties, so use a kernel-level check
    val t = Turn("c", 0, "user", "   \n ", "mystery",
      new java.sql.Timestamp(TranscriptGen.BaseEpochMs))
    val out = Extractor.extractTurn(t, ExtractConfig.default)
    assert(out.classifyScore < ExtractConfig.default.minClassifyScore)
    // prose under an unknown tool survives the gate
    val t2 = t.copy(text = "perfectly ordinary prose content here")
    val out2 = Extractor.extractTurn(t2, ExtractConfig.default)
    assert(out2.classifyScore >= ExtractConfig.default.minClassifyScore)
    assert(out2.text.nonEmpty)
  }
}
