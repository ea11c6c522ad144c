package graft

import graft.kernel._
import graft.model.ExtractConfig
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based kernel invariants (SURVEY §5.2): hold for ARBITRARY input,
  * not just the generator's corpus — the robustness the reference never had
  * (its gates only ever saw its own fixtures). Uses scalacheck generators
  * with fixed seeds (deterministic; no scalatestplus bridge in the offline
  * cache).
  */
class KernelPropertySpec extends AnyFunSuite {

  private val cfg = ExtractConfig.default

  private def forAllSeeded[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var checked = 0
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { a => f(a); checked += 1 }
    }
    assert(checked > n / 2, s"generator discarded too much: $checked/$n")
  }

  private def forAllSeeded2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 300)(f: (A, B) => Unit): Unit =
    forAllSeeded(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }

  private val anyText: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '\n', '\t'),
    1 -> Gen.oneOf('<', '>', '&', ';', '/', '"', '\'', '=', '-', '.', '!')
  )).map(_.mkString)

  test("tokenizer: no char loss on tag-free, entity-free input") {
    forAllSeeded(anyText.map(_.filterNot(c => c == '<' || c == '&'))) { s =>
      val sb = new StringBuilder
      HtmlTokenizer.tokenize(s, new HtmlTokenizer.Sink {
        def onText(c: Char, a: Int, b: Int): Unit = sb.append(c)
        def onTagOpen(n: String, sc: Boolean, p: Int): Unit = ()
        def onTagClose(n: String, p: Int): Unit = ()
      })
      assert(sb.toString == s)
    }
  }

  test("tokenizer: text offsets are in-bounds, ordered, non-overlapping") {
    forAllSeeded(anyText) { s =>
      var prevEnd = 0
      HtmlTokenizer.tokenize(s, new HtmlTokenizer.Sink {
        def onText(c: Char, a: Int, b: Int): Unit = {
          assert(a >= prevEnd && a < b && b <= s.length)
          prevEnd = b
        }
        def onTagOpen(n: String, sc: Boolean, p: Int): Unit = ()
        def onTagClose(n: String, p: Int): Unit = ()
      })
    }
  }

  test("block builder: spans in-bounds, sorted, non-overlapping, trimmed; never throws") {
    forAllSeeded(anyText) { s =>
      val blocks = BlockBuilder.build(s)
      var prevEnd = -1
      blocks.foreach { b =>
        assert(b.start >= prevEnd && b.start < b.end && b.end <= s.length)
        assert(b.text.nonEmpty)
        assert(!b.text.head.isWhitespace && !b.text.last.isWhitespace)
        assert(b.linkChars >= 0 && b.linkChars <= b.text.length)
        prevEnd = b.end
      }
    }
  }

  test("extraction is deterministic: same input → same output") {
    forAllSeeded(anyText) { s =>
      assert(HtmlExtractor.extract(s, cfg) == HtmlExtractor.extract(s, cfg))
    }
  }

  private val spanGen: Gen[(Int, Int, String)] = for {
    x <- Gen.choose(0, 200)
    band <- Gen.choose(0, 8)
    w <- Gen.choose(1, 3)
    words <- Gen.listOfN(w, Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))
  } yield (x, band * 20, words.mkString(" "))

  test("layout parse is input-order invariant (shuffle ≡ identity) — W1 determinism") {
    forAllSeeded2(Gen.listOf(spanGen), Gen.long, 200) { (spans, seed) =>
      val lines = spans.map { case (x, y, t) => s"$x $y $t" }
      val payload = lines.mkString("\n")
      val shuffled = new scala.util.Random(seed).shuffle(lines).mkString("\n")
      assert(LayoutParser.parse(payload, cfg) == LayoutParser.parse(shuffled, cfg))
    }
  }

  test("clean() is idempotent") {
    forAllSeeded(anyText) { s =>
      val once = Validators.clean(s)
      assert(Validators.clean(once) == once)
    }
  }

  test("levenshtein: metric properties on small strings") {
    val small = Gen.listOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    forAllSeeded2(small, small) { (a, b) =>
      val d = Validators.levenshtein(a, b)
      assert(d == Validators.levenshtein(b, a))
      assert((d == 0) == (a == b))
      assert(d <= math.max(a.length, b.length))
    }
  }

  test("correctId accepts exactly 9/12-digit payloads after cleanup") {
    forAllSeeded(anyText) { s =>
      val digits = s.filter(_.isDigit)
      val expectValid = digits.length == 9 || digits.length == 12
      assert(Validators.correctId(s).isDefined == expectValid)
    }
  }

  test("fingerprint: pure twin matches expression-side compute") {
    forAllSeeded(anyText) { s =>
      val viaUtf8 = graft.functions.TextFingerprint.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(viaUtf8 == graft.functions.TextFingerprint.compute(s))
      assert(viaUtf8 >= 0 && viaUtf8 < graft.functions.TextFingerprint.Mod)
    }
  }
}
