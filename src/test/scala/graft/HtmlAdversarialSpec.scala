package graft

import graft.kernel.{BlockBuilder, HtmlExtractor}
import graft.model.ExtractConfig
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed adversarial HTML fixtures (FIXTURES.md §1.1 "adversarial
  * cases") — expectations derived from the tokenizer/builder/classifier SPEC
  * by hand, independent of both the generator and the kernels. The port of
  * the reference's labeled tricky fixtures (`/root/reference/temp/0`). */
class HtmlAdversarialSpec extends AnyFunSuite {

  private val cfg = ExtractConfig.default
  private def text(html: String): String = HtmlExtractor.extract(html, cfg)._1
  private def spans(html: String) = HtmlExtractor.extract(html, cfg)._2

  test("quoted '>' inside attributes does not close the tag") {
    assert(text("""<p title="a>b">fifteen chars of body text</p>""")
      == "fifteen chars of body text")
    assert(text("""<p title='x>y'>single quoted attr body here</p>""")
      == "single quoted attr body here")
  }

  test("script/style islands are dropped entirely, including fake tags inside") {
    assert(text("<p>keep this paragraph text</p><script>var p = '<p>no</p>';</script>")
      == "keep this paragraph text")
    assert(text("<style>p:before { content: '<p>'; }</style><p>the only real content here</p>")
      == "the only real content here")
    // case-insensitive close
    assert(text("<SCRIPT>x<1</SCRIPT><p>content after script block</p>")
      == "content after script block")
  }

  test("comments are dropped; unterminated comment eats the rest") {
    assert(text("<p>before comment text here</p><!-- <p>ghost</p> --><p>after comment text here</p>")
      == "before comment text here\nafter comment text here")
    assert(text("<p>only this block survives</p><!-- unterminated <p>ghost</p>")
      == "only this block survives")
  }

  test("entities decode exactly; malformed entities stay literal") {
    assert(text("<p>fish &amp; chips &lt;tag&gt; &#65;&#x42; &nbsp;end</p>")
      == "fish & chips <tag> AB end")
    // nbsp collapses as whitespace
    assert(text("<p>a&nbsp;&nbsp;b and then some padding</p>") == "a b and then some padding")
    assert(text("<p>broken &amp entity &unknown; &#xZZ; stays put</p>")
      == "broken &amp entity &unknown; &#xZZ; stays put")
  }

  test("misnested and unclosed tags are tolerated") {
    assert(text("<div><p>inner paragraph body text</div></p>")
      == "inner paragraph body text")
    assert(text("<p>unclosed paragraph keeps flowing text")
      == "unclosed paragraph keeps flowing text")
    assert(text("<p><b>bold never closes but text flows</p>")
      == "bold never closes but text flows")
  }

  test("literal '<' that is not a tag is text") {
    assert(text("<p>maths says 1 < 2 and 3 <= 4 here</p>")
      == "maths says 1 < 2 and 3 <= 4 here")
  }

  test("boilerplate kinds drop even with long content") {
    assert(text("<nav>this navigation text is long enough to pass the length gate</nav>" +
      "<p>real content paragraph here</p>") == "real content paragraph here")
    assert(text("<footer>copyright two thousand twenty six all rights reserved</footer>")
      == "")
  }

  test("link-density rule: mostly-anchor blocks drop, lightly-linked keep") {
    assert(text("""<p><a href="#">all of this text is a link</a></p>""") == "")
    val kept = """<p>mostly plain words with one <a href="#">tiny</a> link in the middle</p>"""
    assert(text(kept) == "mostly plain words with one tiny link in the middle")
  }

  test("separator blocks drop regardless of length") {
    assert(text("<p>--------------------------------</p>") == "")
    assert(text("<p>. . . . . . . . . . . . . . . . .</p>") == "")
    assert(text("<p>=-=-=-=-=-=-=-=-=-=-=-=-=-=-=</p>") == "")
  }

  test("span offsets point at the exact source content extent") {
    val html = """<div>  leading ws then the actual content  </div>"""
    val s = spans(html)
    assert(s.length == 1)
    assert(html.substring(s.head.start, s.head.end) == "leading ws then the actual content")
    // entity at the edge: span end covers the entity source
    val html2 = "<p>the last char is an entity &#65;</p>"
    val s2 = spans(html2)
    assert(html2.substring(s2.head.start, s2.head.end) == "the last char is an entity &#65;")
  }

  test("CRLF and tabs collapse like spaces") {
    assert(text("<p>line one\r\n\t\tline two\r\nline three of the block</p>")
      == "line one line two line three of the block")
  }

  test("self-closing block tags segment but do not nest") {
    assert(text("<p>first part of the text<br/>second part after the break</p>")
      == "first part of the text\nsecond part after the break")
    // <hr> between blocks contributes nothing
    assert(text("<p>block number one is here</p><hr><p>block number two is here</p>")
      == "block number one is here\nblock number two is here")
  }

  test("kind = innermost block tag at first content char") {
    val blocks = BlockBuilder.build("<section><h2>heading text goes right here</h2>" +
      "<p>paragraph body text right here</p>stray section tail text here</section>")
    assert(blocks.map(_.kind) == Vector("h2", "p", "section"))
  }

  test("astral-plane numeric entities decode to surrogate pairs") {
    // 😀 = U+1F600; both decimal and hex forms, spans cover the whole entity
    assert(text("<p>smile &#128512; here and hex &#x1F600; too</p>")
      == "smile 😀 here and hex 😀 too")
    val html = "<p>tail entity is astral &#128512;</p>"
    val s = spans(html)
    assert(html.substring(s.head.start, s.head.end) == "tail entity is astral &#128512;")
    // out-of-range stays literal
    assert(text("<p>bad code point &#1114112; stays literal text</p>")
      == "bad code point &#1114112; stays literal text")
  }

  test("deeply nested / pathological input does not throw") {
    val deep = "<div>" * 5000 + "payload text in the middle" + "</div>" * 5000
    assert(text(deep) == "payload text in the middle")
    val manyAmps = "<p>" + ("&" * 2000) + " trailing words to pass gate</p>"
    assert(text(manyAmps).endsWith("trailing words to pass gate"))
    val unterminated = "<p attr=\"never closes"
    assert(text(unterminated) == "")
  }
}
