package graft

import graft.kernel.{FieldExtractor, TemplateStore}
import graft.kernel.FieldExtractor.FieldSpec
import org.scalatest.funsuite.AnyFunSuite

/** Template-as-data (reference `template.py:23-42` loads per-type schemas
  * from files): JSON templates parse into the exact FieldSpec dimension the
  * kernel consumes, and a second document type is a data change only.
  */
class TemplateStoreSpec extends AnyFunSuite {

  test("DefaultJson parses to the in-code DefaultTemplate (lockstep)") {
    val parsed = TemplateStore.parse(TemplateStore.DefaultJson)
    assert(parsed.keySet == Set("layout"))
    assert(parsed("layout") == FieldExtractor.DefaultTemplate)
  }

  private val receiptJson =
    """{
      |  "receipt": [
      |    {"name": "store",  "lineFrom": 0, "lineTo": 0, "kind": "text"},
      |    {"name": "date",   "lineFrom": 1, "lineTo": 1, "kind": "date"},
      |    {"name": "total",  "lineFrom": 2, "lineTo": 2, "kind": "text",
      |     "charset": "0123456789."}
      |  ],
      |  "layout": [
      |    {"name": "title", "lineFrom": 0, "lineTo": 1, "kind": "text"}
      |  ]
      |}""".stripMargin

  test("second template fixture: per-tool schemas, per-field alphabets") {
    val t = TemplateStore.parse(receiptJson)
    assert(t.keySet == Set("receipt", "layout"))
    val receipt = t("receipt")
    assert(receipt == Seq(
      FieldSpec("store", 0, 0, "text"),
      FieldSpec("date", 1, 1, "date"),
      FieldSpec("total", 2, 2, "text", Some("0123456789."))))

    // drive the kernel with the loaded template: charset projects the total
    // down to its digits, the date validator canonicalizes
    val f = FieldExtractor.extract(
      Vector("MEGAMART DOWNTOWN 24H", "paid 03/02/1999 thanks", "TOTAL 129.95 USD"),
      receipt)
    assert(f("store") == "MEGAMART DOWNTOWN 24H")
    assert(f("date") == "03-02-1999" || f("date") == "3-2-1999", f("date"))
    assert(f("total") == "129.95")
  }

  test("charset projection drops a field that empties out") {
    val tpl = Seq(FieldSpec("digits", 0, 0, "text", Some("0123456789")),
      FieldSpec("keep", 1, 1, "text"))
    val f = FieldExtractor.extract(Vector("no numerals here", "regular text stays"), tpl)
    assert(!f.contains("digits"))
    assert(f("keep") == "regular text stays")
  }

  test("malformed templates fail fast at parse time") {
    assertThrows[IllegalArgumentException](TemplateStore.parse("[1,2]"))
    assertThrows[IllegalArgumentException](
      TemplateStore.parse("""{"t":[{"name":"x","lineFrom":0,"lineTo":0,"kind":"nope"}]}"""))
    assertThrows[IllegalArgumentException](
      TemplateStore.parse("""{"t":[{"name":"x","lineFrom":3,"lineTo":1,"kind":"text"}]}"""))
    assertThrows[IllegalArgumentException](
      TemplateStore.parse("""{"t":[{"lineFrom":0,"lineTo":0,"kind":"text"}]}"""))
  }
}
