package graft

import graft.kernel.FieldExtractor
import graft.kernel.FieldExtractor.FieldSpec
import org.scalatest.funsuite.AnyFunSuite

class FieldExtractorSpec extends AnyFunSuite {

  private val lines = Vector(
    "NATIONAL ID CARD",
    "No. 123 456 789",
    "NGUYEN VAN",
    "NGUYEN VAN A", // near-dup of previous line within the fullName field? distance 2 → dropped
    "born 15/03/1987 in",
    "123 Main Street",
    "District 7",
    "HCMC"
  )

  test("default template extracts validated fields from ordered lines") {
    val f = FieldExtractor.extract(lines)
    assert(f("title") == "NATIONAL ID CARD")
    assert(f("idNumber") == "123456789") // digits-only, 9 digits → valid
    assert(f("fullName") == "NGUYEN VAN") // second line dropped as near-dup
    assert(f("dateOfBirth") == "15-03-1987")
    assert(f("address") == "123 Main Street District 7 HCMC")
  }

  test("invalid id/date fields are absent, not wrong") {
    val bad = lines.updated(1, "No. 12 34").updated(4, "born sometime")
    val f = FieldExtractor.extract(bad)
    assert(!f.contains("idNumber")) // 4 digits: not 9/12
    assert(!f.contains("dateOfBirth"))
    assert(f.contains("fullName"))
  }

  test("near-dup suppression only fires within threshold") {
    val tpl = Seq(FieldSpec("x", 0, 1, "text"))
    assert(FieldExtractor.extract(Vector("alpha beta", "alpha betb"), tpl) ==
      Map("x" -> "alpha beta"))
    assert(FieldExtractor.extract(Vector("alpha beta", "gamma delta epsilon"), tpl) ==
      Map("x" -> "alpha beta gamma delta epsilon"))
  }

  test("total-char gate drops noise-only results") {
    val f = FieldExtractor.extract(Vector("ab", "1", "x"),
      Seq(FieldSpec("a", 0, 0, "text"), FieldSpec("b", 2, 2, "text")))
    assert(f.isEmpty) // "ab" + "x" = 3 chars ≤ 5
  }

  test("missing lines yield absent fields; empty input yields empty map") {
    assert(FieldExtractor.extract(Vector.empty) == Map.empty)
    val f = FieldExtractor.extract(Vector("SOME DOCUMENT TITLE"))
    assert(f == Map("title" -> "SOME DOCUMENT TITLE"))
  }
}
