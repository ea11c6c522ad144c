package graft

import graft.kernel.Validators
import org.scalatest.funsuite.AnyFunSuite

/** Unit fixtures for the field validators (FIXTURES.md §2): id/date/name
  * cases per the reference semantics, substitution-table exactness. */
class ValidatorsSpec extends AnyFunSuite {

  test("clean: exact substitution table + whitespace/comma collapse") {
    assert(Validators.clean("don—t  stop") == "don-t stop")
    assert(Validators.clean("a²,b×c") == "a2 b.c")
    assert(Validators.clean("  ¥ ï º » ") == "Y i o -")
    assert(Validators.clean("a b") == "a b") // nbsp
    assert(Validators.clean(",,;;") == "")
    assert(Validators.clean("") == "")
  }

  test("correctId: 9/12 digits after strip") {
    assert(Validators.correctId("No. 123 456 789").contains("123456789"))
    assert(Validators.correctId("id=123456789012!").contains("123456789012"))
    assert(Validators.correctId("12345678").isEmpty)
    assert(Validators.correctId("1234567890").isEmpty)
    assert(Validators.correctId("no digits").isEmpty)
  }

  test("correctDob: full date, bare year, rejects") {
    assert(Validators.correctDob("sinh 15/03/1987 tai").contains("15-03-1987"))
    assert(Validators.correctDob("31-12-2001").contains("31-12-2001"))
    assert(Validators.correctDob("born 1.1.1950").contains("1-1-1950"))
    assert(Validators.correctDob("year 1987 only").contains("1987"))
    // ". " two-char separator defeats the full-date pattern → bare year
    assert(Validators.correctDob("1. 2. 2009").contains("2009"))
    assert(Validators.correctDob("12/34/5678").isEmpty)
    assert(Validators.correctDob("nothing here").isEmpty)
  }

  test("correctName: dictionary correction with T→I retry and ratio gate") {
    val dict = Set("nguyen", "van", "minh", "thi", "hoang")
    // exact hits
    assert(Validators.correctName("NGUYEN VAN MINH", dict) == (1.0, "nguyen van minh"))
    // t→i retry: "mtnh" → "minh"? t→i gives "minh" — yes
    assert(Validators.correctName("mtnh", dict)._2 == "minh")
    // suggestion within ratio: "nguyn" (dist 1, len 5 → 0.2 < 0.34)
    assert(Validators.correctName("nguyn van", dict) == (1.0, "nguyen van"))
    // beyond ratio: "xyz" stays, breaks the run
    val (score, text) = Validators.correctName("nguyen xxyyzz van", dict)
    assert(text == "nguyen xxyyzz van")
    assert(score == 1.0 / 3.0)
    assert(Validators.correctName("", dict) == (0.0, ""))
  }

  test("stripAccents uses the diacritics dimension") {
    assert(Validators.stripAccents("Nguyễn Văn") == "Nguyen Van")
    assert(Validators.stripAccents("ạảấồễ") == "aaaoe")
    assert(Validators.stripAccents("đĐ") == "dD")
    assert(Validators.stripAccents("plain ascii") == "plain ascii")
  }
}
