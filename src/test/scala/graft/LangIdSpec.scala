package graft

import graft.kernel.LangId
import org.scalatest.funsuite.AnyFunSuite

class LangIdSpec extends AnyFunSuite {

  private def lang(s: String): String = LangId.detect(s)._1

  test("identifies clear samples of each profiled language") {
    assert(lang("the quick brown fox jumps over the lazy dog and it is fine") == "en")
    assert(lang("der schnelle braune fuchs springt und das ist nicht schlecht") == "de")
    assert(lang("el zorro marron salta por encima de la cerca y es que los perros duermen") == "es")
    assert(lang("le renard brun saute par dessus la barriere et c'est pour les chiens") == "fr")
    assert(lang("il cane che dorme non morde e sono contento del risultato come sempre") == "it")
  }

  test("undetermined for empty / non-matching input") {
    assert(LangId.detect("") == ("und", 0))
    assert(LangId.detect("xyzzy qwrt 12345") == ("und", 0))
    assert(lang(null) == "und")
  }

  test("deterministic tie-break: first language code in ascending order wins") {
    // trigram 'ent' is in the en, es and fr profiles (score 1 each);
    // ascending-code tie-break → en
    assert(LangId.detect("ent") == ("en", 1))
  }

  test("case-insensitive") {
    assert(lang("THE QUICK BROWN FOX AND THE DOG IT IS") == "en")
  }
}
