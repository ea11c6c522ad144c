package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The portability core of q_bpe_train / q_bpe_apply: greedy leftmost BPE
  * merge application expressed as a literal non-overlapping string replace
  * over DOUBLE-space-delimited symbol sequences. Both engines' `replace`
  * (Spark's UTF8String.replace, DuckDB's replace, and java.lang.String
  * .replace used here) scan left-to-right replacing non-overlapping
  * occurrences — this suite pins that representation trick against a
  * reference fold implementation of Sennrich et al.'s merge step for
  * arbitrary token sequences, including the adversarial shapes (l == r
  * runs, adjacent matches sharing a boundary, merged-token collisions).
  */
class BpeSpec extends AnyFunSuite {

  /** Reference greedy leftmost merge (the Sennrich merge step). */
  private def refMerge(toks: List[String], l: String, r: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** The engines' form: double-space representation + literal replace. */
  private def replaceMerge(toks: List[String], l: String, r: String): List[String] = {
    val seq = toks.map("  " + _).mkString + "  "
    val merged = seq.replace(s" $l  $r ", s" $l$r ")
    merged.split("  ", -1).filter(_.nonEmpty).toList
  }

  private def forAllSeeded[A](gen: Gen[A], n: Int = 500)(f: A => Unit): Unit = {
    var checked = 0
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { a => f(a); checked += 1 }
    }
    assert(checked > n / 2, s"generator discarded too much: $checked/$n")
  }

  // tiny alphabet → dense collisions: runs of equal symbols, adjacent
  // matches, merged tokens re-appearing as singles
  private val symGen = Gen.oneOf("a", "b", "ab", "ba")
  private val toksGen = Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, symGen))
  private val caseGen = for {
    toks <- toksGen
    l <- symGen
    r <- symGen
  } yield (toks, l, r)

  test("double-space replace == reference greedy merge for arbitrary " +
    "sequences and pairs (incl. l == r and boundary-sharing matches)") {
    forAllSeeded(caseGen) { case (toks, l, r) =>
      assert(replaceMerge(toks, l, r) == refMerge(toks, l, r),
        s"toks=$toks l=$l r=$r")
    }
  }

  test("worked adversarial shapes") {
    // overlap consumed: l l l → (ll) l
    assert(replaceMerge(List("l", "l", "l"), "l", "l") == List("ll", "l"))
    // boundary-sharing adjacent matches both merge: a b a b → (ab) (ab)
    assert(replaceMerge(List("a", "b", "a", "b"), "a", "b") == List("ab", "ab"))
    // a merged token never re-merges within the same round: a b b → (ab) b
    assert(replaceMerge(List("a", "b", "b"), "a", "b") == List("ab", "b"))
    // even-length same-symbol run pairs up completely
    assert(replaceMerge(List("a", "a", "a", "a"), "a", "a") == List("aa", "aa"))
  }

  test("chained rounds preserve total character content") {
    forAllSeeded(caseGen) { case (toks, l, r) =>
      val once = replaceMerge(toks, l, r)
      assert(once.mkString == toks.mkString)
    }
  }
}
