package graft

import org.scalatest.funsuite.AnyFunSuite

/** Probabilistic-sketch guarantees, checked as hard assertions on the
  * deterministic sf0.001 corpus (fixed data ⇒ the "with high probability"
  * bounds either hold or the implementation is wrong — a 3σ miss on a
  * 256-register HLL or a blown CountMin row bound would be evidence of a
  * hashing/accounting bug, not bad luck worth tolerating in CI).
  */
class SketchSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("CountMin: estimate never under-counts and stays within the eps*N row bound") {
    val rows = SparkEntry.queries("q_cms_heavyhitters")(spark, sf)
      .select("cms_est", "n_exact").collect()
    assert(rows.nonEmpty)
    val n = SparkEntry.queries("q_cms_heavyhitters")(spark, sf)
      .sparkSession.read.parquet(s"$sf/documents.parquet")
      .selectExpr("sum(size(split(trim(text), ' +')))").head().getLong(0)
    rows.foreach { r =>
      val (est, exact) = (r.getLong(0), r.getLong(1))
      assert(est >= exact, s"CountMin under-counted: $est < $exact")
      // single-row additive error is ≤ N/w in expectation; the min over
      // d=4 rows sits far inside 4·N/w on fixed data — use that as the
      // hard ceiling (w=256)
      assert(est - exact <= 4L * n / 256L, s"est=$est exact=$exact N=$n")
    }
  }

  test("HLL: per-lang estimate within 3 sigma (sigma = 1.04/sqrt(256)) of exact") {
    val rows = SparkEntry.queries("q_hll_distinct")(spark, sf)
      .select("hll_est", "n_exact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getDouble(0), r.getLong(1).toDouble)
      val relErr = math.abs(est - exact) / exact
      assert(relErr <= 3 * 1.04 / 16.0, s"est=$est exact=$exact relErr=$relErr")
    }
  }
}
