package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every driver-contract query must at least plan + execute on the smallest
  * scale factor (the driver's rows-only check is stricter for `x_` queries;
  * the DuckDB oracle is the real gate for the rest — this spec catches
  * wiring breakage early and locally). */
class SparkEntrySmokeSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys ⊆ query keys and column sets stay aligned") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes on sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0)
      // queries that should always produce rows at any SF
      if (!Set("q_dedup_embed_cosine", "q_dedup_jaccard", "q_dedup_minhash_pairs").contains(name))
        assert(n > 0, s"$name returned 0 rows")
    }
  }
}
