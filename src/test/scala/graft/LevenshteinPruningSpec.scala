package graft

import graft.plans.LevenshteinPruning
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule must (1) actually fire — the length bound appears in
  * the optimized plan in front of the levenshtein — and (2) never change
  * results. */
class LevenshteinPruningSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("rule injects the length-difference bound into the plan") {
    LevenshteinPruning.install(spark)
    val names = spark.read.parquet(s"$sf/part.parquet").select(col("p_name")).distinct()
    val joined = names.as("a").join(names.as("b"),
      levenshtein(col("a.p_name"), col("b.p_name")) < 3 && col("b.p_name") < col("a.p_name"),
      "left_anti")
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs((length("), optimized)
    assert(optimized.contains("levenshtein"), optimized)
    // rewritten comparison is <= k-1 (idempotence marker)
    assert(optimized.contains("<= 2"), optimized)
  }

  test("rule is results-preserving and idempotent") {
    val names = spark.read.parquet(s"$sf/part.parquet").select(col("p_name")).distinct()
    def survivors(): Set[String] = {
      names.as("a").join(names.as("b"),
        levenshtein(col("a.p_name"), col("b.p_name")) < 3 && col("b.p_name") < col("a.p_name"),
        "left_anti").collect().map(_.getString(0)).toSet
    }
    // without the rule
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == LevenshteinPruning)
    val before = survivors()
    // with the rule (installed twice → registered once)
    LevenshteinPruning.install(spark)
    LevenshteinPruning.install(spark)
    assert(spark.experimental.extraOptimizations.count(_ == LevenshteinPruning) == 1)
    val after = survivors()
    assert(after == before && before.nonEmpty)
  }

  test("unrelated comparisons are untouched") {
    LevenshteinPruning.install(spark)
    val df = spark.read.parquet(s"$sf/part.parquet")
      .filter(levenshtein(col("p_name"), col("p_type")) > 3) // '>' with lev on the LEFT: not our pattern
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("abs((length("), plan)
  }
}
