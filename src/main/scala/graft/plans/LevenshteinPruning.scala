package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: cheap length-difference pruning for levenshtein
  * thresholds.
  *
  * `levenshtein(a, b) < k` implies `abs(length(a) − length(b)) < k` (edit
  * distance is lower-bounded by the length difference — each edit changes
  * the length by at most 1). The rewrite conjoins that O(1) bound BEFORE the
  * O(|a|·|b|) dynamic program:
  *
  *   levenshtein(a,b) < k   ⇒   abs(len(a) − len(b)) < k  AND  levenshtein(a,b) ≤ k−1
  *
  * On similarity joins (J7 anti-join, J8 dictionary join) most candidate
  * pairs fail the length bound, so the quadratic-cost comparator is skipped
  * for them — the same cheap-predicate-first discipline the reference
  * hand-codes (`/root/reference/src/cmnd/main.py:57-60`) but applied BY THE
  * OPTIMIZER, not the query author.
  *
  * The rewritten comparison uses `<=` with k−1 (integer-equivalent) so the
  * pattern cannot rematch — the rule is idempotent across optimizer passes.
  *
  * Two ways to enable:
  *  - existing session: `spark.experimental.extraOptimizations ++= Seq(LevenshteinPruning)`
  *  - at build time: `.withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object LevenshteinPruning extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThan(lev: Levenshtein, Literal(k: Int, IntegerType)) if lev.threshold.isEmpty =>
      And(
        LessThan(Abs(Subtract(Length(lev.left), Length(lev.right))), Literal(k)),
        LessThanOrEqual(lev, Literal(k - 1)))
    case GreaterThan(Literal(k: Int, IntegerType), lev: Levenshtein) if lev.threshold.isEmpty =>
      And(
        LessThan(Abs(Subtract(Length(lev.left), Length(lev.right))), Literal(k)),
        LessThanOrEqual(lev, Literal(k - 1)))
  }

  /** Idempotent per-session registration on an already-built session. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(LevenshteinPruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LevenshteinPruning
}

/** `spark.sql.extensions` entry point: the engine's whole Catalyst surface
  * in one switch — the optimizer rule above plus every native expression
  * registered as a PERMANENT SQL function (`injectFunction` lands in the
  * session's FunctionRegistry at build time, so a pure-SQL user — a
  * notebook, a Thrift server, `spark-sql` with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` — gets
  * `html_main_text(...)` etc. without touching the Scala API; the
  * per-session `register()` helpers remain for sessions built without
  * extensions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => LevenshteinPruning)
    GraftExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
  }
}

object GraftExtensions {
  import graft.functions._

  /** Name → builder for every native expression the engine ships. Feeds
    * `injectFunction` (extension-built sessions) and [[registerAll]] (the
    * one-call ad-hoc path). The per-module `register()` helpers predate
    * this list and maintain their own entries — prefer registerAll/
    * extensions for full-surface registration. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "html_main_text" -> (es => HtmlMainText(es.head)),
    "text_fingerprint" -> (es => TextFingerprint(es.head)),
    "sorted_pairs" -> (es => SortedPairsL(es.head)),
    "shingles_f" -> (es => ShinglesF(es.head)),
    "minhash_sig" -> (es => MinHashSigF(es.head)),
    "simhash_sig" -> (es => SimHashSigF(es.head)),
    "bloom_maybe" -> (es => BloomMaybe(es(0), es(1))),
    "spans_slim" -> (es => SlimSpans(es.head)),
    "spans_fatten" -> (es => FattenSpans(es(0), es(1))),
    "sqdist_l" -> (es => SqDistL(es(0), es(1))),
    "dot_f" -> (es => DotProductF(es(0), es(1))),
    "plane_sig" -> (es => PlaneSigF(es.head)),
    "winnow_fp" -> (es => WinnowF(es.head)))

  /** Register the whole native surface on an already-built session (the
    * ad-hoc twin of the extensions path, driven by the SAME list). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
