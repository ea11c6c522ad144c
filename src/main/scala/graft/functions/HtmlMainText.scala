package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.kernel.{ExtractorContext, HtmlExtractor}
import graft.model.ExtractConfig

/** `html_main_text(string) -> string` — the HTML boilerplate-strip kernel as
  * a NATIVE codegen'd Catalyst expression (SURVEY §7.3's upgrade over the
  * registered-UDF face): tokenizer → block builder → keep/drop classifier,
  * kept blocks joined with "\n". Staying an `Expression` keeps the call
  * inside whole-stage codegen: no UDF serialization, no Row boxing, and the
  * projection around it stays fused (same pattern as [[TextFingerprint]] /
  * [[DotProductF]], where the HOF→Expression move measured ~20×).
  *
  * The kernel needs per-task mutable state (block builder buffers); a
  * ThreadLocal gives each executor task thread one reusable
  * [[ExtractorContext]] — the same no-per-row-allocation discipline as the
  * mapPartitions pipeline (reference analog: per-daemon model reuse,
  * `/root/reference/src/extras/weinman/interface/server_so.py:100-103`).
  *
  * Null semantics: NULL in → NULL out (standard SQL scalar-function
  * propagation via `UnaryExpression`). This intentionally differs from the
  * registered-UDF predecessor, which mapped null payloads to "" — callers
  * wanting that behavior wrap with `coalesce(html_main_text(x), '')`. The
  * flagship pipeline is unaffected: its F1 gate drops null text before the
  * kernel.
  */
case class HtmlMainText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    HtmlMainText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlMainText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlMainText =
    copy(child = newChild)

  override def prettyName: String = "html_main_text"
}

object HtmlMainText {

  private val localCtx: ThreadLocal[ExtractorContext] =
    ThreadLocal.withInitial(() => new ExtractorContext)

  /** Shared by interpreted eval and generated code. Uses the default
    * ExtractConfig (the SQL face is config-free; the pipeline face takes a
    * broadcast config). */
  def compute(u: UTF8String): UTF8String = {
    val (text, _, _, _) =
      HtmlExtractor.extract(u.toString, ExtractConfig.default, localCtx.get())
    UTF8String.fromString(text)
  }

  def register(spark: SparkSession): Unit =
    NativeFunctions.registerAll(spark) // one shared list — cannot drift

  def apply(c: Column)(implicit spark: SparkSession): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("html_main_text", c)
  }
}
