package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `text_fingerprint(string) -> long` — a native Catalyst expression (with
  * codegen) computing a rolling polynomial document fingerprint:
  *
  *   h = fold over Unicode code points: h ← (h·31 + cp) mod 1_000_000_007
  *
  * This is the document-fingerprinting primitive used by the dedup operators
  * (minhash seeds, exact-dup keys). Implemented as an `Expression` rather
  * than a Scala UDF so it stays inside whole-stage codegen (no
  * serialization, no boxing) — the kernel-side twin lives in
  * [[TextFingerprint.compute]] and both paths share it.
  *
  * Reference ancestry: the per-line hash-like scoring loops of the OCR
  * prototype (`/root/reference/src/algorithm/looptess.py:56-76` best-of-k
  * scoring) — here generalized to a deterministic content fingerprint.
  */
case class TextFingerprint(child: Expression) extends UnaryExpression {

  // input is expected to be StringType (call sites are ours); output long
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TextFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextFingerprint =
    copy(child = newChild)

  override def prettyName: String = "text_fingerprint"
}

object TextFingerprint {
  final val Mod: Long = 1000000007L

  /** Shared by interpreted eval, codegen, and pure kernels. */
  def compute(u: UTF8String): Long = compute(u.toString)

  def compute(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Register for SQL + Column use; returns a Column builder. */
  def register(spark: SparkSession): Unit =
    NativeFunctions.registerAll(spark) // one shared list — cannot drift

  def apply(c: Column)(implicit spark: SparkSession): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("text_fingerprint", c)
  }
}
