package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `dot_f(array<float>, array<float>) -> double` — native codegen'd dot
  * product: float→double cast then STRICTLY SEQUENTIAL accumulation, exactly
  * the fold the DuckDB oracle mirrors (bit-identical doubles). A Catalyst
  * `Expression` instead of `aggregate(zip_with(...))` because higher-order
  * functions drop out of whole-stage codegen and allocate per row — on an
  * O(n²) similarity join the HOF path was ~20× slower in the sf0.1 bench.
  */
case class DotProductF(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductF.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProductF.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductF =
    copy(left = l, right = r)

  override def prettyName: String = "dot_f"
}

object DotProductF {
  /** Sequential double fold over float elements; shared by interpreted eval
    * and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** `plane_sig(array<float>) -> long` — 32-bit random-hyperplane signature
  * (SimHash for vectors, Charikar STOC 2002): bit j = sign of ⟨v, h_j⟩ where
  * hyperplane h_j's i-th component is the integer-derived pseudo-random
  * value ((a_j·i + b_j) mod P)/P − 0.5 (the same universal-hash family as
  * the MinHash stage, so the DuckDB oracle reproduces the planes from j and
  * i alone — no stored random state). The fold is strictly sequential; all
  * inputs to it are exact, so the signature is bit-identical across engines.
  */
case class PlaneSigF(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any): Any =
    PlaneSigF.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PlaneSigF.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): PlaneSigF =
    copy(child = newChild)

  override def prettyName: String = "plane_sig"
}

object PlaneSigF {
  final val Bits = 32
  final val P: Long = TextFunctions.HashP

  def compute(v: ArrayData): Long = {
    val n = v.numElements()
    var sig = 0L
    var j = 0
    while (j < Bits) {
      val aj = TextFunctions.hashA(j)
      val bj = TextFunctions.hashB(j)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val h = ((aj * (i + 1) + bj) % P).toDouble / P - 0.5
        acc += v.getFloat(i).toDouble * h
        i += 1
      }
      if (acc >= 0) sig |= 1L << j
      j += 1
    }
    sig
  }
}

/** `sqdist_l(array<long>, array<long>) -> long` — exact squared Euclidean
  * distance between scaled-integer vectors (the k-means training metric):
  * native and codegen'd for the same reason as [[DotProductF]] — a
  * `aggregate(zip_with(...))` HOF evaluates its lambda interpreted per
  * element (measured: the dominant cost of each Lloyd's iteration). Integer
  * arithmetic throughout: bit-identical across engines by construction. */
case class SqDistL(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    SqDistL.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SqDistL.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistL =
    copy(left = l, right = r)

  override def prettyName: String = "sqdist_l"
}

object SqDistL {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

object VectorFunctions {
  def register(spark: SparkSession): Unit =
    NativeFunctions.registerAll(spark) // one shared list — cannot drift

  def dotF(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dot_f", a, b)

  def l2NormF(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotF(a, a))

  def planeSig(a: Column): Column =
    org.apache.spark.sql.functions.call_function("plane_sig", a)

  def sqDistL(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("sqdist_l", a, b)
}
