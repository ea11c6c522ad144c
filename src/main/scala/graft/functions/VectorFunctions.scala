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

object VectorFunctions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f", exprs => DotProductF(exprs(0), exprs(1)), "built-in")

  def dotF(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dot_f", a, b)

  def l2NormF(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotF(a, a))
}
