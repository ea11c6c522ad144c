package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shuffle-byte reduction for the flagship's one exchange (the
  * order-restoring repartition on conv_id).
  *
  * Kernel invariant (every dialect — `kernel/Extractor.scala`): an extracted
  * turn's `text` is exactly its span texts joined with `"\n"`. So shipping
  * both `text` AND each `span.text` through the exchange moves the payload
  * TWICE. These two codegen'd expressions strip the redundancy on the map
  * side and restore it losslessly on the reduce side:
  *
  *  - `spans_slim(spans)`  → spans with `text` replaced by its UTF-8 BYTE
  *    length (byte-based so multi-byte and astral characters round-trip
  *    exactly — UTF8String slicing below is byte-offset-based);
  *  - `spans_fatten(text, slim)` → the original span array, each text
  *    sliced back out of the joined `text` (separators are single `\n`
  *    bytes, so offsets are the running sum of lengths + index).
  *
  * Both are native expressions (static compute + defineCodeGen) so the map
  * and reduce projections stay inside whole-stage codegen — the same
  * HOF→Expression discipline as [[ShinglesF]]/[[DotProductF]] (interpreted
  * `transform()` lambdas cost ~µs/span; at 10^12 turns that is days of CPU).
  *
  * At 100 TB this halves the bytes the exchange serializes, sorts, and
  * fetches — the flagship's measured ceiling is memory bandwidth through
  * the shuffle/sort path, not kernel CPU (BENCH/BASELINE.md).
  */
object SpanShuffle {

  private val SpanStruct = StructType(Seq(
    StructField("blockIdx", IntegerType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false),
    StructField("kind", StringType, nullable = true),
    StructField("text", StringType, nullable = true)))

  private val SlimStruct = StructType(Seq(
    StructField("blockIdx", IntegerType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false),
    StructField("kind", StringType, nullable = true),
    StructField("tlen", IntegerType, nullable = false)))

  val SlimType: DataType = ArrayType(SlimStruct, containsNull = false)
  val FatType: DataType = ArrayType(SpanStruct, containsNull = false)

  def computeSlim(spans: ArrayData): ArrayData = {
    val n = spans.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val s = spans.getStruct(i, 5)
      val text = s.getUTF8String(4)
      out(i) = InternalRow(s.getInt(0), s.getInt(1), s.getInt(2),
        s.getUTF8String(3), if (text == null) 0 else text.numBytes())
      i += 1
    }
    new GenericArrayData(out)
  }

  def computeFatten(text: UTF8String, slim: ArrayData): ArrayData = {
    val n = slim.numElements()
    val out = new Array[Any](n)
    // zero-copy slices into the text's own buffer (same lifetime semantics
    // as UnsafeRow.getUTF8String itself — valid while the row is live,
    // which covers the consuming projection/writer)
    val base = text.getBaseObject
    val off = text.getBaseOffset
    var pos = 0L
    var i = 0
    while (i < n) {
      val s = slim.getStruct(i, 5)
      val tlen = s.getInt(4)
      out(i) = InternalRow(s.getInt(0), s.getInt(1), s.getInt(2),
        s.getUTF8String(3), UTF8String.fromAddress(base, off + pos, tlen))
      pos += tlen + 1 // the single-byte '\n' joiner
      i += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    NativeFunctions.registerAll(spark) // one shared list — cannot drift

  def slim(spans: Column): Column =
    org.apache.spark.sql.functions.call_function("spans_slim", spans)

  def fatten(text: Column, slimSpans: Column): Column =
    org.apache.spark.sql.functions.call_function("spans_fatten", text, slimSpans)
}

case class SlimSpans(child: Expression) extends UnaryExpression {
  override def dataType: DataType = SpanShuffle.SlimType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    SpanShuffle.computeSlim(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpanShuffle.computeSlim($c)")

  override protected def withNewChildInternal(newChild: Expression): SlimSpans =
    copy(child = newChild)

  override def prettyName: String = "spans_slim"
}

case class FattenSpans(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = SpanShuffle.FatType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(text: Any, slim: Any): Any =
    SpanShuffle.computeFatten(text.asInstanceOf[UTF8String], slim.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) => s"graft.functions.SpanShuffle.computeFatten($t, $s)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FattenSpans =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "spans_fatten"
}
