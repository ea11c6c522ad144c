package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd shingling — the measured fix for the dedup family's
  * hot stage: the `transform(sequence(...), concat_ws(element_at...))`
  * higher-order-function chain evaluates its lambda INTERPRETED per shingle
  * (~20 µs each; 5–8 s for 260k shingles at sf0.1 — the whole q_dedup_*
  * budget). These expressions produce byte-identical values in one compiled
  * pass per document. Semantics are locked to the DuckDB oracle's SQL:
  * distinct word 3-grams joined with single spaces, first-occurrence order;
  * texts shorter than 3 words collapse to one whole-text shingle.
  */
case class ShinglesF(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    ShinglesF.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShinglesF.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesF =
    copy(child = newChild)

  override def prettyName: String = "shingles_f"
}

object ShinglesF {
  final val N = 3
  private val Space = UTF8String.fromString(" ")

  /** Distinct word n-grams in first-occurrence order (the exact semantics of
    * `array_distinct(transform(...))` the HOF form had). */
  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (n >= N) {
      var i = 0
      while (i <= n - N) {
        seen.add(UTF8String.concatWs(Space,
          words.getUTF8String(i), words.getUTF8String(i + 1), words.getUTF8String(i + 2)))
        i += 1
      }
    } else {
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < n) { parts(i) = words.getUTF8String(i); i += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}

/** `minhash_sig(array<string>) -> array<long>` — the 16-hash MinHash
  * signature computed per document in ONE pass: for each distinct shingle,
  * fp = rolling poly fingerprint ([[TextFingerprint.compute]]), then
  * h_k = min over shingles of (fp·a_k + b_k) mod P. Identical values to the
  * explode → fingerprint → groupBy(min × 16) pipeline (min over the same
  * distinct-shingle set), but with no explode, no shuffle, and no 16-way
  * aggregate — the signature stage becomes a narrow map. (MinHash per
  * Broder 1997; constants shared with [[TextFunctions.universalHash]] so
  * the DuckDB oracle reproduces them from k alone.)
  */
case class MinHashSigF(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    MinHashSigF.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSigF.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigF =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSigF {
  final val K = 16
  private final val P = TextFunctions.HashP
  private val A: Array[Long] = Array.tabulate(K)(TextFunctions.hashA)
  private val B: Array[Long] = Array.tabulate(K)(TextFunctions.hashB)

  def compute(words: ArrayData): ArrayData = {
    val shingles = ShinglesF.compute(words)
    val m = shingles.numElements()
    val mins = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val fp = TextFingerprint.compute(shingles.getUTF8String(i))
      var k = 0
      while (k < K) {
        // fp ∈ [0, 1e9+7), a_k ≤ 1.6e7 → products < 2^63: exact
        val h = (fp * A(k) + B(k)) % P
        mins(k) = math.min(mins(k), h)
        k += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** `simhash_sig(array<string>) -> long` — the 64-bit SimHash signature in
  * ONE pass per document: for each DISTINCT word (first-occurrence set, the
  * `array_distinct` semantics), fp = rolling poly fingerprint, 4 universal
  * hashes supply 16 bits each (the hash family yields 31-bit values), each
  * bit votes ±1 into its counter, sign → bit. Setting bit 63 in the long
  * IS the Long.MinValue weight in two's complement, so the value is
  * byte-identical to the explode → 64-aggregate → weighted-sum plan this
  * replaces — but with no explode, no shuffle, and no 64-way aggregate.
  */
case class SimHashSigF(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    SimHashSigF.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashSigF.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSigF =
    copy(child = newChild)

  override def prettyName: String = "simhash_sig"
}

object SimHashSigF {
  private final val P = TextFunctions.HashP
  private val A: Array[Long] = Array.tabulate(4)(TextFunctions.hashA)
  private val B: Array[Long] = Array.tabulate(4)(TextFunctions.hashB)

  def compute(words: ArrayData): Long = {
    val n = words.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (seen.add(w)) {
        val fp = TextFingerprint.compute(w)
        var k = 0
        while (k < 4) {
          val h = (fp * A(k) + B(k)) % P
          var j = 0
          while (j < 16) {
            val bit = ((h >> j) & 1L) == 1L
            votes(16 * k + j) += (if (bit) 1 else -1)
            j += 1
          }
          k += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** `sorted_pairs(array<long>) -> array<struct<a,b>>` — all unordered pairs
  * (a < b) of a bounded id list: the pair-enumeration step of the inverted
  * index (each df-capped posting list of k docs yields k(k−1)/2 candidate
  * pairs, k ≤ cap so the output is bounded). Native because a HOF
  * flatten/transform nest would evaluate interpreted per pair. */
case class SortedPairsL(child: Expression) extends UnaryExpression {

  override def dataType: DataType = SortedPairsL.OutType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    SortedPairsL.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SortedPairsL.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SortedPairsL =
    copy(child = newChild)

  override def prettyName: String = "sorted_pairs"
}

object SortedPairsL {
  import org.apache.spark.sql.types.{LongType => LT, StructField, StructType}
  val OutType: DataType = ArrayType(
    StructType(Seq(StructField("a", LT, nullable = false), StructField("b", LT, nullable = false))),
    containsNull = false)

  def compute(ids: ArrayData): ArrayData = {
    val raw = ids.numElements()
    val sorted = new Array[Long](raw)
    var i = 0
    while (i < raw) { sorted(i) = ids.getLong(i); i += 1 }
    java.util.Arrays.sort(sorted)
    // dedupe in place so duplicate ids in the input can never emit a
    // degenerate (a, a) "pair" — the a < b contract holds for ANY input,
    // not just the distinct posting lists the dedup path feeds it
    var n = 0
    i = 0
    while (i < raw) {
      if (n == 0 || sorted(i) != sorted(n - 1)) { sorted(n) = sorted(i); n += 1 }
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(sorted(i), sorted(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

object ShingleFunctions {
  def register(spark: SparkSession): Unit =
    NativeFunctions.registerAll(spark) // one shared list — cannot drift

  def shinglesF(c: Column): Column =
    org.apache.spark.sql.functions.call_function("shingles_f", c)

  def minhashSig(c: Column): Column =
    org.apache.spark.sql.functions.call_function("minhash_sig", c)

  def simhashSig(c: Column): Column =
    org.apache.spark.sql.functions.call_function("simhash_sig", c)

  def sortedPairs(c: Column): Column =
    org.apache.spark.sql.functions.call_function("sorted_pairs", c)
}
