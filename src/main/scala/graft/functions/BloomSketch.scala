package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_function, udaf}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Bloom membership sketch over 64-bit keys — the incremental-ingest dedup
  * primitive (`q_dedup_incremental`): the committed corpus is folded ONCE
  * into per-shard bloom blobs (a mergeable aggregate → map-side combine →
  * one small binary row per shard), and every later ingest batch probes the
  * broadcast blobs instead of re-scanning petabytes of history. A bloom has
  * NO false negatives (a true duplicate always probes positive), so
  * bloom-negative rows are exactly-new with zero join cost and only the
  * ~fpp tail needs the exact verify join.
  *
  * Standard construction (Bloom 1970; Kirsch–Mitzenmacher double hashing):
  * k=[[NumHashes]] indexes iᵗʰ = h1 + i·h2 into an m=[[NumBits]]-bit array,
  * h1/h2 from two splitmix64 finalizations of the key. m is fixed per blob
  * (16 KiB → fpp = (1−e^(−kn/m))^k ≈ 1% at ~13 k keys/shard, ~5% at 20 k);
  * CAPACITY scales by adding shards (the shard key is a hash of the probe
  * key), never by growing a blob — that keeps every blob broadcastable and
  * the build a plain groupBy. fpp only costs verify-join traffic, never
  * correctness.
  *
  * Three faces, one bit layout ([[setBits]]/[[mightContain]] shared):
  *  - [[BloomAgg]] — typed `Aggregator` (byte-array buffer, merge = OR);
  *  - [[BloomMaybe]] — native codegen probe `bloom_maybe(blob, key)`;
  *  - driver-side [[contains]] for specs.
  */
object BloomSketch {
  /** Bits per blob (power of two — index by mask, not mod). */
  final val NumBits: Int = 1 << 17
  final val NumBytes: Int = NumBits / 8
  final val NumHashes: Int = 7

  /** splitmix64 finalizer (Steele et al. 2014, public domain reference
    * implementation) — decorrelates the rolling-polynomial fingerprints,
    * whose low bits alone are NOT uniform. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def setBits(buf: Array[Byte], key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0xC2B2AE3D27D4EB4FL) | 1L
    var i = 0
    while (i < NumHashes) {
      val bit = ((h1 + i * h2) & (NumBits - 1)).toInt
      buf(bit >>> 3) = (buf(bit >>> 3) | (1 << (bit & 7))).toByte
      i += 1
    }
  }

  def mightContain(buf: Array[Byte], key: Long): Boolean = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0xC2B2AE3D27D4EB4FL) | 1L
    var i = 0
    while (i < NumHashes) {
      val bit = ((h1 + i * h2) & (NumBits - 1)).toInt
      if ((buf(bit >>> 3) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Driver-side face (specs). */
  def contains(blob: Array[Byte], key: Long): Boolean = mightContain(blob, key)

  /** `bloom_agg(long) -> binary` as an untyped-DataFrame aggregate. */
  def agg(c: Column): Column = udaf(new BloomAgg, Encoders.scalaLong).apply(c)

  def register(spark: SparkSession): Unit =
    NativeFunctions.registerAll(spark) // one shared list — cannot drift

  def maybe(spark: SparkSession, blob: Column, key: Column): Column = {
    register(spark)
    call_function("bloom_maybe", blob, key)
  }

  /** Keys → one blob per shard (`shard = pmod(key, nShards)`; output
    * columns `(shard, bloom)`). A plain partial-agg'd groupBy — each map
    * task ships at most nShards 16 KiB blobs, never its keys. Persist the
    * result and OR-merge future deltas ([[BloomAgg.merge]]) rather than
    * rebuilding: that amortization is what makes the probe side of
    * incremental dedup history-scan-free. */
  def shardedBlooms(keys: org.apache.spark.sql.DataFrame, keyCol: Column,
      nShards: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{lit, pmod}
    keys.groupBy(pmod(keyCol, lit(nShards.toLong)).as("shard"))
      .agg(agg(keyCol).as("bloom"))
  }
}

/** Mergeable bloom aggregate: reduce sets k bits, merge ORs the arrays —
  * associative + commutative, so Spark's partial aggregation applies and
  * each map task ships one 16 KiB blob per shard, never its keys. */
final class BloomAgg extends Aggregator[Long, Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = new Array[Byte](BloomSketch.NumBytes)
  override def reduce(b: Array[Byte], key: Long): Array[Byte] = {
    BloomSketch.setBits(b, key); b
  }
  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < x.length) { x(i) = (x(i) | y(i)).toByte; i += 1 }
    x
  }
  override def finish(b: Array[Byte]): Array[Byte] = b
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** `bloom_maybe(binary, long) -> boolean` — native probe, stays inside
  * whole-stage codegen (the probe runs once per ingested row: the hot path). */
case class BloomMaybe(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BooleanType

  override def nullSafeEval(blob: Any, key: Any): Any =
    BloomSketch.mightContain(blob.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.functions.BloomSketch.mightContain($b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMaybe =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_maybe"
}
