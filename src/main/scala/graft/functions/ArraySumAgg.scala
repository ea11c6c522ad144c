package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise Long-array sum — the mergeable monoid behind embedding
  * mean-pooling (and any fixed-width vector-of-counters aggregate, e.g. a
  * per-group histogram vector). As a typed `Aggregator` it map-side
  * combines: a group crosses the exchange as ONE dim-length array per map
  * task, where the posexplode+groupBy alternative multiplies the shuffled
  * row count by the vector dimension. Buffer is O(dim) regardless of group
  * size — safe when one group holds a billion chunk vectors.
  *
  * Ragged inputs: the buffer grows to the longest array seen; absent
  * trailing elements count as 0 (the zip-with-zero-extension monoid, so
  * merge stays associative and commutative).
  */
final class ArraySumAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  private def grow(b: Array[Long], n: Int): Array[Long] =
    if (b.length >= n) b else java.util.Arrays.copyOf(b, n)
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = {
    val out = grow(b, a.length)
    var i = 0
    while (i < a.length) { out(i) += a(i); i += 1 }
    out
  }
  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    val (big, small) = if (x.length >= y.length) (x, y) else (y, x)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }
  override def finish(b: Array[Long]): Seq[Long] = b.toSeq
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object ArraySumAgg {
  val inputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
