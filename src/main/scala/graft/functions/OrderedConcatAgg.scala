package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.model.Span

/** Typed `Aggregator` UDAF surface (SURVEY §2.9): ordered string
  * concatenation as a custom aggregate, the per-group analog of the
  * reference's per-field multi-line accumulation
  * (`/root/reference/src/controller/idcardprocesser.py:149-165` —
  * `hoten1+hoten2`, `quequan1+quequan2` assembled in line order).
  *
  * Two faces over the same semantics:
  *  - [[OrderedConcatAgg]] — the untyped-DataFrame face, registered via
  *    `functions.udaf` and oracle-checked by `q_udaf_concat` (identical
  *    result to the window/collect_list form `q_ordered_concat`);
  *  - [[SpanTextAgg]] — the typed `Aggregator[Span, _, String]` face used
  *    with `Dataset.groupByKey(...).agg(_.toColumn)` (spec-verified).
  *
  * Buffers hold the unsorted (key, value) pairs and `finish` sorts once —
  * merge stays O(|left| + |right|) and associative/commutative, which is
  * what makes the aggregate safe under Spark's partial-aggregation
  * (map-side combine) execution at scale.
  */
object OrderedConcatAgg {

  /** Input row shape for the untyped face (positional column binding). */
  final case class Line(n: Int, flag: String)
  final case class Buf(items: Seq[Line])

  val lineEncoder: Encoder[Line] = Encoders.product[Line]
}

final class OrderedConcatAgg extends Aggregator[OrderedConcatAgg.Line, OrderedConcatAgg.Buf, String] {
  import OrderedConcatAgg._
  override def zero: Buf = Buf(Vector.empty)
  override def reduce(b: Buf, a: Line): Buf = Buf(b.items :+ a)
  override def merge(x: Buf, y: Buf): Buf = Buf(x.items ++ y.items)
  override def finish(b: Buf): String =
    b.items.sortBy(l => (l.n, l.flag)).map(l => s"${l.n}${l.flag}").mkString(",")
  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

/** Typed face promised by SURVEY §2.9: concatenates span texts in blockIdx
  * order (reading order) — `Dataset[Span].groupByKey(...).agg(new
  * SpanTextAgg().toColumn)`. */
final case class SpanBuf(items: Seq[Span])

final class SpanTextAgg extends Aggregator[Span, SpanBuf, String] {
  override def zero: SpanBuf = SpanBuf(Vector.empty)
  override def reduce(b: SpanBuf, a: Span): SpanBuf = SpanBuf(b.items :+ a)
  override def merge(x: SpanBuf, y: SpanBuf): SpanBuf = SpanBuf(x.items ++ y.items)
  override def finish(b: SpanBuf): String =
    b.items.sortBy(s => (s.blockIdx, s.start)).map(_.text).mkString("\n")
  override def bufferEncoder: Encoder[SpanBuf] = Encoders.product[SpanBuf]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
