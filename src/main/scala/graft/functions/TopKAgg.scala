package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator` — the map-side-combinable
  * alternative to `row_number() OVER (PARTITION BY key)` for top-k per
  * group. A window funnels EVERY row of a hot group through one reducer's
  * sort; this aggregate's buffer is pruned to k items on every reduce and
  * merge, so (a) a group sends at most k rows per map task across the
  * shuffle, and (b) reducer state is O(k) regardless of group size — the
  * property that makes per-group top-k safe when one group holds a
  * billion rows. Ordering is the total order (score DESC, id ASC), so the
  * result is deterministic and exactly the window form's prefix
  * (q_topk_agg's oracle IS the window SQL).
  */
object TopKAgg {
  /** Input row (positional binding for the untyped `functions.udaf` face). */
  final case class Scored(id: Long, score: Double)
  final case class Buf(items: Seq[Scored])

  val scoredEncoder: Encoder[Scored] = Encoders.product[Scored]
}

final class TopKAgg(k: Int) extends Aggregator[TopKAgg.Scored, TopKAgg.Buf, Seq[Long]] {
  import TopKAgg._
  private def prune(items: Seq[Scored]): Seq[Scored] =
    items.sortBy(s => (-s.score, s.id)).take(k)
  override def zero: Buf = Buf(Vector.empty)
  override def reduce(b: Buf, a: Scored): Buf = Buf(prune(b.items :+ a))
  override def merge(x: Buf, y: Buf): Buf = Buf(prune(x.items ++ y.items))
  override def finish(b: Buf): Seq[Long] = prune(b.items).map(_.id)
  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** [[TopKAgg]] that keeps the SCORE with each id in the output — for
  * consumers that need the ranked values too (q_bm25's relevance scores),
  * saving the rejoin-to-recover-score pass the id-only form forces. Same
  * O(k) buffer, same (score DESC, id ASC) total order. */
final class TopKScoredAgg(k: Int)
    extends Aggregator[TopKAgg.Scored, TopKAgg.Buf, Seq[TopKAgg.Scored]] {
  import TopKAgg._
  private def prune(items: Seq[Scored]): Seq[Scored] =
    items.sortBy(s => (-s.score, s.id)).take(k)
  override def zero: Buf = Buf(Vector.empty)
  override def reduce(b: Buf, a: Scored): Buf = Buf(prune(b.items :+ a))
  override def merge(x: Buf, y: Buf): Buf = Buf(prune(x.items ++ y.items))
  override def finish(b: Buf): Seq[Scored] = prune(b.items)
  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
