package graft

import graft.functions.{OrderedConcatAgg, SpanTextAgg, TopKAgg, TopKScoredAgg}
import graft.model.Span
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Typed `Aggregator` UDAF surface (SURVEY §2.9). The untyped face is
  * oracle-checked by `q_udaf_concat`; these specs pin the typed face and the
  * partial-aggregation algebra (merge associativity over split buffers).
  */
class AggregatorSpec extends AnyFunSuite with SparkTestBase {

  test("SpanTextAgg: groupByKey + typed column restores reading order") {
    import testImplicits._
    val spans = Seq(
      ("c1", Span(2, 30, 40, "p", "third block")),
      ("c1", Span(0, 0, 10, "p", "first block")),
      ("c2", Span(0, 0, 5, "p", "solo")),
      ("c1", Span(1, 12, 25, "h1", "second block"))
    ).toDS()
    // deliberately shuffled input + repartition: merge order is arbitrary,
    // finish must still sort by (blockIdx, start)
    val out = spans.repartition(4)
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new SpanTextAgg().toColumn.name("text"))
      .collect().toMap
    assert(out("c1") == "first block\nsecond block\nthird block")
    assert(out("c2") == "solo")
  }

  test("OrderedConcatAgg: udaf equals the window/collect_list form") {
    import testImplicits._
    val df = Seq((1L, 2, "B"), (1L, 1, "A"), (1L, 2, "A"), (2L, 1, "C"))
      .toDF("k", "n", "flag").repartition(3)
    val agg = udaf(new OrderedConcatAgg, OrderedConcatAgg.lineEncoder)
    val got = df.groupBy($"k").agg(agg($"n", $"flag").as("s"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "1A,2A,2B") // ties on n break on flag
    assert(got(2L) == "1C")
  }

  test("OrderedConcatAgg algebra: merge is order-insensitive") {
    val a = new OrderedConcatAgg
    import OrderedConcatAgg._
    val left = a.reduce(a.reduce(a.zero, Line(3, "z")), Line(1, "a"))
    val right = a.reduce(a.zero, Line(2, "m"))
    assert(a.finish(a.merge(left, right)) == a.finish(a.merge(right, left)))
    assert(a.finish(a.merge(left, right)) == "1a,2m,3z")
  }

  test("TopKAgg / TopKScoredAgg algebra: buffer pruned to k on every " +
    "reduce and merge, merge order-insensitive, (score DESC, id ASC) " +
    "total order, scored variant carries the scores") {
    import TopKAgg._
    val ids = new TopKAgg(2)
    val scored = new TopKScoredAgg(2)
    val items = Seq(Scored(5, 1.0), Scored(3, 9.0), Scored(4, 9.0),
      Scored(1, 2.0), Scored(9, 9.0))
    val (l, r) = items.splitAt(2)
    def fold(a: Aggregator[Scored, Buf, _], xs: Seq[Scored]): Buf =
      xs.foldLeft(a.asInstanceOf[Aggregator[Scored, Buf, Any]].zero)(
        (b, x) => a.asInstanceOf[Aggregator[Scored, Buf, Any]].reduce(b, x))
    val bl = fold(ids, l); val br = fold(ids, r)
    assert(bl.items.size <= 2 && br.items.size <= 2, "buffer must stay O(k)")
    assert(ids.finish(ids.merge(bl, br)) == ids.finish(ids.merge(br, bl)))
    // ties on score 9.0 break ascending id: 3 then 4 (9 pruned)
    assert(ids.finish(ids.merge(bl, br)) == Seq(3L, 4L))
    val sl = fold(scored, l); val sr = fold(scored, r)
    assert(scored.finish(scored.merge(sl, sr)) ==
      Seq(Scored(3, 9.0), Scored(4, 9.0)))
  }

  test("ArraySumAgg algebra: element-wise sum, ragged arrays zero-extend, " +
    "merge is order-insensitive and matches the sequential fold") {
    val a = new graft.functions.ArraySumAgg
    val rows: Seq[Seq[Long]] = Seq(Seq(1L, 2L, 3L), Seq(10L), Seq(0L, 5L, 0L, 7L))
    def fold(xs: Seq[Seq[Long]]) = xs.foldLeft(a.zero)(a.reduce)
    val all = a.finish(fold(rows))
    assert(all == Seq(11L, 7L, 3L, 7L))
    // split + merge (either order) == sequential
    val (l, r) = rows.splitAt(1)
    assert(a.finish(a.merge(fold(l), fold(r))) == all)
    assert(a.finish(a.merge(fold(r), fold(l))) == all)
    assert(a.finish(a.zero).isEmpty)
  }
}
