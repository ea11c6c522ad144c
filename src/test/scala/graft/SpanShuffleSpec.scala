package graft

import graft.functions.SpanShuffle
import graft.model.{ExtractedTurn, Span}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The slim/fatten span codec must be LOSSLESS across the order-restore
  * exchange — including multi-byte and astral characters, where byte
  * lengths and char counts diverge (the codec is byte-based for exactly
  * this reason). */
class SpanShuffleSpec extends AnyFunSuite with SparkTestBase {

  private def turn(id: String, pieces: Seq[(String, String)]): ExtractedTurn = {
    // kernel invariant: text = span texts joined with "\n"
    val text = pieces.map(_._2).mkString("\n")
    val spans = pieces.zipWithIndex.map { case ((kind, t), i) =>
      Span(i, i * 10, i * 10 + t.length, kind, t)
    }
    ExtractedTurn(id, 0, "user", "html", new java.sql.Timestamp(86400000L),
      text, spans, spans.size, 0, text.length, 1.0)
  }

  test("slim→shuffle→fatten round-trips exactly, incl. multi-byte and astral text") {
    import testImplicits._
    val turns = Seq(
      turn("c0", Seq(("p", "plain ascii"), ("h", "café naïve"), ("t", "𝕊𝕡𝕒𝕣𝕜 🚀 test"))),
      turn("c1", Seq(("p", ""))), // empty span text
      turn("c2", Seq(("p", "日本語のテキスト"), ("q", "emoji 👍🏽 mixed"))),
      turn("c3", Seq.empty) // no spans at all
    )
    val ds = turns.toDS().repartition(2)
    SpanShuffle.register(spark)
    val roundTripped = ds.toDF()
      .withColumn("spans", SpanShuffle.slim(col("spans")))
      .repartition(col("conv_id"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"))
      .withColumn("spans", SpanShuffle.fatten(col("text"), col("spans")))
      .as[ExtractedTurn]
      .collect().sortBy(_.conv_id)
    assert(roundTripped.toSeq == turns.sortBy(_.conv_id))
  }

  test("slim drops the text payload; tlen is the UTF-8 byte length") {
    import testImplicits._
    val ds = Seq(turn("c0", Seq(("k", "ab"), ("k", "héllo"), ("k", "🚀")))).toDS()
    SpanShuffle.register(spark)
    val slim = ds.toDF()
      .select(explode(SpanShuffle.slim(col("spans"))).as("s"))
      .select(col("s.tlen")).as[Int].collect().toSeq
    // "ab"=2, "héllo"=6 (é is 2 bytes), "🚀"=4
    assert(slim == Seq(2, 6, 4))
  }
}
