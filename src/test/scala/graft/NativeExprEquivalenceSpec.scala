package graft

import graft.functions.{ShingleFunctions => SF, TextFingerprint, TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen expressions exist for speed; these specs pin that
  * each one is VALUE-equivalent to the declarative (HOF / explode-groupBy)
  * formulation it replaced — the formulation the DuckDB oracles mirror.
  * Inputs come from the driver's own parquet tables, not synthetic toys.
  */
class NativeExprEquivalenceSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("shingles_f == array_distinct(transform(sequence...)) on all documents") {
    SF.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("w", TF.tokens(col("text")))
    val n = docs
      .select(col("doc_id"),
        SF.shinglesF(col("w")).as("native"),
        TF.shinglesOfWords(col("w")).as("hof"))
      .filter(not(col("native") === col("hof")))
      .count()
    assert(n == 0, s"$n docs diverge")
  }

  test("repetition sorted max-run fold == explode -> groupBy(count) -> max on all documents") {
    // q_repetition_quality computes the top-word count with an O(n log n)
    // narrow fold over the sorted token array; pin it to the shuffling
    // explode-groupBy formulation the DuckDB oracle uses
    val rep = SparkEntry.queries("q_repetition_quality")(spark, sf)
      .select(col("doc_id"), col("top_word_frac"))
    val viaAgg = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), TF.tokens(col("text")).as("w"))
      .withColumn("n_words", size(col("w")).cast("bigint"))
      .select(col("doc_id"), col("n_words"), explode(col("w")).as("wd"))
      .groupBy(col("doc_id"), col("n_words"), col("wd")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n_words")).agg(max(col("c")).as("top_c"))
      .select(col("doc_id"),
        round(col("top_c").cast("double") / col("n_words"), 4).as("top_word_frac"))
    assert(rep.count() == viaAgg.count())
    assert(rep.except(viaAgg).count() == 0 && viaAgg.except(rep).count() == 0)
  }

  test("minhash_sig == explode -> fingerprint -> groupBy(min x16) on all documents") {
    SF.register(spark)
    TextFingerprint.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("w", TF.tokens(col("text")))
    val native = docs.select(col("doc_id"), SF.minhashSig(col("w")).as("sig"))
    val viaAgg = {
      val sh = docs
        .select(col("doc_id"), explode(TF.shinglesOfWords(col("w"))).as("shingle"))
        .withColumn("fp", call_function("text_fingerprint", col("shingle")))
      val aggs = (0 until 16).map(k => min(TF.universalHash(col("fp"), k)).as(s"h$k"))
      sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    }
    // compare positionally by doc_id
    val nMap = native.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val aRows = viaAgg.collect()
    assert(aRows.length == nMap.size)
    aRows.foreach { r =>
      val id = r.getLong(0)
      val agg = (1 to 16).map(i => r.getLong(i))
      assert(nMap(id) == agg, s"doc $id")
    }
  }

  test("simhash_sig == explode(distinct) -> 64-aggregate weighted-sum on all documents") {
    SF.register(spark)
    TextFingerprint.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val native = docs
      .select(col("doc_id"), SF.simhashSig(TF.tokens(col("text"))).as("simhash"))
    val viaAgg = {
      val wf = docs
        .select(col("doc_id"), explode(array_distinct(TF.tokens(col("text")))).as("w"))
        .withColumn("fp", call_function("text_fingerprint", col("w")))
      val withHashes = (0 until 4).foldLeft(wf) { (d, k) =>
        d.withColumn(s"h$k", TF.universalHash(col("fp"), k))
      }
      val sums = (0 until 64).map(j =>
        sum(shiftright(col(s"h${j / 16}"), j % 16).bitwiseAND(lit(1L)) * 2 - 1).as(s"s$j"))
      withHashes.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
        .select(col("doc_id"),
          (0 until 64).map { j =>
            val w = if (j == 63) Long.MinValue else 1L << j
            when(col(s"s$j") > 0, lit(w)).otherwise(lit(0L))
          }.reduce(_ + _).as("simhash"))
    }
    val nMap = native.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aRows = viaAgg.collect()
    assert(aRows.length == nMap.size)
    aRows.foreach(r => assert(nMap(r.getLong(0)) == r.getLong(1), s"doc ${r.getLong(0)}"))
  }

  test("sqdist_l == aggregate(zip_with((x-y)^2)) on quantized embeddings") {
    VF.register(spark)
    val qz = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("qv", transform(col("embedding"), x => floor(x.cast("double") * 1000000.0 + lit(0.5))))
      .select(col("vec_id"), col("qv"))
    val pairs = qz.as("a").join(qz.as("b"), col("a.vec_id") + 1 === col("b.vec_id"))
    val hof = aggregate(zip_with(col("a.qv"), col("b.qv"), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    val n = pairs
      .select(VF.sqDistL(col("a.qv"), col("b.qv")).as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(n == 0)
  }

  test("sorted_pairs enumerates exactly the a<b pairs of a list") {
    SF.register(spark)
    import testImplicits._
    val df = Seq((1L, Seq(5L, 2L, 9L, 2L + 1)), (2L, Seq(7L)), (3L, Seq.empty[Long]))
      .toDF("k", "ids")
    val out = df.select(col("k"), SF.sortedPairs(col("ids")).as("p")).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (p.getLong(0), p.getLong(1)))).toMap
    assert(out(1L).toSet == Set((2L, 3L), (2L, 5L), (2L, 9L), (3L, 5L), (3L, 9L), (5L, 9L)))
    assert(out(1L).forall { case (a, b) => a < b })
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("sorted_pairs dedupes duplicate ids — never a degenerate (a,a) pair") {
    SF.register(spark)
    import testImplicits._
    val df = Seq((1L, Seq(4L, 4L, 4L, 7L, 7L, 1L))).toDF("k", "ids")
    val pairs = df.select(SF.sortedPairs(col("ids")).as("p")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0).map(p => (p.getLong(0), p.getLong(1)))
    assert(pairs.toSet == Set((1L, 4L), (1L, 7L), (4L, 7L)))
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("plane_sig is deterministic and balanced-ish across the corpus") {
    VF.register(spark)
    val sigs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), VF.planeSig(col("embedding")).as("sig"))
    val a = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // each of the 32 bits should split the corpus non-degenerately
    (0 until 32).foreach { j =>
      val ones = a.values.count(s => ((s >> j) & 1L) == 1L)
      assert(ones > 0 && ones < a.size, s"bit $j degenerate: $ones/${a.size}")
    }
  }
}
