package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{VectorFunctions => VF}

/** Product quantization (q_pq_encode / q_knn_pq): the exactness of the
  * encode/search arithmetic is the DuckDB oracle's job; this spec pins the
  * QUALITY and SHAPE properties — codes are genuinely 4-bit (the 64×
  * compression claim), every vector is encoded, and the compressed-domain
  * ADC search recalls a useful fraction of the true nearest neighbors under
  * the metric PQ approximates (scaled-integer L2). */
class PqSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("PQ encode emits 8 codes per vector, each a 4-bit value") {
    val rows = SparkEntry.queries("q_pq_encode")(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.length.toLong == n, s"expected $n encoded vectors, got ${rows.length}")
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == 8, s"vec ${r.getLong(0)}: ${codes.length} codes")
      assert(codes.forall(c => c >= 0 && c < 16),
        s"vec ${r.getLong(0)}: code out of 4-bit range: $codes")
    }
    // the codebooks must actually discriminate: across the corpus every
    // subspace should use more than one code word
    val perSub = rows.flatMap(_.getSeq[Int](1).zipWithIndex.map(_.swap))
      .groupBy(_._1).map { case (m, cs) => m -> cs.map(_._2).distinct.length }
    assert(perSub.values.forall(_ > 1), s"degenerate codebook: $perSub")
  }

  test("IVF-ADC recall@5 vs exact integer-L2 ground truth beats the random baseline") {
    val pq = SparkEntry.queries("q_knn_pq")(spark, sf)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq.size == 50, s"expected 10 queries x 5 neighbors, got ${pq.size}")

    // exact ground truth under the metric ADC approximates: squared L2 on
    // the scaled-integer vectors, same (d2 asc, vec_id) tie order
    VF.register(spark)
    val qz = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => floor(x.cast("double") * 1000000.0 + lit(0.5))).as("qv"))
    val q = qz.filter(col("vec_id") >= 100 && col("vec_id") < 110)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("d2"), col("vec_id"))
    val exact = qz.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("query_id"))
      .withColumn("d2", VF.sqDistL(col("qv"), col("qqv")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // two approximations stack: the 2-of-16-list coarse prune (~12.5% of
    // the corpus scanned; random lists => recall ~0.125) and the 4-bit
    // code quantization on top. The floor is pinned above the random
    // baseline and below the measured value.
    val recall = (pq & exact).size.toDouble / exact.size
    info(f"IVF-ADC recall@5 = $recall%.3f (random-probe baseline ~= 0.125)")
    assert(recall >= 0.2, f"recall $recall%.3f under floor 0.2")
  }
}
