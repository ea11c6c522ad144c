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
    // codes emit comma-joined (the oracle comparator cannot hash array
    // cells) — parse back for the shape assertions
    def codesOf(r: org.apache.spark.sql.Row): Seq[Int] =
      r.getString(1).split(',').toSeq.map(_.toInt)
    rows.foreach { r =>
      val codes = codesOf(r)
      assert(codes.length == 8, s"vec ${r.getLong(0)}: ${codes.length} codes")
      assert(codes.forall(c => c >= 0 && c < 16),
        s"vec ${r.getLong(0)}: code out of 4-bit range: $codes")
    }
    // the codebooks must actually discriminate: across the corpus every
    // subspace should use more than one code word
    val perSub = rows.flatMap(r => codesOf(r).zipWithIndex.map(_.swap))
      .groupBy(_._1).map { case (m, cs) => m -> cs.map(_._2).distinct.length }
    assert(perSub.values.forall(_ > 1), s"degenerate codebook: $perSub")
  }

  test("IVF-ADC+refine recall@5 vs exact cosine reaches the 2-probe candidate cap") {
    val pq = SparkEntry.queries("q_knn_pq")(spark, sf)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq.size == 50, s"expected 10 queries x 5 neighbors, got ${pq.size}")

    // exact cosine ground truth for the same query set (the metric the
    // refine stage ranks by — comparable to q_knn_ivf's recall)
    VF.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), VF.l2NormF(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") >= 100 && col("vec_id") < 110)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", VF.dotF(col("embedding"), col("qv")) / (col("nrm") * col("qnrm")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // without the refine stage, raw 4-bit ADC ranking measured 0.2 here;
    // the exact re-rank of the ADC top-20 recovers the 2-probe candidate
    // cap (q_knn_ivf measures 0.42 on this corpus). Floor pinned between.
    val recall = (pq & exact).size.toDouble / exact.size
    info(f"IVF-ADC+refine recall@5 = $recall%.3f (raw ADC measured 0.2, IVF cap 0.42)")
    assert(recall >= 0.3, f"recall $recall%.3f under floor 0.3")

    // and the refined PQ search must agree with q_knn_ivf on most results:
    // same candidate lists, exact metric on top — differences can come only
    // from true top-in-list neighbors the 20-deep ADC shortlist missed
    val ivf = SparkEntry.queries("q_knn_ivf")(spark, sf)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val agree = (pq & ivf).size.toDouble / ivf.size
    info(f"agreement with q_knn_ivf = $agree%.3f")
    assert(agree >= 0.8, f"agreement $agree%.3f under floor 0.8")
  }
}
