package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFingerprint, TextFunctions => TF}

/** One-off: timing probe for the shingle/minhash stages at sf0.1. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TextFingerprint.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    time("warm")(spark.range(1000000).count())
    val inline = docs.select(explode(TF.shingles(col("text"), 3)).as("s"))
    time("explode-INLINE-shingles")(inline.count())
    val mat = docs.withColumn("w", TF.tokens(col("text")))
      .select(explode(TF.shinglesOfWords(col("w"))).as("s"))
    time("explode-MATERIALIZED")(mat.count())
    time("old-q_minhash_sig-shape") {
      val sh = docs.select(col("doc_id"), explode(TF.shingles(col("text"), 3)).as("shingle"))
        .withColumn("fp", call_function("text_fingerprint", col("shingle")))
      val aggs = (0 until 16).map(k => min(TF.universalHash(col("fp"), k)).as(s"h$k"))
      sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).count()
    }
    time("new-q_minhash_sig-shape") {
      val sh = docs.withColumn("w", TF.tokens(col("text")))
        .select(col("doc_id"), explode(TF.shinglesOfWords(col("w"))).as("shingle"))
        .withColumn("fp", call_function("text_fingerprint", col("shingle")))
      val aggs = (0 until 16).map(k => min(TF.universalHash(col("fp"), k)).as(s"h$k"))
      sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).count()
    }
    spark.stop()
  }
}
