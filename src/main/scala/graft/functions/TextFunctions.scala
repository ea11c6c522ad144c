package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis builders for the training-data pipeline
  * operators (dedup, quality scoring, token stats). All are composed from
  * `org.apache.spark.sql.functions._` built-ins so they stay codegen'd and
  * Catalyst-visible (prunable/pushable) — no UDFs in the hot path. Every
  * definition here has an exact ANSI-SQL twin used by the DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]]; keep them in lockstep.
  */
object TextFunctions {

  /** Whitespace tokenization (multi-space safe). */
  def tokens(c: Column): Column = split(trim(c), " +")

  def tokenCount(c: Column): Column = size(tokens(c))

  def distinctTokenCount(c: Column): Column = size(array_distinct(tokens(c)))

  /** Small fixed stopword table (broadcast-dimension analog of the
    * reference's diacritics CSV, SURVEY §2.7 C6). */
  final val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordCount(c: Column): Column = {
    val sw = array(Stopwords.map(lit): _*)
    size(filter(tokens(c), w => array_contains(sw, w)))
  }

  /** Count of chars in an explicit class (portable: no regex-dialect
    * dependence beyond a literal char class). */
  def charClassCount(c: Column, clazz: String): Column =
    length(c) - length(regexp_replace(c, s"[$clazz]", ""))

  def punctCount(c: Column): Column = charClassCount(c, """.,!?;:""")
  def digitCount(c: Column): Column = charClassCount(c, "0-9")

  /** Quality score in [0,1]: stopword-ratio and mean-token-length signals,
    * punct-density penalty — the text analog of the reference's blur +
    * density gates (`/root/reference/src/cmnd/main.py:23-28`,
    * `src/controller/pagepredictor.py:131-148`). Formula (locked, mirrored
    * in the oracle):
    *   q = least(1, 4·stopRatio) · least(1, meanTokLen/4) · (1 − punctRatio)
    */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val stopRatio = stopwordCount(c) / nTok
    val meanTokLen = (length(regexp_replace(trim(c), " +", "")) / nTok)
    val punctRatio = punctCount(c) / length(c).cast("double")
    least(lit(1.0), stopRatio * 4) * least(lit(1.0), meanTokLen / 4) * (lit(1.0) - punctRatio)
  }

  /** Word n-gram shingles from an ALREADY-MATERIALIZED words-array column;
    * texts shorter than n words collapse to a single whole-text shingle.
    * IMPORTANT: pass an attribute reference (e.g. `.withColumn("w",
    * tokens(col("text")))` first), NOT `tokens(c)` inline — Catalyst inlines
    * the split into every lambda element_at, re-splitting the text once per
    * shingle element (measured ~10× slowdown on the dedup queries). */
  def shinglesOfWords(w: Column, n: Int = 3): Column =
    array_distinct(
      when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n), i =>
          concat_ws(" ", (1 to n).map(k => element_at(w, i + k)): _*)))
        .otherwise(array(concat_ws(" ", w))))

  /** Convenience form over raw text; see the materialization note above —
    * prefer shinglesOfWords on a projected words column in hot paths. */
  def shingles(c: Column, n: Int = 3): Column = shinglesOfWords(tokens(c), n)

  /** Universal-hash family over a fingerprint: h_k(x) = (a_k·x + b_k) mod P,
    * P = 2^31 − 1. Constants derived from k alone so the DuckDB oracle can
    * reproduce them. (MinHash per Broder, "On the resemblance and
    * containment of documents", 1997; banding analysis per Leskovec/
    * Rajaraman/Ullman, Mining of Massive Datasets §3; SimHash per Charikar,
    * STOC 2002.) */
  final val HashP: Long = 2147483647L
  def hashA(k: Int): Long = 1000003L * (k + 1)
  def hashB(k: Int): Long = 7919L * (k + 1)
  def universalHash(fp: Column, k: Int): Column =
    pmod(fp * lit(hashA(k)) + lit(hashB(k)), lit(HashP))

  /** Cosine machinery over Array[Float] embedding columns: float→double
    * cast then strictly sequential fold, so the result is bit-identical to
    * DuckDB's list_dot_product over the same doubles. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  def cosineSim(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))
}
