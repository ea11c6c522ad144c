package graft

import graft.functions.WinnowF
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003): the O(n)
  * deque implementation is pinned against a brute-force per-window argmin
  * twin, the paper's detection guarantee is property-tested, and the
  * codegen'd Spark path is pinned against driver-side eval. */
class WinnowSpec extends AnyFunSuite with SparkTestBase {

  private val K = WinnowF.K
  private val W = WinnowF.W
  private val P = WinnowF.Mod
  private val PosMask = (1L << 31) - 1

  /** Brute-force twin: direct O(n·k) hashes, explicit per-window min. */
  private def brute(s: String): Seq[Long] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < K) return Seq.empty
    val m = n - K + 1
    val keys = (0 until m).map { i =>
      var h = 0L
      (i until i + K).foreach(j => h = (h * 31 + cps(j)) % P)
      (h << 31) + (PosMask - (i + 1))
    }
    val sel = (1 to math.max(1, m - W + 1)).map { j =>
      keys.slice(j - 1, math.min(j + W - 1, m)).min
    }
    sel.distinct
  }

  private def decode(key: Long): (Long, Long) = (PosMask - (key & PosMask), key >> 31)

  private def positions(keys: Seq[Long]): Set[(Long, Long)] = keys.map(decode).toSet

  test("deque == brute-force windows on all sf0.001 documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    assert(docs.nonEmpty)
    docs.foreach { t =>
      val fast = WinnowF.compute(t).toLongArray().toSeq
      assert(positions(fast) == positions(brute(t)), s"diverged on: ${t.take(60)}")
      // selections arrive in increasing position order, once each
      val ps = fast.map(k => PosMask - (k & PosMask))
      assert(ps == ps.sorted && ps.distinct == ps)
    }
  }

  test("rightmost-min tie-break: constant string selects the last position of each window") {
    // "aaaa..." gives every k-gram the same hash, so every window is an
    // all-tie; the paper's rule picks the rightmost position
    val s = "a" * (K + 20) // m = 21 hashes
    val sel = positions(WinnowF.compute(s).toLongArray().toSeq).toSeq.sortBy(_._1)
    val m = 21
    val expected = (1 to math.max(1, m - W + 1)).map(j => math.min(j + W - 1, m).toLong).distinct
    assert(sel.map(_._1) == expected)
  }

  test("detection guarantee: shared substring of length K+W-1 implies a shared fingerprint") {
    val rnd = new scala.util.Random(7)
    def randStr(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    (0 until 200).foreach { _ =>
      val common = randStr(K + W - 1)
      val a = randStr(rnd.nextInt(40)) + common + randStr(rnd.nextInt(40))
      val b = randStr(rnd.nextInt(40)) + common + randStr(rnd.nextInt(40))
      val fa = WinnowF.compute(a).toLongArray().map(_ >> 31).toSet
      val fb = WinnowF.compute(b).toLongArray().map(_ >> 31).toSet
      assert((fa & fb).nonEmpty, s"guarantee violated: a=$a b=$b")
    }
  }

  test("edges: empty, shorter than K, exactly K, supplementary-plane code points") {
    assert(WinnowF.compute("").numElements() == 0)
    assert(WinnowF.compute("x" * (K - 1)).numElements() == 0)
    val one = WinnowF.compute("x" * K).toLongArray()
    assert(one.length == 1 && decode(one(0))._1 == 1L)
    // astral chars count as ONE position (code points, not UTF-16 units) —
    // the DuckDB oracle's substr/ord/length are code-point based
    val emoji = "😀" // U+1F600
    val s = emoji * (K + 3)
    val ps = positions(WinnowF.compute(s).toLongArray().toSeq).map(_._1)
    assert(ps.nonEmpty && ps.max <= (K + 3 - K + 1).toLong)
    assert(positions(WinnowF.compute(s).toLongArray().toSeq) == positions(brute(s)))
  }

  test("expected density ~ 2/(W+1) on random text") {
    val rnd = new scala.util.Random(11)
    val s = (0 until 20000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val m = s.length - K + 1
    val d = WinnowF.compute(s).numElements().toDouble / m
    assert(math.abs(d - 2.0 / (W + 1)) < 0.03, s"density $d")
  }

  test("codegen path == driver eval; q_winnow_fp decodes exactly") {
    WinnowF.register(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaSpark = df
      .select(col("doc_id"), explode(call_function("winnow_fp", col("text"))).as("key"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaDriver = df.select(col("doc_id"), col("text")).collect().flatMap { r =>
      WinnowF.compute(r.getString(1)).toLongArray().map(k => (r.getLong(0), k))
    }.toSet
    assert(viaSpark == viaDriver)

    // the query's (pos, fp) decode inverts the key encoding
    val q = SparkEntry.queries("q_winnow_fp")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = viaDriver.map { case (d, k) => (d, PosMask - (k & PosMask), k >> 31) }
    assert(q == expect)
  }

  test("window-min SQL formulation (the DuckDB oracle's shape) == native, in Spark") {
    // run the oracle's selection logic in Spark itself over sf0.001: per-doc
    // position hashes via the native expression on substrings, then the
    // same frame-min + window-start restriction + distinct
    import org.apache.spark.sql.expressions.Window
    graft.functions.TextFingerprint.register(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(length(col("text")) >= K)
    val hs = df
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - (K - 1))).as("i"))
      .withColumn("h", call_function("text_fingerprint",
        expr(s"substring(text, i, $K)")))
      .withColumn("tkey", col("h") * lit(1L << 31) + (lit(PosMask) - col("i")))
      .withColumn("m", count(lit(1)).over(Window.partitionBy("doc_id")))
    val wspec = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, W - 1)
    val chosen = hs
      .withColumn("sel", min(col("tkey")).over(wspec))
      .filter(col("i") <= greatest(lit(1), col("m") - (W - 1)))
      .select(col("doc_id"),
        (lit(PosMask) - col("sel").bitwiseAND(lit(PosMask))).as("pos"),
        shiftright(col("sel"), 31).as("fp"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val native = SparkEntry.queries("q_winnow_fp")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(chosen == native)
  }
}
