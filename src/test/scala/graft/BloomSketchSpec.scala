package graft

import graft.functions.{BloomAgg, BloomSketch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Bloom membership sketch (q_dedup_incremental's prefilter): the dedup
  * result is exact ONLY because a bloom has no false negatives and the
  * positives get an exact verify — this suite pins the first property (the
  * oracle pins the composition). */
class BloomSketchSpec extends AnyFunSuite with SparkTestBase {

  private val rnd = new Random(42)
  private val present = Vector.fill(20000)(rnd.nextLong())
  private val absent = Vector.fill(20000)(rnd.nextLong()).filterNot(present.toSet)

  private def build(keys: Seq[Long]): Array[Byte] = {
    val buf = new Array[Byte](BloomSketch.NumBytes)
    keys.foreach(BloomSketch.setBits(buf, _))
    buf
  }

  test("no false negatives: every inserted key probes positive") {
    val blob = build(present)
    assert(present.forall(BloomSketch.contains(blob, _)))
  }

  test("false-positive rate tracks theory at two load points") {
    // fpp = (1 − e^(−kn/m))^k with m = 2^17, k = 7:
    // n = 20k → ≈ 5.2%; n = 13k → ≈ 1.2% (the shard-sizing design point)
    val fpFull = absent.count(BloomSketch.contains(build(present), _))
    assert(fpFull.toDouble / absent.size < 0.07, s"$fpFull/${absent.size}")
    val fpDesign = absent.count(BloomSketch.contains(build(present.take(13000)), _))
    assert(fpDesign.toDouble / absent.size < 0.025, s"$fpDesign/${absent.size}")
  }

  test("merge is the bitwise OR of the parts: any split builds the same blob") {
    val whole = build(present)
    val agg = new BloomAgg
    val parts = present.grouped(3000).map(g => build(g)).toVector
    val merged = parts.reduce((a, b) => agg.merge(a, b))
    assert(java.util.Arrays.equals(merged, whole))
  }

  test("Spark faces: udaf build + codegen probe agree with the driver-side blob") {
    import testImplicits._
    val keys = present.take(5000)
    val df = keys.toDF("key")
    val blob = df.agg(BloomSketch.agg(col("key"))).collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(blob, build(keys)),
      "distributed udaf build == sequential driver build")
    val probes = (keys.take(500) ++ absent.take(500)).toDF("key")
      .crossJoin(df.agg(BloomSketch.agg(col("key")).as("bloom")))
    val got = probes
      .withColumn("maybe", BloomSketch.maybe(spark, col("bloom"), col("key")))
      .select("key", "maybe").as[(Long, Boolean)].collect().toMap
    keys.take(500).foreach(k => assert(got(k), s"false negative via Spark: $k"))
    val driver = (keys.take(500) ++ absent.take(500))
      .map(k => k -> BloomSketch.contains(blob, k)).toMap
    assert(got == driver, "codegen probe == interpreted/driver probe")
  }
}
