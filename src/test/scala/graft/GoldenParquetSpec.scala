package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Keeps the committed golden-parquet oracle fixtures honest: every `sbt
  * test` re-derives each fixture from the spec-derived generator goldens
  * (the same pure code path GoldenDump writes from) and asserts the
  * committed artifact matches row-for-row. A drift here means someone
  * changed the generator/spec without re-running GoldenDump — exactly the
  * staleness that would silently break the driver's x_* hash oracles. */
class GoldenParquetSpec extends AnyFunSuite with SparkTestBase {

  private def canonRows(df: DataFrame): Seq[String] = {
    val names = df.schema.fieldNames.sorted.toIndexedSeq
    df.select(names.map(col): _*).collect()
      .map(_.toSeq.map(v => if (v == null) "NULL" else v.toString).mkString("|"))
      .sorted.toSeq
  }

  test("committed golden parquets equal freshly derived goldens") {
    val dir = SparkEntry.GoldenDir
    graft.tools.GoldenDump.goldenFrames(spark).foreach { case (name, fresh) =>
      val path = s"$dir/$name.parquet"
      assert(Files.exists(Paths.get(path)),
        s"missing $path — run `sbt \"runMain graft.tools.GoldenDump\"` and commit")
      val committed = spark.read.parquet(path)
      assert(committed.schema.fieldNames.sorted.toSeq ==
        fresh.schema.fieldNames.sorted.toSeq, s"$name schema drift")
      assert(canonRows(committed) == canonRows(fresh), s"$name rows drift")
    }
  }

  test("golden fixtures cover the query outputs they oracle (pipeline side)") {
    // The driver does this compare in DuckDB; this is the sbt-side twin for
    // the flagship fixture: the ACTUAL x_extract_flagship query output must
    // equal the committed golden parquet (same canonicalization).
    val q = SparkEntry.queries("x_extract_flagship")(spark, "unused")
    val golden = spark.read.parquet(s"${SparkEntry.GoldenDir}/x_extract_flagship.parquet")
    assert(canonRows(q) == canonRows(golden), "flagship query vs golden parquet")
  }

  test("media features query (real encode→decode round-trip) equals the " +
    "source-value-derived golden") {
    // The golden computes expected luma/RMS from the synthesis PRNG's
    // SOURCE pixel/sample values (GoldenDump never calls BinaryMedia), so
    // equality here proves the encoder and decoder round-trip bit-exactly.
    val q = SparkEntry.queries("x_media_features")(spark, "unused")
    val golden = spark.read.parquet(s"${SparkEntry.GoldenDir}/x_media_features.parquet")
    assert(canonRows(q) == canonRows(golden), "media query vs golden parquet")
  }
}
