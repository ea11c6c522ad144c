package graft

import graft.model.{ExtractedTurn, Span}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Catalog plugin suite: snapshot tables as first-class catalog tables
  * (`spark.table("graft.t")`, SQL `VERSION AS OF`), and the headline scale
  * feature the catalog unlocks — STORAGE-PARTITIONED JOINS: two snapshot
  * tables bucketed by the same conv_id layout join with ZERO shuffle
  * exchange, because their scans report `KeyGroupedPartitioning(bucket(n,
  * conv_id))` and the catalog's V2 `bucket` function proves the layouts
  * identical. At 100 TB that turns the table-to-table join from a
  * full-corpus shuffle into per-bucket merge IO.
  */
class GraftCatalogSpec extends AnyFunSuite with SparkTestBase {

  private val base = 1767225600000L

  private def mk(conv: String, idx: Int, tag: String): ExtractedTurn = {
    val text = s"$tag $conv#$idx"
    ExtractedTurn(conv, idx, "user", "html", new Timestamp(base + idx * 1000L),
      text, Seq(Span(0, 0, text.length, "p", text)), 1, 0, text.length, 1.0)
  }

  /** Warehouse with two co-bucketed tables (same conv_ids, numBuckets=4). */
  private lazy val warehouse: String = {
    import testImplicits._
    val wh = Files.createTempDirectory("graft_wh").toString
    val t1 = (0 until 60).map(i => mk(s"c$i", 0, "left"))
    val t2 = (0 until 60).map(i => mk(s"c$i", 0, "right"))
    t1.toDS().toDF().write.format("graft-snapshot").mode("append")
      .option("numBuckets", "4").option("runId", "w1").save(s"$wh/t1")
    t2.toDS().toDF().write.format("graft-snapshot").mode("append")
      .option("numBuckets", "4").option("runId", "w1").save(s"$wh/t2")
    wh
  }

  private def catalogSession(spj: Boolean): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.connector.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", spj.toString)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeExec] =
    df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }

  test("catalog resolution: spark.table, SQL, listing, VERSION AS OF") {
    val s = catalogSession(spj = false)
    assert(s.table("graft.t1").count() == 60L)
    assert(s.sql("SELECT text FROM graft.t2 WHERE conv_id = 'c7'")
      .collect().map(_.getString(0)).toSeq == Seq("right c7#0"))
    assert(s.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).toSet == Set("t1", "t2"))
    // time travel through SQL: snapshot 0 is the only one → same rows
    assert(s.sql("SELECT count(*) FROM graft.t1 VERSION AS OF 0")
      .collect().head.getLong(0) == 60L)
  }

  test("storage-partitioned join: co-bucketed tables join with ZERO shuffle") {
    val s = catalogSession(spj = true)
    val joined = s.table("graft.t1").alias("a")
      .join(s.table("graft.t2").alias("b"), "conv_id")
      .select(col("conv_id"), col("a.text").as("lt"), col("b.text").as("rt"))
    assert(shuffles(joined).isEmpty,
      s"expected a shuffle-free storage-partitioned join:\n${joined.queryExecution.executedPlan}")
    val rows = joined.collect()
    assert(rows.length == 60)
    assert(rows.forall(r => r.getString(1).startsWith("left") &&
      r.getString(2).startsWith("right")))

    // control: identical join WITHOUT v2 bucketing shuffles both sides
    val s2 = catalogSession(spj = false)
    val control = s2.table("graft.t1")
      .join(s2.table("graft.t2"), "conv_id")
    assert(shuffles(control).nonEmpty)
    assert(control.count() == 60L)
  }

  test("CREATE TABLE then INSERT INTO resolves and commits snapshot 0") {
    val s = catalogSession(spj = false)
    s.sql("CREATE TABLE graft.fresh (conv_id STRING, ts TIMESTAMP, note STRING) " +
      "USING `graft-snapshot` TBLPROPERTIES ('numBuckets'='4')")
    assert(s.table("graft.fresh").count() == 0L) // resolvable before any commit
    s.sql("INSERT INTO graft.fresh VALUES ('c1', TIMESTAMP'2026-01-01 00:00:00', 'hello')")
    val rows = s.sql("SELECT conv_id, note FROM graft.fresh").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("c1", "hello")))
    assert(s.sql("SELECT count(*) FROM graft.fresh").collect().head.getLong(0) == 1L)
    s.sql("DROP TABLE graft.fresh")
    assert(!s.catalog.tableExists("graft.fresh"))
  }

  test("a delete-emptied snapshot still loads as an empty, appendable table") {
    import testImplicits._
    val s = catalogSession(spj = false)
    val dir = s"$warehouse/t_empty"
    (0 until 3).map(i => mk(s"e$i", 0, "x")).toDS().toDF()
      .write.format("graft-snapshot").mode("append")
      .option("numBuckets", "4").option("runId", "w1").save(dir)
    val table = graft.table.SnapshotTable.open(dir)
    table.deleteConversations(spark, (0 until 3).map(i => s"e$i"), "del1")
    assert(s.table("graft.t_empty").count() == 0L)
    // and it accepts a fresh append afterwards
    Seq(mk("e_new", 0, "y")).toDS().toDF()
      .write.format("graft-snapshot").mode("append")
      .option("runId", "w2").save(dir)
    assert(s.table("graft.t_empty").count() == 1L)
  }

  test("SQL DELETE FROM: conv_id predicates map to bucket-targeted row-level delete") {
    import testImplicits._
    val s = catalogSession(spj = false)
    val dir = s"$warehouse/t_del"
    (0 until 10).map(i => mk(s"d$i", 0, "x")).toDS().toDF()
      .write.format("graft-snapshot").mode("append")
      .option("numBuckets", "4").option("runId", "w1").save(dir)

    s.sql("DELETE FROM graft.t_del WHERE conv_id = 'd3'")
    assert(s.table("graft.t_del").count() == 9L)
    assert(s.sql("SELECT * FROM graft.t_del WHERE conv_id = 'd3'").count() == 0L)
    s.sql("DELETE FROM graft.t_del WHERE conv_id IN ('d4', 'd5')")
    assert(s.table("graft.t_del").count() == 7L)
    // non-key predicate: executed as a copy-on-write group rewrite (no
    // longer declined — SupportsRowLevelOperations). Matches nothing here,
    // so the table rewrites to the same 7 rows.
    s.sql("DELETE FROM graft.t_del WHERE turn_idx = 5")
    assert(s.table("graft.t_del").count() == 7L)
    // deleting a conversation that doesn't exist is a no-op
    s.sql("DELETE FROM graft.t_del WHERE conv_id = 'nope'")
    assert(s.table("graft.t_del").count() == 7L)
  }

  test("SQL UPDATE / MERGE INTO / non-key DELETE: copy-on-write bucket rewrite") {
    import testImplicits._
    val s = catalogSession(spj = false)
    val dir = s"$warehouse/t_cow"
    val seed = (0 until 8).flatMap(i => Seq(mk(s"u$i", 0, "a"), mk(s"u$i", 1, "b")))
    seed.toDS().toDF().write.format("graft-snapshot").mode("append")
      .option("numBuckets", "4").option("runId", "w1").save(dir)

    val table = graft.table.SnapshotTable.open(dir)
    val before = table.committedEntries(spark).map(e => e.bucket -> (e.path, e.runId)).toMap

    // key-pruned UPDATE: rewrites ONLY the bucket owning u3
    s.sql("UPDATE graft.t_cow SET text = 'patched' WHERE conv_id = 'u3' AND turn_idx = 1")
    assert(s.table("graft.t_cow").count() == 16L)
    assert(s.sql("SELECT text FROM graft.t_cow WHERE conv_id='u3' AND turn_idx=1")
      .collect().map(_.getString(0)).toSeq == Seq("patched"))
    assert(s.sql("SELECT text FROM graft.t_cow WHERE conv_id='u3' AND turn_idx=0")
      .collect().head.getString(0).startsWith("a"))
    val after = table.committedEntries(spark).map(e => e.bucket -> (e.path, e.runId)).toMap
    val hot = table.bucketOfId("u3")
    assert(after(hot) != before(hot), "the scanned bucket must be rewritten")
    (before.keySet - hot).foreach { b =>
      assert(after(b) == before(b), s"untouched bucket $b must keep its file-set")
    }
    // the pre-operation snapshot stays time-travelable
    assert(s.sql("SELECT text FROM graft.t_cow VERSION AS OF 0 WHERE conv_id='u3' AND turn_idx=1")
      .collect().head.getString(0).startsWith("b"))

    // non-key UPDATE: full-table copy-on-write, all rows preserved
    s.sql("UPDATE graft.t_cow SET role = 'assistant' WHERE turn_idx = 1")
    assert(s.sql("SELECT count(*) FROM graft.t_cow WHERE role = 'assistant'")
      .collect().head.getLong(0) == 8L)
    assert(s.table("graft.t_cow").count() == 16L)

    // non-key DELETE: rows actually drop
    s.sql("DELETE FROM graft.t_cow WHERE turn_idx = 1")
    assert(s.table("graft.t_cow").count() == 8L)

    // MERGE INTO: update matched rows, insert brand-new conversations
    s.createDataFrame(Seq(mk("u0", 0, "merged"), mk("zz1", 0, "fresh")))
      .createOrReplaceTempView("cow_src")
    s.sql(
      """MERGE INTO graft.t_cow t USING cow_src v
        |ON t.conv_id = v.conv_id AND t.turn_idx = v.turn_idx
        |WHEN MATCHED THEN UPDATE SET t.text = v.text
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(s.table("graft.t_cow").count() == 9L)
    assert(s.sql("SELECT text FROM graft.t_cow WHERE conv_id='u0'")
      .collect().head.getString(0).startsWith("merged"))
    assert(s.sql("SELECT text FROM graft.t_cow WHERE conv_id='zz1'")
      .collect().head.getString(0).startsWith("fresh"))
  }

  test("INSERT OVERWRITE / mode(overwrite): snapshot becomes exactly the new data, history time-travels") {
    import testImplicits._
    val s = catalogSession(spj = false)
    val dir = s"$warehouse/t_ovw"
    (0 until 10).map(i => mk(s"o$i", 0, "old")).toDS().toDF()
      .write.format("graft-snapshot").mode("append")
      .option("numBuckets", "4").option("runId", "w1").save(dir)
    (0 until 3).map(i => mk(s"n$i", 0, "new")).toDS().toDF()
      .write.format("graft-snapshot").mode("overwrite")
      .option("runId", "w2").save(dir)

    assert(s.table("graft.t_ovw").count() == 3L)
    assert(s.table("graft.t_ovw").select("text").collect()
      .forall(_.getString(0).startsWith("new")))
    // the pre-overwrite snapshot remains time-travel-able
    assert(s.sql("SELECT count(*) FROM graft.t_ovw VERSION AS OF 0")
      .collect().head.getLong(0) == 10L)
  }

  test("grouped scan mode keeps per-bucket partition keys consistent with the data") {
    val s = catalogSession(spj = true)
    // groupBy conv_id ON TOP of the keyed scan: Spark may also use the
    // partitioning for aggregation; results must be exact either way
    val agg = s.table("graft.t1").groupBy("conv_id").count()
    assert(agg.collect().map(_.getLong(1)).forall(_ == 1L))
  }
}
