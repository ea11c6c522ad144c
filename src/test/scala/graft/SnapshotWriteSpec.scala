package graft

import graft.model.{ExtractedTurn, Span}
import graft.table.SnapshotTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** DataSource V2 WRITE path: df.write.format("graft-snapshot") must create
  * real snapshots — data first, per-task stats merged into manifest entries,
  * OCC manifest-then-CURRENT publish — interoperable in both directions
  * with the library path (SnapshotTable), with Spark itself planning the
  * clustering + in-partition (conv_id, turn_idx) sort the table's
  * stable-order invariant needs.
  */
class SnapshotWriteSpec extends AnyFunSuite with SparkTestBase {

  private val base = 1767225600000L // 2026-01-01T00:00:00Z

  private def mk(conv: String, idx: Int): ExtractedTurn = {
    val text = s"written $conv#$idx"
    ExtractedTurn(conv, idx, "user", "html", new Timestamp(base + idx * 1000L),
      text, Seq(Span(0, 0, text.length, "p", text)), 2, 1, text.length, 1.0)
  }

  private def write(dir: String, rows: Seq[ExtractedTurn], runId: String): Unit = {
    import testImplicits._
    rows.toDS().toDF().write.format("graft-snapshot").mode("append")
      .option("numBuckets", "4").option("runId", runId).save(dir)
  }

  private def key(df: DataFrame): Set[(String, Int, String)] = {
    import testImplicits._
    df.select(col("conv_id"), col("turn_idx"), col("text"))
      .as[(String, Int, String)].collect().toSet
  }

  test("first V2 write creates snapshot 0; library open reads it back exactly") {
    val dir = Files.createTempDirectory("v2write").toString
    val rows = (0 until 30).flatMap(i => Seq(mk(s"c$i", 0), mk(s"c$i", 1)))
    write(dir, rows, "w1")

    val table = SnapshotTable.open(dir) // bucket count recovered from manifest
    assert(table.numBuckets == 4)
    assert(table.currentSnapshotId.contains(0L))
    assert(key(table.read(spark)) == rows.map(t => (t.conv_id, t.turn_idx, t.text)).toSet)

    // manifest stats came from the tasks' inline counters, not a rescan
    val st = table.stats(spark).collect()
    assert(st.map(_.getLong(2)).sum == 60L) // turns
    assert(st.map(_.getLong(3)).sum == 120L) // blocksKept = 2/turn
  }

  test("every written file is internally ordered by (conv_id, turn_idx)") {
    import testImplicits._
    val dir = Files.createTempDirectory("v2write_ord").toString
    // deliberately unsorted, multi-partition input
    val rows = scala.util.Random.shuffle(
      (0 until 40).flatMap(i => (0 until 3).map(j => mk(s"c$i", j))).toList)
    rows.toDS().repartition(8).toDF().write.format("graft-snapshot")
      .mode("append").option("numBuckets", "4").option("runId", "w1").save(dir)

    val table = SnapshotTable.open(dir)
    val files = table.read(spark).inputFiles
    assert(files.nonEmpty)
    files.foreach { f =>
      val inFile = spark.read.parquet(f).select("conv_id", "turn_idx")
        .as[(String, Int)].collect().toSeq
      assert(inFile == inFile.sortBy(identity),
        s"file $f is not (conv_id, turn_idx)-ordered")
    }
    assert(key(table.read(spark)) == rows.map(t => (t.conv_id, t.turn_idx, t.text)).toSet)
  }

  test("appends chain snapshots; readChanges sees exactly the delta; count(*) pushdown tracks") {
    val dir = Files.createTempDirectory("v2write_app").toString
    val a = (0 until 10).map(i => mk(s"c$i", 0))
    val b = (0 until 4).map(i => mk(s"late$i", 0))
    write(dir, a, "w1")
    write(dir, b, "w2")

    val table = SnapshotTable.open(dir)
    assert(table.currentSnapshotId.contains(1L))
    assert(key(table.readChanges(spark, 0L, 1L)) ==
      b.map(t => (t.conv_id, t.turn_idx, t.text)).toSet)

    val count = spark.read.format("graft-snapshot").load(dir).groupBy().count()
    assert(count.collect().map(_.getLong(0)).toSeq == Seq(14L))
  }

  test("interop: library commit + V2 append + compact stay one consistent table") {
    import testImplicits._
    val dir = Files.createTempDirectory("v2write_mix").toString
    val table = new SnapshotTable(dir, numBuckets = 4)
    val a = (0 until 8).map(i => mk(s"lib$i", 0))
    table.commit(spark, a.toDS(), "libRun")

    val b = (0 until 8).map(i => mk(s"v2_$i", 0))
    write(dir, b, "v2Run")

    val all = (a ++ b).map(t => (t.conv_id, t.turn_idx, t.text)).toSet
    assert(key(table.read(spark)) == all)

    val compacted = table.compact(spark, "compactRun")
    assert(key(table.readAt(spark, compacted)) == all)
    // V2 read face agrees after the rewrite
    assert(key(spark.read.format("graft-snapshot").load(dir)) == all)
  }

  test("streaming sink: one snapshot per micro-batch, replayed epochs commit nothing") {
    import testImplicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("v2write_stream").toString
    val mem = MemoryStream[ExtractedTurn]
    val q = mem.toDS().toDF().writeStream.format("graft-snapshot")
      .option("numBuckets", "4")
      .option("checkpointLocation", Files.createTempDirectory("v2chk").toString)
      .outputMode("append").start(dir)
    try {
      mem.addData((0 until 6).map(i => mk(s"s$i", 0)): _*)
      q.processAllAvailable()
      val table = SnapshotTable.open(dir)
      assert(table.currentSnapshotId.contains(0L))
      assert(table.read(spark).count() == 6L)

      mem.addData(mk("s_late", 1))
      q.processAllAvailable()
      assert(table.currentSnapshotId.contains(1L))
      assert(key(table.readChanges(spark, 0L, 1L)) == Set(("s_late", 1, "written s_late#1")))
    } finally q.stop()

    // replay idempotence: re-committing an ALREADY-PUBLISHED epoch's
    // messages must be a manifest no-op (crash between sink commit and
    // checkpoint write ⇒ the restarted query re-runs the epoch)
    val table = SnapshotTable.open(dir)
    val before = table.currentSnapshotId
    val write = new graft.connector.SnapshotStreamingWrite(dir, 4,
      org.apache.spark.sql.Encoders.product[ExtractedTurn].schema,
      queryId = table.committedEntries(spark).head.runId.stripSuffix("-0"))
    write.commit(0L, Array(graft.connector.SnapshotCommitMessage(0,
      Map(0 -> graft.connector.BucketWriteStats(99L, 0L, 0L, 0L, 0L, 0L)), Map.empty)))
    assert(table.currentSnapshotId == before, "replayed epoch must not advance the snapshot")
  }

  test("attempt durability: staged writes, deterministic names, runId-collision fail-fast") {
    val dir = Files.createTempDirectory("v2write_idem").toString
    val rows = (0 until 12).map(i => mk(s"c$i", 0))
    write(dir, rows, "w1")
    val table = SnapshotTable.open(dir)
    val before = table.read(spark).inputFiles.sorted.toSeq
    assert(before.nonEmpty && before.forall(!_.contains("_staging")))
    // names are partition-deterministic (no task-attempt suffix): a
    // replayed/speculative twin RENAMING the same target overwrites
    // byte-identical content instead of accumulating a duplicate
    assert(before.forall(_.matches(".*/part-\\d+\\.[a-z0-9.]*parquet$")), before.toString)
    // no staging residue anywhere under the run dir
    assert(!Files.exists(java.nio.file.Paths.get(dir, "data", "run=w1", "_staging")))

    // a BATCH re-run with the same runId is an identity collision: appending
    // the same paths again would double-count — must fail fast, and the
    // table must be untouched (files overwritten in place are byte-identical)
    val ex = intercept[Exception] { write(dir, rows, "w1") }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("already committed")), msgs(ex).toString)
    val after = SnapshotTable.open(dir)
    assert(after.currentSnapshotId.contains(0L))
    assert(after.read(spark).inputFiles.sorted.toSeq == before)
    assert(after.read(spark).count() == 12L)
  }

  test("generic schema: a non-ExtractedTurn dataframe writes to a fresh table and reads back") {
    import testImplicits._
    val dir = Files.createTempDirectory("v2write_gen").toString
    val df = Seq(("convA", new Timestamp(base), "payload-1"),
      ("convB", new Timestamp(base + 1000L), "payload-2"))
      .toDF("conv_id", "ts", "payload")
    df.write.format("graft-snapshot").mode("append")
      .option("numBuckets", "4").option("runId", "g1").save(dir)
    val back = spark.read.format("graft-snapshot").load(dir)
    assert(back.schema.fieldNames.toSeq == Seq("conv_id", "ts", "payload"))
    assert(back.select("conv_id", "payload").as[(String, String)].collect().toSet ==
      Set(("convA", "payload-1"), ("convB", "payload-2")))
    // manifest stats: turns counted, absent blocks/chars columns are zero
    val table = SnapshotTable.open(dir)
    assert(table.stats(spark).collect().map(_.getLong(2)).sum == 2L)
  }

  test("a crashed prior attempt's stale bucket files are cleared by the driver publish") {
    val dir = Files.createTempDirectory("v2write_stale").toString
    // fabricate a crashed attempt of run w1: a renamed file from a WIDER
    // partition layout sits in a bucket dir, unreferenced by any manifest
    val staleDir = java.nio.file.Paths.get(dir, "data", "run=w1", "bucket=2")
    Files.createDirectories(staleDir)
    Files.writeString(staleDir.resolve("part-99.snappy.parquet"), "GARBAGE")
    val staleStaging = java.nio.file.Paths.get(dir, "data", "run=w1", "_staging", "attempt-7-7")
    Files.createDirectories(staleStaging)

    write(dir, (0 until 12).map(i => mk(s"c$i", 0)), "w1")
    // the stale file and staging are gone; the table reads exactly 12 rows
    assert(!Files.exists(staleDir.resolve("part-99.snappy.parquet")))
    assert(!Files.exists(java.nio.file.Paths.get(dir, "data", "run=w1", "_staging")))
    assert(SnapshotTable.open(dir).read(spark).count() == 12L)
  }

  test("replay lineage survives compaction: a replayed epoch after compact is still a no-op") {
    import testImplicits._
    val dir = Files.createTempDirectory("v2write_compact").toString
    write(dir, (0 until 8).map(i => mk(s"c$i", 0)), "qidX-0") // "epoch 0"
    val table = SnapshotTable.open(dir)
    table.compact(spark, "compactRun") // CURRENT's entries now carry compactRun
    val before = table.currentSnapshotId

    val write0 = new graft.connector.SnapshotStreamingWrite(dir, 4,
      org.apache.spark.sql.Encoders.product[ExtractedTurn].schema, queryId = "qidX")
    write0.commit(0L, Array(graft.connector.SnapshotCommitMessage(0,
      Map(0 -> graft.connector.BucketWriteStats(99L, 0L, 0L, 0L, 0L, 0L)), Map.empty)))
    assert(table.currentSnapshotId == before,
      "epoch replay after compaction must find its lineage in the retained manifests")
    assert(table.read(spark).count() == 8L)
  }

  test("snapshot GC interop: expireSnapshots reclaims V2-written file-sets that only expired manifests reference") {
    import testImplicits._
    val dir = Files.createTempDirectory("v2write_gc").toString
    write(dir, (0 until 6).map(i => mk(s"g$i", 0)), "w1") // snap 0
    // overwrite: snap 1 references ONLY w2's files; w1's survive for time travel
    (0 until 2).map(i => mk(s"h$i", 0)).toDS().toDF()
      .write.format("graft-snapshot").mode("overwrite")
      .option("runId", "w2").save(dir)
    val table = SnapshotTable.open(dir)
    val w1Files = java.nio.file.Paths.get(dir, "data", "run=w1")
    assert(Files.exists(w1Files)) // still time-travel-able pre-GC
    assert(table.readAt(spark, 0L).count() == 6L)

    val deleted = table.expireSnapshots(spark, keepLast = 1)
    assert(deleted.nonEmpty && deleted.forall(_.contains("run=w1")), deleted.toString)
    assert(table.read(spark).count() == 2L) // live snapshot untouched
    assert(table.snapshotIds == Seq(1L))
  }

  test("removeOrphanFiles collects a crashed V2 writer's run dir including its _staging tree") {
    val dir = Files.createTempDirectory("v2write_orphan").toString
    write(dir, (0 until 4).map(i => mk(s"k$i", 0)), "w1")
    // a crashed attempt: unreferenced run dir with bucket data AND a
    // non-empty staging subtree (this used to make the residue sweep throw)
    val crashed = java.nio.file.Paths.get(dir, "data", "run=crashed")
    Files.createDirectories(crashed.resolve("bucket=1"))
    Files.writeString(crashed.resolve("bucket=1").resolve("part-0.parquet"), "x")
    Files.createDirectories(crashed.resolve("_staging").resolve("attempt-3-3"))
    Files.writeString(crashed.resolve("_staging").resolve("attempt-3-3").resolve("b1.parquet"), "y")

    val table = SnapshotTable.open(dir)
    val deleted = table.removeOrphanFiles(spark, olderThanMillis = -1000L) // everything is "old"
    assert(deleted.exists(_.contains("run=crashed")), deleted.toString)
    assert(!Files.exists(crashed))
    assert(table.read(spark).count() == 4L) // committed data untouched
  }

  test("manifest ts stats from the write match the data (ts-range pruning works on V2-written sets)") {
    val dir = Files.createTempDirectory("v2write_ts").toString
    write(dir, Seq(mk("early", 0)), "w1") // ts = base
    write(dir, Seq(mk("late", 3600)), "w2") // ts = base + 1h
    val df = spark.read.format("graft-snapshot").load(dir)
      .where(col("ts") >= new Timestamp(base + 3000 * 1000L))
    assert(key(df) == Set(("late", 3600, "written late#3600")))
    val scan = df.queryExecution.sparkPlan
      .collectFirst { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan }
      .get.asInstanceOf[graft.connector.SnapshotScan]
    assert(scan.keptEntries.forall(_.path.contains("run=w2")), scan.keptEntries.toString)
  }
}
