package graft.connector

import graft.table.SnapshotTable
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.types.{StringType, StructType, TimestampType}
import org.apache.spark.util.SerializableConfiguration
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

/** DataSource V2 WRITE path for the snapshot table:
  *
  * {{{
  *   df.write.format("graft-snapshot").mode("append")
  *     .option("numBuckets", "16")        // first commit only; manifest after
  *     .option("runId", "runX")           // default: the query id
  *     .save(dir)
  * }}}
  *
  * The exactly-once protocol lands in the V2 contract's natural places:
  * executors write the run's bucket-partitioned parquet (DATA FIRST — a
  * failed job leaves only unreferenced files), each task ships its
  * per-bucket row/ts stats back as its WriterCommitMessage, and the
  * driver-side [[SnapshotBatchWrite.commit]] merges them into manifest
  * entries and publishes manifest-then-CURRENT through
  * [[SnapshotTable.commitEntries]] — the same optimistic-concurrency
  * claim as the library path, so a racing library committer and a V2
  * writer resolve to one winner.
  *
  * [[RequiresDistributionAndOrdering]] declares the shuffle/sort instead
  * of hand-planning it: Spark clusters by conv_id and sorts
  * (conv_id, turn_idx) within partitions, so every file holds contiguous,
  * order-restored conversations — the stable-order invariant is
  * materialized by the plan Spark itself chose. Entries APPEND
  * (replaceBuckets = false, the streaming-sink merge rule): a bucket
  * accumulates one file-set per commit; compaction folds them back.
  */
final class SnapshotWriteBuilder(dir: String, numBuckets: Int,
    info: LogicalWriteInfo) extends WriteBuilder {

  override def build(): Write = new SnapshotWrite(dir, numBuckets, info)
}

final class SnapshotWrite(dir: String, numBuckets: Int, info: LogicalWriteInfo)
  extends Write with RequiresDistributionAndOrdering {

  require(info.schema().fieldNames.contains("conv_id"),
    s"graft-snapshot writes need a conv_id column; got [${info.schema().fieldNames.mkString(", ")}]")

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.column("conv_id")))

  override def requiredOrdering(): Array[SortOrder] = {
    val cols = Seq("conv_id") ++
      (if (info.schema().fieldNames.contains("turn_idx")) Seq("turn_idx") else Nil)
    cols.map(c => Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray
  }

  override def toBatch: BatchWrite = {
    val runId = Option(info.options().get("runId")).getOrElse(info.queryId())
    new SnapshotBatchWrite(dir, numBuckets, info.schema(), runId)
  }

  /** Streaming sink face (`df.writeStream.format("graft-snapshot")`,
    * append mode): one snapshot per micro-batch, runId = `<queryId>-<epoch>`
    * — so a REPLAYED epoch (restart after a crash between sink commit and
    * checkpoint write) is detected in the manifest lineage and commits
    * nothing, the same exactly-once argument as the foreachBatch sink
    * (`StreamingExtract.snapshotSink`), but in the engine's own
    * StreamingWrite contract. */
  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new SnapshotStreamingWrite(dir, numBuckets, info.schema(), info.queryId())
}

final class SnapshotStreamingWrite(dir: String, numBuckets: Int,
    schema: StructType, queryId: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private def runId(epochId: Long) = s"$queryId-$epochId"
  private def dataPath(epochId: Long) = s"$dir/data/run=${runId(epochId)}"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val spark = SparkSession.active
    val hconf = spark.sessionState.newHadoopConfWithOptions(Map.empty)
    val job = Job.getInstance(hconf)
    val factory = ParquetUtils.prepareWrite(
      spark.sessionState.conf, job, schema,
      new ParquetOptions(Map.empty[String, String], spark.sessionState.conf))
    SnapshotStreamingDataWriterFactory(factory,
      new SerializableConfiguration(job.getConfiguration), dir, queryId,
      numBuckets, schema)
  }

  private val TsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss").withZone(ZoneOffset.UTC)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val table = new SnapshotTable(dir, numBuckets)
    val rid = runId(epochId)
    SnapshotWriterUtil.dropStaging(spark, dataPath(epochId))
    // replay detection via manifest lineage: this epoch already published —
    // the re-run's deterministic file names overwrote the published files
    // with identical bytes, so only the manifest append must be skipped
    if (table.committedEntries(spark).exists(_.runId == rid)) return
    val merged = messages.collect { case m: SnapshotCommitMessage => m.stats }
      .foldLeft(Map.empty[Int, BucketWriteStats]) { (acc, m) =>
        m.foldLeft(acc) { case (a, (b, s)) =>
          a.updated(b, a.get(b).map(_.merge(s)).getOrElse(s))
        }
      }
    val schemaDdl = schema.catalogString
    val entries = merged.toSeq.sortBy(_._1).map { case (b, s) =>
      table.BucketEntry(b, s"${dataPath(epochId)}/bucket=$b", rid,
        s.turns, s.blocksKept, s.blocksDropped, s.charsEmitted,
        TsFmt.format(Instant.ofEpochMilli(s.minTsUs / 1000L)),
        TsFmt.format(Instant.ofEpochMilli(s.maxTsUs / 1000L)), schemaDdl)
    }
    // micro-batches APPEND entries (the streaming merge rule); compaction
    // folds a bucket's accumulated file-sets back to one
    table.commitEntries(spark, entries, replaceBuckets = false)
    ()
  }

  /** Same guard as the batch abort: a replayed epoch that fails AFTER its
    * predecessor already published must not delete the published files
    * (deterministic names mean the replay overwrote them in place). */
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val committed = new SnapshotTable(dir, numBuckets)
      .committedEntries(spark).exists(_.runId == runId(epochId))
    SnapshotWriterUtil.dropStaging(spark, dataPath(epochId))
    if (!committed) {
      val p = new org.apache.hadoop.fs.Path(dataPath(epochId))
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
    ()
  }
}

final case class SnapshotStreamingDataWriterFactory(factory: OutputWriterFactory,
    conf: SerializableConfiguration, dir: String, queryId: String,
    numBuckets: Int, schema: StructType)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new SnapshotDataWriter(factory, conf.value,
      s"$dir/data/run=$queryId-$epochId", numBuckets, schema, partitionId, taskId)
}

/** Per-bucket stats one task observed; merged driver-side at commit. */
final case class BucketWriteStats(turns: Long, blocksKept: Long,
    blocksDropped: Long, charsEmitted: Long, minTsUs: Long, maxTsUs: Long) {
  def merge(o: BucketWriteStats): BucketWriteStats = BucketWriteStats(
    turns + o.turns, blocksKept + o.blocksKept, blocksDropped + o.blocksDropped,
    charsEmitted + o.charsEmitted, math.min(minTsUs, o.minTsUs), math.max(maxTsUs, o.maxTsUs))
}

final case class SnapshotCommitMessage(stats: Map[Int, BucketWriteStats])
  extends WriterCommitMessage

final class SnapshotBatchWrite(dir: String, numBuckets: Int,
    schema: StructType, runId: String) extends BatchWrite {

  private val dataPath = s"$dir/data/run=$runId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val spark = SparkSession.active
    // prepareWrite configures the job conf (row-schema for the write
    // support, codec, summary level) exactly as the built-in parquet sink
    // does; the factory + prepared conf ship to executors.
    val hconf = spark.sessionState.newHadoopConfWithOptions(Map.empty)
    val job = Job.getInstance(hconf)
    val factory = ParquetUtils.prepareWrite(
      spark.sessionState.conf, job, schema,
      new ParquetOptions(Map.empty[String, String], spark.sessionState.conf))
    SnapshotDataWriterFactory(factory,
      new SerializableConfiguration(job.getConfiguration), dataPath, numBuckets, schema)
  }

  private val TsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss").withZone(ZoneOffset.UTC)

  /** DATA is on disk; merge task stats → manifest entries → OCC publish. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    SnapshotWriterUtil.dropStaging(spark, dataPath) // zombie-attempt leftovers
    // batch jobs don't replay themselves: a runId collision is a caller
    // re-using an identity, and silently appending the SAME paths again
    // would make readers double-count the file-set. Fail fast; streaming
    // epochs (which DO legitimately replay) go through the lineage-checked
    // streaming face instead.
    val table = new SnapshotTable(dir, numBuckets)
    if (table.committedEntries(spark).exists(_.runId == runId))
      throw new IllegalStateException(
        s"runId $runId is already committed in $dir — pick a fresh runId " +
          "(batch writes are not replayable; the streaming face handles epoch replays)")
    val merged = messages.collect { case m: SnapshotCommitMessage => m.stats }
      .foldLeft(Map.empty[Int, BucketWriteStats]) { (acc, m) =>
        m.foldLeft(acc) { case (a, (b, s)) =>
          a.updated(b, a.get(b).map(_.merge(s)).getOrElse(s))
        }
      }
    val schemaDdl = schema.catalogString
    val entries = merged.toSeq.sortBy(_._1).map { case (b, s) =>
      table.BucketEntry(b, s"$dataPath/bucket=$b", runId,
        s.turns, s.blocksKept, s.blocksDropped, s.charsEmitted,
        TsFmt.format(Instant.ofEpochMilli(s.minTsUs / 1000L)),
        TsFmt.format(Instant.ofEpochMilli(s.maxTsUs / 1000L)), schemaDdl)
    }
    table.commitEntries(spark, entries, replaceBuckets = false)
  }

  /** Nothing was published (commit is the only manifest writer): remove
    * this run's orphan data so the failed attempt costs no storage — but
    * ONLY if the manifest doesn't already reference this runId (the
    * fail-fast runId-collision path aborts AFTER tasks overwrote the
    * committed files with identical bytes; deleting the dir there would
    * destroy published data). Even a missed abort is safe — unreferenced
    * files are invisible to readers and removeOrphanFiles reclaims them. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val committed = new SnapshotTable(dir, numBuckets)
      .committedEntries(spark).exists(_.runId == runId)
    SnapshotWriterUtil.dropStaging(spark, dataPath)
    if (!committed) {
      val p = new org.apache.hadoop.fs.Path(dataPath)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
    ()
  }
}

private[connector] object SnapshotWriterUtil {
  /** Remove a run's staging dir (crashed-attempt leftovers) before the
    * manifest publish — staged files are never reader-visible, this is
    * pure storage hygiene. */
  def dropStaging(spark: SparkSession, dataPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dataPath/_staging")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }
}

final case class SnapshotDataWriterFactory(factory: OutputWriterFactory,
    conf: SerializableConfiguration, dataPath: String, numBuckets: Int,
    schema: StructType) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SnapshotDataWriter(factory, conf.value, dataPath, numBuckets, schema,
      partitionId, taskId)
}

/** One parquet OutputWriter per BUCKET this task's rows hash into. Rows
  * arrive clustered by conv_id and sorted (conv_id, turn_idx) — each
  * bucket file therefore holds its conversations contiguous and ordered.
  * Stats are tracked inline (single pass, same as the library commit's
  * accumulator) and returned as the commit message.
  *
  * DURABILITY: tasks write to a per-ATTEMPT staging dir and only
  * [[commit]] renames into the manifest-referenced bucket dirs — a failed
  * or zombie attempt never leaves a partial file where readers look
  * (the commit-coordinator denies its commit, abort removes its staging).
  * Final names are DETERMINISTIC per partition (`part-<partitionId>`), so
  * a replayed streaming epoch or a speculative twin re-renaming the same
  * target overwrites with identical bytes instead of accumulating
  * duplicates next to an already-published manifest entry. (Iceberg
  * avoids the rename by manifesting individual files; our manifest is
  * bucket-dir granular, so stage-and-rename is the honest equivalent.) */
final class SnapshotDataWriter(factory: OutputWriterFactory, conf: Configuration,
    dataPath: String, numBuckets: Int, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val ctx = new TaskAttemptContextImpl(conf,
    new TaskAttemptID(new TaskID(new org.apache.hadoop.mapreduce.JobID("graft", 0),
      TaskType.MAP, partitionId), taskId.toInt))
  private val ext = factory.getFileExtension(ctx)
  private val stagingDir = s"$dataPath/_staging/attempt-$partitionId-$taskId"
  private def fs = new org.apache.hadoop.fs.Path(dataPath).getFileSystem(conf)

  private val convIdx = schema.fieldIndex("conv_id")
  private def optIdx(n: String): Int =
    if (schema.fieldNames.contains(n)) schema.fieldIndex(n) else -1
  private val tsIdx = optIdx("ts")
  require(tsIdx < 0 || schema(tsIdx).dataType == TimestampType,
    s"ts must be a timestamp, got ${schema(tsIdx).dataType}")
  private val keptIdx = optIdx("blocksKept")
  private val dropIdx = optIdx("blocksDropped")
  private val charsIdx = optIdx("charsEmitted")

  private val writers = scala.collection.mutable.Map.empty[Int, org.apache.spark.sql.execution.datasources.OutputWriter]
  private val stats = scala.collection.mutable.Map.empty[Int, BucketWriteStats]

  override def write(row: InternalRow): Unit = {
    val conv = row.getUTF8String(convIdx)
    val h = XxHash64Function.hash(conv, StringType, 42L)
    val b = (((h % numBuckets) + numBuckets) % numBuckets).toInt
    val w = writers.getOrElseUpdate(b,
      factory.newInstance(s"$stagingDir/b$b$ext", schema, ctx))
    w.write(row)
    val tsUs = if (tsIdx >= 0 && !row.isNullAt(tsIdx)) row.getLong(tsIdx) else 0L
    val s = BucketWriteStats(1L,
      if (keptIdx >= 0) row.getInt(keptIdx).toLong else 0L,
      if (dropIdx >= 0) row.getInt(dropIdx).toLong else 0L,
      if (charsIdx >= 0) row.getInt(charsIdx).toLong else 0L,
      tsUs, tsUs)
    stats.updateWith(b) { case Some(p) => Some(p.merge(s)); case None => Some(s) }
  }

  override def commit(): WriterCommitMessage = {
    val buckets = writers.keySet.toSeq
    writers.values.foreach(_.close())
    writers.clear()
    val hfs = fs
    buckets.foreach { b =>
      val dest = new org.apache.hadoop.fs.Path(s"$dataPath/bucket=$b/part-$partitionId$ext")
      hfs.mkdirs(dest.getParent)
      hfs.delete(dest, false) // replay/speculative twin: overwrite, not duplicate
      if (!hfs.rename(new org.apache.hadoop.fs.Path(s"$stagingDir/b$b$ext"), dest))
        throw new java.io.IOException(s"failed to publish $dest from staging")
    }
    hfs.delete(new org.apache.hadoop.fs.Path(stagingDir), true)
    SnapshotCommitMessage(stats.toMap)
  }

  override def abort(): Unit = {
    writers.values.foreach(w => try w.close() catch { case _: Throwable => () })
    writers.clear()
    try fs.delete(new org.apache.hadoop.fs.Path(stagingDir), true)
    catch { case _: Throwable => () }
    ()
  }

  override def close(): Unit = {
    writers.values.foreach(w => try w.close() catch { case _: Throwable => () })
    writers.clear()
  }
}
