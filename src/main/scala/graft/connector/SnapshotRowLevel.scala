package graft.connector

import graft.table.SnapshotTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, SortDirection, SortOrder}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Group-based (copy-on-write) row-level operations for the snapshot
  * table — the face behind SQL `UPDATE`, `MERGE INTO`, and non-key
  * `DELETE FROM` (key-only deletes keep taking the cheaper metadata path
  * via `SupportsDelete`; Spark's `OptimizeMetadataOnlyDeleteFromTable`
  * folds them back automatically).
  *
  * The REPLACEMENT GROUP is a bucket: Spark reads every row of the
  * buckets that might contain matches (through [[SnapshotCowScan]]),
  * applies the assignments/merge actions, and the write commits the
  * rewritten rows as a snapshot that replaces EXACTLY the scanned
  * buckets — untouched buckets keep their existing file-sets
  * byte-identical, and the pre-operation snapshot stays time-travelable.
  *
  * Correctness invariant (the one thing a COW scan must get right): the
  * pushed command condition is used for BUCKET-granular pruning ONLY.
  * It must never reach the parquet reader as a row filter and never
  * prune file-sets WITHIN a kept bucket — the rewrite plan preserves the
  * non-matching rows of matched groups, so dropping any row of a scanned
  * bucket would silently delete it. We therefore scan all file-sets of
  * every kept bucket with zero pushed filters, and replace exactly the
  * bucket ids we scanned (read-set == replace-set by construction).
  *
  * Rows the operation routes to UNSCANNED buckets (a `MERGE … WHEN NOT
  * MATCHED THEN INSERT` landing in a bucket that had no matches) APPEND
  * alongside that bucket's existing entries — same manifest-merge rule as
  * the streaming sink; compaction folds them back to one file-set.
  *
  * Reference precedent: reprocess-one-conversation after a bad kernel
  * deploy is the first maintenance flow the prototype's operators reach
  * for (the respawn/reprocess loop in
  * `/root/reference/src/controller/cmnd9processer.py:30-43` re-runs
  * individual work items); here that flow is one SQL `UPDATE … WHERE
  * conv_id = …` rewriting one bucket crash-safely.
  */
final class SnapshotRowLevelOperation(dir: String, entries: Seq[ManifestEntry],
    numBuckets: Int, tableSchema: StructType, cmd: RowLevelOperation.Command,
    private[connector] val baseSnapshotId: Long)
  extends RowLevelOperation {

  /** The scan instance Spark planned for this operation. Scan and write
    * come from the SAME operation instance (RowLevelOperationTable
    * delegates both), which is what lets the write's commit replace
    * exactly the buckets the scan read. */
  @volatile private[connector] var configuredScan: SnapshotCowScan = _

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String = s"graft-snapshot COW $cmd on $dir"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotCowScanBuilder(this, dir, entries, tableSchema, numBuckets)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new SnapshotCowWrite(SnapshotRowLevelOperation.this, dir, numBuckets, cmd, info)
    }
}

/** Accepts pushed filters and column pruning like the plain scan builder,
  * but everything stays residual AND row-invisible: filters only feed the
  * bucket-granular prune in the scan. */
final class SnapshotCowScanBuilder(op: SnapshotRowLevelOperation, dir: String,
    entries: Seq[ManifestEntry], fullSchema: StructType, numBuckets: Int)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // all residual: pruning is bucket-set-level, rows re-evaluated
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val scan = new SnapshotCowScan(dir, entries, fullSchema, required, pushed, numBuckets)
    op.configuredScan = scan
    scan
  }
}

/** The COW read: full rows of every file-set of every bucket that might
  * hold a matching row. Runtime group filtering (Spark's
  * RowLevelOperationRuntimeGroupFiltering) narrows the bucket set further
  * at execution for conditions that only resolve at runtime (MERGE
  * sources, subqueries) via the conv_id runtime filter. */
final class SnapshotCowScan(dir: String, entries: Seq[ManifestEntry],
    dataSchema: StructType, required: StructType, pushed: Array[Filter],
    numBuckets: Int)
  extends Scan with Batch with SupportsRuntimeFiltering {

  private def spark = SparkSession.active

  private var runtimeFilters: Array[Filter] = Array.empty

  /** Bucket ids that MIGHT own a row matching the condition under the
    * current (static + runtime) filters — the groups this operation reads
    * and the write replaces. `None`-style "no conv filter" keeps all. */
  private def candidateBucketIds(filters: Array[Filter]): Set[Int] = {
    val convSets = filters.toSeq.collect {
      case EqualTo(a, v: String) if a.equalsIgnoreCase("conv_id")       => Set(v)
      case EqualNullSafe(a, v: String) if a.equalsIgnoreCase("conv_id") => Set(v)
      case In(a, vs) if a.equalsIgnoreCase("conv_id") &&
          vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        vs.map(_.asInstanceOf[String]).toSet
    }
    val keepConvs = convSets.reduceOption(_ intersect _)

    def ms(v: Any): Option[Long] = v match {
      case t: java.sql.Timestamp => Some(t.getTime)
      case i: java.time.Instant  => Some(i.toEpochMilli)
      case _                     => None
    }
    var lo = Long.MinValue
    var hi = Long.MaxValue
    filters.foreach {
      case GreaterThan(a, v) if a.equalsIgnoreCase("ts")        => ms(v).foreach(m => lo = math.max(lo, m))
      case GreaterThanOrEqual(a, v) if a.equalsIgnoreCase("ts") => ms(v).foreach(m => lo = math.max(lo, m))
      case LessThan(a, v) if a.equalsIgnoreCase("ts")           => ms(v).foreach(m => hi = math.min(hi, m))
      case LessThanOrEqual(a, v) if a.equalsIgnoreCase("ts")    => ms(v).foreach(m => hi = math.min(hi, m))
      case _                                                    => ()
    }

    val twins = scala.collection.mutable.Map.empty[Int, SnapshotTable]
    def bucketOf(c: String, nb: Int): Int =
      twins.getOrElseUpdate(nb, new SnapshotTable(dir, nb)).bucketOfId(c)
    // a bucket id survives iff SOME of its entries could own a candidate
    // conversation (hashed under the entry's OWN layout) AND SOME of its
    // entries overlap the ts range — exclusion is only safe when it holds
    // for the whole bucket, because replacement is bucket-granular
    entries.groupBy(_.bucket).collect { case (b, es)
      if es.exists { e =>
        val nb = if (e.numBuckets > 0) e.numBuckets else numBuckets
        keepConvs.forall(_.exists(c => bucketOf(c, nb) == b))
      } && es.exists(e => e.maxTsMs >= lo && e.minTsMs <= hi) => b
    }.toSet
  }

  /** Final bucket set at execution time: recorded when Spark plans the
    * input partitions (after runtime group filtering has landed), read by
    * the write's commit. */
  @volatile private[connector] var scannedBuckets: Set[Int] = _

  private def keptEntries: Seq[ManifestEntry] = {
    val ids = candidateBucketIds(pushed ++ runtimeFilters)
    entries.filter(e => ids(e.bucket))
  }

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("conv_id"))

  override def filter(filters: Array[Filter]): Unit = {
    runtimeFilters = filters
  }

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String = {
    val ids = candidateBucketIds(pushed ++ runtimeFilters).toSeq.sorted
    s"graft-snapshot COW scan $dir buckets=${ids.mkString("[", ",", "]")} " +
      s"(bucket-granular pruning only; PushedFilters never row-filter)"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // MOR gate at EXECUTION time (analysis builds this scan eagerly for
    // every DELETE, even ones the metadata/MOR deleteWhere lane takes):
    // a COW rewrite over buckets with pending merge-on-read deletes
    // would re-materialize the deleted rows
    if (entries.exists(_.kind == "delete"))
      throw new IllegalStateException(
        s"$dir has pending merge-on-read deletes — cannot run a " +
          "copy-on-write row-level operation over them; fold them first " +
          "(SnapshotTable.compact / CALL graft.system.compact)")
    val kept = keptEntries
    scannedBuckets = kept.map(_.bucket).toSet
    SnapshotRead.pack(spark, SnapshotRead.listFiles(spark, kept))
  }

  /** NO pushed filters reach parquet: row groups of kept buckets must
    * surface every row (see class doc invariant). */
  override def createReaderFactory(): PartitionReaderFactory =
    SnapshotRead.readerFactory(spark, dir, dataSchema, required, Array.empty)
}

/** The replacement write: same clustered-by-conv_id, sorted
  * (conv_id, turn_idx) shape as the append writer, committing a snapshot
  * that swaps out exactly the scanned buckets. */
final class SnapshotCowWrite(op: SnapshotRowLevelOperation, dir: String,
    numBuckets: Int, cmd: RowLevelOperation.Command, info: LogicalWriteInfo)
  extends Write with RequiresDistributionAndOrdering {

  require(info.schema().fieldNames.contains("conv_id"),
    s"graft-snapshot COW writes need a conv_id column; got [${info.schema().fieldNames.mkString(", ")}]")

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.column("conv_id")))

  override def requiredOrdering(): Array[SortOrder] = {
    val cols = Seq("conv_id") ++
      (if (info.schema().fieldNames.contains("turn_idx")) Seq("turn_idx") else Nil)
    cols.map(c => Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray
  }

  override def toBatch: BatchWrite = {
    val runId = s"cow-${cmd.toString.toLowerCase}-${info.queryId()}"
    // column mapping: COW rewrites must land under the PHYSICAL names
    // too, or a rewritten bucket would fork the file-level naming
    new SnapshotCowBatchWrite(op, dir, numBuckets,
      SnapshotTableMeta.toPhysical(dir, info.schema()), runId)
  }
}

final class SnapshotCowBatchWrite(op: SnapshotRowLevelOperation, dir: String,
    numBuckets: Int, schema: StructType, runId: String) extends BatchWrite {

  private val dataPath = s"$dir/data/run=$runId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    SnapshotCowWriterFactory(
      SnapshotWriterUtil.writerFactory(SparkSession.active, schema, dataPath, numBuckets),
      schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val scan = op.configuredScan
    if (scan == null || scan.scannedBuckets == null)
      throw new IllegalStateException(
        "graft-snapshot COW commit without a planned operation scan — the " +
          "row-level rewrite must read through the operation's own scan")
    // SERIALIZABLE-conflict guard (the Iceberg validate-no-conflicting-
    // commits analog): the rewrite was computed against the snapshot this
    // statement loaded; if anyone committed since, replacing the scanned
    // buckets would silently clobber their changes. Fail retryably
    // instead — nothing has been renamed or published yet.
    val live = new SnapshotTable(dir, numBuckets).currentSnapshotId.getOrElse(-1L)
    if (live != op.baseSnapshotId)
      throw new SnapshotTable.CommitConflictException(
        s"concurrent commit on $dir: the row-level operation read snapshot " +
          s"${op.baseSnapshotId} but CURRENT is now $live — re-run the statement")
    if (SnapshotWriterUtil.runIdCommitted(dir, numBuckets, runId))
      throw new IllegalStateException(
        s"runId $runId is already committed in $dir — a row-level operation " +
          "must not be replayed against the same table state")
    SnapshotWriterUtil.publish(spark, dir, numBuckets, dataPath, runId, schema,
      messages, replaceExactly = Some(scan.scannedBuckets))
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    SnapshotWriterUtil.guardedAbort(SparkSession.active, dir, numBuckets, dataPath, runId)
}

/** Spark 4.1 quirk guard (verified against ReplaceDataExec bytecode): for
  * a group-based operation with NO required metadata attributes, the plain
  * `DataWritingSparkTask` hands the writer the RAW ReplaceData query rows —
  * `[__row_operation int] ++ dataColumns` — even though
  * `LogicalWriteInfo.schema()` was the data schema alone; the
  * `projections.rowProjection` that would strip the marker is only applied
  * on the metadata path (`DataAndMetadataWritingSparkTask`), which is why
  * Iceberg's COW never sees this (it requires `_file` metadata). We keep
  * the operation metadata-free and strip the marker here with Spark's own
  * [[ProjectingInternalRow]], keyed off the row width so a future Spark
  * that projects for us degrades to a pass-through rather than a silent
  * column shift. Any other width is corruption — fail loudly. */
final case class SnapshotCowWriterFactory(base: SnapshotDataWriterFactory,
    schema: StructType) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val inner = base.createWriter(partitionId, taskId)
    val width = schema.length
    new DataWriter[InternalRow] {
      private var proj: org.apache.spark.sql.catalyst.ProjectingInternalRow = _
      override def write(row: InternalRow): Unit =
        if (row.numFields == width) inner.write(row)
        else {
          if (proj == null) {
            require(row.numFields == width + 1,
              s"graft-snapshot COW writer expected $width data columns " +
                s"(or +1 leading __row_operation marker), got ${row.numFields}")
            proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
              schema, (1 to width).toIndexedSeq)
          }
          proj.project(row)
          inner.write(proj)
        }
      override def commit(): WriterCommitMessage = inner.commit()
      override def abort(): Unit = inner.abort()
      override def close(): Unit = inner.close()
    }
  }
}
