package graft.connector

import com.fasterxml.jackson.databind.ObjectMapper
import graft.table.SnapshotTable
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.{FileFormat, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.nio.file.{Files, Paths}
import java.time.{LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.util.OptionalLong
import scala.jdk.CollectionConverters._

/** DataSource V2 connector for [[graft.table.SnapshotTable]] — the
  * Iceberg-connector analog for our snapshot format, so the table is a
  * first-class Spark source instead of a library call:
  *
  * {{{
  *   spark.read.format("graft-snapshot").load(dir)                  // live
  *   spark.read.format("graft-snapshot")
  *     .option("snapshotId", "3").load(dir)                         // time travel
  * }}}
  *
  * What the connector adds over `SnapshotTable.read` (a plain parquet read
  * of the manifest's paths):
  *
  *  - '''Planning-time pruning from the manifest, driven by pushed
  *    filters.''' `conv_id = x` / `conv_id IN (…)` prunes to the owning
  *    hash bucket(s) (the conv_id-bucketed layout's point-read path), and
  *    `ts` range predicates prune whole file-sets via the per-entry
  *    min/max ts stats the commit recorded — at 100 TB this is Iceberg's
  *    core trick: metadata, not data, decides what gets scanned.
  *  - '''Column pruning + parquet row-group pushdown.''' The pruned
  *    required schema and the pushed filters reach the parquet reader
  *    (`ParquetFileFormat.buildReaderWithPartitionValues`), so the scan
  *    reads only requested columns and skips row groups by min/max. All
  *    filters are also returned as residual — file/row-group pruning is
  *    set-level, Spark re-evaluates rows — so correctness never depends
  *    on the pruning.
  *  - '''Manifest statistics to the planner''' (`SupportsReportStatistics`):
  *    post-pruning row counts from the commit-time accumulators and byte
  *    sizes from the file listing, so joins against a pruned snapshot read
  *    can broadcast without a size guess.
  *
  * Reference precedent: the prototype's readers hide storage layout behind
  * one loader face (`/root/reference/src/controller/common.py:30-49`); here
  * that face is Spark's own source API, which is what makes the table
  * usable from SQL (`CREATE TABLE … USING graft-snapshot`), not just Scala.
  */
final class SnapshotSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  private def dirOf(options: CaseInsensitiveStringMap): String = {
    val d = Option(options.get("path")).getOrElse(
      sys.error("graft-snapshot needs a path: spark.read.format(\"graft-snapshot\").load(dir)"))
    d
  }

  private def loadTable(options: CaseInsensitiveStringMap): SnapshotV2Table = {
    val dir = dirOf(options)
    val snapId = Option(options.get("snapshotId")).map(_.trim.toLong).getOrElse {
      val cur = Paths.get(dir, "CURRENT")
      require(Files.exists(cur), s"no committed snapshot in $dir")
      Files.readString(cur).trim.toLong
    }
    val entries = SnapshotManifest.read(dir, snapId)
    require(entries.nonEmpty, s"snapshot $snapId in $dir is empty")
    new SnapshotV2Table(dir, snapId, entries)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    loadTable(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    loadTable(new CaseInsensitiveStringMap(properties))
}

/** One manifest line, parsed driver-side (Jackson — no Spark job at
  * planning time; Iceberg likewise reads manifests on the driver). `maxTsMs`
  * is widened by +1 s: the manifest formats ts at second granularity, so the
  * recorded max FLOORS the true max — an overlap test against the raw value
  * could prune a file-set whose last rows sit inside the truncated second.
  * `minTsMs` floors too, which only widens the range (safe). */
final case class ManifestEntry(bucket: Int, path: String, turns: Long,
    minTsMs: Long, maxTsMs: Long, schema: String, numBuckets: Int)

object SnapshotManifest {
  private val TsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
  private def tsMs(s: String): Long =
    LocalDateTime.parse(s, TsFmt).toInstant(ZoneOffset.UTC).toEpochMilli

  def read(dir: String, snapshotId: Long): Seq[ManifestEntry] = {
    val f = Paths.get(dir, "manifests", s"snap-$snapshotId.json")
    require(Files.exists(f), s"snapshot $snapshotId does not exist in $dir")
    val mapper = new ObjectMapper()
    Files.readAllLines(f).asScala.toSeq.filter(_.nonEmpty).map { line =>
      val n = mapper.readTree(line)
      val buckets =
        if (n.has("buckets")) n.get("buckets").asInt()
        else -1 // pre-field manifest: resolved below from max(bucket)+1
      ManifestEntry(
        n.get("bucket").asInt(), n.get("path").asText(), n.get("turns").asLong(),
        tsMs(n.get("minTs").asText()), tsMs(n.get("maxTs").asText()) + 1000L,
        if (n.has("schema")) n.get("schema").asText() else "", buckets)
    } match {
      case es if es.exists(_.numBuckets < 0) =>
        val nb = es.map(_.bucket).max + 1
        es.map(e => if (e.numBuckets < 0) e.copy(numBuckets = nb) else e)
      case es => es
    }
  }
}

final class SnapshotV2Table(dir: String, snapshotId: Long,
    entries: Seq[ManifestEntry]) extends Table with SupportsRead {

  override def name(): String = s"graft-snapshot `$dir` @ $snapshotId"

  override def schema(): StructType =
    entries.find(_.schema.nonEmpty).map(e =>
        DataType.fromDDL(e.schema).asInstanceOf[StructType])
      .getOrElse(org.apache.spark.sql.Encoders.product[graft.model.ExtractedTurn].schema)

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(dir, entries, schema())
}

final class SnapshotScanBuilder(dir: String, entries: Seq[ManifestEntry],
    fullSchema: StructType)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  /** Accept every filter: all of them go to the parquet reader (row-group
    * min/max skipping) and the conv_id/ts ones additionally drive
    * manifest-level pruning in [[SnapshotScan]]. ALL are returned as
    * residual — pruning is file-set/row-group granular, so Spark must still
    * evaluate rows; reporting them in [[pushedFilters]] is what surfaces
    * `PushedFilters: […]` in explain. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SnapshotScan(dir, entries, fullSchema, required, pushed)
}

final class SnapshotScan(dir: String, entries: Seq[ManifestEntry],
    dataSchema: StructType, required: StructType, pushed: Array[Filter])
  extends Scan with Batch with SupportsReportStatistics {

  private def spark = SparkSession.active
  private val numBuckets = entries.head.numBuckets
  private def hashTwin = new SnapshotTable(dir, numBuckets)

  /** Manifest-level pruning: intersect the bucket sets demanded by
    * conv_id equality/IN filters, and drop file-sets whose [minTs, maxTs]
    * range cannot overlap the ts predicates. Unknown/other filters prune
    * nothing (they still reach parquet + Spark's residual evaluation). */
  private[graft] lazy val keptEntries: Seq[ManifestEntry] = {
    val bucketSets = pushed.toSeq.collect {
      case EqualTo(a, v: String) if a.equalsIgnoreCase("conv_id") =>
        Set(hashTwin.bucketOfId(v))
      case EqualNullSafe(a, v: String) if a.equalsIgnoreCase("conv_id") =>
        Set(hashTwin.bucketOfId(v))
      case In(a, vs) if a.equalsIgnoreCase("conv_id") &&
          vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        vs.map(v => hashTwin.bucketOfId(v.asInstanceOf[String])).toSet
    }
    val keepBuckets = bucketSets.reduceOption(_ intersect _)
    def ms(v: Any): Option[Long] = v match {
      case t: java.sql.Timestamp => Some(t.getTime)
      case i: java.time.Instant  => Some(i.toEpochMilli)
      case _                     => None
    }
    var lo = Long.MinValue
    var hi = Long.MaxValue
    pushed.foreach {
      case GreaterThan(a, v) if a.equalsIgnoreCase("ts") =>
        ms(v).foreach(m => lo = math.max(lo, m))
      case GreaterThanOrEqual(a, v) if a.equalsIgnoreCase("ts") =>
        ms(v).foreach(m => lo = math.max(lo, m))
      case LessThan(a, v) if a.equalsIgnoreCase("ts") =>
        ms(v).foreach(m => hi = math.min(hi, m))
      case LessThanOrEqual(a, v) if a.equalsIgnoreCase("ts") =>
        ms(v).foreach(m => hi = math.min(hi, m))
      case _ => ()
    }
    entries.filter { e =>
      keepBuckets.forall(_.contains(e.bucket)) &&
        e.maxTsMs >= lo && e.minTsMs <= hi
    }
  }

  private lazy val fileStatuses: Seq[org.apache.hadoop.fs.FileStatus] = {
    val hconf = spark.sessionState.newHadoopConf()
    keptEntries.flatMap { e =>
      val p = new HPath(e.path)
      val fs = p.getFileSystem(hconf)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.filter { st =>
        val n = st.getPath.getName
        st.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }
    }
  }

  override def readSchema(): StructType = required

  override def description(): String = {
    val bs = keptEntries.map(_.bucket).distinct.sorted
    s"graft-snapshot $dir buckets=${bs.mkString("[", ",", "]")} " +
      s"filesets=${keptEntries.size}/${entries.size} " +
      s"PushedFilters=${pushed.mkString("[", ", ", "]")}"
  }

  override def toBatch: Batch = this

  /** Post-pruning stats straight from the manifest (rows) + listing
    * (bytes): exact pre-residual-filter, so the planner can e.g. decide a
    * broadcast from real numbers instead of a whole-table size guess. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(fileStatuses.map(_.getLen).sum)
    override def numRows(): OptionalLong =
      OptionalLong.of(keptEntries.map(_.turns).sum)
  }

  /** Spark's own size-based packing (FilePartition.maxSplitBytes math):
    * parquet is splittable, so files first split at maxSplitBytes, then the
    * splits bin-pack (descending, openCost padding) — partition count tracks
    * bytes, not file count, exactly like the built-in file source. */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = spark.sessionState.conf
    val openCost = conf.filesOpenCostInBytes
    val totalBytes = fileStatuses.map(_.getLen + openCost).sum
    val bytesPerCore = totalBytes / math.max(1, spark.sparkContext.defaultParallelism)
    val maxSplit = math.min(conf.filesMaxPartitionBytes, math.max(openCost, bytesPerCore))

    val splits = fileStatuses.flatMap { st =>
      (0L until st.getLen by maxSplit).map { off =>
        PartitionedFile(InternalRow.empty,
          SparkPath.fromPathString(st.getPath.toString),
          off, math.min(maxSplit, st.getLen - off),
          Array.empty[String], st.getModificationTime, st.getLen)
      }
    }.sortBy(-_.length)

    val parts = scala.collection.mutable.ArrayBuffer.empty[Array[PartitionedFile]]
    val cur = scala.collection.mutable.ArrayBuffer.empty[PartitionedFile]
    var curBytes = 0L
    def flush(): Unit = if (cur.nonEmpty) { parts += cur.toArray; cur.clear(); curBytes = 0L }
    splits.foreach { f =>
      if (curBytes + f.length + openCost > maxSplit) flush()
      cur += f; curBytes += f.length + openCost
    }
    flush()
    parts.map(SnapshotInputPartition(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // The parquet read path IS Spark's: buildReaderWithPartitionValues wires
    // the pruned schema + pushed filters into the (vectorized) parquet
    // reader and returns a serializable per-file closure — identical
    // row-group skipping and column decoding to the built-in source, but
    // over OUR manifest-selected file set.
    val fmt = new ParquetFileFormat
    val hconf = spark.sessionState.newHadoopConfWithOptions(Map.empty)
    val readFunc = fmt.buildReaderWithPartitionValues(
      spark, dataSchema, new StructType(), required, pushed.toSeq,
      Map(FileFormat.OPTION_RETURNING_BATCH -> "false"), hconf)
    SnapshotReaderFactory(readFunc)
  }
}

final case class SnapshotInputPartition(files: Array[PartitionedFile])
  extends InputPartition

final case class SnapshotReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow])
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val files = partition.asInstanceOf[SnapshotInputPartition].files
    new PartitionReader[InternalRow] {
      private val it = files.iterator.flatMap(readFunc)
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
