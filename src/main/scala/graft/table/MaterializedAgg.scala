package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Incrementally-maintained aggregate over a [[SnapshotTable]] — the
  * materialized-view-maintenance analog (Iceberg/Delta "incremental
  * refresh"): per-(tool, role) turn/char/block counts kept in their own
  * versioned parquet state, refreshed from [[SnapshotTable.readChanges]]
  * DELTAS instead of full table rescans. At 100 TB a dashboard aggregate
  * that rescans the table per refresh IS the cluster's biggest job; this
  * one reads only the appended files since the last refreshed snapshot.
  *
  * Correct by algebra: every maintained measure is a commutative monoid
  * (counts and integer sums), so merge(old_agg, agg(delta)) ≡
  * agg(old ∪ delta) exactly — no floats, no order dependence. Non-monoid
  * measures (exact distinct, medians) need the sketch forms the query
  * surface already provides (q_hll_distinct, q_quantile_sketch).
  *
  * Append-only deltas are the fast path. If the chain from the refreshed
  * snapshot was broken by a rewrite (compact / replaceWhere / delete),
  * [[SnapshotTable.readChanges]] throws — and refresh falls back to a full
  * recompute at the target snapshot, the honest MV-maintenance behavior
  * (a rewritten bucket's old rows cannot be subtracted from manifests
  * alone).
  *
  * State protocol mirrors the table's own (data first, CURRENT last,
  * atomic rename): `dir/agg-v<snapId>/` parquet + `dir/CURRENT` naming the
  * snapshot the view is consistent with. A crash between the two leaves an
  * orphan agg-v dir that the next refresh simply overwrites — refresh is
  * idempotent.
  */
final class MaterializedAgg(val table: SnapshotTable, val dir: String) {

  private def currentFile: Path = Paths.get(dir, "CURRENT")

  /** Snapshot id the materialized state is consistent with, if any. */
  def refreshedSnapshot: Option[Long] =
    if (Files.exists(currentFile)) Some(Files.readString(currentFile).trim.toLong)
    else None

  /** The view definition over extracted turns (mergeable partials only). */
  private def aggregate(rows: DataFrame): DataFrame =
    rows.groupBy(col("tool"), col("role"))
      .agg(count(lit(1)).as("n_turns"),
        sum(col("charsEmitted").cast("long")).as("chars"),
        sum(col("blocksKept").cast("long")).as("blocks_kept"))

  private def merge(oldAgg: DataFrame, deltaAgg: DataFrame): DataFrame =
    oldAgg.unionByName(deltaAgg)
      .groupBy(col("tool"), col("role"))
      .agg(sum(col("n_turns")).as("n_turns"), sum(col("chars")).as("chars"),
        sum(col("blocks_kept")).as("blocks_kept"))

  /** Current materialized state (empty-schema frame before first refresh). */
  def read(spark: SparkSession): DataFrame = refreshedSnapshot match {
    case Some(id) => spark.read.parquet(s"$dir/agg-v$id")
    case None     => aggregate(table.read(spark)).limit(0)
  }

  /** Bring the view to the table's current snapshot. Returns the snapshot
    * the view is now consistent with (no-op when already current). */
  def refresh(spark: SparkSession): Long = {
    val target = table.currentSnapshotId.getOrElse(
      throw new IllegalStateException(s"table ${table.dir} has no committed snapshot"))
    val from = refreshedSnapshot
    if (from.contains(target)) return target
    val newAgg = from match {
      case Some(f) =>
        try merge(read(spark), aggregate(table.readChanges(spark, f, target)))
        catch { case _: IllegalStateException =>
          // chain broken by compact/replaceWhere/delete: full recompute
          aggregate(table.readAt(spark, target))
        }
      case None => aggregate(table.readAt(spark, target))
    }
    val out = s"$dir/agg-v$target"
    newAgg.coalesce(1).write.mode("overwrite").parquet(out)
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, s".CURRENT.tmp.$target")
    Files.writeString(tmp, target.toString)
    Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // GC superseded versions (safe AFTER the marker move; keep the live one)
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("agg-v")
        && p.getFileName.toString != s"agg-v$target")
      .foreach(deleteRecursively)
    target
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
