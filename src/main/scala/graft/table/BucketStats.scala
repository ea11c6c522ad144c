package graft.table

import org.apache.spark.util.AccumulatorV2
import scala.jdk.CollectionConverters._

/** Per-bucket write-pass statistics (manifest ingredients). Timestamps are
  * epoch millis; formatting happens driver-side at manifest write. */
final case class BStats(
    turns: Long, blocksKept: Long, blocksDropped: Long, charsEmitted: Long,
    minTs: Long, maxTs: Long) {
  def merge(o: BStats): BStats = BStats(
    turns + o.turns, blocksKept + o.blocksKept, blocksDropped + o.blocksDropped,
    charsEmitted + o.charsEmitted, math.min(minTs, o.minTs), math.max(maxTs, o.maxTs))
}

/** Accumulates per-bucket stats DURING the commit's write pass, so the
  * manifest needs no second scan of the written data (the round-1 commit
  * re-read the entire dataset — a second full table scan per commit at
  * 100 TB). Keyed by the task's partitionId with overwrite semantics:
  * a retried or speculative task recomputes the same deterministic
  * partition and replaces, never double-counts.
  */
final class BucketStatsAccumulator
    extends AccumulatorV2[(Int, Map[Int, BStats]), Map[Int, BStats]] {

  private val byPartition =
    new java.util.concurrent.ConcurrentHashMap[Int, Map[Int, BStats]]()

  override def isZero: Boolean = byPartition.isEmpty

  override def copy(): BucketStatsAccumulator = {
    val c = new BucketStatsAccumulator
    c.byPartition.putAll(byPartition)
    c
  }

  override def reset(): Unit = byPartition.clear()

  override def add(v: (Int, Map[Int, BStats])): Unit = byPartition.put(v._1, v._2)

  override def merge(other: AccumulatorV2[(Int, Map[Int, BStats]), Map[Int, BStats]]): Unit =
    other match {
      case o: BucketStatsAccumulator => o.byPartition.forEach((k, v) => byPartition.put(k, v))
      case _ => throw new UnsupportedOperationException("incompatible accumulator")
    }

  /** Folded across partitions: bucket → combined stats. */
  override def value: Map[Int, BStats] =
    byPartition.values().asScala.foldLeft(Map.empty[Int, BStats]) { (acc, m) =>
      m.foldLeft(acc) { case (a, (b, s)) =>
        a.updated(b, a.get(b).map(_.merge(s)).getOrElse(s))
      }
    }
}
