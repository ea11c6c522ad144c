package graft.pipe

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._

/** Hot-key skew defusal for per-row kernel stages.
  *
  * The reference has no skew concept (one document at a time); at transcript
  * scale, hot conversations (Zipf head) would pin whole conversations to one
  * task if we partitioned by `conv_id` alone. Because the extraction kernel
  * is PER-TURN (no cross-turn state), we are free to split a conversation
  * across tasks: repartition by (conv_id, pmod(hash(turn_idx), salt)) spreads
  * a hot conversation over up to `salt` tasks while keeping the shuffle
  * key-based (deterministic routing, AQE-coalescible). Order is restored
  * afterwards by the (conv_id, turn_idx) sort — the same unordered-gather +
  * re-sort shape as the reference's queue scatter/gather
  * (`/root/reference/src/extras/weinman/interface/linepredictor.py:32-51`).
  */
object Salting {

  def saltCol(turnIdx: Column, saltBuckets: Int): Column =
    pmod(hash(turnIdx), lit(saltBuckets))

  /** Salted repartition: key-based enough for locality, salted enough that a
    * hot conversation fans out over `saltBuckets` tasks.
    *
    * `saltBuckets <= 0` = NO pre-kernel exchange at all: the kernel runs
    * fused onto the scan partitions. For a per-row kernel whose cost is
    * bounded per row (maxTextLen gate), scan splits are size-bounded by
    * `spark.sql.files.maxPartitionBytes`, so per-task kernel work is bounded
    * BY CONSTRUCTION — no conversation, however hot, can concentrate more
    * than one split's bytes in one task. That both defuses skew and removes
    * a full shuffle of the raw payloads; keep salting (> 0) for kernels
    * whose per-row cost is unbounded/cost-skewed. */
  def salted[T](ds: Dataset[T], saltBuckets: Int): Dataset[T] =
    if (saltBuckets <= 0) ds
    else ds.repartition(col("conv_id"), saltCol(col("turn_idx"), saltBuckets))

  def salted[T](ds: Dataset[T], numPartitions: Int, saltBuckets: Int): Dataset[T] =
    ds.repartition(numPartitions, col("conv_id"), saltCol(col("turn_idx"), saltBuckets))
}
