package graft.pipe

import org.apache.spark.util.AccumulatorV2

/** One quarantined turn (poison-row guard fired; see
  * [[graft.model.ExtractConfig.failFast]]): the key the operator needs to
  * reprocess it after a kernel fix — feed the distinct conv_ids to
  * [[graft.table.SnapshotTable.replaceWhere]] — plus the error head for
  * triage. */
final case class QuarantineRecord(conv_id: String, turn_idx: Int, error: String)

/** Driver-side bounded sample of quarantined rows (the dead-letter channel).
  *
  * Quarantine is an ALARM path, not a data path: at any healthy moment it
  * carries zero rows, and when a kernel bug ships it must not become a
  * second unbounded output. A bounded accumulator is the scale-correct
  * capture: zero cost when nothing fails, O(cap) driver memory when
  * something does, and the sample is exactly what the operator needs — the
  * conversations to `replaceWhere`-reprocess and a look at WHAT threw.
  * `turnsFailed` (unbounded counter) still tells them HOW MANY.
  *
  * Caveats inherent to accumulators: task retries can duplicate entries
  * (dedup by key when consuming) and which entries survive the cap under
  * overflow is nondeterministic (it is a sample, not a ledger — a full
  * ledger would be a second job over the same input with failFast=false
  * and a filter on the sentinel score).
  */
final class BoundedListAccumulator[T](val cap: Int)
    extends AccumulatorV2[T, java.util.List[T]] {
  private val buf = new java.util.ArrayList[T]()

  override def isZero: Boolean = buf.isEmpty

  override def copy(): BoundedListAccumulator[T] = {
    val a = new BoundedListAccumulator[T](cap)
    a.buf.addAll(buf)
    a
  }

  override def reset(): Unit = buf.clear()

  override def add(v: T): Unit = if (buf.size < cap) buf.add(v)

  override def merge(other: AccumulatorV2[T, java.util.List[T]]): Unit = {
    val it = other.value.iterator()
    while (it.hasNext && buf.size < cap) buf.add(it.next())
  }

  override def value: java.util.List[T] =
    java.util.Collections.unmodifiableList(buf)

  /** Scala view of the sample (driver only). */
  def sample: Vector[T] = {
    import scala.jdk.CollectionConverters._
    buf.asScala.toVector
  }
}
