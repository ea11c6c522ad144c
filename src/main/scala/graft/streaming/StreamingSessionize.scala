package graft.streaming

import graft.model.ExtractedTurn
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming operator (`flatMapGroupsWithState`) — the
  * stateful face SURVEY §2.10 reserves for semantics windowed aggregation
  * cannot express: per-conversation SESSION assembly with an explicit
  * in-flight state machine, the streaming analog of the reference's
  * per-upload accumulation loop (`/root/reference/src/controller/
  * server.py:45-57` buckets turns until size/age flush).
  *
  * Semantics (processing-time variant, deterministic under MemoryStream
  * batch boundaries in tests):
  *  - state per conv_id = turns seen so far + running metric sums;
  *  - a conversation FLUSHES (emits one [[ConvSession]] row and clears
  *    state) when its accumulated turn count reaches `flushTurns`, or on
  *    processing-time timeout `idleMs` with partial content;
  *  - emitted sessions carry the same per-partition metrics the snapshot
  *    manifest records (turns, blocksKept/Dropped, charsEmitted), so the
  *    streaming and batch lineage stories line up.
  */
object StreamingSessionize {

  final case class ConvState(
      turns: Int, blocksKept: Long, blocksDropped: Long, charsEmitted: Long,
      minIdx: Int, maxIdx: Int)

  final case class ConvSession(
      conv_id: String, turns: Int, blocksKept: Long, blocksDropped: Long,
      charsEmitted: Long, minIdx: Int, maxIdx: Int, reason: String)

  /** @param idleMs idle-flush horizon; ≤ 0 disables the timeout path
    *        (size-flush only — what the deterministic spec drives: an armed
    *        processing-time timer makes `processAllAvailable` livelock in a
    *        MemoryStream test, since the engine keeps scheduling
    *        timeout-check batches). */
  def sessions(spark: SparkSession, extracted: Dataset[ExtractedTurn],
      flushTurns: Int = 8, idleMs: Long = 10000L): Dataset[ConvSession] = {
    import spark.implicits._
    val timeoutConf =
      if (idleMs > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    extracted
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvState, ConvSession](
        OutputMode.Append, timeoutConf) {
        (convId: String, turns: Iterator[ExtractedTurn], state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ConvSession(convId, s.turns, s.blocksKept, s.blocksDropped,
              s.charsEmitted, s.minIdx, s.maxIdx, "timeout"))
          } else {
            var s = state.getOption.getOrElse(ConvState(0, 0L, 0L, 0L, Int.MaxValue, Int.MinValue))
            val out = Vector.newBuilder[ConvSession]
            // deterministic in-batch order regardless of shuffle arrival
            turns.toVector.sortBy(_.turn_idx).foreach { t =>
              s = ConvState(s.turns + 1, s.blocksKept + t.blocksKept,
                s.blocksDropped + t.blocksDropped, s.charsEmitted + t.charsEmitted,
                math.min(s.minIdx, t.turn_idx), math.max(s.maxIdx, t.turn_idx))
              if (s.turns >= flushTurns) {
                out += ConvSession(convId, s.turns, s.blocksKept, s.blocksDropped,
                  s.charsEmitted, s.minIdx, s.maxIdx, "size")
                s = ConvState(0, 0L, 0L, 0L, Int.MaxValue, Int.MinValue)
              }
            }
            if (s.turns > 0) {
              state.update(s)
              if (idleMs > 0) state.setTimeoutDuration(idleMs)
            } else state.remove()
            out.result().iterator
          }
      }
  }

  /** Event-time state: [[ConvState]] plus the session's event-time extent. */
  final case class EventConvState(
      turns: Int, blocksKept: Long, blocksDropped: Long, charsEmitted: Long,
      minIdx: Int, maxIdx: Int, minTsMs: Long, maxTsMs: Long)

  private val EmptyEventState =
    EventConvState(0, 0L, 0L, 0L, Int.MaxValue, Int.MinValue, Long.MaxValue, Long.MinValue)

  /** EVENT-TIME sessionization — the production variant: a conversation's
    * session closes when the WATERMARK (not the wall clock) passes its last
    * event time + `gapMs`. Deterministic under replay: watermark movement
    * is a pure function of the data, so re-running the stream yields the
    * same sessions — which processing-time timeouts cannot promise.
    *
    *  - `withWatermark(ts, watermarkDelay)` bounds state AND drops
    *    too-late rows engine-side before they reach the operator (the
    *    late-data semantics StreamingSpec asserts);
    *  - `state.setTimeoutTimestamp(maxTs + gapMs)` arms an
    *    [[GroupStateTimeout.EventTimeTimeout]] that fires on watermark
    *    passage — no armed wall-clock timer, so `processAllAvailable`
    *    stays deterministic in MemoryStream tests (unlike
    *    ProcessingTimeTimeout, see [[sessions]]);
    *  - gaps INSIDE a batch also split sessions (the fold closes a
    *    session whenever the next event is > gapMs after the last);
    *  - `flushTurns` is a state-size bound: a conversation that never goes
    *    idle still flushes (reason "size") instead of growing state forever.
    */
  def sessionsEventTime(spark: SparkSession, extracted: Dataset[ExtractedTurn],
      gapMs: Long = 30 * 60 * 1000L, watermarkDelay: String = "10 seconds",
      flushTurns: Int = 1000): Dataset[ConvSession] = {
    import spark.implicits._
    def emit(convId: String, s: EventConvState, reason: String) =
      ConvSession(convId, s.turns, s.blocksKept, s.blocksDropped,
        s.charsEmitted, s.minIdx, s.maxIdx, reason)
    extracted
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[EventConvState, ConvSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (convId: String, turns: Iterator[ExtractedTurn], state: GroupState[EventConvState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(convId, s, "gap"))
          } else {
            var s = state.getOption.getOrElse(EmptyEventState)
            val out = Vector.newBuilder[ConvSession]
            // deterministic order: event time, then turn index
            turns.toVector.sortBy(t => (t.ts.getTime, t.turn_idx)).foreach { t =>
              val tMs = t.ts.getTime
              if (s.turns > 0 && tMs - s.maxTsMs > gapMs) {
                out += emit(convId, s, "gap")
                s = EmptyEventState
              }
              s = EventConvState(s.turns + 1, s.blocksKept + t.blocksKept,
                s.blocksDropped + t.blocksDropped, s.charsEmitted + t.charsEmitted,
                math.min(s.minIdx, t.turn_idx), math.max(s.maxIdx, t.turn_idx),
                math.min(s.minTsMs, tMs), math.max(s.maxTsMs, tMs))
              if (s.turns >= flushTurns) {
                out += emit(convId, s, "size")
                s = EmptyEventState
              }
            }
            if (s.turns > 0) {
              state.update(s)
              state.setTimeoutTimestamp(s.maxTsMs + gapMs)
            } else state.remove()
            out.result().iterator
          }
      }
  }
}
