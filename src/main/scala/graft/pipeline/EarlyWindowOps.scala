package graft.pipeline

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Jet `earlyResultsPeriod` exact semantics (reference:
  * pipeline/WindowDefinition.java:39-70, emission at
  * processor/SlidingWindowP.java:184-192): while a window is still open, the
  * engine emits wall-clock-paced PARTIAL results for it; when the watermark
  * passes the window end it emits the final result and releases the state.
  *
  * The update-output-mode approximation (EarlyResultsSpec's first case) paces
  * early results by micro-batch and only re-emits when the aggregate changed.
  * This operator is the exact form: a `flatMapGroupsWithState` keyed on
  * (key, window start) whose ProcessingTime timer is the early-results clock —
  * partials fire every `earlyPeriodMillis` even if nothing arrived (Jet's
  * contract: the period is wall-clock, not data-driven), finals fire on the
  * first timer tick after the watermark closes the window, and the output is
  * APPEND-mode compatible (each emission is a new row tagged `is_early`, never
  * a retraction), so it composes with exactly-once file sinks.
  *
  * Scale: state per (key, window) is one accumulator; timers are per key in
  * the state store, partitioned by the groupBy shuffle — no driver
  * involvement. The watermark bounds state lifetime exactly as the plain
  * windowed aggregate's does.
  */
object EarlyWindowOps {

  /** Tumbling window with early results.
    *
    * @param tsFn   event-time accessor (the stream must already carry a
    *               watermark on that column — `withTimestamps` upstream)
    * @param export (key, windowStart, windowEnd, isEarly, acc) → output row;
    *               called for every early emission and once for the final
    */
  def tumblingEarly[K, V, A, O](
      ds: Dataset[V], tsFn: V => java.sql.Timestamp, keyFn: V => K,
      windowMillis: Long, earlyPeriodMillis: Long,
      zero: A, acc: (A, V) => A,
      export: (K, Long, Long, Boolean, A) => O)(
      implicit ke: Encoder[(K, Long)], ae: Encoder[(A, Long)], oe: Encoder[O]): Dataset[O] = {

    // key computed inside groupByKey (AppendColumns keeps the input schema, so
    // the event-time watermark survives; a typed .map first would strip it)
    ds.groupByKey { v =>
        val t = tsFn(v).getTime
        (keyFn(v), t - Math.floorMod(t, windowMillis))
      }
      // state = (accumulator, wall-clock deadline of the next early emission).
      // The deadline must live IN the state: Spark clears the group's timeout
      // on every invocation, so a key receiving data each micro-batch would
      // otherwise re-arm a full period per batch and never fire (starving
      // exactly the busy keys early results exist for)
      .flatMapGroupsWithState[(A, Long), O](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case ((key, winStart), values, state) =>
          val winEnd = winStart + windowMillis
          if (state.hasTimedOut) {
            // timer tick: the early-results clock. Final iff the watermark
            // has passed the window end; else a partial, and re-arm.
            val (a, _) = state.get
            if (state.getCurrentWatermarkMs() >= winEnd) {
              state.remove()
              Iterator.single(export(key, winStart, winEnd, false, a))
            } else {
              state.update((a, System.currentTimeMillis() + earlyPeriodMillis))
              state.setTimeoutDuration(earlyPeriodMillis)
              Iterator.single(export(key, winStart, winEnd, true, a))
            }
          } else if (state.getOption.isEmpty && state.getCurrentWatermarkMs() >= winEnd) {
            // late data for a window the watermark already closed: under
            // ProcessingTimeTimeout Spark does NOT filter watermark-late rows
            // (it only does for EventTimeTimeout), so without this guard a
            // late event would re-create the released state from `zero` and
            // the next tick would emit a second, partial "final" row
            Iterator.empty
          } else {
            // data: fold into the accumulator. Emission is deadline-paced,
            // and the deadline must be checked HERE too: Spark only delivers
            // hasTimedOut calls to keys with NO data in the batch, so a busy
            // key that sees data every micro-batch would never get a timer
            // tick at all — the data path honors the same wall clock
            // (SlidingWindowP's early-result tick is likewise independent of
            // whether data kept arriving).
            var (a, nextEmit) = state.getOption.getOrElse((zero, 0L))
            values.foreach(v => a = acc(a, v))
            val now = System.currentTimeMillis()
            if (nextEmit == 0L) nextEmit = now + earlyPeriodMillis
            val out =
              if (now >= nextEmit) {
                nextEmit = now + earlyPeriodMillis
                Iterator.single(export(key, winStart, winEnd, true, a))
              } else Iterator.empty
            state.update((a, nextEmit))
            // timer covers the idle case; arm with the REMAINING time to the
            // stored deadline, not a fresh full period
            state.setTimeoutDuration(math.max(1L, nextEmit - now))
            out
          }
      }
  }
}
