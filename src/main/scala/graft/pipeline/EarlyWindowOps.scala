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
      implicit ke: Encoder[(K, Long)], ae: Encoder[A], oe: Encoder[O]): Dataset[O] = {

    // key computed inside groupByKey (AppendColumns keeps the input schema, so
    // the event-time watermark survives; a typed .map first would strip it)
    ds.groupByKey { v =>
        val t = tsFn(v).getTime
        (keyFn(v), t - Math.floorMod(t, windowMillis))
      }
      .flatMapGroupsWithState[A, O](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case ((key, winStart), values, state) =>
          val winEnd = winStart + windowMillis
          if (state.hasTimedOut) {
            // timer tick: the early-results clock. Final iff the watermark
            // has passed the window end; else a partial, and re-arm.
            val a = state.get
            if (state.getCurrentWatermarkMs() >= winEnd) {
              state.remove()
              Iterator.single(export(key, winStart, winEnd, false, a))
            } else {
              state.setTimeoutDuration(earlyPeriodMillis)
              Iterator.single(export(key, winStart, winEnd, true, a))
            }
          } else {
            // data: fold into the accumulator, no emission (results are
            // timer-paced, matching SlidingWindowP's early-result tick)
            var a = state.getOption.getOrElse(zero)
            values.foreach(v => a = acc(a, v))
            state.update(a)
            state.setTimeoutDuration(earlyPeriodMillis)
            Iterator.empty
          }
      }
  }
}
