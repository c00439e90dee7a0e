package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Jet user-defined metrics (reference: core/metrics/Metrics.java:40
  * `Metrics.metric(name)` + Metric.java `increment`/`increment(n)`): custom
  * numeric counters incremented from user code running INSIDE transforms,
  * surfaced on `Job.getMetrics()` / `SHOW JOB METRICS` under a `user.`
  * prefix.
  *
  * Spark-native mapping: one named `LongAccumulator` per (session, metric
  * name). Accumulators are designed for exactly this — serializable handles
  * captured in task closures, task-side adds merged into the driver value —
  * the same processor-local-then-merged flow as the reference's
  * MetricsImpl. Deltas from Jet, documented:
  *   - counters are SESSION-scoped, not job-scoped (Spark accumulators
  *     attach to the SparkContext); name-prefix per job if isolation is
  *     needed;
  *   - Jet's `Metric.set` (absolute value) has no merge semantics here —
  *     use increments (Jet's own docs recommend counters for exactly this
  *     reason);
  *   - a task retry can double-count inside transformations (Spark's
  *     documented accumulator caveat; Jet's metrics have the same
  *     at-least-once wrinkle under job restart).
  */
object UserMetrics {

  /** The task-side handle — Jet `Metric` (Metric.java). Serializable;
    * capture it in the transform closure.
    */
  final class UserMetric private[UserMetrics] (acc: LongAccumulator)
      extends Serializable {
    /** Jet `Metric.increment()`. */
    def increment(): Unit = acc.add(1L)
    /** Jet `Metric.increment(long)`. */
    def increment(n: Long): Unit = acc.add(n)
    /** Driver-side read (Jet surfaces the value via JobMetrics). */
    def value: Long = acc.value
  }

  private val registries =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, LongAccumulator]]()

  private def registry(spark: SparkSession) = registries.synchronized {
    var r = registries.get(spark)
    if (r == null) {
      r = new java.util.concurrent.ConcurrentHashMap[String, LongAccumulator]()
      registries.put(spark, r)
    }
    r
  }

  /** Jet `Metrics.metric(name)`: the handler for a named counter — created
    * on first call, cached after (same contract as the reference).
    */
  def counter(spark: SparkSession, name: String): UserMetric =
    new UserMetric(registry(spark).computeIfAbsent(name,
      n => spark.sparkContext.longAccumulator(s"graft.user.$n")))

  /** All user metrics of a session, `user.`-prefixed — merged into
    * `JobHandle.metrics` and `SHOW JOB METRICS`.
    */
  def snapshot(spark: SparkSession): Map[String, Long] = {
    val r = registry(spark)
    val out = Map.newBuilder[String, Long]
    r.forEach((k, v) => out += (s"user.$k" -> v.value))
    out.result()
  }
}
