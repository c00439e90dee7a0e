package graft.pipeline

import graft.SparkSpec

/** The BATCH stateful family (Jet GeneralStage mapStateful/filterStateful/
  * flatMapStateful + rollingAggregate on batch stages) through the
  * secondary-sort plan: repartition by key, sort within partitions on
  * (key, order), one streaming pass with per-key-run state — deterministic
  * under an explicit `orderFn` (stronger than Jet's undefined batch
  * encounter order), memory O(state) not O(group).
  */
class BatchStatefulSpec extends SparkSpec {

  import spark.implicits._

  private def stage = new BatchStage(
    Seq(("a", 3L, 10.0), ("a", 1L, 1.0), ("b", 1L, 5.0),
        ("a", 2L, 2.0), ("b", 2L, 7.0)).toDS())

  test("mapStateful folds per key in orderFn order (deterministic running sum)") {
    val out = stage.mapStateful[String, Double, (String, Long, Double)](
      _._1, () => 0.0, _._2) { (k, s, t) =>
      val s2 = s + t._3
      (s2, (k, t._2, s2))
    }.ds.collect().toSet
    assert(out === Set(
      ("a", 1L, 1.0), ("a", 2L, 3.0), ("a", 3L, 13.0),
      ("b", 1L, 5.0), ("b", 2L, 12.0)))
  }

  test("filterStateful: emit-first-occurrence per key (stateful dedup)") {
    val out = stage.filterStateful[String, Boolean](
      _._1, () => false, _._2) { (seen, _) => (true, !seen) }
      .ds.collect().toSet
    assert(out === Set(("a", 1L, 1.0), ("b", 1L, 5.0)))
  }

  test("flatMapStateful: state transition with variable emission (delta > 3 alarms)") {
    val out = stage.flatMapStateful[String, Double, String](
      _._1, () => 0.0, _._2) { (k, prev, t) =>
      (t._3, if (t._3 - prev > 3.0) Seq(s"$k:${t._2}") else Nil)
    }.ds.collect().toSet
    // a: 1.0(+1), 2.0(+1), 10.0(+8 alarm); b: 5.0(+5 alarm), 7.0(+2)
    assert(out === Set("a:3", "b:1"))
  }

  test("rollingAggregate emits the running aggregate per item (keyed count)") {
    val out = stage.rollingAggregate[String, Long, (String, Long, Long)](
      _._1, () => 0L, _._2)((n, _) => n + 1, (k, n, t) => (k, t._2, n))
      .ds.collect().toSet
    assert(out === Set(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("b", 1L, 1L), ("b", 2L, 2L)))
  }

  test("mapStatefulGlobal: one serial ordered fold over everything (Jet parallelism-1)") {
    val out = stage.mapStatefulGlobal[Long, Long](() => 0L, _._2) {
      (n, _) => (n + 1, n + 1)
    }.ds.collect().sorted
    assert(out.toSeq === Seq(1L, 2L, 3L, 4L, 5L), "every row folded exactly once")
  }

  test("per-key runs are contiguous even across many partitions (no group buffering needed)") {
    val big = new BatchStage(spark.range(10000)
      .selectExpr("CAST(id % 7 AS STRING) AS k", "id AS o", "CAST(1 AS DOUBLE) AS v")
      .as[(String, Long, Double)].repartition(13))
    val out = big.rollingAggregate[String, Long, (String, Long)](
      _._1, () => 0L, _._2)((n, _) => n + 1, (k, n, _) => (k, n))
    val maxPerKey = out.ds.groupByKey(_._1).mapGroups((k, it) => (k, it.map(_._2).max))
      .collect().toMap
    // each key 0..6 sees ceil-ish 10000/7 rows; the max running count per key
    // must equal that key's cardinality — proof every row folded once, in-key
    val expected = (0 until 7).map(k => k.toString -> (0 until 10000).count(_ % 7 == k).toLong).toMap
    assert(maxPerKey === expected)
  }
}
