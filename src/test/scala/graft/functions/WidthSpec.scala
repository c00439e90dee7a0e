package graft.functions

import graft.SparkSpec

/** Width.widen guard: narrow inputs spread to cluster width; already-wide
  * inputs (the 100 TB case) pass through without a repartition.
  */
class WidthSpec extends SparkSpec {

  import spark.implicits._

  test("widens a single-partition input to cluster width") {
    val narrow = (1 to 100).toDF("v").coalesce(1)
    assert(narrow.rdd.getNumPartitions == 1)
    val w = Width.widen(narrow)
    assert(w.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(w.count() == 100)
  }

  test("leaves an already-wide input untouched (no shuffle at scale)") {
    val target = spark.sparkContext.defaultParallelism
    val wide = (1 to 100).toDF("v").repartition(target)
    val w = Width.widen(wide)
    // same plan object — widen must not insert a second repartition
    assert(w eq wide)
  }

  test("leaves an input at half cluster width untouched (guard boundary)") {
    val target = spark.sparkContext.defaultParallelism
    val half = (1 to 100).toDF("v").repartition(math.max(1, target / 2 + 1))
    assert(Width.widen(half) eq half)
  }
}
