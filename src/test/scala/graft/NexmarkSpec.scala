package graft

import graft.queries.NexmarkQueries

/** NEXMark suite invariants: the fixture derivation's structural properties
  * (the 1:3:46 person/auction/bid interleave, dense auction ids, in-range
  * entity references) and the 100 TB plan shapes (persons broadcast in
  * Q3/Q8, no cartesian products anywhere in the suite).
  */
class NexmarkSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("fixture interleave: persons/auctions/bids partition the event stream 1:3:46") {
    val nEvents = Tables(spark, sf, "events").count()
    val p = NexmarkQueries.persons(spark, sf).count()
    val a = NexmarkQueries.auctions(spark, sf).count()
    val b = NexmarkQueries.bids(spark, sf).count()
    assert(p + a + b == nEvents, s"partition leak: $p + $a + $b != $nEvents")
    // ratio within rounding of 1:3:46 per 50 events
    assert(math.abs(p - nEvents / 50) <= 1)
    assert(math.abs(a - 3 * (nEvents / 50)) <= 3)
  }

  test("fixture references resolve: every auction's seller and bid's auction exist") {
    val p = NexmarkQueries.persons(spark, sf).select("id")
    val a = NexmarkQueries.auctions(spark, sf)
    val b = NexmarkQueries.bids(spark, sf)
    assert(a.join(p, a("seller") === p("id"), "left_anti").count() == 0,
      "auction with dangling seller")
    val aIds = a.select(a("id").as("a_id"))
    assert(b.join(aIds, b("auction") === aIds("a_id"), "left_anti").count() == 0,
      "bid with dangling auction")
    // auction ids are dense and unique
    assert(a.select("id").distinct().count() == a.count())
  }

  test("Q3/Q8 plans broadcast the persons side; no cartesian in the suite") {
    val p3 = planOf(NexmarkQueries.q144_nexmark_local_item(spark, sf))
    assert(p3.contains("BroadcastHashJoin"), s"Q3 not broadcast:\n$p3")
    val p8 = planOf(NexmarkQueries.q149_nexmark_new_users(spark, sf))
    assert(p8.contains("BroadcastHashJoin"), s"Q8 not broadcast:\n$p8")
    for ((name, q) <- NexmarkQueries.entries if !name.contains("stream")) {
      val plan = planOf(q(spark, sf))
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian:\n$plan")
    }
  }

  test("Q5 sliding window expands each bid into exactly 3 covering windows") {
    import org.apache.spark.sql.functions._
    val b = NexmarkQueries.bids(spark, sf)
    val n = b.count()
    val expanded = b.select(window(col("ts"), "1 hour", "20 minutes"), col("auction")).count()
    assert(expanded == 3 * n, s"expected ${3 * n} window rows, got $expanded")
  }

  test("Q4 average uses exact integer sums: avg equals sum/count on bigint prices") {
    import org.apache.spark.sql.functions._
    val w = NexmarkQueries.q145_nexmark_avg_category(spark, sf)
    assert(w.count() == 10) // all 10 categories populated (dense id % 10)
    val prices = w.select(min("avg_price"), max("avg_price")).head()
    assert(prices.getDouble(0) >= 100.0, "price floor violated")
  }
}
