package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AggregateOperations vocabulary tests + property-style algebraic laws
  * (SURVEY §5.6: partial+final equivalence — the combineFn contract Jet relies
  * on). Seeded generation: deterministic, no scalatestplus bridge needed.
  */
class AggregateOpsSpec extends SparkSpec {

  import spark.implicits._
  private lazy val p = Pipeline.create(spark)
  import AggregateOperations._

  test("counting/summing/averaging/min-max by") {
    val df = Seq(("a", 1L, 1.5), ("a", 2L, 0.5), ("b", 5L, 9.0))
      .toDF("k", "x", "y")
    val out = new BatchStage(df).groupingKey(col("k"))
      .aggregate(allOf(
        counting("n"),
        summingLong(col("x"), "sx"),
        summingDouble(col("y"), "sy"),
        averaging(col("x"), "ax"),
        minBy(col("x"), struct(col("y"), col("x")), "argmin_y"),
        maxBy(col("x"), struct(col("y"), col("x")), "argmax_y")))
      .toDF.collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) === 2 && a.getLong(2) === 3 && a.getDouble(3) === 2.0)
    assert(a.getDouble(4) === 1.5)
    assert(a.getLong(5) === 2 && a.getLong(6) === 1) // argmin by y=0.5 → x=2
  }

  test("sideFiltered conditions built-in AND typed-udaf aggregates (aggregate2 seam)") {
    val df = Seq((0, 5.0), (0, 3.0), (1, 9.0)).toDF("side", "v")
    val top2 = udaf(graft.pipeline.typed.TypedAggs.topN(2))
    val cols = AggregateOperations.sideFiltered(
      AggOp(Seq(
        count(lit(1)).as("n"),
        round(sum($"v"), 2).as("sv"), // scalar wrapper must stay outside the filter
        top2($"v").as("top"))),
      $"side" === 0)
    val r = df.agg(cols.head, cols.tail: _*).collect()(0)
    assert(r.getLong(0) === 2L)        // side-1 row not counted
    assert(r.getDouble(1) === 8.0)     // 5 + 3, not 17
    assert(r.getSeq[Double](2) === Seq(5.0, 3.0)) // 9.0 excluded from the typed agg
  }

  test("sideFiltered filters SESSION-registered aggregates and rejects unknown names") {
    // a session-registered udaf used by bare name must get the side filter
    // (the round-4 builtin-only lookup silently left it unfiltered → it
    // would have accumulated BOTH inputs' rows in a co-aggregation)
    spark.udf.register("graft_spec_top2", udaf(graft.pipeline.typed.TypedAggs.topN(2)))
    val df = Seq((0, 5.0), (0, 3.0), (1, 9.0)).toDF("side", "v")
    val cols = AggregateOperations.sideFiltered(
      AggOp(Seq(expr("graft_spec_top2(v)").as("top"))), $"side" === 0)
    val r = df.agg(cols.head, cols.tail: _*).collect()(0)
    assert(r.getSeq[Double](0) === Seq(5.0, 3.0), "side-1 row leaked into session udaf")
    // a name in NEITHER registry must fail loudly, not pass through unfiltered
    val e = intercept[IllegalArgumentException] {
      AggregateOperations.sideFiltered(
        AggOp(Seq(expr("graft_no_such_fn(v)").as("x"))), $"side" === 0)
    }
    assert(e.getMessage.contains("graft_no_such_fn"))
  }

  test("topN / bottomN / sorting / toList / toSet / concatenating / toMap / pickAny") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("a", 1)).toDF("k", "x")
    val row = new BatchStage(df).groupingKey(col("k"))
      .aggregate(allOf(
        topN(2, col("x"), "top2"),
        bottomN(2, col("x"), "bot2"),
        sorting(col("x"), "sorted"),
        toSet(col("x"), "set"),
        concatenating(col("x"), ",", "cat"),
        toMap(col("x"), col("x") * 10, "m"),
        pickAny(col("k"), "any")))
      .toDF.collect().head
    assert(row.getSeq[Int](1) === Seq(3, 2))
    assert(row.getSeq[Int](2) === Seq(1, 1))
    assert(row.getSeq[Int](3) === Seq(1, 1, 2, 3))
    assert(row.getSeq[Int](4) === Seq(1, 2, 3))
    assert(row.getMap[Int, Int](6) === Map(1 -> 10, 2 -> 20, 3 -> 30))
    assert(row.getString(7) === "a")
  }

  test("linearTrend recovers a known slope") {
    val df = (0 until 100).map(i => (i.toDouble, 3.0 * i + 7.0)).toDF("x", "y")
    val slope = new BatchStage(df).aggregate(linearTrend(col("x"), col("y"), "m"))
      .toDF.collect().head.getDouble(0)
    assert(math.abs(slope - 3.0) < 1e-9)
  }

  test("reducing folds collected values") {
    val df = Seq(1, 2, 3, 4).toDF("x")
    val prod = new BatchStage(df)
      .aggregate(reducing(col("x"), lit(1), (a, b) => a * b, "prod"))
      .toDF.collect().head.getInt(0)
    assert(prod === 24)
  }

  test("filtering: downstream sees only matching rows; fused ops see all rows") {
    import AggregateOperations._
    val df = Seq(("a", 1L), ("a", 10L), ("a", 100L), ("b", 5L)).toDF("k", "v")
    val out = new BatchStage(df).groupingKey(col("k"))
      .aggregate(allOf(
        filtering(col("v") >= 10, summingLong(col("v"), "big_sum")),
        counting("n_all")))
      .toDF.collect().map(r => r.getString(0) -> (r.get(1), r.getLong(2))).toMap
    assert(out("a") === ((110L, 3L)), "filter must scope only its own op")
    assert(out("b") === ((null, 1L)), "no matching rows -> NULL sum, count still 1")
  }

  test("groupingBy: one-pass map-valued aggregation (toList + counting)") {
    import AggregateOperations._
    val df = Seq(("g", "x", 1L), ("g", "y", 2L), ("g", "x", 3L), ("g", null, 9L))
      .toDF("k", "sub", "v")
    val row = new BatchStage(df).groupingKey(col("k"))
      .aggregate(allOf(
        groupingByToList(col("sub"), col("v"), "lists"),
        groupingByCounting(col("sub"), "counts")))
      .toDF.collect().head
    val lists = row.getMap[String, Seq[Long]](1)
    val counts = row.getMap[String, Long](2)
    assert(lists("x").toList === List(1L, 3L) && lists("y").toList === List(2L))
    assert(!lists.contains(null), "NULL keys must be dropped")
    assert(counts === Map("x" -> 2L, "y" -> 1L))
  }

  test("LAW: sum/count are partition-count invariant (combineFn associativity)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val xs = List.fill(1 + rnd.nextInt(200))(rnd.nextLong() % 100000)
      val base = xs.toDF("x")
      val results = Seq(1, 2, 7).map { parts =>
        new BatchStage(base.repartition(parts))
          .aggregate(allOf(summingLong(col("x"), "s"), counting("n")))
          .toDF.collect().head
      }
      assert(results.map(_.getLong(0)).distinct.size === 1)
      assert(results.map(_.getLong(1)).distinct.size === 1)
    }
  }

  test("mapping / flatMapping / averaging aliases / allOfBuilder (r10 name parity)") {
    import graft.pipeline.AggregateOperations._
    val df = Seq((1, "ab"), (1, "c"), (2, "defg")).toDF("k", "s")
    val op = allOfBuilder()
      .add(mapping(col("s"), length(_))(summingLong(_, "chars")))
      .add(flatMapping(col("s"), split(_, ""), size(_).cast("long"), "n_letters"))
      .add(averagingLong(length(col("s")), "avg_len"))
      .build()
    val out = new BatchStage(df).groupingKey(col("k")).aggregate(op)
      .toDF.collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1) === ((3L, 3L, 1.5)))
    assert(out(2) === ((4L, 4L, 4.0)))
  }

  test("LAW: keyed aggregate equals map-side pre-aggregation (two-phase equivalence)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val xs = List.fill(1 + rnd.nextInt(300))((rnd.nextInt(8), rnd.nextInt(1000).toLong))
      val df = xs.toDF("k", "v")
      val direct = new BatchStage(df).groupingKey(col("k"))
        .aggregate(summingLong(col("v"), "s"))
        .toDF.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      // simulate partial aggregation: pre-agg per partition, then combine
      val partial = df.repartition(4).groupBy(col("k"), spark_partition_id().as("p"))
        .agg(sum("v").as("ps"))
        .groupBy("k").agg(sum("ps").as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(direct === partial)
    }
  }
}
