package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Facade parity tests mirroring the reference suites BatchStageTest /
  * BatchAggregateTest / SourcesTest / SinksTest (SURVEY §5.2).
  */
class BatchPipelineSpec extends SparkSpec {

  import spark.implicits._
  private lazy val p = Pipeline.create(spark)

  test("items source + map/filter/flatMap/typed ops") {
    val out = p.readFrom(Sources.items(1 to 10))
      .map(_ * 2)
      .filter(_ > 4)
      .flatMap(x => Seq(x, x + 1))
      .ds.collect().sorted
    assert(out.head === 6 && out.length === 16)
  }

  test("attachFile ships a resource readable from inside a service (JobConfig.attachFile parity)") {
    val f = java.io.File.createTempFile("graft_attach", ".txt")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath, "offset=7")
    p.attachFile(f.getAbsolutePath, "lookup.txt")
    val svc = ServiceFactories.service(() => {
      val txt = java.nio.file.Files
        .readString(Attachments.attachedFile("lookup.txt").toPath)
      txt.stripPrefix("offset=").trim.toInt
    })
    val out = p.readFrom(Sources.items(1 to 5))
      .mapUsingService(svc)((off, x) => x + off)
      .ds.collect().sorted
    assert(out.toSeq == Seq(8, 9, 10, 11, 12))
  }

  test("setName labels the stage in the DAG; setLocalParallelism sets partition count") {
    val named = p.readFrom(Sources.items(1 to 4)).map(_ + 1).setName("adder")
    assert(named.toDotString.contains("adder"))
    val par = named.setLocalParallelism(3)
    // coalesce semantics: exactly n when reducing, no-op when n >= current
    val before = named.ds.rdd.getNumPartitions
    assert(par.ds.rdd.getNumPartitions == math.min(3, before))
    assert(par.ds.collect().sorted.toSeq == Seq(2, 3, 4, 5))
    // the Jet hint must not insert a shuffle: no Exchange in the plan
    assert(!par.ds.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("toDotString renders the stage DAG as GraphViz DOT (Jet Pipeline.toDotString parity)") {
    val dim = p.readFrom(Sources.items(Seq((1, "a"), (2, "b")))).ds.toDF("k", "name")
    val stage = p.readFrom(Sources.items(1 to 10))
      .map(_ * 2)
      .filter(_ > 4)
    val joined = new BatchStage(stage.ds.toDF("k").join(broadcast(dim), "k"))
    val dot = joined.toDotString
    assert(dot.startsWith("digraph pipeline {"))
    assert(dot.trim.endsWith("}"))
    // one node per logical operator, one edge per data flow
    assert(dot.contains("Join"), dot)
    assert(dot.contains("->"), dot)
    val nodes = "n\\d+ \\[label".r.findAllIn(dot).size
    val edges = "n\\d+ -> n\\d+".r.findAllIn(dot).size
    assert(nodes >= 3 && edges == nodes - 1, s"nodes=$nodes edges=$edges\n$dot")
    // labels are quoted/escaped — a malformed label would break the quote pairing
    assert(dot.count(_ == '"') % 2 == 0)
  }

  test("fanOut: one stage, two sinks, the shared prefix runs ONCE (DAG fan-out)") {
    val evals = spark.sparkContext.longAccumulator("fanout_evals")
    val stage = p.readFrom(Sources.items(1 to 100))
      .map { x => evals.add(1); x * 2 }
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    def sink(): Sink = new Sink {
      def write(df: org.apache.spark.sql.DataFrame): Unit =
        got += df.count()
    }
    stage.fanOut(sink(), sink())
    assert(got.toSeq === Seq(100L, 100L), "both sinks saw every row")
    // without the persist pin, two sinks would re-run the map => 200 evals
    assert(evals.value === 100L,
      s"shared prefix evaluated ${evals.value} times, expected once per row")
  }

  test("streaming fanOut: one query feeds two writers per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val job = StreamSinks.fanOut(
      (b, _) => { seen.merge("a", b.count(), java.lang.Long.sum(_, _)); () },
      (b, _) => { seen.merge("b", b.count(), java.lang.Long.sum(_, _)); () }
    ).start(mem.toDF())
    mem.addData(1, 2, 3)
    job.processAllAvailable()
    assert(seen.get("a") === 3L && seen.get("b") === 3L)
    job.cancel()
  }

  test("wordcount parity (reference examples/wordcount)") {
    val lines = Seq("the quick brown fox", "the lazy dog", "the fox")
    val counts = p.readFrom(Sources.items(lines))
      .select(explode(split(lower(col("value")), "\\s+")).as("word"))
      .groupingKey(col("word"))
      .aggregate(AggregateOperations.counting("n"))
      .toDF.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("the") === 3 && counts("fox") === 2 && counts("dog") === 1)
  }

  test("global aggregate (all-to-one) and allOf composition") {
    val row = p.readFrom(Sources.items(1L to 100L))
      .aggregate(AggregateOperations.allOf(
        AggregateOperations.counting("n"),
        AggregateOperations.summingLong(col("value"), "s"),
        AggregateOperations.averaging(col("value"), "a")))
      .toDF.collect().head
    assert(row.getLong(0) === 100 && row.getLong(1) === 5050 && row.getDouble(2) === 50.5)
  }

  test("hashJoin is planned as a broadcast join") {
    val facts = p.readFrom(Sources.parquet(s"$sf/orders.parquet"))
    val dim = p.readFrom(Sources.parquet(s"$sf/customer.parquet"))
    val joined = facts.innerHashJoin(dim, col("o_custkey") === col("c_custkey"))
    val plan = joined.toDF.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
    assert(joined.toDF.count() > 0)
  }

  test("hashJoinN chains broadcasts (hashJoinBuilder parity)") {
    val li = p.readFrom(Sources.parquet(s"$sf/lineitem.parquet"))
    val orders = p.readFrom(Sources.parquet(s"$sf/orders.parquet"))
    val part = p.readFrom(Sources.parquet(s"$sf/part.parquet"))
    val out = li.hashJoinN(
      (orders, col("l_orderkey") === col("o_orderkey")),
      (part, col("l_partkey") === col("p_partkey")))
    assert(out.toDF.count() > 0)
  }

  test("sort + limit + distinct + merge + rebalance") {
    val a = p.readFrom(Sources.items(Seq(3, 1, 2, 2)))
    val b = p.readFrom(Sources.items(Seq(4, 4)))
    val merged = a.merge(b).distinct().sort(col("value")).ds.collect()
    assert(merged.toSeq === Seq(1, 2, 3, 4))
    assert(a.rebalance(8).ds.rdd.getNumPartitions === 8)
  }

  test("mapUsingService: per-partition service lifecycle") {
    val factory = ServiceFactories.service[java.text.DecimalFormat](
      () => new java.text.DecimalFormat("000"))
    val out = p.readFrom(Sources.items(Seq(1, 22, 333)))
      .mapUsingService(factory)((fmt, x) => fmt.format(x.toLong))
      .ds.collect().sorted
    assert(out.toSeq === Seq("001", "022", "333"))
  }

  test("mapUsingServiceBatched groups inputs") {
    val factory = ServiceFactories.service[String](() => "svc")
    val out = p.readFrom(Sources.items(1 to 10))
      .mapUsingServiceBatched(factory, batchSize = 3)((_, batch) => batch.map(_ + 100))
      .ds.collect()
    assert(out.sorted.toSeq === (101 to 110))
  }

  test("aggregate2 co-aggregation (full outer on key)") {
    val odd = p.readFrom(Sources.items(Seq(1, 3, 5, 7))).toDF.withColumn("k", col("value") % 3)
    val even = p.readFrom(Sources.items(Seq(2, 4, 6))).toDF.withColumn("k", col("value") % 3)
    val out = new BatchStage(odd).groupingKey(col("k"))
      .aggregate2(AggregateOperations.counting("n_odd"),
        new BatchStage(even).groupingKey(col("k")),
        AggregateOperations.counting("n_even"))
      .toDF.collect().map(r => (r.getInt(0), (Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out.size === 3)
  }

  test("aggregate3 three-way co-aggregation") {
    val s1 = p.readFrom(Sources.items(Seq(1, 2, 3, 4))).toDF.withColumn("k", col("value") % 2)
    val s2 = p.readFrom(Sources.items(Seq(10, 20))).toDF.withColumn("k", col("value") % 2)
    val s3 = p.readFrom(Sources.items(Seq(5))).toDF.withColumn("k", col("value") % 2)
    val out = new BatchStage(s1).groupingKey(col("k"))
      .aggregate3(
        AggregateOperations.counting("n1"),
        new BatchStage(s2).groupingKey(col("k")), AggregateOperations.counting("n2"),
        new BatchStage(s3).groupingKey(col("k")), AggregateOperations.counting("n3"))
      .toDF.collect().map(r => r.getInt(0) -> (r.get(1), r.get(2), r.get(3))).toMap
    assert(out(0) === ((2L, 2L, null)) && out(1) === ((2L, null, 1L)))
  }

  test("aggregateBuilder N-way co-aggregation (Jet GrAggBuilder, N=4)") {
    def staged(vals: Seq[Int]) = new BatchStage(
      p.readFrom(Sources.items(vals)).toDF.withColumn("k", col("value") % 2))
      .groupingKey(col("k"))
    val out = staged(Seq(1, 2, 3, 4)).aggregateBuilder(AggregateOperations.counting("n1"))
      .add(staged(Seq(10, 20)), AggregateOperations.counting("n2"))
      .add(staged(Seq(5)), AggregateOperations.counting("n3"))
      .add(staged(Seq(7, 9, 11)), AggregateOperations.counting("n4"))
      .build()
      .toDF.collect().map(r => r.getInt(0) -> (r.get(1), r.get(2), r.get(3), r.get(4))).toMap
    // key 0: evens in s1/s2; absent from s3/s4 → NULL tags (ItemsByTag.get → null)
    assert(out(0) === ((2L, 2L, null, null)))
    assert(out(1) === ((2L, null, 1L, 3L)))
  }

  test("mapUsingServiceAsync: bounded in-flight async calls") {
    import scala.concurrent.Future
    import scala.concurrent.ExecutionContext.Implicits.global
    val factory = ServiceFactories.service[String](() => "svc")
    val out = p.readFrom(Sources.items(1 to 20))
      .mapUsingServiceAsync(factory, maxConcurrent = 4)((_, x) => Future(x * 2))
      .ds.collect()
    assert(out.sorted.toSeq === (1 to 20).map(_ * 2))
  }

  test("topNPerKey never materializes the group (window row_number)") {
    val li = p.readFrom(Sources.parquet(s"$sf/lineitem.parquet"))
    val top = li.topNPerKey(2, col("l_returnflag"),
      col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val counts = top.toDF.groupBy("l_returnflag").count().collect()
    assert(counts.forall(_.getLong(1) <= 2))
  }

  test("KeyedStore: put/get/upsert last-writer-wins + sinks") {
    KeyedStore.put("kv_test", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    p.readFrom(Sources.items(Seq((2, "B"), (3, "C"))))
      .toDF.toDF("k", "v").let { df =>
        Sinks.map("kv_test", "k").write(df)
      }
    val m = KeyedStore.get(spark, "kv_test").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(m === Map(1 -> "a", 2 -> "B", 3 -> "C"))
    KeyedStore.drop("kv_test")
  }

  implicit class Let[A](a: A) { def let[B](f: A => B): B = f(a) }
}
