package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.concurrent.Future

/** Service-transform variants added round 2 (reference: GeneralStage.java
  * filterUsingService:255, flatMapUsingService:279, async-unordered:354 →
  * AsyncTransformUsingServiceUnorderedP) plus the expression-keyed
  * aggregate2/distinct fixes and lazy peek.
  */
class ServiceOpsSpec extends SparkSpec {

  import spark.implicits._
  private lazy val p = Pipeline.create(spark)

  test("filterUsingService / flatMapUsingService with per-partition lifecycle") {
    val factory = ServiceFactories.service[Set[Int]](() => Set(2, 4, 6))
    val kept = p.readFrom(Sources.items(1 to 8))
      .filterUsingService(factory)((svc, x) => svc.contains(x))
      .ds.collect().sorted
    assert(kept.toSeq === Seq(2, 4, 6))
    val expanded = p.readFrom(Sources.items(Seq(1, 2)))
      .flatMapUsingService(factory)((svc, x) => svc.toSeq.sorted.map(_ * x))
      .ds.collect().sorted
    assert(expanded.toSeq === Seq(2, 4, 4, 6, 8, 12))
  }

  test("mapUsingServiceAsyncUnordered emits in completion order, all results present") {
    import scala.concurrent.ExecutionContext.Implicits.global
    val factory = ServiceFactories.service[String](() => "svc")
    // first item sleeps; unordered emission means the rest never wait on it
    val out = p.wrap(spark.createDataset(Seq(50, 1, 2, 3)).coalesce(1))
      .mapUsingServiceAsyncUnordered(factory, maxConcurrent = 4)((_, x) =>
        Future { Thread.sleep(x.toLong * 4); x })
      .ds.collect()
    assert(out.sorted.toSeq === Seq(1, 2, 3, 50))
    // completion order: the 200ms sleeper lands last despite being first input
    assert(out.last === 50)
  }

  test("mapUsingServiceAsync is a sliding window: later calls complete during a slow head, order preserved") {
    import scala.concurrent.ExecutionContext.Implicits.global
    AsyncOrderedProbe.done.clear()
    val t0 = System.nanoTime()
    val factory = ServiceFactories.service[String](() => "svc")
    val out = p.wrap(spark.createDataset(Seq(0, 1, 2, 3, 4)).coalesce(1))
      .mapUsingServiceAsync(factory, maxConcurrent = 4)((_, x) =>
        Future {
          Thread.sleep(if (x == 0) 600L else 5L)
          AsyncOrderedProbe.done.put(x, System.nanoTime() - t0)
          x
        })
      .ds.collect()
    // ordered emission: exactly the input order
    assert(out.toSeq === Seq(0, 1, 2, 3, 4))
    // sliding window, not a cohort barrier: items 1-3 fill the initial ring;
    // item 4 is issued the moment the slow head is dequeued for emission —
    // ALL of them complete while the head is still sleeping. (The round-4
    // grouped+Future.sequence form ran [0,1,2,3] as a cohort, so item 4
    // could not even START before the 600 ms head finished.)
    val headDone = AsyncOrderedProbe.done.get(0)
    (1 to 4).foreach { i =>
      assert(AsyncOrderedProbe.done.get(i) < headDone,
        s"item $i completed after the slow head — window is not sliding")
    }
  }

  test("mapUsingServiceAsyncBatched: concurrent batches in flight, ordered flattened output") {
    import scala.concurrent.ExecutionContext.Implicits.global
    AsyncOrderedProbe.done.clear()
    val t0 = System.nanoTime()
    val factory = ServiceFactories.service[String](() => "svc")
    val out = p.wrap(spark.createDataset(Seq(0, 1, 2, 3, 4, 5)).coalesce(1))
      .mapUsingServiceAsyncBatched(factory, batchSize = 2, maxConcurrent = 3)(
        (_, batch) => Future {
          Thread.sleep(if (batch.head == 0) 500L else 5L)
          AsyncOrderedProbe.done.put(batch.head, System.nanoTime() - t0)
          batch.map(_ * 10)
        })
      .ds.collect()
    // ordered, flattened: batches [0,1],[2,3],[4,5] in input order
    assert(out.toSeq === Seq(0, 10, 20, 30, 40, 50))
    // the later batches completed WHILE the slow head batch was in flight
    val headDone = AsyncOrderedProbe.done.get(0)
    Seq(2, 4).foreach { b =>
      assert(AsyncOrderedProbe.done.get(b) < headDone,
        s"batch starting at $b completed after the slow head — not concurrent")
    }
  }

  test("async early-exit (limit) drains in-flight calls before destroying the service") {
    import scala.concurrent.ExecutionContext.Implicits.global
    AsyncOrderedProbe.done.clear()
    AsyncOrderedProbe.useAfterClose.set(0)
    AsyncOrderedProbe.closed.set(false)
    val factory = ServiceFactories.service[String](() => "svc",
      _ => AsyncOrderedProbe.closed.set(true))
    // window of 4: limit(1) abandons the iterator with ~3 calls in flight;
    // the task-completion listener must drain them before destroy — any
    // in-flight call observing the closed flag is a use-after-close
    val out = p.wrap(spark.createDataset(Seq(1, 2, 3, 4, 5)).coalesce(1))
      .mapUsingServiceAsync(factory, maxConcurrent = 4)((_, x) =>
        Future {
          Thread.sleep(80)
          if (AsyncOrderedProbe.closed.get()) AsyncOrderedProbe.useAfterClose.incrementAndGet()
          x
        })
      .ds.limit(1).collect()
    assert(out.length === 1)
    // allow the task-completion listener to finish
    Thread.sleep(600)
    assert(AsyncOrderedProbe.closed.get(), "service never destroyed")
    assert(AsyncOrderedProbe.useAfterClose.get() === 0,
      "a still-running call observed the service after destroy")
  }

  test("aggregate2/aggregate3/distinct work with EXPRESSION grouping keys") {
    val left = p.wrap(Seq(("Ann", 1), ("ann", 2), ("bob", 3)).toDF("name", "v"))
      .groupingKey(upper(col("name")))
    val right = p.wrap(Seq(("ANN", 10), ("Bob", 20)).toDF("name", "w"))
      .groupingKey(upper(col("name")))
    val co = left.aggregate2(
      AggregateOperations.summingLong(col("v"), "sv"),
      right, AggregateOperations.summingLong(col("w"), "sw"))
      .toDF.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(co.toSeq === Seq(("ANN", 3L, 10L), ("BOB", 3L, 20L)))

    val d = p.wrap(Seq(("Ann", 1), ("ann", 2), ("bob", 3)).toDF("name", "v"))
      .groupingKey(upper(col("name"))).distinct()
      .toDF.collect()
    assert(d.length === 2)
    // hidden key columns are dropped from the output
    assert(d.head.schema.fieldNames.toSeq === Seq("name", "v"))
  }

  test("stream mapUsingService / filterUsingService run inside micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StructType}
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    mem.addData(1, 2, 3, 4)
    val factory = ServiceFactories.service[Int](() => 10)
    val out = new StreamSourceStage(mem.toDF()).withoutTimestamps()
      .filterUsingService(factory)((_, r) => r.getInt(0) % 2 == 0)
      .mapUsingService(factory, new StructType().add("v", IntegerType))(
        (svc, r) => Row(r.getInt(0) * svc))
    val job = StreamSinks.memory("svc_stream_test", "append").start(out.df)
    job.processAllAvailable()
    val vals = spark.table("svc_stream_test").collect().map(_.getInt(0)).sorted
    assert(vals.toSeq === Seq(20, 40))
    job.cancel()
  }

  test("SourceBuilder.batch distributes create/fill/destroy over tasks") {
    // each of 4 task contexts emits its own 25-number range in 10-row buffers
    val src = Sources.build[(Int, Iterator[Seq[Int]]), Int](parallelism = 4) { idx =>
      (idx, (idx * 25 until (idx + 1) * 25).grouped(10).map(_.toSeq))
    } { case (_, chunks) => if (chunks.hasNext) Some(chunks.next()) else None }()
    val out = p.readFrom(src).ds.collect().sorted
    assert(out.toSeq === (0 until 100).toSeq)
  }

  test("SourceBuilder destroys every created context even when the partition is not drained") {
    SourceBuilderProbe.created.set(0)
    SourceBuilderProbe.destroyed.set(0)
    val src = Sources.build[Iterator[Seq[Int]], Int](parallelism = 2) { idx =>
      SourceBuilderProbe.created.incrementAndGet()
      ((idx * 50) until ((idx + 1) * 50)).grouped(10).map(_.toSeq)
    } { it => if (it.hasNext) Some(it.next()) else None } { _ =>
      SourceBuilderProbe.destroyed.incrementAndGet(); ()
    }
    // limit stops consuming before any partition iterator is drained — the
    // task-completion listener must still run destroy once per created context
    assert(p.readFrom(src).ds.limit(3).collect().length === 3)
    assert(SourceBuilderProbe.created.get() >= 1)
    assert(SourceBuilderProbe.destroyed.get() === SourceBuilderProbe.created.get())
  }

  test("peek is lazy (no job at construction) and passes rows through") {
    val stage = p.readFrom(Sources.items(1 to 100)).peek(2)
    // construction ran no job; the data survives the passthrough intact
    assert(stage.ds.collect().sorted.toSeq === (1 to 100).toSeq)
  }
}

/** Static probe for SourceBuilder lifecycle assertions: an object's fields are
  * resolved through the classloader, so executor threads in local mode mutate
  * the SAME counters the test thread reads (a captured field would be
  * serialized into the closure and mutations lost).
  */
object SourceBuilderProbe {
  val created = new java.util.concurrent.atomic.AtomicInteger(0)
  val destroyed = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Completion-time probe for the ordered-async sliding-window test (static:
  * task closures are serialized even in local mode; a JVM-static map is the
  * only state both sides see).
  */
object AsyncOrderedProbe {
  val done = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
  val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
  val useAfterClose = new java.util.concurrent.atomic.AtomicInteger(0)
}
