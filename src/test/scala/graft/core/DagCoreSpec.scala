package graft.core

import graft.SparkSpec

import scala.collection.mutable

/** Core DAG API (reference: hazelcast-jet-core/.../core/DAG.java, Edge.java,
  * Processor.java): topology validation, the processor/tasklet loop incl.
  * cooperative backpressure, edge routing policies, priority draining, and the
  * canonical two-stage word-count + hash-join DAGs compiled to Spark.
  */
class DagCoreSpec extends SparkSpec {

  private def sc = spark.sparkContext

  // ------------------------------------------------------------ traverser laws

  test("traverser combinators: map/filter/flatMap/take/drop/append/prepend") {
    def t = Traversers.traverseItems(1, 2, 3, 4, 5)
    def drain[T](tr: Traverser[T]): List[T] = {
      val b = mutable.ListBuffer.empty[T]
      var x = tr.next()
      while (x != null) { b += x; x = tr.next() }
      b.toList
    }
    assert(drain(t.map(i => i * 10)) == List(10, 20, 30, 40, 50))
    assert(drain(t.filter(i => i % 2 == 1)) == List(1, 3, 5))
    assert(drain(t.flatMap(i => Traversers.traverseItems(i, -i))) ==
      List(1, -1, 2, -2, 3, -3, 4, -4, 5, -5))
    assert(drain(t.takeWhile(i => i < 3)) == List(1, 2))
    assert(drain(t.dropWhile(i => i < 3)) == List(3, 4, 5))
    assert(drain(t.append(9).prepend(0)) == List(0, 1, 2, 3, 4, 5, 9))
    var fired = 0
    val withHook = t.onFirstNull(() => fired += 1)
    assert(drain(withHook) == List(1, 2, 3, 4, 5))
    withHook.next(); withHook.next()
    assert(fired == 1)
  }

  test("appendable and resettable-singleton traversers") {
    val app = new AppendableTraverser[Integer](4)
    app.append(1).append(2)
    assert(app.next() == 1 && app.next() == 2 && app.next() == null)
    val single = new ResettableSingletonTraverser[String]
    single.accept("x")
    assert(single.next() == "x" && single.next() == null)
    single.accept("y")
    assert(single.next() == "y")
  }

  // ------------------------------------------------------------ dag validation

  test("DAG validation: duplicate names, ordinal clashes, contiguity, cycles") {
    val dag = new DAG
    val a = dag.newVertex("a", Processors.noopP())
    val b = dag.newVertex("b", Processors.noopP())
    intercept[IllegalArgumentException](dag.newVertex("a", Processors.noopP()))
    dag.edge(Edge.between(a, b))
    // second outbound edge at ordinal 0 of a
    intercept[IllegalArgumentException](dag.edge(Edge.between(a, b)))
    val c = dag.newVertex("c", Processors.noopP())
    // inbound ordinal gap on c: edge lands at ordinal 1 with no ordinal 0
    dag.edge(Edge.from(b).to(c, 1))
    intercept[IllegalArgumentException](dag.iterator.toList)
    // close the gap → valid, topological order a, b, c
    dag.edge(Edge.from(a, 1).to(c, 0))
    assert(dag.iterator.map(_.name).toList == List("a", "b", "c"))
    // cycles rejected
    val cyc = new DAG
    val x = cyc.newVertex("x", Processors.noopP())
    val y = cyc.newVertex("y", Processors.noopP())
    cyc.edge(Edge.between(x, y)).edge(Edge.between(y, x))
    intercept[IllegalArgumentException](cyc.iterator.toList)
    // self-edge rejected
    intercept[IllegalArgumentException](cyc.edge(Edge.between(x, x)))
  }

  test("toDotString and toJson render the topology") {
    val dag = new DAG
    val s = dag.newVertex("src", Processors.itemsP(Seq(1)))
    val t = dag.newVertex("sink", Processors.noopP())
    dag.edge(Edge.between(s, t).partitioned(identity).priority(-1))
    val dot = dag.toDotString
    assert(dot.contains("\"src\" -> \"sink\"") && dot.contains("partitioned"))
    val json = dag.toJson
    assert(json.contains("\"routing\":\"PARTITIONED\"") && json.contains("\"priority\":-1"))
  }

  // ------------------------------------------------------- processor execution

  test("itemsP source → mapP → filterP pipeline end to end") {
    val dag = new DAG
    val src = dag.newVertex("src", Processors.itemsP(1 to 100)).localParallelism(1)
    val map = dag.newVertex("map", Processors.mapP((i: Int) => i * 2))
    val filt = dag.newVertex("filter", Processors.filterP((i: Int) => i % 20 == 0))
    dag.edge(Edge.between(src, map)).edge(Edge.between(map, filt))
    val res = DagExecutor.execute(spark, dag)("filter").map(_.asInstanceOf[Int]).sorted
    assert(res == (20 to 200 by 20).toList)
  }

  test("flatMapP emits via suspendable traverser under a tiny outbox") {
    val dag = new DAG
    val src = dag.newVertex("src", Processors.itemsP(1 to 50)).localParallelism(1)
    val fm = dag.newVertex("fm",
      Processors.flatMapP((i: Int) => Traversers.traverseItems(i, i, i)))
    dag.edge(Edge.between(src, fm))
    // outboxCapacity=2 forces repeated suspension mid-traverser
    val res = DagExecutor.execute(spark, dag, outboxCapacity = 2)("fm")
    assert(res.size == 150)
    assert(res.map(_.asInstanceOf[Int]).sum == 3 * (1 to 50).sum)
  }

  test("two-stage aggregation: accumulateByKeyP → partitioned edge → combineByKeyP") {
    val words = Seq("a", "b", "a", "c", "b", "a") ++ (1 to 94).map(i => s"w${i % 7}")
    val input = sc.parallelize(words.map(_.asInstanceOf[Any]), 4)
    val dag = new DAG
    val acc = dag.newVertex("accumulate",
      Processors.accumulateByKeyP((w: Any) => w, AggregateOp.counting))
    val comb = dag.newVertex("combine",
      Processors.combineByKeyP[Any, Long, Long](AggregateOp.counting, (k, n) => (k, n)))
    dag.edge(Edge.between(acc, comb).partitioned(_.asInstanceOf[(Any, Long)]._1)
      .distributed())
    val res = DagExecutor
      .execute(spark, dag, inputs = Map("accumulate" -> input))("combine")
      .map(_.asInstanceOf[(String, Long)])
      .toMap
    val expected = words.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(res == expected)
  }

  test("aggregateP on an allToOne edge computes the global aggregate once") {
    val input = sc.parallelize((1 to 1000).map(_.asInstanceOf[Any]), 8)
    val dag = new DAG
    val pass = dag.newVertex("pass", Processors.mapP((i: Int) => i))
    val agg = dag.newVertex("agg",
      Processors.aggregateP(AggregateOp.summingLong(_.asInstanceOf[Int].toLong)))
      .localParallelism(1) // Jet convention: full aggregate = allToOne + lp 1
    dag.edge(Edge.between(pass, agg).allToOne("k"))
    val res = DagExecutor.execute(spark, dag, inputs = Map("pass" -> input))("agg")
    assert(res == Seq(500500L))
  }

  test("priority edge: broadcast build side drains fully before probe (hash join)") {
    // the canonical Jet hash-join DAG: build side at priority -1, broadcast
    val build = sc.parallelize(
      Seq(("FR", "France"), ("DE", "Germany")).map(_.asInstanceOf[Any]), 2)
    val probe = sc.parallelize(
      Seq(("FR", 1), ("DE", 2), ("FR", 3), ("XX", 4)).map(_.asInstanceOf[Any]), 3)
    val joinP: () => Processor = () =>
      new AbstractProcessor {
        private val table = mutable.HashMap.empty[String, String]
        private var sawProbeBeforeBuildDone = false
        private var buildDone = false
        override protected def tryProcess(ordinal: Int, item: Any): Boolean =
          ordinal match {
            case 0 => // build
              val (k, v) = item.asInstanceOf[(String, String)]
              table.update(k, v); true
            case 1 => // probe
              if (!buildDone) sawProbeBeforeBuildDone = true
              val (k, n) = item.asInstanceOf[(String, Int)]
              table.get(k) match {
                case Some(name) => tryEmit((k, name, n))
                case None       => true // inner join: drop
              }
          }
        override def completeEdge(ordinal: Int): Boolean = {
          if (ordinal == 0) buildDone = true
          true
        }
        override def complete(): Boolean = {
          // plain throw: scalatest assert would capture the spec instance
          if (sawProbeBeforeBuildDone)
            throw new IllegalStateException("probe item arrived before build completed")
          true
        }
      }
    val dagJ = new DAG
    val b = dagJ.newVertex("build", Processors.mapP((x: Any) => x))
    val p = dagJ.newVertex("probe", Processors.mapP((x: Any) => x))
    val j = dagJ.newVertex("join", joinP)
    dagJ
      .edge(Edge.from(b).to(j, 0).broadcast().priority(-1))
      .edge(Edge.from(p).to(j, 1))
    val res = DagExecutor
      .execute(spark, dagJ, inputs = Map("build" -> build, "probe" -> probe))("join")
      .map(_.asInstanceOf[(String, String, Int)])
      .sortBy(_._3)
    assert(res == Seq(("FR", "France", 1), ("DE", "Germany", 2), ("FR", "France", 3)))
  }

  test("isolated edge enforces equal parallelism; unicast rebalances") {
    val input = sc.parallelize((1 to 10).map(_.asInstanceOf[Any]), 3)
    val dag = new DAG
    val a = dag.newVertex("a", Processors.mapP((i: Int) => i))
    val b = dag.newVertex("b", Processors.mapP((i: Int) => i)).localParallelism(5)
    dag.edge(Edge.between(a, b).isolated())
    intercept[IllegalArgumentException](
      DagExecutor.compile(spark, dag, inputs = Map("a" -> input)))
    val dag2 = new DAG
    val a2 = dag2.newVertex("a", Processors.mapP((i: Int) => i))
    val b2 = dag2.newVertex("b", Processors.mapP((i: Int) => i)).localParallelism(5)
    dag2.edge(Edge.between(a2, b2)) // unicast
    val compiled = DagExecutor.compile(spark, dag2, inputs = Map("a" -> input))
    assert(compiled("b").getNumPartitions == 5)
    assert(compiled("b").collect().map(_.asInstanceOf[Int]).sorted.toSeq == (1 to 10))
    assert(a != null && b != null && a2 != null && b2 != null)
  }

  test("ordered edge feeds each partition's stream in comparator order") {
    val input = sc.parallelize(
      Seq(5, 3, 9, 1, 7, 2, 8).map(_.asInstanceOf[Any]), 2)
    val checkOrderP: () => Processor = () =>
      new AbstractProcessor {
        private var last = Int.MinValue
        override protected def tryProcess(ordinal: Int, item: Any): Boolean = {
          val i = item.asInstanceOf[Int]
          if (i < last) throw new IllegalStateException(s"out of order: $i after $last")
          last = i
          tryEmit(i)
        }
      }
    val dag = new DAG
    val a = dag.newVertex("a", Processors.mapP((i: Int) => i))
    val chk = dag.newVertex("check", checkOrderP)
    dag.edge(Edge.between(a, chk).ordered(Ordering.Int.asInstanceOf[Ordering[Any]]))
    val res = DagExecutor.execute(spark, dag, inputs = Map("a" -> input))("check")
    assert(res.map(_.asInstanceOf[Int]).sorted.toSeq == Seq(1, 2, 3, 5, 7, 8, 9))
  }

  test("sortP + allToOne produces a globally sorted stream") {
    val input = sc.parallelize(
      scala.util.Random.shuffle((1 to 200).toList).map(_.asInstanceOf[Any]), 6)
    val dag = new DAG
    val pre = dag.newVertex("pre", Processors.mapP((i: Int) => i))
    val sorter = dag.newVertex("sort", Processors.sortP(Ordering.Int))
    dag.edge(Edge.between(pre, sorter).allToOne("all"))
    val res = DagExecutor.execute(spark, dag, inputs = Map("pre" -> input))("sort")
    assert(res.map(_.asInstanceOf[Int]).toSeq == (1 to 200))
  }

  test("mapStatefulP keeps per-key state within the partitioned stage") {
    val events =
      Seq(("k1", 1), ("k1", 2), ("k2", 10), ("k1", 3), ("k2", 20))
        .map(_.asInstanceOf[Any])
    val input = sc.parallelize(events, 2)
    val dag = new DAG
    val route = dag.newVertex("route", Processors.mapP((x: Any) => x))
    val runsum = dag.newVertex("runsum",
      Processors.mapStatefulP[String, Long, (String, Long)](
        keyFn = _.asInstanceOf[(String, Int)]._1,
        createFn = () => 0L,
        mapFn = (s, k, item) => {
          val s2 = s + item.asInstanceOf[(String, Int)]._2
          (s2, (k, s2))
        }))
    dag.edge(Edge.between(route, runsum).partitioned(_.asInstanceOf[(String, Int)]._1))
    val res = DagExecutor
      .execute(spark, dag, inputs = Map("route" -> input))("runsum")
      .map(_.asInstanceOf[(String, Long)])
    // final per-key running sums must appear
    assert(res.contains(("k1", 6L)) && res.contains(("k2", 30L)))
    assert(res.size == 5)
  }

  test("close() runs exactly once per instance, also with empty input") {
    val counter = sc.collectionAccumulator[String]("closes")
    val closingP: () => Processor = () =>
      new AbstractProcessor {
        override protected def tryProcess(ordinal: Int, item: Any): Boolean = tryEmit(item)
        override def close(): Unit = counter.add("closed")
      }
    val input = sc.parallelize(Seq.empty[Any], 3)
    val dag = new DAG
    val v = dag.newVertex("v", closingP)
    val res = DagExecutor.execute(spark, dag, inputs = Map("v" -> input))("v")
    assert(res.isEmpty)
    assert(counter.value.size == 3) // one per partition instance
  }

  test("mapStatefulP under a tiny outbox: state commits only after emit (no double-apply)") {
    // outboxCapacity=2 < ChunkSize forces rejected emits mid-chunk; before the
    // pending-slot fix the re-offered item ran mapFn against the already-
    // updated state and running sums double-counted.
    val events = (1 to 400).map(i => ("k" + (i % 3), 1)).map(_.asInstanceOf[Any])
    val input = sc.parallelize(events, 2)
    val dag = new DAG
    val route = dag.newVertex("route", Processors.mapP((x: Any) => x))
    val runsum = dag.newVertex("runsum",
      Processors.mapStatefulP[String, Long, (String, Long)](
        keyFn = _.asInstanceOf[(String, Int)]._1,
        createFn = () => 0L,
        mapFn = (s, k, item) => {
          val s2 = s + item.asInstanceOf[(String, Int)]._2
          (s2, (k, s2))
        }))
    dag.edge(Edge.between(route, runsum).partitioned(_.asInstanceOf[(String, Int)]._1))
    val res = DagExecutor
      .execute(spark, dag, inputs = Map("route" -> input), outboxCapacity = 2)("runsum")
      .map(_.asInstanceOf[(String, Long)])
    assert(res.size == 400)
    // final running sum per key == exact item count per key
    val finalSums = res.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
    val expected = events.map(_.asInstanceOf[(String, Int)])
      .groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    assert(finalSums == expected)
  }

  test("mapP/filterP invoke the user fn exactly once per item under outbox rejection") {
    val mapCalls = sc.longAccumulator("mapCalls")
    val filterCalls = sc.longAccumulator("filterCalls")
    val input = sc.parallelize((1 to 300).map(_.asInstanceOf[Any]), 2)
    val dag = new DAG
    val m = dag.newVertex("m", Processors.mapP { (i: Int) => mapCalls.add(1); i * 2 })
    val f = dag.newVertex("f", Processors.filterP { (i: Int) => filterCalls.add(1); i % 4 == 0 })
    dag.edge(Edge.between(m, f))
    val res = DagExecutor
      .execute(spark, dag, inputs = Map("m" -> input), outboxCapacity = 1)("f")
    assert(res.size == 150)
    assert(mapCalls.value == 300L)
    assert(filterCalls.value == 300L)
  }

  test("edge validation: unset destination fails with the intended message") {
    val dag = new DAG
    val a = dag.newVertex("a", Processors.noopP())
    val ex = intercept[IllegalArgumentException](dag.edge(Edge.from(a)))
    assert(ex.getMessage.contains("has no destination"))
    // Edge.toString itself must be null-safe for the unset destination
    assert(Edge.from(a).toString.contains("?"))
  }

  test("ordered edge sorts streams much larger than the inbox chunk (spill-aware path)") {
    val n = 20000 // >> ChunkSize(256) and outboxCapacity
    val data = scala.util.Random.shuffle((1 to n).toList).map(_.asInstanceOf[Any])
    val checkOrderP: () => Processor = () =>
      new AbstractProcessor {
        private var last = Int.MinValue
        override protected def tryProcess(ordinal: Int, item: Any): Boolean = {
          val i = item.asInstanceOf[Int]
          if (i < last) throw new IllegalStateException(s"out of order: $i after $last")
          last = i
          tryEmit(i)
        }
      }
    // unicast ordered (localExternalSort path)
    val dag1 = new DAG
    val a1 = dag1.newVertex("a", Processors.mapP((i: Int) => i))
    val c1 = dag1.newVertex("check", checkOrderP)
    dag1.edge(Edge.between(a1, c1).ordered(Ordering.Int.asInstanceOf[Ordering[Any]]))
    val r1 = DagExecutor.execute(spark, dag1,
      inputs = Map("a" -> sc.parallelize(data, 4)))("check")
    assert(r1.map(_.asInstanceOf[Int]).sorted.toSeq == (1 to n))
    // partitioned ordered (single-shuffle sortedShuffle path): same key →
    // one partition, so the comparator order is also the global order
    val dag2 = new DAG
    val a2 = dag2.newVertex("a", Processors.mapP((i: Int) => i))
    val c2 = dag2.newVertex("check", checkOrderP)
    dag2.edge(Edge.between(a2, c2)
      .partitioned(i => i.asInstanceOf[Int] % 2)
      .ordered(Ordering.Int.asInstanceOf[Ordering[Any]]))
    val r2 = DagExecutor.execute(spark, dag2,
      inputs = Map("a" -> sc.parallelize(data, 4)))("check")
    assert(r2.map(_.asInstanceOf[Int]).sorted.toSeq == (1 to n))
  }

  test("a vertex with two outbound edges computes once (persisted, not re-run)") {
    val calls = sc.longAccumulator("sharedCalls")
    val input = sc.parallelize((1 to 100).map(_.asInstanceOf[Any]), 2)
    val dag = new DAG
    val shared = dag.newVertex("shared", Processors.mapP { (i: Int) => calls.add(1); i })
    val l1 = dag.newVertex("l1", Processors.mapP((i: Int) => i + 1))
    val l2 = dag.newVertex("l2", Processors.mapP((i: Int) => i - 1))
    dag.edge(Edge.from(shared, 0).to(l1, 0))
    dag.edge(Edge.from(shared, 1).to(l2, 0))
    val res = DagExecutor.execute(spark, dag, inputs = Map("shared" -> input))
    assert(res("l1").size == 100 && res("l2").size == 100)
    assert(calls.value == 100L) // one run, not one per leaf
  }

  test("insertWatermarksP: throttled watermarks, lag applied, final MaxValue flush") {
    val events = Seq(105L, 120L, 118L, 250L, 240L, 380L).map(_.asInstanceOf[Any])
    val input = sc.parallelize(events, 1)
    val dag = new DAG
    val wm = dag.newVertex("wm",
      Processors.insertWatermarksP[Long](ts => ts, lag = 10L, throttleFrame = 100L))
      .localParallelism(1)
    // probe: record watermarks AND items in arrival order
    val probe: () => Processor = () =>
      new AbstractProcessor {
        override protected def tryProcess(ordinal: Int, item: Any): Boolean =
          tryEmit(("item", item))
        override def tryProcessWatermark(w: Watermark): Boolean =
          tryEmit(("wm", w.timestamp))
      }
    val sink = dag.newVertex("sink", probe).localParallelism(1)
    dag.edge(Edge.between(wm, sink))
    val out = DagExecutor.execute(spark, dag, inputs = Map("wm" -> input))("sink")
      .map(_.asInstanceOf[(String, Any)])
    val wms = out.collect { case ("wm", ts: Long) => ts }
    val items = out.collect { case ("item", v) => v }
    assert(items == events, "all events pass through in order")
    // top-ts 105-10=95 → frame 0; 120-10=110 → 100; 250-10=240 → 200;
    // 380-10=370 → 300; then the bounded-final MaxValue
    assert(wms == Seq(0L, 100L, 200L, 300L, Long.MaxValue),
      s"throttled watermark sequence expected, got $wms")
  }

  test("watermark coalescing: min across senders governs, forwarded monotonically") {
    // sender partition 0 watermarks ahead (top ts 1000), sender 1 lags (500)
    val input: org.apache.spark.rdd.RDD[Any] = sc.parallelize(0 until 2, 2)
      .mapPartitionsWithIndex((i, _) =>
        (if (i == 0) Seq(1000L) else Seq(500L, 510L)).map(_.asInstanceOf[Any]).iterator)
    val dag = new DAG
    val wm = dag.newVertex("wm",
      Processors.insertWatermarksP[Long](ts => ts, lag = 0L, throttleFrame = 100L))
    val probe: () => Processor = () =>
      new AbstractProcessor {
        private var last = Long.MinValue
        override protected def tryProcess(ordinal: Int, item: Any): Boolean = true
        override def tryProcessWatermark(w: Watermark): Boolean = {
          if (w.timestamp <= last)
            throw new IllegalStateException(s"non-monotonic wm ${w.timestamp} after $last")
          last = w.timestamp
          tryEmit(w.timestamp)
        }
      }
    val sink = dag.newVertex("sink", probe).localParallelism(1)
    dag.edge(Edge.between(wm, sink).allToOne("all"))
    val out = DagExecutor.execute(spark, dag, inputs = Map("wm" -> input))("sink")
      .map(_.asInstanceOf[Long])
    // no forward before every sender reported; monotonic; final flush arrives
    assert(out.nonEmpty && out.last == Long.MaxValue,
      s"bounded final flush must reach the instance: $out")
    assert(out == out.sorted, s"forwarded watermarks must be monotonic: $out")
    assert(out.head <= 1000L, s"first forward cannot exceed a sender's max: $out")

    // deterministic min-governance, unit-level (DAG-level arrival order
    // across senders is shuffle-block order, so it is pinned here instead)
    val c = new WatermarkCoalescer(2)
    assert(c.observe(0, 0, 1000L).isEmpty, "one sender alone cannot advance the clock")
    assert(c.observe(0, 1, 500L).contains(500L), "min across senders governs")
    assert(c.observe(0, 1, 600L).contains(600L), "lagging sender advancing moves the min")
    assert(c.observe(0, 0, 1200L).isEmpty, "leading sender advancing does not (min still 600)")
    assert(c.observe(0, 1, 900L).contains(900L), "min(1200, 900) = 900 advances")
  }

  test("two-stage event-time tumbling window: accumulateByFrameP → combineToSlidingWindowP") {
    // keyed events (ts, key): windows of 100; exact counts per (window, key)
    val events = (0 until 1000).map(i => (i.toLong, "k" + (i % 3))).map(_.asInstanceOf[Any])
    val input = sc.parallelize(scala.util.Random.shuffle(events), 4)
    val dag = new DAG
    // shuffled input: the lag must cover the intra-partition disorder (the
    // full range here) or late events drop — the dedicated late-drop test
    // below pins that behavior; this one pins exact totals
    val wm = dag.newVertex("wm",
      Processors.insertWatermarksP[(Long, String)](_._1, lag = 1000L, throttleFrame = 100L))
    val acc = dag.newVertex("accframe",
      Processors.accumulateByFrameP[String, Long](
        keyFn = _.asInstanceOf[(Long, String)]._2,
        tsFn = _.asInstanceOf[(Long, String)]._1,
        frameLen = 100L, AggregateOp.counting))
    val comb = dag.newVertex("combine",
      Processors.combineToSlidingWindowP[String, Long, Long](
        frameLen = 100L, windowLen = 100L, AggregateOp.counting,
        (we, k, n) => (we - 100L, k, n)))
    dag
      .edge(Edge.between(wm, acc))
      .edge(Edge.between(acc, comb)
        .partitioned(_.asInstanceOf[(Long, String, Long)]._2).distributed())
    val out = DagExecutor.execute(spark, dag, inputs = Map("wm" -> input))("combine")
      .map(_.asInstanceOf[(Long, String, Long)])
    // 10 windows × 3 keys; ~33/34 events each, totals exact
    assert(out.size == 30, s"expected 30 (window,key) results, got ${out.size}")
    assert(out.map(_._3).sum == 1000L)
    val ws0 = out.filter(_._1 == 0L).map(t => t._2 -> t._3).toMap
    assert(ws0 == Map("k0" -> 34L, "k1" -> 33L, "k2" -> 33L), s"window 0: $ws0")
  }

  test("sliding windows combine multiple frames; frames evict after last use") {
    // 4 frames of 10; window 20 sliding by 10 → window ends 10,20,30,40,50
    val events = Seq(5L, 12L, 15L, 27L, 33L, 38L).map(ts => (ts, "k").asInstanceOf[Any])
    val input = sc.parallelize(events, 2)
    val dag = new DAG
    val wm = dag.newVertex("wm",
      Processors.insertWatermarksP[(Long, String)](_._1, lag = 0L, throttleFrame = 10L))
    val acc = dag.newVertex("accframe",
      Processors.accumulateByFrameP[String, Long](
        _.asInstanceOf[(Long, String)]._2, _.asInstanceOf[(Long, String)]._1,
        frameLen = 10L, AggregateOp.counting))
    val comb = dag.newVertex("combine",
      Processors.combineToSlidingWindowP[String, Long, Long](
        frameLen = 10L, windowLen = 20L, AggregateOp.counting,
        (we, k, n) => (we, k, n)))
    dag
      .edge(Edge.between(wm, acc))
      .edge(Edge.between(acc, comb)
        .partitioned(_.asInstanceOf[(Long, String, Long)]._2).distributed())
    val out = DagExecutor.execute(spark, dag, inputs = Map("wm" -> input))("combine")
      .map(_.asInstanceOf[(Long, String, Long)]).map(t => t._1 -> t._3).toMap
    // events per frame: [0,10)=1, [10,20)=2, [20,30)=1, [30,40)=2
    // windows (end): 10→1, 20→3, 30→3, 40→3, 50→2
    assert(out == Map(10L -> 1L, 20L -> 3L, 30L -> 3L, 40L -> 3L, 50L -> 2L),
      s"sliding window counts: $out")
  }

  test("late events drop once the coalesced watermark closed their frame") {
    // single partition, deterministic order: 150, 160 open frame (100,200];
    // 250 advances the watermark to 200 closing it; 90 then arrives LATE
    val events = Seq(150L, 160L, 250L, 90L).map(ts => (ts, "k").asInstanceOf[Any])
    val input = sc.parallelize(events, 1)
    val dag = new DAG
    val wm = dag.newVertex("wm",
      Processors.insertWatermarksP[(Long, String)](_._1, lag = 0L, throttleFrame = 100L))
      .localParallelism(1)
    val acc = dag.newVertex("accframe",
      Processors.accumulateByFrameP[String, Long](
        _.asInstanceOf[(Long, String)]._2, _.asInstanceOf[(Long, String)]._1,
        frameLen = 100L, AggregateOp.counting)).localParallelism(1)
    val comb = dag.newVertex("combine",
      Processors.combineToSlidingWindowP[String, Long, Long](
        frameLen = 100L, windowLen = 100L, AggregateOp.counting,
        (we, k, n) => (we, k, n))).localParallelism(1)
    dag
      .edge(Edge.between(wm, acc))
      .edge(Edge.between(acc, comb)
        .partitioned(_.asInstanceOf[(Long, String, Long)]._2).distributed())
    val out = DagExecutor.execute(spark, dag, inputs = Map("wm" -> input))("combine")
      .map(_.asInstanceOf[(Long, String, Long)]).map(t => t._1 -> t._3).toMap
    assert(out == Map(200L -> 2L, 300L -> 1L),
      s"the ts=90 event must drop (frame closed by wm 200): $out")
  }

  test("session windows: growth, strict-boundary split, bridge-merge, watermark emission") {
    val T = 30L
    def sessionDag(events: Seq[Long]) = {
      val input = sc.parallelize(events.map(ts => (ts, "u").asInstanceOf[Any]), 1)
      val dag = new DAG
      val wm = dag.newVertex("wm",
        Processors.insertWatermarksP[(Long, String)](_._1, lag = 1000L, throttleFrame = 10L))
        .localParallelism(1)
      val sess = dag.newVertex("session",
        Processors.aggregateToSessionWindowP[String, Long, Long](
          sessionTimeout = T,
          tsFn = _.asInstanceOf[(Long, String)]._1,
          keyFn = _.asInstanceOf[(Long, String)]._2,
          AggregateOp.counting,
          (s, e, k, n) => (s, e, k, n)))
      dag.edge(Edge.between(wm, sess)
        .partitioned(_.asInstanceOf[(Long, String)]._2).distributed())
      DagExecutor.execute(spark, dag, inputs = Map("wm" -> input))("session")
        .map(_.asInstanceOf[(Long, Long, String, Long)])
        .map(t => (t._1, t._2, t._4)).sortBy(_._1)
    }
    // growth: consecutive events within the timeout extend one session
    assert(sessionDag(Seq(0L, 10L, 25L)) == Seq((0L, 55L, 3L)))
    // strict boundary: an event AT the session end starts a NEW session
    assert(sessionDag(Seq(0L, 30L)) == Seq((0L, 30L, 1L), (30L, 60L, 1L)))
    // bridge: an event whose interval spans the gap merges two sessions
    // ([0,30) and [50,80); the [25,55) interval overlaps both)
    assert(sessionDag(Seq(0L, 50L, 25L)) == Seq((0L, 80L, 3L)))
  }

  test("session windows emit on watermark passage, not only at completion") {
    // two sessions far apart; the second event's watermark closes the first —
    // the probe downstream must see session 1 BEFORE the final flush wm
    val events = Seq(0L, 500L).map(ts => (ts, "u").asInstanceOf[Any])
    val input = sc.parallelize(events, 1)
    val dag = new DAG
    val wm = dag.newVertex("wm",
      Processors.insertWatermarksP[(Long, String)](_._1, lag = 0L, throttleFrame = 10L))
      .localParallelism(1)
    val sess = dag.newVertex("session",
      Processors.aggregateToSessionWindowP[String, Long, Long](
        30L, _.asInstanceOf[(Long, String)]._1,
        _.asInstanceOf[(Long, String)]._2, AggregateOp.counting,
        (s, e, k, n) => (s, e, n)))
    val probe: () => Processor = () =>
      new AbstractProcessor {
        private var sawFinalWm = false
        override protected def tryProcess(ordinal: Int, item: Any): Boolean = {
          if (sawFinalWm) throw new IllegalStateException(
            s"session $item arrived only at the final flush — not watermark-driven")
          tryEmit(item)
        }
        override def tryProcessWatermark(w: Watermark): Boolean = {
          if (w.timestamp == Long.MaxValue) sawFinalWm = true
          true
        }
      }
    val sink = dag.newVertex("sink", probe).localParallelism(1)
    dag
      .edge(Edge.between(wm, sess)
        .partitioned(_.asInstanceOf[(Long, String)]._2).distributed())
      .edge(Edge.between(sess, sink).allToOne("x"))
    val out = DagExecutor.execute(spark, dag, inputs = Map("wm" -> input))("sink")
      .map(_.asInstanceOf[(Long, Long, Long)]).sortBy(_._1)
    assert(out == Seq((0L, 30L, 1L), (500L, 530L, 1L)))
  }

  test("broadcast edge rejects oversized build sides instead of collecting them") {
    val dag = new DAG
    val a = dag.newVertex("a", Processors.mapP((i: Int) => i))
    val b = dag.newVertex("b", Processors.noopP())
    dag.edge(Edge.between(a, b).broadcast())
    // tiny cap for the test; the default is DagExecutor.MaxBroadcastItems
    val big = sc.parallelize((1 to 5000).map(_.asInstanceOf[Any]), 8)
    intercept[IllegalArgumentException](
      DagExecutor.compile(spark, dag, inputs = Map("a" -> big),
        maxBroadcastItems = 1000))
  }

  test("ordered edges reject watermarks explicitly on every routing policy") {
    // a Watermark on an ordered edge must fail with the intended message —
    // never a ClassCastException in keyFn/comparator (partitioned), a raw
    // Watermark in the inbox (isolated), or an envelope fed to the user
    // comparator (unicast)
    val intCmp = Ordering.by[Any, Int](_.asInstanceOf[Int])
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    Seq[(Vertex, Vertex) => Edge](
      (a, b) => Edge.between(a, b).partitioned(identity).ordered(intCmp),
      (a, b) => Edge.between(a, b).isolated().ordered(intCmp),
      (a, b) => Edge.between(a, b).ordered(intCmp)
    ).foreach { mkEdge =>
      val input: org.apache.spark.rdd.RDD[Any] =
        sc.parallelize(Seq[Any](3, 1, Watermark(100L), 2), 1)
      val dag = new DAG
      val a = dag.newVertex("a", Processors.mapP((x: Any) => x)).localParallelism(1)
      val b = dag.newVertex("b", Processors.mapP((x: Any) => x)).localParallelism(1)
      dag.edge(mkEdge(a, b))
      val ex = intercept[Exception](
        DagExecutor.execute(spark, dag, inputs = Map("a" -> input)))
      assert(messages(ex).exists(_.contains("ordered edge")),
        s"expected the ordered-edge watermark error, got: ${messages(ex)}")
    }
  }

  test("an ordered edge does not stall watermark coalescing into a mixed-input vertex") {
    // sink hears a watermarked partitioned edge (ordinal 0) AND an ordered
    // unicast edge (ordinal 1). Ordered edges drop watermarks by design, so
    // they are excluded from the coalescer's sender count — counting them
    // would make every window wait for a sender that can never report.
    val data: org.apache.spark.rdd.RDD[Any] =
      sc.parallelize(Seq(100L, 200L, 900L).map(_.asInstanceOf[Any]), 1)
    val side: org.apache.spark.rdd.RDD[Any] =
      sc.parallelize(Seq(5, 3, 1).map(_.asInstanceOf[Any]), 1)
    val dag = new DAG
    val wm = dag.newVertex("wm",
      Processors.insertWatermarksP[Long](ts => ts, lag = 0L, throttleFrame = 10L))
      .localParallelism(1)
    val sideV = dag.newVertex("side", Processors.mapP((i: Int) => i)).localParallelism(1)
    val probe: () => Processor = () =>
      new AbstractProcessor {
        override protected def tryProcess(ordinal: Int, item: Any): Boolean = true
        override def tryProcessWatermark(w: Watermark): Boolean = tryEmit(w.timestamp)
      }
    val sink = dag.newVertex("sink", probe).localParallelism(1)
    dag
      .edge(Edge.from(wm).to(sink, 0).partitioned(_ => "k").distributed())
      .edge(Edge.from(sideV).to(sink, 1)
        .ordered(Ordering.by[Any, Int](_.asInstanceOf[Int])))
    val out = DagExecutor
      .execute(spark, dag, inputs = Map("wm" -> data, "side" -> side))("sink")
      .map(_.asInstanceOf[Long])
    assert(out.nonEmpty,
      "watermarks never reached the processor — the ordered edge stalled the coalescer")
  }

  test("two-stage sessions (preMerge + combineFragments) match the single-stage processor") {
    val T = 30L
    // multi-partition input: a key's events spread across partitions, so
    // fragments from different partitions MUST merge downstream; scenarios
    // cover growth, strict boundary, bridge-merge, and cross-key isolation
    def run(events: Seq[(Long, String)], twoStage: Boolean,
            outbox: Int = 1024): Seq[(Long, Long, String, Long)] = {
      val input = sc.parallelize(events.map(_.asInstanceOf[Any]), 3)
      val dag = new DAG
      val wm = dag.newVertex("wm",
        Processors.insertWatermarksP[(Long, String)](_._1, lag = 1000L, throttleFrame = 10L))
        .localParallelism(3)
      val out =
        if (twoStage) {
          val pre = dag.newVertex("premerge",
            Processors.sessionPreMergeP[String, Long](
              T, _.asInstanceOf[(Long, String)]._1,
              _.asInstanceOf[(Long, String)]._2, AggregateOp.counting))
            .localParallelism(3)
          val sess = dag.newVertex("session",
            Processors.combineSessionFragmentsP[String, Long, Long](
              AggregateOp.counting, (s, e, k, n) => (s, e, k, n)))
          dag
            .edge(Edge.between(wm, pre))
            .edge(Edge.between(pre, sess)
              .partitioned(_.asInstanceOf[(Long, Long, String, Long)]._3)
              .distributed())
          "session"
        } else {
          val sess = dag.newVertex("session",
            Processors.aggregateToSessionWindowP[String, Long, Long](
              T, _.asInstanceOf[(Long, String)]._1,
              _.asInstanceOf[(Long, String)]._2, AggregateOp.counting,
              (s, e, k, n) => (s, e, k, n)))
          dag.edge(Edge.between(wm, sess)
            .partitioned(_.asInstanceOf[(Long, String)]._2).distributed())
          "session"
        }
      DagExecutor.execute(spark, dag, inputs = Map("wm" -> input),
          outboxCapacity = outbox)(out)
        .map(_.asInstanceOf[(Long, Long, String, Long)]).sortBy(t => (t._3, t._1))
    }
    val scenarios = Seq(
      Seq[(Long, String)]((0L, "a"), (10L, "a"), (25L, "a")), // growth
      Seq[(Long, String)]((0L, "a"), (30L, "a")), // strict boundary split
      Seq[(Long, String)]((0L, "a"), (50L, "a"), (25L, "a")), // bridge-merge
      Seq[(Long, String)]( // two keys interleaved across partitions
        (0L, "a"), (5L, "b"), (12L, "a"), (40L, "b"), (100L, "a"), (110L, "b")),
      (0L until 60L by 7L).map(ts => (ts, if (ts % 2 == 0) "x" else "y")))
    scenarios.foreach { ev =>
      assert(run(ev, twoStage = true) == run(ev, twoStage = false),
        s"two-stage and single-stage sessions diverge on $ev")
    }
    // capacity-1 outbox: every flush suspends mid-emission (fragments AND
    // closed sessions), so the resumable-traverser paths in both topologies
    // must hold state across re-entries without loss or duplication
    val dense = scenarios.last
    assert(run(dense, twoStage = true, outbox = 1) ==
      run(dense, twoStage = false, outbox = 1),
      "suspendable emission under a capacity-1 outbox diverged")
  }

  test("session windows drop events below the watermark (no overlapping emissions)") {
    // wm advances to 50 after ts=58; the late ts=25 (25 < 50 but 25+30 > 50)
    // must DROP — accepting it would open [25,55) overlapping the already
    // emitted [0,30), diverging from Spark's session_window and the reference
    val events = Seq(0L, 58L, 25L).map(ts => (ts, "u").asInstanceOf[Any])
    val input = sc.parallelize(events, 1)
    val dag = new DAG
    val wm = dag.newVertex("wm",
      Processors.insertWatermarksP[(Long, String)](_._1, lag = 0L, throttleFrame = 10L))
      .localParallelism(1)
    val sess = dag.newVertex("session",
      Processors.aggregateToSessionWindowP[String, Long, Long](
        30L, _.asInstanceOf[(Long, String)]._1,
        _.asInstanceOf[(Long, String)]._2, AggregateOp.counting,
        (s, e, k, n) => (s, e, n)))
    dag.edge(Edge.between(wm, sess)
      .partitioned(_.asInstanceOf[(Long, String)]._2).distributed())
    val out = DagExecutor.execute(spark, dag, inputs = Map("wm" -> input))("session")
      .map(_.asInstanceOf[(Long, Long, Long)]).sortBy(_._1)
    assert(out == Seq((0L, 30L, 1L), (58L, 88L, 1L)),
      s"late ts=25 must drop, not open an overlapping session: $out")
  }

  // -------------------------------------------------- early results (r14,
  // VERDICT r13 item 5): the niladic tryProcess() seam + earlyResultsPeriod
  // on the DAG-layer window processors (SlidingWindowP.java:184-192,
  // SessionWindowP's earlyWinTraverser). Topology note: single-partition
  // NARROW chains, so the slow upstream mapP's wall-clock interleaves with
  // the window stage's between-chunk ticks (a shuffle would be a stage
  // barrier and starve the cadence in a bounded test).

  /** Runs a slowed sliding-window chain; returns leaf output in order. */
  private def earlySlidingRun(period: Long): Seq[Any] = {
    val events = (0 until 100).map(i => (i.toLong, "k" + (i % 2)).asInstanceOf[Any])
    val input = sc.parallelize(events, 1)
    val dag = new DAG
    val slow = dag.newVertex("slow", Processors.mapP[Any, Any] { x =>
      Thread.sleep(1); x
    }).localParallelism(1)
    val wm = dag.newVertex("wm",
      Processors.insertWatermarksP[(Long, String)](_._1, lag = 0L, throttleFrame = 10L))
      .localParallelism(1)
    val acc = dag.newVertex("accframe",
      Processors.accumulateByFrameP[String, Long](
        keyFn = _.asInstanceOf[(Long, String)]._2,
        tsFn = _.asInstanceOf[(Long, String)]._1,
        frameLen = 10L, AggregateOp.counting)).localParallelism(1)
    val comb = dag.newVertex("combine",
      Processors.combineToSlidingWindowP[String, Long, Long](
        frameLen = 10L, windowLen = 50L, AggregateOp.counting,
        (we, k, n) => (we, k, n), earlyResultsPeriod = period))
      .localParallelism(1)
    dag
      .edge(Edge.between(slow, wm))
      .edge(Edge.between(wm, acc))
      .edge(Edge.between(acc, comb))
    DagExecutor.execute(spark, dag, inputs = Map("slow" -> input))("combine")
  }

  test("sliding-window early results: partials precede finals; finals unchanged") {
    val out = earlySlidingRun(period = 1L)
    val earlies = out.zipWithIndex.collect {
      case (EarlyResult(t), i) => (t.asInstanceOf[(Long, String, Long)], i)
    }
    val finals = out.zipWithIndex.collect {
      case (t, i) if !t.isInstanceOf[EarlyResult] =>
        (t.asInstanceOf[(Long, String, Long)], i)
    }
    assert(earlies.nonEmpty, "the 1ms cadence must emit at least one early partial")
    val finalByWin = finals.map { case ((we, k, n), i) => (we, k) -> ((n, i)) }.toMap
    earlies.foreach { case ((we, k, n), i) =>
      finalByWin.get((we, k)).foreach { case (fn, fi) =>
        assert(n <= fn, s"early count $n for ($we,$k) exceeds final $fn")
        assert(i < fi, s"early for ($we,$k) at index $i did not precede final at $fi")
      }
    }
    // finals are byte-identical to a run with early results off
    val off = earlySlidingRun(period = 0L)
    assert(!off.exists(_.isInstanceOf[EarlyResult]), "period 0 must emit no earlies")
    assert(finals.map(_._1).sortBy(t => (t._1, t._2)) ==
      off.map(_.asInstanceOf[(Long, String, Long)]).sortBy(t => (t._1, t._2)))
  }

  /** Runs a slowed session chain (single- or two-stage); leaf output in order. */
  private def earlySessionRun(period: Long, twoStage: Boolean): Seq[Any] = {
    val events = (0 until 100 by 5).map(i => (i.toLong, "u").asInstanceOf[Any])
    val input = sc.parallelize(events, 1)
    val dag = new DAG
    val slow = dag.newVertex("slow", Processors.mapP[Any, Any] { x =>
      Thread.sleep(2); x
    }).localParallelism(1)
    val wm = dag.newVertex("wm",
      Processors.insertWatermarksP[(Long, String)](_._1, lag = 0L, throttleFrame = 10L))
      .localParallelism(1)
    val leaf =
      if (twoStage) {
        val pre = dag.newVertex("premerge",
          Processors.sessionPreMergeP[String, Long](
            sessionTimeout = 30L,
            tsFn = _.asInstanceOf[(Long, String)]._1,
            keyFn = _.asInstanceOf[(Long, String)]._2,
            AggregateOp.counting)).localParallelism(1)
        val sess = dag.newVertex("session",
          Processors.combineSessionFragmentsP[String, Long, Long](
            AggregateOp.counting, (s, e, k, n) => (s, e, k, n),
            earlyResultsPeriod = period)).localParallelism(1)
        dag
          .edge(Edge.between(slow, wm))
          .edge(Edge.between(wm, pre))
          .edge(Edge.between(pre, sess))
        "session"
      } else {
        val sess = dag.newVertex("session",
          Processors.aggregateToSessionWindowP[String, Long, Long](
            sessionTimeout = 30L,
            tsFn = _.asInstanceOf[(Long, String)]._1,
            keyFn = _.asInstanceOf[(Long, String)]._2,
            AggregateOp.counting, (s, e, k, n) => (s, e, k, n),
            earlyResultsPeriod = period)).localParallelism(1)
        dag
          .edge(Edge.between(slow, wm))
          .edge(Edge.between(wm, sess))
        "session"
      }
    DagExecutor.execute(spark, dag, inputs = Map("slow" -> input))(leaf)
  }

  test("session early results (single- and two-stage): growing partials, finals unchanged") {
    for (twoStage <- Seq(false, true)) {
      val out = earlySessionRun(period = 1L, twoStage)
      val earlies = out.collect {
        case EarlyResult(t) => t.asInstanceOf[(Long, Long, String, Long)]
      }
      val finals = out.filter(!_.isInstanceOf[EarlyResult])
        .map(_.asInstanceOf[(Long, Long, String, Long)])
      assert(earlies.nonEmpty, s"twoStage=$twoStage: no early partials fired")
      // one growing session: finals = the whole thing, earlies are prefixes
      assert(finals == Seq((0L, 125L, "u", 20L)), s"twoStage=$twoStage: $finals")
      earlies.foreach { case (s, e, k, n) =>
        assert(s == 0L && k == "u" && n <= 20L && e <= 125L,
          s"twoStage=$twoStage: early ($s,$e,$k,$n) is not a prefix partial")
      }
      // partial counts must be non-decreasing in emission order
      val counts = earlies.map(_._4)
      assert(counts == counts.sorted, s"twoStage=$twoStage: partials shrank: $counts")
      val off = earlySessionRun(period = 0L, twoStage)
      assert(off == Seq((0L, 125L, "u", 20L)), s"twoStage=$twoStage period-0: $off")
    }
  }
}
