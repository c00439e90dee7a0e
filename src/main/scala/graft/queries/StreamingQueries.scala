package graft.queries

import graft.Tables
import graft.pipeline.StreamSourceStage
import graft.streaming.StreamRunner
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Correctness-gate entries that execute REAL Structured Streaming (MemoryStream
  * replay over the events fixture, micro-batched, with watermarks and state
  * stores) and are checked against batch SQL oracles in DuckDB — the
  * stream–batch equivalence contract (SURVEY §5, FIXTURES.md §3).
  */
object StreamingQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Hard cap on the corpus-sized broadcast-index serving forms (vectors) —
    * q161's brute loop AND q162's in-service IVF (r18, VERDICT r17
    * What's-wrong #2: q162 collects the whole corpus to build its broadcast
    * service, the same driver boundary, and was unguarded). Both broadcast
    * the WHOLE index to every executor — exact / the oracle shape, but
    * O(corpus) driver + executor memory. Above this cap both queries fail
    * loudly and steer to the sharded plan (q165 / operators.IvfShardedServe:
    * centroid-only broadcast, posting lists as a cell-keyed table,
    * shuffle-hash stream-static join) — the 100 TB serving shape. 50k × 64
    * float dims ≈ 13 MB broadcast: well past the sf1 gate data (20k) and far
    * below anything a real corpus needs.
    */
  val BruteServeMaxIndexVectors = 50000L

  /** The shared refusal (r18): both broadcast-index serving forms call this
    * before collecting, so the cap and the steer-to-q165 message stay
    * identical across the two surfaces (spec-pinned by ShardedAnnServeSpec).
    */
  private[graft] def requireBroadcastServable(n: Long, form: String): Unit =
    require(n <= BruteServeMaxIndexVectors,
      s"$form index has $n vectors (cap $BruteServeMaxIndexVectors): " +
        "collecting/broadcasting a corpus-sized index does not scale — use " +
        "the sharded serving plan (q165_stream_ann_ivf_shard / " +
        "operators.IvfShardedServe) for large indexes")

  /** Cosine from a dot product and a norm product, scoring 0.0 when either
    * norm is zero: a zero vector has no direction, and the NaN that a raw
    * division produces would kill the streaming task downstream —
    * `new java.math.BigDecimal(NaN)` in the rank quantizer throws
    * NumberFormatException. (The gate data has no zero norms, so the guard
    * never changes an oracle row; it keeps a degenerate query vector or
    * centroid from failing the query instead of producing a rankable row.)
    */
  private def safeCosine(dot: Double, normProduct: Double): Double = {
    val c = dot / normProduct
    if (java.lang.Double.isFinite(c)) c else 0.0
  }

  private def eventsDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events").select($"ts", $"user_id", $"event_type", $"value")
  }

  // -------------------------------------------- q50 streaming tumbling window
  /** Tumbling 1 h count+sum per event_type through a real streaming query
    * (SlidingWindowP single-stage parity, SURVEY §2.7). File-stream source +
    * UPDATE mode — no driver-side rows, no complete-mode re-emission of the
    * whole result per micro-batch; the final snapshot keeps each key's last
    * update (the row with the largest n — the count only ever grows).
    */
  val q50_stream_tumbling: Q = (s, dir) => {
    import s.implicits._
    val raw = StreamRunner.replayFiles(s, eventsDf(s, dir), "ts", "update") { df =>
      df.withWatermark("ts", "1 hour")
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
        .select(unix_timestamp($"w.start").as("window_start"), $"event_type", $"n", $"sum_value")
    }
    raw.groupBy($"window_start", $"event_type")
      .agg(max($"n").as("n"), max_by($"sum_value", $"n").as("sum_value"))
  }

  // the batch q20 and the streamed q50 compute the SAME aggregate — one
  // oracle definition, so the stream-batch equivalence pair cannot drift
  val q50_oracle: String = EventQueries.q20_oracle

  // -------------------------------------------- q51 streaming session window
  /** `session_window` gap-merged sessions per user through a real streaming
    * query (SessionWindowP merging semantics: window = [min ts, max ts + gap)).
    */
  val q51_stream_session: Q = (s, dir) => {
    import s.implicits._
    val events = eventsDf(s, dir)
    // Session windows only support APPEND mode, which emits a session once the
    // watermark passes its end. Two far-future sentinel chunks close out the
    // tail: the first advances the watermark past every real session end
    // (+3 h > 1 h delay + 30 min gap), the second triggers the batch in which
    // the now-expired sessions actually flush to the sink.
    // sentinels are placed relative to max(ts), which the replay harness
    // derives from its own written chunks — no second scan of the source here
    def sentinel(maxTs: Timestamp, offsetSec: Long): DataFrame =
      Seq((new Timestamp(maxTs.getTime + offsetSec * 1000L), -1L, "__sentinel", 0.0))
        .toDF("ts", "user_id", "event_type", "value")
    StreamRunner.replayFiles(s, events, "ts", "append",
      tails = Some(maxTs =>
        Seq(sentinel(maxTs, 3 * 3600), sentinel(maxTs, 3 * 3600 + 60)))) { df =>
      df.withWatermark("ts", "1 hour")
        .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
        .select($"user_id", unix_micros($"w.start").as("session_start_us"),
          unix_micros($"w.end").as("session_end_us"), $"n_events", $"sum_value")
      // drop exactly the sentinel sessions (user_id = -1) with a NULL-SAFE
      // comparison: the previous `user_id >= 0` evaluated NULL for a
      // NULL-user session and silently dropped it, while the oracle keeps it
    }.filter(!($"user_id" <=> lit(-1L)))
  }

  /** Oracle: gaps-and-islands sessions; Spark's session end = last event + gap. */
  val q51_oracle: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) >= 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |numbered AS (
      |  SELECT user_id, ts, value,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT user_id,
      |  epoch_us(CAST(min(ts) AS TIMESTAMP)) AS session_start_us,
      |  epoch_us(CAST(max(ts) AS TIMESTAMP)) + 1800000000 AS session_end_us,
      |  count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM numbered GROUP BY user_id, session_id""".stripMargin

  // ------------------------------------- q52 streaming stateful rolling agg
  /** `flatMapGroupsWithState` rolling aggregate (TransformStatefulP parity):
    * the stream emits a running (count, sum) per user per event; the gate
    * checks the FINAL state per user — order-insensitive, equals the batch
    * per-user aggregate.
    */
  val q52_stream_rolling_final: Q = (s, dir) => {
    import s.implicits._
    val rolled = StreamRunner.replayFiles(s, eventsDf(s, dir), "ts", "append") { df =>
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      // the primitive-tuple decoder aborts the stream on a NULL field; filter
      // nulls explicitly (the oracle carries the same predicate)
      df.filter($"ts".isNotNull && $"user_id".isNotNull && $"value".isNotNull)
        .as[(Timestamp, Long, String, Double)]
        .groupByKey(_._2)
        .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          case (user, events, state) =>
            var (n, sum) = state.getOption.getOrElse((0L, 0.0))
            val out = events.map { e =>
              n += 1; sum += e._4
              (user, n, sum)
            }.toList
            state.update((n, sum))
            out.iterator
        }.toDF("user_id", "running_n", "running_sum")
    }
    // final state per user = the row with the largest running_n
    rolled.groupBy($"user_id")
      .agg(max($"running_n").as("n_events"),
        round(max_by($"running_sum", $"running_n"), 4).as("total_value"))
  }

  val q52_oracle: String =
    """SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value
      |FROM events
      |WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
      |GROUP BY user_id""".stripMargin

  // ------------------------------------- q77 stream-stream time-bounded join
  /** Stream-stream inner join with a time-bound (view → purchase within 2 h,
    * same user) through a REAL streaming self-join: both sides are watermarked
    * branches of the same file-stream, Spark buffers each side's state and
    * evicts it once the watermark passes the bound (StreamingSymmetricHashJoin)
    * — the funnel/attribution query every event pipeline runs. Beyond the
    * reference: Jet 4.x has no stream-stream join (its SQL rejects it); this is
    * the Spark-native answer, oracle-checked against the batch join.
    * Scale shape: state per side is bounded by (watermark + bound) time span,
    * keyed on user — no unbounded buffering, no cross product.
    */
  val q77_stream_join: Q = (s, dir) => {
    import s.implicits._
    val events = Tables(s, dir, "events")
      .select($"ts", $"event_id", $"user_id", $"event_type", $"value")
    StreamRunner.replayFiles(s, events, "ts", "append") { df =>
      val wm = df.withWatermark("ts", "1 hour")
      val views = wm.filter($"event_type" === "view")
        .select($"ts".as("view_ts"), $"event_id".as("view_id"),
          $"user_id", $"value".as("view_value"))
      val buys = wm.filter($"event_type" === "purchase")
        .select($"ts".as("buy_ts"), $"event_id".as("buy_id"),
          $"user_id".as("buyer_id"), $"value".as("buy_value"))
      views.join(buys,
        $"user_id" === $"buyer_id" &&
          $"buy_ts" >= $"view_ts" &&
          $"buy_ts" <= $"view_ts" + expr("INTERVAL 2 HOURS"))
        .select($"user_id", $"view_id", $"buy_id",
          unix_micros($"view_ts").as("view_ts_us"),
          unix_micros($"buy_ts").as("buy_ts_us"),
          round($"view_value", 4).as("view_value"),
          round($"buy_value", 4).as("buy_value"))
    }
  }

  // --------------------------------- q94 streaming LEFT OUTER stream-stream join
  /** LEFT OUTER time-bounded stream-stream join — the semantics q77's inner
    * join does not cover: an UNMATCHED left row is held in state until the
    * watermark passes its join window, then emitted with NULL right columns
    * (StreamingSymmetricHashJoin's outer-eviction path). Views left-joined to
    * purchases within [view_ts, view_ts + 2 h] per user; far-future sentinel
    * chunks advance the watermark past every real view's window and trigger
    * the flush batches, so the replay drains every outer row
    * deterministically (q51's sentinel pattern).
    *
    * Sentinel shape matters here: the per-side `event_type` filters get
    * PUSHED below the watermark into each branch's file scan, so a sentinel
    * with a type matching neither side is skipped at scan level and never
    * reaches the event-time stats — the watermark stalls and the tail outer
    * rows never flush (observed: 10 rows short). The sentinels are therefore
    * 'purchase' rows for user −1: they enter the right side (advancing the
    * watermark), can never match a real view, and the build side of a left
    * outer join emits nothing unmatched — no result filtering needed.
    */
  val q94_stream_left_join: Q = (s, dir) => {
    import s.implicits._
    val events = Tables(s, dir, "events")
      .select($"ts", $"event_id", $"user_id", $"event_type", $"value")
    def sentinel(maxTs: Timestamp, offsetSec: Long): DataFrame =
      Seq((new Timestamp(maxTs.getTime + offsetSec * 1000L), -1L, -1L, "purchase", 0.0))
        .toDF("ts", "event_id", "user_id", "event_type", "value")
    StreamRunner.replayFiles(s, events, "ts", "append",
      // two sentinel chunks (the documented minimum — replayFiles: the flush
      // lands in the batch FOLLOWING the watermark-advancing one); both far
      // enough past max(ts) that the first alone clears every view's window
      tails = Some(maxTs =>
        Seq(sentinel(maxTs, 4 * 3600), sentinel(maxTs, 4 * 3600 + 60)))) { df =>
      val wm = df.withWatermark("ts", "1 hour")
      val views = wm.filter($"event_type" === "view")
        .select($"ts".as("view_ts"), $"event_id".as("view_id"),
          $"user_id", $"value".as("view_value"))
      val buys = wm.filter($"event_type" === "purchase")
        .select($"ts".as("buy_ts"), $"event_id".as("buy_id"),
          $"user_id".as("buyer_id"), $"value".as("buy_value"))
      views.join(buys,
        $"user_id" === $"buyer_id" &&
          $"buy_ts" >= $"view_ts" &&
          $"buy_ts" <= $"view_ts" + expr("INTERVAL 2 HOURS"),
        "left_outer")
        .select($"user_id", $"view_id", $"buy_id",
          unix_micros($"view_ts").as("view_ts_us"),
          round($"view_value", 4).as("view_value"),
          round($"buy_value", 4).as("buy_value"))
    }
  }

  // --------------------------------------- q96 stream-static broadcast join
  /** Stream-static enrichment — Jet's streaming `hashJoin` against a
    * replicated batch dimension (StreamStage.hashJoin: left-outer broadcast,
    * each micro-batch probes the dim). Stateless: no watermark, no state
    * store; every event row is enriched with its customer's name/nation, and
    * events without a matching dimension row keep NULLs (left outer). This
    * is the operator's first oracle-checked entry (previously spec-only).
    */
  val q96_stream_static_join: Q = (s, dir) => {
    import s.implicits._
    val events = Tables(s, dir, "events")
      .select($"ts", $"event_id", $"user_id", $"event_type", $"value")
    val dim = Tables(s, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_nationkey")
    StreamRunner.replayFiles(s, events, "ts", "append") { df =>
      new StreamSourceStage(df).withoutTimestamps()
        .hashJoin(dim, $"user_id" === $"c_custkey")
        .df
        .select($"event_id", $"user_id", $"c_name",
          $"c_nationkey".cast("int").as("c_nationkey"),
          round($"value", 4).as("value"))
    }
  }

  val q96_oracle: String =
    """SELECT e.event_id, e.user_id, c.c_name, c.c_nationkey::INT AS c_nationkey,
      |  round(e.value, 4) AS value
      |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey""".stripMargin

  // ------------------------- q159/q160 CDC dialect envelope parse, oracled
  /** The MySQL/Postgres CDC dialect parsers (`Cdc.parseMySql`/`parsePostgres`,
    * the reference's `MySqlCdcSources`/`PostgresCdcSources` split) under the
    * gate: a deterministic envelope feed is BUILT from `orders` (to_json of
    * the full connector source block), parsed back through the dialect
    * parser, and the oracle computes the expected (op, seq, id, v) rows
    * DIRECTLY from `orders` — an independent derivation, so the JSON
    * round-trip, snapshot→SYNC mapping and sequence encoding are all
    * checked against first principles rather than against the parser
    * itself. At 100 TB both build and parse are narrow row-local maps.
    */
  private val cdcValueSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.StringType)))

  val q159_cdc_mysql_parse: Q = (s, dir) => {
    import s.implicits._
    // the fixture's orders table is ONE parquet file; without a repartition
    // the entire to_json+from_json round-trip runs on a single core (measured
    // 7.5 s single-task at sf0.1). A real CDC feed arrives as many
    // splits/topic partitions — model that layout so the gate measures the
    // parallel parse (~0.3 s), not the one-file accident.
    val o = Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus")
      .repartition(s.sparkContext.defaultParallelism)
    val valueRow = struct($"o_orderkey".as("id"),
      $"o_custkey".cast("string").as("v"))
    val opCode = when($"o_orderstatus" === "O", "c")
      .when($"o_orderstatus" === "F", "u").otherwise("d")
    val env = o.select(to_json(struct(
      when(opCode === "d", valueRow).as("before"),
      when(opCode =!= "d", valueRow).as("after"),
      struct(lit("1.9.7.Final").as("version"), lit("mysql").as("connector"),
        lit("g").as("name"), lit(0L).as("ts_ms"),
        when($"o_orderkey" % 97 === 0, "true").otherwise("false").as("snapshot"),
        lit("gdb").as("db"), lit("orders").as("table"), lit(1L).as("server_id"),
        lit(null).cast("string").as("gtid"),
        format_string("mysql-bin.%06d", ($"o_orderkey" / 1000).cast("int")).as("file"),
        ($"o_orderkey" % 1000).as("pos"), lit(0).as("row")).as("source"),
      opCode.as("op"), lit(0L).as("ts_ms"))).as("value"))
    graft.pipeline.Cdc.parseMySql(env, cdcValueSchema)
  }

  val q159_oracle: String =
    """SELECT CASE WHEN o_orderkey % 97 = 0 THEN 'SYNC'
      |            WHEN o_orderstatus = 'O' THEN 'INSERT'
      |            WHEN o_orderstatus = 'F' THEN 'UPDATE'
      |            ELSE 'DELETE' END AS op,
      |  CAST(o_orderkey // 1000 AS BIGINT) * 4294967296
      |    + o_orderkey % 1000 AS seq,
      |  o_orderkey AS id, CAST(o_custkey AS VARCHAR) AS v
      |FROM orders""".stripMargin

  val q160_cdc_postgres_parse: Q = (s, dir) => {
    import s.implicits._
    // the fixture's orders table is ONE parquet file; without a repartition
    // the entire to_json+from_json round-trip runs on a single core (measured
    // 7.5 s single-task at sf0.1). A real CDC feed arrives as many
    // splits/topic partitions — model that layout so the gate measures the
    // parallel parse (~0.3 s), not the one-file accident.
    val o = Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus")
      .repartition(s.sparkContext.defaultParallelism)
    val valueRow = struct($"o_orderkey".as("id"),
      $"o_custkey".cast("string").as("v"))
    val opCode = when($"o_orderstatus" === "O", "c")
      .when($"o_orderstatus" === "F", "u").otherwise("d")
    val env = o.select(to_json(struct(
      when(opCode === "d", valueRow).as("before"),
      when(opCode =!= "d", valueRow).as("after"),
      struct(lit("1.9.7.Final").as("version"),
        lit("postgresql").as("connector"), lit("g").as("name"),
        lit(0L).as("ts_ms"),
        when($"o_orderkey" % 89 === 0, "last").otherwise("false").as("snapshot"),
        lit("gdb").as("db"), lit("public").as("schema"),
        lit("orders").as("table"), ($"o_orderkey" % 100000).as("txId"),
        ($"o_orderkey" * 16 + 8).as("lsn"),
        lit(null).cast("long").as("xmin")).as("source"),
      opCode.as("op"), lit(0L).as("ts_ms"))).as("value"))
    graft.pipeline.Cdc.parsePostgres(env, cdcValueSchema)
  }

  val q160_oracle: String =
    """SELECT CASE WHEN o_orderkey % 89 = 0 THEN 'SYNC'
      |            WHEN o_orderstatus = 'O' THEN 'INSERT'
      |            WHEN o_orderstatus = 'F' THEN 'UPDATE'
      |            ELSE 'DELETE' END AS op,
      |  o_orderkey * 16 + 8 AS seq,
      |  o_orderkey AS id, CAST(o_custkey AS VARCHAR) AS v
      |FROM orders""".stripMargin

  // ---------------------------- q161 streaming ANN serving (model service)
  /** Per-EVENT vector search through the service-transform path — the
    * reference's model-serving pattern (`mapUsingService` with a loaded
    * model, SURVEY §2.4) applied to ANN: query vectors stream in, a
    * per-partition service holds the broadcast index (ids + vectors +
    * precomputed norms), and each event emits its top-5 cosine neighbors.
    * Entirely STATELESS per event, which is what makes this same plan
    * eligible for the event-at-a-time paths (RealTimeModeSpec pins the
    * operator shape; BASELINE.md r9 measures the service path at
    * p99 ≤ 1 ms) — streaming vector search with per-event latency, not
    * batch-scan latency.
    *
    * Determinism contract: the service mirrors the oracle's arithmetic
    * EXACTLY (sequential double dot over dims, separate norms, divide) so
    * cosines are bit-identical; ranking quantizes to 9 dp HALF_UP with the
    * neighbor-id tiebreak, same as `SimilarityFunctions.bruteForceTopK`.
    *
    * Scale: the broadcast index is model-scale state (the same boundary as
    * q108's classifier and q129's query set). The brute-force scan is
    * O(index) per event — ScaleTrend-flagged SUPER-LINEAR on purpose (it
    * is the exact oracle); the production serving plan is [[q162_stream_ann_ivf_serve]],
    * which composes the IVF cells into this same service loop and is
    * itself oracle-gated (sub-linear per-event work, BASELINE.md r10), and
    * the 100 TB shape is q165's SHARDED index (IvfShardedServe — centroid-only
    * broadcast + posting-list shuffle join). The corpus-sized broadcast here
    * is capped at [[StreamingQueries.BruteServeMaxIndexVectors]] and FAILS
    * LOUDLY above it (the DagExecutor broadcast-edge pattern): at bench rungs
    * above sf0.1 the serving headline is q165, not this brute baseline.
    */
  val q161_stream_ann_serve: Q = (s, dir) => {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings").select($"vec_id", $"embedding")
    val idxCount = emb.count()
    requireBroadcastServable(idxCount, "brute-force ANN serving")
    val idx: Array[(Long, Array[Float])] = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val bc = s.sparkContext.broadcast(idx)
    val k = 5
    final case class Index(ids: Array[Long], vecs: Array[Array[Float]],
                           norms: Array[Double])
    val factory = graft.pipeline.ServiceFactory(() => {
      val data = bc.value
      val norms = data.map { case (_, v) =>
        var n = 0.0; var i = 0
        while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
        math.sqrt(n)
      }
      Index(data.map(_._1), data.map(_._2), norms)
    })
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("neighbor_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cosine",
        org.apache.spark.sql.types.DoubleType)))
    def quant9(x: Double): java.math.BigDecimal =
      new java.math.BigDecimal(x).setScale(9, java.math.RoundingMode.HALF_UP)
    val queries = emb.filter($"vec_id" % 40 === 1)
      .withColumn("ts", timestamp_seconds($"vec_id"))
      .select($"ts", $"vec_id", $"embedding")
    val served = StreamRunner.replayFiles(s, queries, "ts", "append") { df =>
      new graft.pipeline.StreamStage(df, "ts")
        .flatMapUsingService(factory, outSchema) { (svc, r) =>
          val qid = r.getLong(1)
          val qv = r.getSeq[Float](2).toArray
          var qn = 0.0
          var i = 0
          while (i < qv.length) { qn += qv(i).toDouble * qv(i).toDouble; i += 1 }
          qn = math.sqrt(qn)
          val scored = new scala.collection.mutable.ArrayBuffer[(Long, Double)](
            svc.ids.length)
          var j = 0
          while (j < svc.ids.length) {
            if (svc.ids(j) != qid) {
              val v = svc.vecs(j)
              var d = 0.0
              var t = 0
              while (t < v.length) { d += qv(t).toDouble * v(t).toDouble; t += 1 }
              scored += ((svc.ids(j), safeCosine(d, qn * svc.norms(j))))
            }
            j += 1
          }
          scored.sortInPlaceBy { case (id, c) => (quant9(c).negate, id) }(
            Ordering.Tuple2(Ordering.ordered[java.math.BigDecimal],
              Ordering.Long))
          scored.take(k).zipWithIndex.map { case ((id, c), rank) =>
            org.apache.spark.sql.Row(qid, rank + 1, id, c)
          }
        }.df
    }
    served.select($"query_id", $"rank", $"neighbor_id",
      round($"cosine", 6).as("cosine"))
  }

  val q161_oracle: String = {
    val dims = 64
    val cos =
      s"""(list_sum(list_transform(range(1, ${dims + 1}), i -> q.qv[i]::DOUBLE * e.embedding[i]::DOUBLE))
         | / (sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))
         |    * sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))))""".stripMargin
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 40 = 1),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id, $cos AS cosine
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id ORDER BY round(cosine, 9) DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank::INT AS rank, neighbor_id, round(cosine, 6) AS cosine
       |FROM ranked WHERE rank <= 5""".stripMargin
  }

  // ------------- q162 streaming ANN serving through IVF cells (scale path)
  /** q161's per-event serving loop composed with the IVF coarse cells — the
    * plan a 100 TB deployment actually runs (VERDICT r9 item 1). The service
    * holds centroids + per-cell posting lists; each event scores the
    * centroids, probes its `nprobe` = 2 nearest cells, and ranks ONLY those
    * candidates — per-event work is O(cells + nprobe · N/cells) instead of
    * q161's O(N) full scan.
    *
    * Cells: a deterministic composite coarse quantizer — label × the sign
    * bits of the leading `b` dimensions (a hyperplane-LSH sub-split of the
    * q44 per-label cells), with `b` chosen by INTEGER arithmetic
    * (smallest b with 100 · 4^b ≥ N, i.e. 10 · 2^b ≳ √N) so the cell count
    * grows as √N — the IVF optimum that minimizes cells + N/cells. That is
    * what makes per-event work SUB-LINEAR in the index: at 10× the corpus,
    * cells ×~3.2 and cell size ×~3.2, not ×10 (measured in ScaleTrend —
    * q161's brute-force form is the flagged super-linear contrast). The
    * integer rule is replayed bit-identically by the oracle (no float log2
    * whose ceil could disagree across engines).
    *
    * Oracle: restricted-recall replay (the q44/q75/q112 technique) — the
    * DuckDB oracle rebuilds the same cells, probes the same 2, and ranks
    * the same candidate set, so approximate RECALL is out of scope by
    * construction and the differential checks the serving loop exactly:
    * probe ranking quantized at 9 dp with cell-id tiebreak, candidate
    * ranking quantized at 9 dp with neighbor-id tiebreak, cosine arithmetic
    * mirrored term-for-term (sequential double dot, separate norms).
    *
    * Scale: the gate form broadcasts the whole index — the same model-scale
    * boundary as q161/q108, and HARD-CAPPED at the same
    * [[BruteServeMaxIndexVectors]] (it fails loudly above the cap naming the
    * sharded plan). At corpus scale the posting lists shard by cell
    * across executors (the q44 bucketed-by-cell layout) and each query
    * routes to its probed cells' shards; the per-event loop here is
    * unchanged, only `svc.cells` becomes the local shard.
    */
  val q162_stream_ann_ivf_serve: Q = (s, dir) => {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings").select($"vec_id", $"embedding", $"label")
    val n = emb.count()
    // same hard cap as q161 (VERDICT r17 What's-wrong #2): this form collects
    // the WHOLE corpus to build the broadcast IVF service — model-scale only.
    // Above the cap it fails loudly and steers to the sharded plan instead of
    // silently OOMing the driver at corpus scale.
    requireBroadcastServable(n, "IVF broadcast serving")
    var b0 = 0
    while (100L * (1L << (2 * b0)) < n) b0 += 1
    val bBits = b0
    val raw: Array[(Long, Array[Float], Int)] = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2))).sortBy(_._1)
    val bc = s.sparkContext.broadcast(raw)
    val k = 5
    val nprobe = 2
    final case class Cell(ids: Array[Long], vecs: Array[Array[Float]],
                          norms: Array[Double])
    final case class Ivf(cellIds: Array[Long], cents: Array[Array[Double]],
                         centNorms: Array[Double], cells: Array[Cell])
    val factory = graft.pipeline.ServiceFactory(() => {
      val data = bc.value
      def vnorm(v: Array[Float]): Double = {
        var s0 = 0.0; var i = 0
        while (i < v.length) { s0 += v(i).toDouble * v(i).toDouble; i += 1 }
        math.sqrt(s0)
      }
      def cellOf(label: Int, v: Array[Float]): Long = {
        var bits = 0L; var j = 0
        while (j < bBits) { if (v(j) >= 0f) bits |= 1L << j; j += 1 }
        label.toLong * (1L << bBits) + bits
      }
      val grouped = scala.collection.mutable.LinkedHashMap
        .empty[Long, scala.collection.mutable.ArrayBuffer[(Long, Array[Float])]]
      data.foreach { case (id, v, l) =>
        grouped.getOrElseUpdate(cellOf(l, v),
          new scala.collection.mutable.ArrayBuffer) += ((id, v))
      }
      val cellIds = grouped.keys.toArray.sorted
      val dims = data(0)._2.length
      val cents = cellIds.map { cid =>
        val vs = grouped(cid)
        val m = new Array[Double](dims)
        vs.foreach { case (_, v) =>
          var i = 0; while (i < dims) { m(i) += v(i).toDouble; i += 1 }
        }
        var i = 0; while (i < dims) { m(i) /= vs.length; i += 1 }
        m
      }
      val centNorms = cents.map { c =>
        var s0 = 0.0; var i = 0
        while (i < c.length) { s0 += c(i) * c(i); i += 1 }
        math.sqrt(s0)
      }
      val cells = cellIds.map { cid =>
        val vs = grouped(cid)
        Cell(vs.map(_._1).toArray, vs.map(_._2).toArray,
          vs.map(v => vnorm(v._2)).toArray)
      }
      Ivf(cellIds, cents, centNorms, cells)
    })
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("neighbor_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cosine",
        org.apache.spark.sql.types.DoubleType)))
    def quant9(x: Double): java.math.BigDecimal =
      new java.math.BigDecimal(x).setScale(9, java.math.RoundingMode.HALF_UP)
    val queries = emb.filter($"vec_id" % 40 === 1)
      .withColumn("ts", timestamp_seconds($"vec_id"))
      .select($"ts", $"vec_id", $"embedding")
    val served = StreamRunner.replayFiles(s, queries, "ts", "append") { df =>
      new graft.pipeline.StreamStage(df, "ts")
        .flatMapUsingService(factory, outSchema) { (svc, r) =>
          val qid = r.getLong(1)
          val qv = r.getSeq[Float](2).toArray
          var qn = 0.0
          var i = 0
          while (i < qv.length) { qn += qv(i).toDouble * qv(i).toDouble; i += 1 }
          qn = math.sqrt(qn)
          def dotD(a: Array[Float], c: Array[Double]): Double = {
            var d = 0.0; var t = 0
            while (t < c.length) { d += a(t).toDouble * c(t); t += 1 }
            d
          }
          // probe: rank ALL centroids (cells ≈ √N of them), take nprobe
          val probed = Array.tabulate(svc.cellIds.length) { ci =>
            (ci, safeCosine(dotD(qv, svc.cents(ci)), qn * svc.centNorms(ci)))
          }.sortBy { case (ci, c) => (quant9(c).negate, svc.cellIds(ci)) }(
            Ordering.Tuple2(Ordering.ordered[java.math.BigDecimal], Ordering.Long))
            .take(nprobe)
          // score ONLY the probed cells' candidates
          val scored = new scala.collection.mutable.ArrayBuffer[(Long, Double)]()
          probed.foreach { case (ci, _) =>
            val cell = svc.cells(ci)
            var j = 0
            while (j < cell.ids.length) {
              if (cell.ids(j) != qid) {
                val v = cell.vecs(j)
                var d = 0.0
                var t = 0
                while (t < v.length) { d += qv(t).toDouble * v(t).toDouble; t += 1 }
                scored += ((cell.ids(j), safeCosine(d, qn * cell.norms(j))))
              }
              j += 1
            }
          }
          scored.sortInPlaceBy { case (id, c) => (quant9(c).negate, id) }(
            Ordering.Tuple2(Ordering.ordered[java.math.BigDecimal],
              Ordering.Long))
          scored.take(k).zipWithIndex.map { case ((id, c), rank) =>
            org.apache.spark.sql.Row(qid, rank + 1, id, c)
          }
        }.df
    }
    served.select($"query_id", $"rank", $"neighbor_id",
      round($"cosine", 6).as("cosine"))
  }

  // --------- q165 streaming ANN serving, SHARDED index (partitioned q162)
  /** q162's serving loop with the index PARTITIONED instead of broadcast —
    * the last architectural scale ceiling of the serving story (VERDICT r10
    * item 1). Composition (see [[graft.operators.IvfShardedServe]]):
    *
    *   - cell ids and norms are CATALYST COLUMNS over the corpus (no
    *     collect);
    *   - centroids come from a deterministic distributed build (one shuffle
    *     by cell, sequential in-partition accumulation in vec_id order —
    *     bit-identical to q162's in-service sums) and are the ONLY thing
    *     collected: O(√N) rows, the replicated-map analog;
    *   - each event probes the broadcast centroids in-stream and fans out
    *     to nprobe (query, cell) rows; candidates resolve via a
    *     stream-static SHUFFLE_HASH join on cell id — the posting lists
    *     never leave the cluster, each join task holds only its cells
    *     (the reference's partitioned `mapUsingIMap` vs replicated-map
    *     broadcast, GeneralStage.java:582-734);
    *   - the per-query top-5 runs IN-STREAM as a windowed aggregation with
    *     the bounded `graft_topk` accumulator (answer-sized state).
    *
    * Shares q162's restricted-recall oracle verbatim: same integer cell
    * rule, same probe ranking (9-dp quantization, cell-id tiebreak), same
    * candidate ranking (9-dp, neighbor-id tiebreak), same cosine
    * arithmetic. ShardedAnnServeSpec asserts the plan has NO corpus-sized
    * broadcast and pins the bucketed-table layout that drops the
    * static-side exchange entirely.
    *
    * r18: the gate runs the FIT/SERVE split — `IvfShardedServe.fit`
    * persists the index (bucketed postings + centroid sidecar), the serving
    * pipeline replays the PREBUILT tables ([[q165Serve]]), and incremental
    * growth is `IvfShardedServe.append` (frozen cells, servable
    * immediately). Spec-pinned bit-equal to the previously-fused form.
    */
  val q165_stream_ann_ivf_shard: Q = (s, dir) => {
    import graft.operators.IvfShardedServe
    // FIT → SERVE split (r18, VERDICT r17 Next #1): the gate fits the
    // PERSISTED index (bucketed postings + centroid sidecar) and then serves
    // against it — the production shape, where the corpus pass is an offline
    // build and serving replays the prebuilt tables. Bit-equal to the old
    // fused form (same deterministic centroid build, same postings rows), so
    // the shared q162 oracle is untouched.
    val emb = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val idx = IvfShardedServe.fit(emb, IvfShardedServe.tableFor(dir))
    q165Serve(s, dir, idx)
  }

  /** The SERVE half of q165 against an already-built index — also driven
    * directly by ScaleTrend's `q165_serve_only` row (the decade measurement
    * the split exists for).
    */
  def q165Serve(s: SparkSession, dir: String,
                idx: graft.operators.IvfShardedServe.IvfIndex): DataFrame = {
    import s.implicits._
    import graft.operators.IvfShardedServe
    val emb = Tables(s, dir, "embeddings").select($"vec_id", $"embedding", $"label")
    val queries = emb.filter($"vec_id" % 40 === 1)
      .withColumn("ts", timestamp_seconds($"vec_id"))
      .select($"ts", $"vec_id", $"embedding")
    def sentinel(maxTs: Timestamp, offsetSec: Long): DataFrame =
      Seq((new Timestamp(maxTs.getTime + offsetSec * 1000L), -1L, Seq.empty[Float]))
        .toDF("ts", "vec_id", "embedding")
    StreamRunner.replayFiles(s, queries, "ts", "append",
      tails = Some(maxTs =>
        Seq(sentinel(maxTs, 3600), sentinel(maxTs, 3660)))) { df =>
      IvfShardedServe.serve(s, idx, df, "ts", k = 5, nprobe = 2)
    }.select($"query_id", $"rank", $"neighbor_id",
      round($"cosine", 6).as("cosine"))
  }

  // ---------- q166 windowed agg over the MULTI-PARTITION kafka-shaped source
  /** q50's tumbling-window aggregate consumed through the multi-partition
    * kafka-shaped source instead of the file replay (VERDICT r10 item 2):
    * the events fixture is produced DISTRIBUTED through the transactional
    * sink into a 4-partition topic (8 sink tasks → hash-routed topic
    * partitions, exactly-once per partition), then a real streaming query
    * reads it back via [[graft.streaming.KafkaShapedSource]] — one reader
    * per partition, per-partition offsets in the checkpoint — parses the
    * JSON payload, and runs the watermarked windowed aggregate. Two produce
    * rounds split at the time midpoint drive two micro-batches, so the
    * second batch exercises the per-partition seek against live state.
    *
    * Hash-matches the SINGLE-partition q50/q20 oracle: partitioning the
    * log cannot change a windowed aggregate — per-partition order is
    * preserved by construction and the aggregate is order-insensitive
    * across partitions (the reference's multi-consumer StreamKafkaP makes
    * the same argument via per-partition watermark coalescing;
    * KafkaShapedSourceSpec pins the ordering/seek/idle/discovery cases).
    */
  val q166_stream_kafka_windowed: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
    val broker = s"q166_${System.nanoTime()}"
    val topic = "events"
    val payload = eventsDf(s, dir).select(
      unix_micros($"ts").as("ts_us"), $"event_type", $"value")
    val bounds = payload.agg(min($"ts_us"), max($"ts_us")).head()
    val mid = (bounds.getLong(0) + bounds.getLong(1)) / 2
    // writeBatch JSON-encodes the row itself — the record value on the
    // topic is {"ts_us":...,"event_type":...,"value":...}
    def produce(batchId: Long, part: DataFrame): Unit =
      graft.pipeline.KafkaShapedSink.writeBatch(broker, "q166", topic, batchId,
        part, parts = 8, topicPartitions = 4)
    // batch 0 = the early half (plus null-ts rows); batch 1 = the late half
    // — time-ordered like the replay chunks, so no batch-2 row is late
    produce(0L, payload.filter($"ts_us".isNull || $"ts_us" <= mid))
    val jschema = new StructType().add("ts_us", LongType)
      .add("event_type", StringType).add("value", DoubleType)
    val name = s"q166_sink_${System.nanoTime()}"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try s.readStream.format("graft.streaming.KafkaShapedSource")
        .option("broker", broker).option("topic", topic).load()
        .select(from_json($"value", jschema).as("j"))
        .select(timestamp_micros($"j.ts_us").as("ts"),
          $"j.event_type".as("event_type"), $"j.value".as("value"))
        .withWatermark("ts", "1 hour")
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
        .select(unix_timestamp($"w.start").as("window_start"),
          $"event_type", $"n", $"sum_value")
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    try {
      q.processAllAvailable()
      produce(1L, payload.filter($"ts_us".isNotNull && $"ts_us" > mid))
      q.processAllAvailable()
    } finally q.stop()
    // update-mode snapshot: keep each key's final update (q50's post-pass)
    s.table(name).groupBy($"window_start", $"event_type")
      .agg(max($"n").as("n"), max_by($"sum_value", $"n").as("sum_value"))
  }

  // ------- q169 windowed agg over the kinesis-shaped source, RESHARDED mid-run
  /** q50's tumbling aggregate consumed through the KINESIS-shaped source
    * ([[graft.streaming.KinesisShapedSource]]) with a RESHARD in the
    * middle: the events fixture is put distributed (partition key =
    * user id, md5-hash-range routed — per-user ordering by construction)
    * onto a 2-shard stream; after the first half is consumed, shard 0 is
    * SPLIT (parent closes, two children take its hash range) and the
    * second half lands on the children. The source's parent-before-child
    * gate and per-shard checkpointed sequences must deliver every record
    * exactly once across the reshard — the oracle is the same
    * single-partition q50/q20 aggregate, so a dropped, duplicated, or
    * resequenced record anywhere in the shard tracking breaks the hash.
    * (The consumer-side shard-tracker rule of the reference's Kinesis
    * connector, extensions/kinesis KinesisSources.java, executed on the
    * stub service; KinesisShapedSourceSpec pins routing/seek/split.)
    */
  val q169_stream_kinesis_reshard: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
    val svcName = s"q169_${System.nanoTime()}"
    val k = graft.pipeline.InMemoryKinesis.named(svcName)
    k.createStream("events", 2)
    val payload = eventsDf(s, dir).select(
      coalesce($"user_id".cast("string"), lit("null")).as("pk"),
      to_json(struct(unix_micros($"ts").as("ts_us"), $"event_type", $"value"))
        .as("v"),
      unix_micros($"ts").as("ts_us"))
    val bounds = payload.agg(min($"ts_us"), max($"ts_us")).head()
    val mid = (bounds.getLong(0) + bounds.getLong(1)) / 2
    def produce(part: org.apache.spark.sql.DataFrame): Unit =
      part.select($"pk", $"v").as[(String, String)].foreachPartition {
        (it: Iterator[(String, String)]) =>
          val svc = graft.pipeline.InMemoryKinesis.named(svcName)
          it.foreach { case (pk, v) => svc.putRecord("events", pk, v) }
      }
    produce(payload.filter($"ts_us".isNull || $"ts_us" <= mid))
    val jschema = new StructType().add("ts_us", LongType)
      .add("event_type", StringType).add("value", DoubleType)
    val name = s"q169_sink_${System.nanoTime()}"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try s.readStream.format("graft.streaming.KinesisShapedSource")
        .option("service", svcName).option("stream", "events").load()
        .select(from_json($"value", jschema).as("j"))
        .select(timestamp_micros($"j.ts_us").as("ts"),
          $"j.event_type".as("event_type"), $"j.value".as("value"))
        .withWatermark("ts", "1 hour")
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
        .select(unix_timestamp($"w.start").as("window_start"),
          $"event_type", $"n", $"sum_value")
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    try {
      q.processAllAvailable() // first half consumed; parent shards drained
      val parent = k.listShards("events").head._1
      k.splitShard("events", parent)
      produce(payload.filter($"ts_us".isNotNull && $"ts_us" > mid))
      q.processAllAvailable() // children discovered, second half consumed
      q.processAllAvailable()
    } finally q.stop()
    s.table(name).groupBy($"window_start", $"event_type")
      .agg(max($"n").as("n"), max_by($"sum_value", $"n").as("sum_value"))
  }

  val q162_oracle: String = {
    val dims = 64
    def cos(a: String, bb: String): String =
      s"""(list_sum(list_transform(range(1, ${dims + 1}), i -> $a[i]::DOUBLE * $bb[i]::DOUBLE))
         | / (sqrt(list_sum(list_transform($a, x -> x::DOUBLE * x::DOUBLE)))
         |    * sqrt(list_sum(list_transform($bb, x -> x::DOUBLE * x::DOUBLE)))))""".stripMargin
    s"""WITH nrow AS (SELECT count(*) AS n FROM embeddings),
       |bsel AS (SELECT min(j)::INT AS b FROM range(0, 16) t(j), nrow
       |         WHERE 100 * pow(4, j) >= n),
       |cells AS (
       |  SELECT vec_id, embedding, label,
       |    label * pow(2, b)::BIGINT + COALESCE(list_sum(list_transform(
       |      range(1, b + 1),
       |      j -> CASE WHEN embedding[j] >= 0 THEN pow(2, j - 1)::BIGINT ELSE 0 END)), 0)::BIGINT AS cell
       |  FROM embeddings, bsel),
       |expanded AS (
       |  SELECT cell, generate_subscripts(embedding, 1) AS pos,
       |    unnest(embedding)::DOUBLE AS x
       |  FROM cells),
       |cent AS (
       |  SELECT cell, list(m ORDER BY pos) AS cv
       |  FROM (SELECT cell, pos, avg(x) AS m FROM expanded GROUP BY cell, pos)
       |  GROUP BY cell),
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 40 = 1),
       |probe AS (
       |  SELECT query_id, qv, cell AS probe_cell FROM (
       |    SELECT q.query_id, q.qv, c.cell,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        round(${cos("q.qv", "c.cv")}, 9) DESC, c.cell ASC) AS rn
       |    FROM q CROSS JOIN cent c) WHERE rn <= 2),
       |scored AS (
       |  SELECT p.query_id, e.vec_id AS neighbor_id,
       |    ${cos("p.qv", "e.embedding")} AS cosine
       |  FROM cells e JOIN probe p
       |    ON e.cell = p.probe_cell AND e.vec_id <> p.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id ORDER BY round(cosine, 9) DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank::INT AS rank, neighbor_id, round(cosine, 6) AS cosine
       |FROM ranked WHERE rank <= 5""".stripMargin
  }

  val q94_oracle: String =
    """SELECT a.user_id, a.event_id AS view_id, b.event_id AS buy_id,
      |  epoch_us(CAST(a.ts AS TIMESTAMP)) AS view_ts_us,
      |  round(a.value, 4) AS view_value, round(b.value, 4) AS buy_value
      |FROM (SELECT * FROM events WHERE event_type = 'view') a
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      |  ON a.user_id = b.user_id
      |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 2 HOUR""".stripMargin

  val q77_oracle: String =
    """SELECT a.user_id, a.event_id AS view_id, b.event_id AS buy_id,
      |  epoch_us(CAST(a.ts AS TIMESTAMP)) AS view_ts_us,
      |  epoch_us(CAST(b.ts AS TIMESTAMP)) AS buy_ts_us,
      |  round(a.value, 4) AS view_value, round(b.value, 4) AS buy_value
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 2 HOUR
      |WHERE a.event_type = 'view' AND b.event_type = 'purchase'""".stripMargin

  // ------------------------------------------------- q87 streaming dedup
  /** Streaming exact dedup (Jet `distinct` on an unbounded stream): a real
    * streaming `dropDuplicates` on (user_id, event_type) — state keyed on the
    * pair, each first-seen row emitted exactly once in append mode — then a
    * batch rollup of unique users per event type, checked against DuckDB's
    * COUNT(DISTINCT).
    *
    * Scale shape: dedup state is one (tiny) entry per DISTINCT key, not per
    * event — bounded by key cardinality. For unbounded key spaces the
    * watermarked variant (`dropDuplicatesWithinWatermark`, spec'd in
    * StreamDistinctSpec) caps state by time instead; the gate uses the exact
    * variant because the oracle is global distinctness.
    */
  val q87_stream_dedup: Q = (s, dir) => {
    import s.implicits._
    val events = Tables(s, dir, "events").select($"ts", $"user_id", $"event_type")
    val firsts = StreamRunner.replayFiles(s, events, "ts", "append") { df =>
      // DuckDB's COUNT(DISTINCT user_id) ignores NULL users — mirror that
      df.filter($"user_id".isNotNull && $"event_type".isNotNull)
        .dropDuplicates("user_id", "event_type")
    }
    firsts.groupBy($"event_type").agg(count(lit(1)).as("n_unique_users"))
  }

  val q87_oracle: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_unique_users
      |FROM events
      |WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      |GROUP BY event_type""".stripMargin

  // ---------------------------------------------- q91 stream windowed topk
  /** Streaming windowed top-k (Jet `aggregateBuilder` + `topN` inside a
    * window, reference AggregateOperations.topN): hourly event counts per
    * type through a REAL streaming windowed aggregation (q50's update-mode
    * snapshot shape), then the rank step — kept OUTSIDE the stream on the
    * final snapshot, the standard lambda-free pattern: per-window state stays
    * a scalar count (cheap, mergeable), the top-k sort happens once on the
    * tiny aggregated result, not per micro-batch.
    */
  val q91_stream_window_topk: Q = (s, dir) => {
    import s.implicits._
    val raw = StreamRunner.replayFiles(s, eventsDf(s, dir), "ts", "update") { df =>
      df.withWatermark("ts", "1 hour")
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp($"w.start").as("window_start"), $"event_type", $"n")
    }
    // update-mode snapshot keeps every revision of a key: the final value of
    // each (window, type) is the row with the largest n (counts only grow)
    val finals = raw.groupBy($"window_start", $"event_type")
      .agg(max($"n").as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"window_start").orderBy($"n".desc, $"event_type".asc)
    finals.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 2)
      .select($"window_start", $"event_type", $"n", $"rank")
  }

  val q91_oracle: String =
    """WITH c AS (
      |  SELECT epoch(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)))::BIGINT AS window_start,
      |    event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT window_start, event_type, n,
      |        row_number() OVER (PARTITION BY window_start
      |          ORDER BY n DESC, event_type ASC) AS rank
      |      FROM c)
      |SELECT window_start, event_type, n, rank FROM r WHERE rank <= 2""".stripMargin

  // ------------------------------------ q113 streaming classifier scoring
  /** Fit-batch / score-stream — the model-serving pattern every production
    * corpus pipeline ends in: q108's Naive-Bayes model is fitted batch-side,
    * collected to the driver (vocab×classes-sized — the same model-scale
    * boundary as KMeansLite's driver-held centroids; beyond broadcast scale
    * you'd ship it as a keyed store via mapUsingIMap), broadcast to every
    * task, and each streamed document is scored ROW-LOCALLY in one typed map
    * — no shuffle, no state store, unbounded throughput. A declarative
    * in-stream argmax is impossible (window functions and chained
    * aggregations are unsupported on streams), which is exactly why scoring
    * belongs row-side with the model broadcast — same architecture as
    * MLlib's model.transform.
    *
    * Determinism contract: identical to q108 — per-(token, class)
    * log-likelihoods and priors rounded to 6 dp at fit time, folded in token
    * order at scoring time, final 6 dp round, ties on class name (the class
    * loop ascends with a strict `>`). The ORACLE IS q108's: stream scoring
    * must reproduce the batch classifier bit-for-bit. Tokenization uses
    * Locale.ROOT lowercasing to match the column expression's
    * locale-independent lower().
    */
  val q113_stream_classify: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.{TextFunctions => T}
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables(s, dir, "documents")
    // fit (batch side, one tokenize pass; q108's arithmetic). The fit
    // tokenize fans out of the single-row-group gate scan (Tables.fanOutScan
    // — no-op on production layouts); the replayed stream side already
    // widens per micro-batch below.
    val tokc = Tables.fanOutScan(docs)
      .select($"lang", explode(T.tokens($"text")).as("tok"))
      .groupBy($"tok", $"lang").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val v = tokc.agg(countDistinct($"tok").cast("double")).head.getDouble(0)
    val tots: Map[String, Double] = tokc.groupBy($"lang")
      .agg(sum($"cnt").cast("double").as("tot"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val nd = docs.count().toDouble
    val priors: Map[String, Double] = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> round6(math.log(r.getLong(1) / nd))).toMap
    val ll: Map[(String, String), Double] = tokc.collect().map { r =>
      val (tok, c, cnt) = (r.getString(0), r.getString(1), r.getLong(2))
      (tok, c) -> round6(math.log((cnt + 1) / (tots(c) + v)))
    }.toMap
    val absent: Map[String, Double] =
      tots.map { case (c, t) => c -> round6(math.log(1.0 / (t + v))) }
    val classes = priors.keys.toSeq.sorted
    val bc = s.sparkContext.broadcast((ll, absent, priors, classes))
    // score (stream side, row-local)
    StreamRunner.replayFiles(s, docs.select($"doc_id", $"text"), "doc_id", "append") { df =>
      df.as[(Long, String)].map { case (id, text) =>
        val (llm, dflt, pri, cls) = bc.value
        val toks = text.toLowerCase(java.util.Locale.ROOT)
          .split("[^a-z0-9]+").filter(_.nonEmpty)
        var bestC = ""
        var bestS = Double.NegativeInfinity
        for (c <- cls) {
          var acc = 0.0
          toks.foreach(t => acc += llm.getOrElse((t, c), dflt(c)))
          val sc = round6(acc + pri(c))
          if (sc > bestS) { bestS = sc; bestC = c }
        }
        (id, bestC, bestS)
      }.toDF("doc_id", "pred_lang", "score")
    }
  }

  // -------------------------------------- q114 streaming ingestion dedup
  /** Ingestion-time near-dup gate — q86's cross-corpus MinHash dedup with
    * the NEW side a real stream: documents arrive micro-batched, are
    * tokenized + signature-banded row-locally in-stream, joined
    * stream-static against the reference corpus's banded signatures
    * (checkpointed here; production reads the writeBandedSignatures
    * parquet), exact-Jaccard verified and emitted as pairs. The oracle is
    * q86's SQL — in-stream dedup must find exactly the pairs the batch pass
    * finds. At 100 TB/day this is the shape that matters: the reference
    * side is hashed ONCE (persisted), each arriving batch pays only its own
    * row-local hashing plus a band-keyed join.
    */
  val q114_stream_ingest_dedup: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.{TextFunctions => T, DedupFunctions => D}
    val docs = Tables(s, dir, "documents").select($"doc_id", $"source", $"text")
    val half = substring($"source", 4, 10).cast("int")
    // static side: fan the reference-corpus signature build out of the
    // single-row-group gate scan (Tables.fanOutScan; the stream side's
    // per-batch repartition below is the same fix for the replay source)
    val refSig = D.referenceSignatures(
      Tables.fanOutScan(docs.filter(half < 10))
        .select($"doc_id", T.tokenSet($"text").as("toks")),
      "doc_id", "toks", hashes = 12, bands = 2).localCheckpoint(true)
    StreamRunner.replayFiles(s, docs.filter(half >= 10).select($"doc_id", $"text"),
        "doc_id", "append") { df =>
      // the streaming analog of Width.widen (a streaming plan's partition
      // count can't be inspected, so widen explicitly): the file-replay
      // source delivers each micro-batch as ONE scan partition, which
      // serialized the md5+minhash build — 9.1× super-linear at 10× data
      // before this repartition, linear after. Raw text shuffles BEFORE
      // tokenize+hash so the CPU-dense work lands wide; a well-partitioned
      // production source (many kafka partitions) can skip this.
      val wide = df.repartition(s.sparkContext.defaultParallelism)
      D.streamCrossCorpusPairs(wide.withColumn("toks", T.tokenSet($"text")), refSig,
        "doc_id", "toks", hashes = 12, bands = 2, minJaccard = 0.9)
        .select($"id_new", $"id_ref", $"jaccard")
    }
  }

  // ------------------------------------------------------------- registry
  // ----------------------------------- q140 streaming journal materialization
  /** The STREAM half of stream-table duality (q138 is the table half, and
    * the two share one oracle): replay the cutoff-filtered event journal as
    * a real stream and materialize per-user latest-state + change-count in
    * `mapGroupsWithState`. State transition is ORDER-INDEPENDENT by
    * construction — "latest" folds by (ts, event_id) max, the count is
    * additive — so micro-batch boundaries and within-batch iterator order
    * cannot change the answer; the final snapshot is each user's last
    * emission (largest n_changes). A divergence between the streaming state
    * machine and the batch window query fails the shared hash.
    *
    * This is mapJournal -> IMap materialization (KeyedStore) expressed as a
    * gate query: the journal IS the stream, the snapshot IS the table.
    */
  val q140_stream_journal: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .filter($"ts" <= lit("2024-01-15").cast("timestamp"))
      .select($"ts", $"user_id", $"event_id", $"event_type", $"value")
    val emitted = StreamRunner.replayFiles(s, ev, "ts", "update") { df =>
      import org.apache.spark.sql.streaming.GroupStateTimeout
      df.filter($"ts".isNotNull && $"user_id".isNotNull)
        .as[(Timestamp, Long, Long, String, Double)]
        .groupByKey(_._2)
        .mapGroupsWithState[(Long, String, Double, Timestamp, Long),
          (Long, Long, String, Double, Long)](GroupStateTimeout.NoTimeout()) {
          case (user, events, state) =>
            var (lid, ltyp, lval, lts, n) = state.getOption
              .getOrElse((0L, "", 0.0, new Timestamp(0L), 0L))
            events.foreach { case (ts, _, id, typ, v) =>
              n += 1
              if (ts.after(lts) || (ts.equals(lts) && id > lid)) {
                lid = id; ltyp = typ; lval = v; lts = ts
              }
            }
            state.update((lid, ltyp, lval, lts, n))
            (user, lid, ltyp, lval, n)
        }.toDF("user_id", "last_event_id", "last_event_type", "last_value",
          "n_changes")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"n_changes".desc)
    emitted.withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"user_id", $"last_event_id", $"last_event_type",
        $"last_value", $"n_changes")
  }

  // ------------------------- q157 streaming preference-journal derivation
  /** The STREAM half of q153: the pairwise comparisons are derived
    * IN-STREAM by a per-user state machine (`flatMapGroupsWithState` keeping
    * each user's last event) instead of a batch lag window, then the same
    * shared Bradley–Terry fit runs over the emitted comparison stream —
    * the "preference data lands as a stream, reward-model prep consumes
    * it" production shape. Within a micro-batch each user's events fold in
    * (ts, event_id) order; the state carries the last event across
    * batches, so the comparison chain equals the batch lag window's
    * EXACTLY regardless of chunking (replayFiles' time-ranged chunks keep
    * equal timestamps together). Shares q153's oracle: the stream must
    * derive exactly the batch comparisons, and the strengths must match
    * bit-for-bit.
    */
  val q157_stream_preferences: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .filter($"user_id".isNotNull)
      .select($"ts", $"user_id", $"event_id", $"event_type")
    val comps = StreamRunner.replayFiles(s, ev, "ts", "append") { df =>
      import org.apache.spark.sql.streaming.GroupStateTimeout
      df.as[(Timestamp, Long, Long, String)]
        .groupByKey(_._2)
        .flatMapGroupsWithState[(Timestamp, Long, String), (String, String)](
          org.apache.spark.sql.streaming.OutputMode.Append(),
          GroupStateTimeout.NoTimeout()) {
          case (_, events, state) =>
            var prev = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
            // fold in event order within the batch; state continues the
            // chain across batches
            // FULL-microsecond order — Timestamp.getTime truncates to ms,
            // and the batch lag window / oracle order by the microsecond ts
            // (the fixture carries sub-ms precision); ms truncation would
            // let event_id decide ties the oracle resolves by time
            events.toSeq.sortBy(e =>
              (org.apache.spark.sql.catalyst.util.DateTimeUtils
                .fromJavaTimestamp(e._1), e._3)).foreach {
              case (ts, _, id, typ) =>
                if (prev != null && prev._3 != typ) out += ((typ, prev._3))
                prev = (ts, id, typ)
            }
            if (prev != null) state.update(prev)
            out.iterator
        }.toDF("winner", "loser")
    }
    CurationQueries.bradleyTerryFit(s, comps)
  }

  val entries: Map[String, Q] = Map(
    "q157_stream_preferences" -> q157_stream_preferences,
    "q140_stream_journal" -> q140_stream_journal,
    "q113_stream_classify" -> q113_stream_classify,
    "q114_stream_ingest_dedup" -> q114_stream_ingest_dedup,
    "q50_stream_tumbling" -> q50_stream_tumbling,
    "q51_stream_session" -> q51_stream_session,
    "q52_stream_rolling_final" -> q52_stream_rolling_final,
    "q77_stream_join" -> q77_stream_join,
    "q87_stream_dedup" -> q87_stream_dedup,
    "q91_stream_window_topk" -> q91_stream_window_topk,
    "q94_stream_left_join" -> q94_stream_left_join,
    "q96_stream_static_join" -> q96_stream_static_join,
    "q159_cdc_mysql_parse" -> q159_cdc_mysql_parse,
    "q160_cdc_postgres_parse" -> q160_cdc_postgres_parse,
    "q161_stream_ann_serve" -> q161_stream_ann_serve,
    "q162_stream_ann_ivf_serve" -> q162_stream_ann_ivf_serve,
    "q165_stream_ann_ivf_shard" -> q165_stream_ann_ivf_shard,
    "q166_stream_kafka_windowed" -> q166_stream_kafka_windowed,
    "q169_stream_kinesis_reshard" -> q169_stream_kinesis_reshard)

  val oracles: Map[String, String] = Map(
    // the in-stream comparison derivation must reproduce the batch fit
    "q157_stream_preferences" -> CurationQueries.q153_oracle,
    "q140_stream_journal" -> EventQueries.q138_oracle,
    // stream scoring must reproduce the batch classifier exactly
    "q113_stream_classify" -> CurationQueries.q108_oracle,
    // in-stream dedup must find exactly the pairs the batch pass finds
    "q114_stream_ingest_dedup" -> CorpusQueries.q86_oracle,
    "q50_stream_tumbling" -> q50_oracle,
    "q51_stream_session" -> q51_oracle,
    "q52_stream_rolling_final" -> q52_oracle,
    "q77_stream_join" -> q77_oracle,
    "q87_stream_dedup" -> q87_oracle,
    "q91_stream_window_topk" -> q91_oracle,
    "q94_stream_left_join" -> q94_oracle,
    "q96_stream_static_join" -> q96_oracle,
    "q159_cdc_mysql_parse" -> q159_oracle,
    "q160_cdc_postgres_parse" -> q160_oracle,
    "q161_stream_ann_serve" -> q161_oracle,
    "q162_stream_ann_ivf_serve" -> q162_oracle,
    // q165 = the sharded plan for the SAME serving semantics — one oracle,
    // so the broadcast and partitioned forms can never drift
    "q165_stream_ann_ivf_shard" -> q162_oracle,
    // multi-partition consume of the same windowed agg = q50's oracle:
    // partitioning the log must not change the aggregate
    "q166_stream_kafka_windowed" -> q50_oracle,
    // resharded kinesis consume of the same windowed agg = q50's oracle
    "q169_stream_kinesis_reshard" -> q50_oracle)
}
