package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator inventory queries (SURVEY.md §2.3, §2.5, §2.6, §2.10–2.12)
  * over the driver TESTDATA star schema, each with a DuckDB-runnable oracle.
  *
  * Scale notes (100 TB design rules):
  *  - dimension joins (`region/nation/customer/supplier/part`) are explicit
  *    `broadcast()` — at real scale these stay tiny relative to the fact tables;
  *  - aggregations are plain `groupBy().agg()` so Catalyst plans two-phase
  *    (partial + final) hash aggregation — the Jet `accumulateByKeyP`/`combineByKeyP`
  *    shape (reference: impl/pipeline/transform/GroupTransform.java:111-118) for free;
  *  - no `collect()` anywhere; top-k per key uses window `row_number` which is a
  *    single shuffle on the group key.
  */
object TpchQueries {

  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // ---------------------------------------------------------------- q01 agg
  /** TPC-H Q1 shape: the Jet two-stage keyed aggregation (`groupingKey().aggregate`,
    * AggregateOperations summing/averaging/counting — reference:
    * aggregate/AggregateOperations.java:94-411).
    */
  val q01_pricing_summary: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 4).as("sum_qty"),
        round(sum($"l_extendedprice"), 4).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")), 4).as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q01_oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(sum(l_extendedprice), 4) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------- q02 filter + project
  /** Stateless row ops: `map`/`filter` (GeneralStage.java:78-95) = Catalyst
    * Project/Filter; predicate + projection push down to the parquet scan.
    */
  val q02_filter_project: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .select($"l_orderkey", $"l_linenumber",
        ($"l_extendedprice" * $"l_discount").as("revenue"))
  }

  val q02_oracle: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice * l_discount AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------- q03 global aggregate
  /** Non-keyed ("global") aggregate — Jet's two-stage global agg with an all-to-one
    * combine (AggregateTransform.java:121-139). Spark does partial aggregation on
    * every partition and a single final reduce: same shape, no full shuffle.
    */
  val q03_global_agg: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      round(sum($"l_quantity"), 4).as("total_qty"),
      min($"l_extendedprice").as("min_price"),
      max($"l_extendedprice").as("max_price"),
      round(avg($"l_discount"), 6).as("avg_disc"))
  }

  val q03_oracle: String =
    """SELECT count(*) AS n_rows, round(sum(l_quantity), 4) AS total_qty,
      |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
      |  round(avg(l_discount), 6) AS avg_disc
      |FROM lineitem""".stripMargin

  // ------------------------------------------------- q04 broadcast hash join
  /** Jet `hashJoin` IS a broadcast hash join: enriching side replicated to every
    * processor (HashJoinP.java, reference impl/processor/HashJoinP.java) — exactly
    * Spark's `join(broadcast(dim))`. Customer is the dim side here.
    */
  val q04_join_broadcast: Q = (s, dir) => {
    import s.implicits._
    val orders = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    orders.join(broadcast(customer), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 4).as("revenue"))
  }

  val q04_oracle: String =
    """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 4) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  // ----------------------------------------------------- q05 multi-way join
  /** N-way hash join (Jet `hashJoinBuilder`, GeneralStage.java:864-954): one fact
    * stream enriched by several broadcast dims in a chain — Catalyst collapses
    * the broadcast joins into one stage.
    */
  val q05_join_multiway: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q05_oracle: String =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue, count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  // ------------------------------------------------------------ q06 distinct
  /** Jet `distinct` (DistinctTransform.java:45-60) = `dropDuplicates`; Spark plans
    * it as partial+final hash agg, same two-stage HashSet shape.
    */
  val q06_distinct: Q = (s, dir) => {
    t(s, dir, "orders").select("o_custkey", "o_orderstatus").dropDuplicates()
  }

  val q06_oracle: String =
    "SELECT DISTINCT o_custkey, o_orderstatus FROM orders"

  // ---------------------------------------------------------- q07 sort+limit
  /** Jet `BatchStage.sort()` (SortTransform.java:53-71) is a local-sort + single
    * merge; Spark's `orderBy` is a range-partitioned sample sort — strictly better
    * at scale. Limit pushes into the sort (TakeOrderedAndProject).
    */
  val q07_sort_limit: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(100)
  }

  val q07_oracle: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin

  // ------------------------------------------------------- q08 top-N per key
  /** Jet `topN` aggregate (AggregateOperations.java:279, bounded-PQ accumulator).
    * Scale-safe Spark shape: window `row_number` over the group key — one shuffle,
    * no unbounded `collect_list`.
    */
  val q08_topn_per_key: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc)
    t(s, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"l_returnflag", $"rn", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
  }

  val q08_oracle: String =
    """SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice FROM (
      |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rn
      |  FROM lineitem) WHERE rn <= 3""".stripMargin

  // ------------------------------------------------------ q09 minBy / maxBy
  /** Jet `minBy`/`maxBy` (AggregateOperations.java:200-237) = `min_by`/`max_by`.
    * Tie-broken through a (price, orderkey, linenumber) struct so the argmax is
    * deterministic in both engines.
    */
  val q09_minby_maxby: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        max_by($"l_orderkey", struct($"l_extendedprice", $"l_orderkey", $"l_linenumber"))
          .as("max_price_orderkey"),
        min_by($"l_orderkey", struct($"l_extendedprice", $"l_orderkey", $"l_linenumber"))
          .as("min_price_orderkey"),
        max($"l_extendedprice").as("max_price"),
        min($"l_extendedprice").as("min_price"))
  }

  val q09_oracle: String =
    """WITH ranked AS (
      |  SELECT l_returnflag, l_orderkey, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC) AS rmax,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC) AS rmin
      |  FROM lineitem)
      |SELECT l_returnflag,
      |  max(CASE WHEN rmax = 1 THEN l_orderkey END) AS max_price_orderkey,
      |  max(CASE WHEN rmin = 1 THEN l_orderkey END) AS min_price_orderkey,
      |  max(l_extendedprice) AS max_price,
      |  min(l_extendedprice) AS min_price
      |FROM ranked GROUP BY l_returnflag""".stripMargin

  // --------------------------------------------- q10 concatenating / toList
  /** Jet `concatenating` + `sorting` + `toSet` (AggregateOperations.java:500-546,
    * 1286, 804): emitted as a deterministic sorted join so the oracle hash is
    * stable across engines. `collect_set` is bounded here (5 statuses) — at scale
    * this pattern is only safe for low-cardinality groups, which is exactly the
    * Jet contract too (accumulator lives on the heap).
    */
  val q10_concat_sorted: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        array_join(array_sort(collect_set($"o_orderstatus")), ",").as("statuses"),
        count(lit(1)).as("n"))
  }

  val q10_oracle: String =
    """SELECT o_orderpriority,
      |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // ----------------------------------------------------------- q11 union/merge
  /** Jet `merge` (MergeTransform.java) = `unionByName`; Spark unions are free
    * (no shuffle) — partitions concatenate.
    */
  val q11_union_merge: Q = (s, dir) => {
    import s.implicits._
    val o = t(s, dir, "orders")
    val hi = o.filter($"o_totalprice" > 150000).select($"o_orderkey", lit("hi").as("bucket"))
    val lo = o.filter($"o_totalprice" < 1000).select($"o_orderkey", lit("lo").as("bucket"))
    hi.unionByName(lo).groupBy($"bucket").agg(count(lit(1)).as("n"))
  }

  val q11_oracle: String =
    """SELECT bucket, count(*) AS n FROM (
      |  SELECT o_orderkey, 'hi' AS bucket FROM orders WHERE o_totalprice > 150000
      |  UNION ALL
      |  SELECT o_orderkey, 'lo' AS bucket FROM orders WHERE o_totalprice < 1000)
      |GROUP BY bucket""".stripMargin

  // ------------------------------------------------------- q12 co-aggregate
  /** Jet `aggregate2` / co-group (BatchStageWithKey.java:211-391): two keyed inputs
    * aggregated into one result per key. Spark shape: aggregate each input on its
    * key, then join the compact per-key aggregates (shuffle on pre-aggregated data
    * only — far smaller than co-shuffling raw inputs).
    */
  val q12_coaggregate: Q = (s, dir) => {
    import s.implicits._
    val ordersAgg = t(s, dir, "orders").groupBy($"o_custkey".as("custkey"))
      .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 4).as("total_spent"))
    val custAgg = t(s, dir, "customer").select($"c_custkey".as("custkey"), $"c_acctbal")
    custAgg.join(ordersAgg, Seq("custkey"), "left_outer")
      .select($"custkey",
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"total_spent", lit(0.0)).as("total_spent"),
        $"c_acctbal")
  }

  val q12_oracle: String =
    """SELECT c_custkey AS custkey,
      |  coalesce(n_orders, 0) AS n_orders,
      |  coalesce(total_spent, 0.0) AS total_spent,
      |  c_acctbal
      |FROM customer LEFT JOIN (
      |  SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 4) AS total_spent
      |  FROM orders GROUP BY o_custkey) ON c_custkey = o_custkey""".stripMargin

  // ------------------------------------------------- q13 distinct-count agg
  /** DISTINCT inside aggregates — Jet forces single-phase
    * (AggregatePhysicalRule.java:87-96); Spark's expand/partial-distinct rewrite
    * is strictly better. Also covers `countDistinct`.
    */
  val q13_count_distinct: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_suppkey").as("n_supp"),
        countDistinct($"l_partkey").as("n_part"),
        round(sum_distinct($"l_quantity"), 4).as("sum_qty_distinct"))
  }

  val q13_oracle: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_suppkey) AS n_supp,
      |  count(DISTINCT l_partkey) AS n_part,
      |  round(sum(DISTINCT l_quantity), 4) AS sum_qty_distinct
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // -------------------------------------------------- q14 grouping sets (superset)
  /** Beyond-reference: Jet has no ROLLUP/CUBE (AggregatePhysicalRule.java:64
    * asserts simple groups); Spark has them natively.
    */
  val q14_rollup: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(round(sum($"l_quantity"), 4).as("sum_qty"), count(lit(1)).as("n"))
  }

  val q14_oracle: String =
    """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  // ------------------------------------------------- q15 intersect / except
  /** Beyond-reference set ops (absent in Jet, SURVEY §2.10): customers with orders
    * in 1995 but none in 2001.
    */
  val q15_except_intersect: Q = (s, dir) => {
    import s.implicits._
    val o = t(s, dir, "orders")
    val y1995 = o.filter(year($"o_orderdate") === 1995).select($"o_custkey")
    val y2001 = o.filter(year($"o_orderdate") === 2001).select($"o_custkey")
    y1995.except(y2001)
  }

  val q15_oracle: String =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001""".stripMargin

  // ----------------------------------- q16 toMap / groupingBy / pickAny / reducing
  /** Jet `toMap` + nested `groupingBy` (AggregateOperations.java:844,1026),
    * `pickAny` (:1259) and `reducing` (:1209), driven through the Pipeline
    * facade's keyed-aggregate path. The map is canonicalized to a sorted
    * `status:count` string so the cross-engine compare is exact; `pickAny` is
    * applied to a column constant within the group (the only deterministic use).
    */
  val q16_tomap_reduce: Q = (s, dir) => {
    import s.implicits._
    import graft.pipeline.{AggregateOperations => A, Pipeline}
    val counts = t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus").agg(count(lit(1)).as("n"))
    Pipeline.create(s).wrap(counts)
      .groupingKey($"l_returnflag")
      .aggregate(A.allOf(
        A.toMap($"l_linestatus", $"n", as = "status_map"),
        A.pickAny(upper($"l_returnflag"), as = "flag_upper"),
        A.reducing($"n", lit(0L), _ + _, as = "total")))
      .toDF
      .withColumn("status_counts", array_join(
        transform(map_entries(col("status_map")),
          e => concat_ws(":", e("key"), e("value"))), ","))
      .drop("status_map")
  }

  val q16_oracle: String =
    """WITH c AS (
      |  SELECT l_returnflag, l_linestatus, count(*) AS n
      |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
      |SELECT l_returnflag,
      |  upper(l_returnflag) AS flag_upper,
      |  sum(n)::BIGINT AS total,
      |  string_agg(l_linestatus || ':' || n, ',' ORDER BY l_linestatus) AS status_counts
      |FROM c GROUP BY l_returnflag""".stripMargin

  // ------------------------------------------- q17 typed Aggregator udaf path
  /** Custom `Aggregator[IN,BUF,OUT]` via `functions.udaf` — the Jet
    * `AggregateOperation` builder contract (AggregateOperation.java:87-103)
    * run as Tungsten partial+final aggregation: bounded-PQ `topN` and O(1)
    * moment-sum `linearTrend` (graft.pipeline.typed.TypedAggs), both
    * constant-memory per group at any scale.
    */
  val q17_typed_topn: Q = (s, dir) => {
    import s.implicits._
    val top3 = udaf(graft.pipeline.typed.TypedAggs.topN(3))
    val trend = udaf(graft.pipeline.typed.TypedAggs.LinearTrend)
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        top3($"l_extendedprice").as("top_prices"),
        round(trend($"l_quantity", $"l_extendedprice"), 4).as("price_trend"))
      // gate harness cannot hash ARRAY columns — emit one row per top price
      // (multiset compare after row sort; rank is implied by the values)
      .select($"l_returnflag", explode($"top_prices").as("top_price"), $"price_trend")
  }

  // oracle slope via regr_slope: DuckDB's regression aggregate is the same
  // central-moment (Welford-family) algorithm as TypedAggs.LinearTrend — the
  // raw moment-sum closed form would diverge from the engine at the last
  // digits on large groups (the q26 same-formula-both-sides principle,
  // honored here by matching ALGORITHM family instead)
  val q17_oracle: String =
    """WITH m AS (
      |  SELECT l_returnflag,
      |    round(regr_slope(l_extendedprice, l_quantity), 4) AS price_trend,
      |    (list(l_extendedprice ORDER BY l_extendedprice DESC))[1:3] AS top_prices
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, unnest(top_prices) AS top_price, price_trend
      |FROM m""".stripMargin

  // ----------------------------------------------- q18 semi / anti joins
  /** Beyond-reference semi/anti joins (SURVEY §2.5 lists them absent in Jet):
    * customers WITH at least one 1995 order (left_semi — no row multiplication
    * from multiple orders) and customers WITHOUT any order at all (left_anti).
    * Both plan as broadcast/shuffled hash joins with early short-circuit.
    */
  val q18_semi_anti: Q = (s, dir) => {
    import s.implicits._
    val cust = t(s, dir, "customer")
    val orders = t(s, dir, "orders")
    val with1995 = cust.join(
      orders.filter(year($"o_orderdate") === 1995), $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", lit("active_1995").as("segment"))
    val without = cust.join(orders, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", lit("no_orders").as("segment"))
    with1995.unionByName(without)
  }

  val q18_oracle: String =
    """SELECT c_custkey, 'active_1995' AS segment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
      |UNION ALL
      |SELECT c_custkey, 'no_orders' AS segment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  // --------------------------------------------------------- q19 as-of join
  /** As-of join (graft.operators.AsofJoin — absent in both the reference and
    * Spark built-ins; the prompt's canonical custom operator): for every
    * `purchase` event, the user's latest `view` at or before it. One shuffle
    * on user_id + one in-partition sort — never the O(n·m) blow-up of a theta
    * join. DuckDB validates via its native ASOF JOIN.
    */
  val q19_asof_join: Q = (s, dir) => {
    import s.implicits._
    val events = t(s, dir, "events")
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
    // one view per (user, ts), keeping the max event id: DuckDB's ASOF JOIN
    // picks an ARBITRARY right row on timestamp ties while the engine breaks
    // ties deterministically — dedup on BOTH sides removes the ambiguity
    val views = events.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts".as("view_ts"))
      .agg(max($"event_id").as("view_event"))
    graft.operators.AsofJoin(purchases, views, key = "user_id",
        leftTs = "ts", rightTs = "view_ts", rightVals = Seq("view_event"))
      .select($"user_id", $"event_id".as("purchase_event"),
        $"view_event", unix_timestamp($"ts").as("purchase_epoch"))
  }

  val q19_oracle: String =
    """SELECT p.user_id, p.event_id AS purchase_event, v.event_id AS view_event,
      |  (epoch_us(CAST(p.ts AS TIMESTAMP)) // 1000000) AS purchase_epoch
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT user_id, ts, max(event_id) AS event_id
      |           FROM events WHERE event_type = 'view' GROUP BY user_id, ts) v
      |  ON p.user_id = v.user_id AND v.ts <= p.ts""".stripMargin

  // --------------------------------------------- q63 KMV distinct sketch
  /** Deterministic cardinality sketch (TypedAggs.KmvDistinct): estimate
    * distinct part keys per return flag from the 64 smallest md5-hash values —
    * O(k) state per group at any scale, mergeable like HLL, and exactly
    * reproducible in DuckDB (same md5 → same estimate to the last bit; the
    * built-in `approx_count_distinct` could never be differentially tested).
    */
  val q63_kmv_sketch: Q = (s, dir) => {
    import s.implicits._
    val kmv = udaf(graft.pipeline.typed.TypedAggs.kmvDistinct(64))
    // KMV is insensitive to duplicate hashes, so dedup (flag, key) FIRST in a
    // codegen'd hash aggregate and run the md5 + udaf (object-hash agg, per-row
    // buffer ser/de) over only the ~10x smaller distinct set — the md5 cost
    // and the non-codegen aggregator both scale with DISTINCT keys, not rows.
    t(s, dir, "lineitem")
      .select($"l_returnflag", $"l_partkey").distinct()
      .withColumn("hv",
        graft.functions.TextFunctions.md5PrefixLong($"l_partkey".cast("string"), 15)
          .cast("double") / lit(1152921504606846976.0)) // 2^60
      .groupBy($"l_returnflag")
      .agg(round(kmv($"hv"), 4).as("est_distinct"),
        count($"l_partkey").as("true_distinct"))
  }

  val q63_oracle: String =
    """WITH h AS (
      |  SELECT DISTINCT l_returnflag,
      |    ('0x' || substr(md5(l_partkey::VARCHAR), 1, 15))::BIGINT::DOUBLE
      |      / 1152921504606846976.0 AS hv
      |  FROM lineitem),
      |r AS (
      |  SELECT l_returnflag, hv,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rk,
      |    count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM h)
      |SELECT l_returnflag,
      |  round(CASE WHEN max(n) < 64 THEN max(n)::DOUBLE
      |        ELSE 63.0 / max(CASE WHEN rk = 64 THEN hv END) END, 4) AS est_distinct,
      |  (SELECT count(DISTINCT l_partkey) FROM lineitem li
      |   WHERE li.l_returnflag = r.l_returnflag) AS true_distinct
      |FROM r GROUP BY l_returnflag""".stripMargin

  // ------------------------------------------------------------- registry
  // ---------------------------------------------- q131 join-key skew audit
  /** Join-key skew profiler: for each candidate shuffle key of the fact
    * table, the key-cardinality facts that decide the join strategy —
    * row count, distinct keys, the heaviest key's row count, and
    * skew_factor = max_key_rows / mean_rows_per_key. This is the
    * measurement that feeds the salted-skew-join recipe
    * (BatchStage.saltedJoin / ScaleRecipesSpec): skew_factor near 1 means
    * hash-partitioning balances; a large factor names the key that will
    * straggle a 1000-executor shuffle and by how much. All inputs are
    * integer counts; the ratio rounds at output.
    *
    * 100 TB shape: one key-cardinality-bounded count agg per audited column
    * (map-side partials), each collapsed to a single stats row — the audit
    * costs a fraction of the join it de-risks and never shuffles the fact
    * table's payload columns.
    */
  val q131_skew_audit: Q = (s, dir) => {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    def audit(keyCol: String) = li.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("c"))
      .agg(sum($"c").as("n_rows"), count(lit(1)).as("n_keys"),
        max($"c").as("max_key_rows"))
      .select(lit(keyCol).as("key_col"), $"n_rows", $"n_keys", $"max_key_rows",
        round($"max_key_rows".cast("double") * $"n_keys" / $"n_rows", 6)
          .as("skew_factor"))
    audit("l_orderkey").unionByName(audit("l_partkey"))
      .unionByName(audit("l_suppkey"))
  }

  val q131_oracle: String = {
    def audit(c: String) =
      s"""SELECT '$c' AS key_col, sum(cnt)::BIGINT AS n_rows,
         |  count(*)::BIGINT AS n_keys, max(cnt)::BIGINT AS max_key_rows,
         |  round(max(cnt)::DOUBLE * count(*) / sum(cnt), 6) AS skew_factor
         |FROM (SELECT $c, count(*)::BIGINT AS cnt FROM lineitem GROUP BY 1)""".stripMargin
    s"""${audit("l_orderkey")}
       |UNION ALL ${audit("l_partkey")}
       |UNION ALL ${audit("l_suppkey")}""".stripMargin
  }

  // ----------------------------------------- q132 TPC-H Q3 shipping priority
  /** TPC-H Q3 (shipping priority), adapted to the fixture schema
    * (o_orderpriority stands in for o_shippriority): top-10 unshipped
    * BUILDING-segment orders by revenue as of the 1998-07-01 cutoff.
    * The canonical 3-table star join: customer (selective dim filter)
    * broadcasts into orders, the result broadcasts/AQE-joins into lineitem,
    * one (orderkey)-keyed revenue agg, TakeOrdered 10. Rank is decided on
    * the 4dp-rounded revenue with the orderkey tie-break on both engines
    * (the README quantized-rank contract).
    */
  val q132_tpch_q3: Q = (s, dir) => {
    import s.implicits._
    val cut = lit("1998-07-01").cast("timestamp")
    val cust = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val ord = t(s, dir, "orders").filter($"o_orderdate" < cut)
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    t(s, dir, "lineitem").filter($"l_shipdate" > cut)
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"))
      .select($"l_orderkey", $"revenue", $"o_orderdate", $"o_orderpriority")
      .orderBy($"revenue".desc, $"l_orderkey".asc)
      .limit(10)
  }

  val q132_oracle: String =
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-07-01'
      |  AND l_shipdate > TIMESTAMP '1998-07-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // --------------------------------------- q133 TPC-H Q10 returned items
  /** TPC-H Q10 (returned-item reporting): top-20 customers by revenue lost
    * to returns in a one-quarter order window, with nation context. The
    * 4-table shape: the quarter filter prunes orders at the scan, lineitem
    * joins on orderkey keeping only returnflag='R' rows, customer + nation
    * broadcast in for the report columns. Same quantized-rank contract as
    * q132.
    */
  val q133_tpch_q10: Q = (s, dir) => {
    import s.implicits._
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1997-04-01").cast("timestamp")
    val ord = t(s, dir, "orders")
      .filter($"o_orderdate" >= lo && $"o_orderdate" < hi)
      .select($"o_orderkey", $"o_custkey")
    val rev = t(s, dir, "lineitem").filter($"l_returnflag" === "R")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"))
    rev.join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"revenue", $"c_acctbal", $"n_name")
      .orderBy($"revenue".desc, $"c_custkey".asc)
      .limit(20)
  }

  val q133_oracle: String =
    """SELECT c_custkey, c_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
      |  c_acctbal, n_name
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // ------------------------------------- q136 TPC-H Q18 large-volume orders
  /** TPC-H Q18 (large-volume customer): orders whose total quantity exceeds
    * the threshold, reported with customer context — the HAVING-semi-join
    * shape (an aggregate filters which orders may enter the main join).
    * Quantities are integer-valued doubles, so the sums are exact and the
    * HAVING boundary has no float risk; ranks order on (o_totalprice desc,
    * o_orderkey) with the quantized-rank contract.
    *
    * Plan shape: the HAVING aggregate runs FIRST and produces a tiny key
    * set that semi-joins (broadcast) into lineitem before the wide join —
    * the aggregate-pushdown a naive 3-table join would miss.
    */
  val q136_tpch_q18: Q = (s, dir) => {
    import s.implicits._
    val big = t(s, dir, "lineitem").groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 330.0)
    val ord = t(s, dir, "orders")
      .join(broadcast(big), $"o_orderkey" === $"l_orderkey")
      .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
    ord.select($"c_custkey", $"c_name", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", round($"sum_qty", 4).as("sum_qty"))
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(20)
  }

  val q136_oracle: String =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      |  round(sum_qty, 4) AS sum_qty
      |FROM customer, orders,
      |  (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
      |   GROUP BY 1 HAVING sum(l_quantity) > 330) big
      |WHERE o_orderkey = big.l_orderkey AND c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  // ------------------------------------------------- q137 pivot matrix
  /** Pivoted event matrix: event counts by type x day-of-week — the
    * `DataFrame.pivot` surface (dynamic column generation from data values,
    * which plain GROUP BY can't express) with an explicit value list so the
    * schema is static and plannable. Integer counts only.
    */
  val q137_event_pivot: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_type", dayofweek($"ts").as("dow"))
      .groupBy($"event_type")
      .pivot("dow", 1 to 7)
      .agg(count(lit(1)))
      .select($"event_type" +: (1 to 7).map(d => coalesce(col(s"$d"), lit(0L))
        .as(s"dow_$d")): _*)
  }

  val q137_oracle: String = {
    val cols = (1 to 7).map(d =>
      s"sum(CASE WHEN dayofweek(ts) + 1 = $d THEN 1 ELSE 0 END)::BIGINT AS dow_$d")
      .mkString(",\n|  ")
    s"""SELECT event_type,
       |  $cols
       |FROM events GROUP BY event_type""".stripMargin
  }

  val entries: Map[String, Q] = Map(
    "q131_skew_audit" -> q131_skew_audit,
    "q136_tpch_q18" -> q136_tpch_q18,
    "q137_event_pivot" -> q137_event_pivot,
    "q132_tpch_q3" -> q132_tpch_q3,
    "q133_tpch_q10" -> q133_tpch_q10,
    "q01_pricing_summary" -> q01_pricing_summary,
    "q02_filter_project" -> q02_filter_project,
    "q03_global_agg" -> q03_global_agg,
    "q04_join_broadcast" -> q04_join_broadcast,
    "q05_join_multiway" -> q05_join_multiway,
    "q06_distinct" -> q06_distinct,
    "q07_sort_limit" -> q07_sort_limit,
    "q08_topn_per_key" -> q08_topn_per_key,
    "q09_minby_maxby" -> q09_minby_maxby,
    "q10_concat_sorted" -> q10_concat_sorted,
    "q11_union_merge" -> q11_union_merge,
    "q12_coaggregate" -> q12_coaggregate,
    "q13_count_distinct" -> q13_count_distinct,
    "q14_rollup" -> q14_rollup,
    "q15_except_intersect" -> q15_except_intersect,
    "q16_tomap_reduce" -> q16_tomap_reduce,
    "q18_semi_anti" -> q18_semi_anti,
    "q19_asof_join" -> q19_asof_join,
    "q63_kmv_sketch" -> q63_kmv_sketch,
    "q17_typed_topn" -> q17_typed_topn)

  val oracles: Map[String, String] = Map(
    "q131_skew_audit" -> q131_oracle,
    "q136_tpch_q18" -> q136_oracle,
    "q137_event_pivot" -> q137_oracle,
    "q132_tpch_q3" -> q132_oracle,
    "q133_tpch_q10" -> q133_oracle,
    "q01_pricing_summary" -> q01_oracle,
    "q02_filter_project" -> q02_oracle,
    "q03_global_agg" -> q03_oracle,
    "q04_join_broadcast" -> q04_oracle,
    "q05_join_multiway" -> q05_oracle,
    "q06_distinct" -> q06_oracle,
    "q07_sort_limit" -> q07_oracle,
    "q08_topn_per_key" -> q08_oracle,
    "q09_minby_maxby" -> q09_oracle,
    "q10_concat_sorted" -> q10_oracle,
    "q11_union_merge" -> q11_oracle,
    "q12_coaggregate" -> q12_oracle,
    "q13_count_distinct" -> q13_oracle,
    "q14_rollup" -> q14_oracle,
    "q15_except_intersect" -> q15_oracle,
    "q16_tomap_reduce" -> q16_oracle,
    "q18_semi_anti" -> q18_oracle,
    "q19_asof_join" -> q19_oracle,
    "q63_kmv_sketch" -> q63_oracle,
    "q17_typed_topn" -> q17_oracle)
}
