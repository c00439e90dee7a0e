package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** AsofJoin / range join unit tests (the q19 gate query covers the fixture
  * path against DuckDB's native ASOF JOIN).
  */
class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100.0),
    ("A", ts("2024-01-01 10:00:05"), 101.0),
    ("B", ts("2024-01-01 10:00:03"), 50.0)
  ).toDF("sym", "qts", "price")

  private val trades = Seq(
    ("A", ts("2024-01-01 10:00:04"), 1L), // latest quote at/before: 100.0
    ("A", ts("2024-01-01 10:00:05"), 2L), // exact-ts match counts: 101.0
    ("B", ts("2024-01-01 10:00:01"), 3L), // before any quote
    ("C", ts("2024-01-01 10:00:09"), 4L)  // no quotes for key
  ).toDF("sym", "tts", "trade_id")

  test("backward as-of picks latest right row at or before; inner drops unmatched") {
    val out = AsofJoin(trades, quotes, "sym", "tts", "qts", Seq("price"))
      .select($"trade_id", $"price").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 100.0, 2L -> 101.0))
  }

  test("left as-of keeps unmatched rows with null") {
    val out = AsofJoin(trades, quotes, "sym", "tts", "qts", Seq("price"), how = "left")
      .select($"trade_id", $"price").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out === Map(1L -> Some(100.0), 2L -> Some(101.0), 3L -> None, 4L -> None))
  }

  test("range join matches within tolerance via bucketed equi-join") {
    val out = AsofJoin.range(trades, quotes, "sym", "tts", "qts", toleranceSec = 2)
      .select($"trade_id", $"price").collect().map(r => r.getLong(0) -> r.getDouble(1)).toSet
    // trade 1 @04: quotes @05 (|1s|) and @00 (|4s| -> out); trade 2 @05: @05 + none closer
    assert(out === Set(1L -> 101.0, 2L -> 101.0, 3L -> 50.0))
  }

  test("NULL keys and NULL right timestamps never match (join semantics)") {
    val l = Seq((Option("A"), ts("2024-01-01 10:00:04"), 1L),
      (Option.empty[String], ts("2024-01-01 10:00:04"), 2L)).toDF("sym", "tts", "trade_id")
    val r = Seq((Option("A"), Option(ts("2024-01-01 10:00:00")), 100.0),
      (Option.empty[String], Option(ts("2024-01-01 10:00:00")), 666.0), // null key
      (Option("A"), Option.empty[Timestamp], 999.0))                    // null ts
      .toDF("sym", "qts", "price")
    val out = AsofJoin(l, r, "sym", "tts", "qts", Seq("price"), how = "left")
      .collect().map(x => x.getLong(2) ->
        (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    // trade 1 matches the real quote; the null-key and null-ts quotes are
    // invisible; the null-key trade stays unmatched
    assert(out === Map(1L -> Some(100.0), 2L -> None))
  }

  test("ties on (ts) resolve deterministically across partitionings") {
    val r = Seq(("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:00:00"), 2.0)).toDF("sym", "qts", "price")
    val l = Seq(("A", ts("2024-01-01 10:00:05"), 1L)).toDF("sym", "tts", "trade_id")
    val picks = (1 to 4).map { p =>
      AsofJoin(l.repartition(p), r.repartition(5 - p), "sym", "tts", "qts", Seq("price"))
        .select($"price").collect().head.getDouble(0)
    }
    assert(picks.distinct.size === 1, s"nondeterministic tie pick: $picks")
  }

  test("range join renames clashing right columns with _r") {
    val l = Seq(("A", ts("2024-01-01 10:00:00"), 1L)).toDF("sym", "ts", "trade_id")
    val r = Seq(("A", ts("2024-01-01 10:00:01"), 9.0)).toDF("sym", "ts", "price")
    val out = AsofJoin.range(l, r, "sym", "ts", "ts", toleranceSec = 5)
    assert(out.columns.toSeq.sorted === Seq("price", "sym", "trade_id", "ts", "ts_r"))
    assert(out.count() === 1)
    intercept[IllegalArgumentException] {
      AsofJoin.range(l, r, "sym", "ts", "ts", toleranceSec = 0)
    }
  }
}
