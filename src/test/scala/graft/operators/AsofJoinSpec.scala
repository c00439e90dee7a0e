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
}
