package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100.0),
    ("A", ts("2024-01-01 10:05:00"), 101.0),
    ("A", ts("2024-01-01 10:10:00"), 99.0),
    ("B", ts("2024-01-01 10:02:00"), 50.0))
    .toDF("sym", "qts", "px")

  private lazy val trades = Seq(
    (1L, "A", ts("2024-01-01 10:03:00")), // -> 100.0 (10:00)
    (2L, "A", ts("2024-01-01 10:05:00")), // -> 101.0 (exact tie: <=)
    (3L, "A", ts("2024-01-01 10:30:00")), // -> 99.0  (10:10)
    (4L, "B", ts("2024-01-01 10:01:00")), // -> none (no quote yet)
    (5L, "C", ts("2024-01-01 10:00:00"))) // -> none (no key)
    .toDF("trade_id", "sym", "tts")

  test("asof join picks the latest right row at-or-before each left ts") {
    val out = AsOf.join(trades, quotes, "sym", "tts", "qts", Seq("px"))
      .orderBy("trade_id").collect()
    assert(out.map(r => Option(r.get(r.fieldIndex("px")))).toSeq ==
      Seq(Some(100.0), Some(101.0), Some(99.0), None, None))
    assert(out(0).getTimestamp(out(0).fieldIndex("asof_ts")) == ts("2024-01-01 10:00:00"))
  }

  test("tolerance nulls out stale matches") {
    val out = AsOf.join(trades, quotes, "sym", "tts", "qts", Seq("px"),
      tolerance = Some(expr("INTERVAL 10 MINUTES")))
      .orderBy("trade_id").collect()
    // trade 3 at 10:30 vs quote 10:10 -> 20min stale -> null
    assert(Option(out(2).get(out(2).fieldIndex("px"))).isEmpty)
    assert(Option(out(0).get(out(0).fieldIndex("px"))).contains(100.0))
  }

  test("all left rows survive (left-join semantics)") {
    val out = AsOf.join(trades, quotes, "sym", "tts", "qts", Seq("px"))
    assert(out.count() == 5)
    assert(out.columns.toSeq == Seq("trade_id", "sym", "tts", "asof_ts", "px"))
  }
}
