package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("gapFill materializes empty buckets with zero counts") {
    val ev = Seq(
      ("a", ts(0, 10), 1.0), ("a", ts(0, 50), 3.0), ("a", ts(3, 5), 2.0),
      ("b", ts(1, 0), 5.0))
      .toDF("k", "t", "v")
    val got = TimeSeries.gapFill(ev, "k", "t", "v", "hour")
      .orderBy("k", "bkt").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("a", "2024-01-01 00:00:00.0", 2L, 1.0),
      ("a", "2024-01-01 01:00:00.0", 0L, null), // gap
      ("a", "2024-01-01 02:00:00.0", 0L, null), // gap
      ("a", "2024-01-01 03:00:00.0", 1L, 2.0),
      ("b", "2024-01-01 01:00:00.0", 1L, 5.0)))
  }

  test("gapFill keeps null-key groups (null-safe stats join)") {
    val ev = Seq((Some("a"), ts(0), 1.0), (None, ts(1), 7.0),
      (None, ts(3), 9.0)).toDF("k", "t", "v")
    val nullRows = TimeSeries.gapFill(ev, "k", "t", "v", "hour")
      .filter(col("k").isNull).orderBy("bkt").collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3)))
    // span 1h..3h: events at 1 and 3, gap at 2 — counts must be real,
    // not zero-filled away by a null-blind equi-join
    assert(nullRows.toSeq == Seq((1L, 7.0), (0L, null), (1L, 9.0)))
  }

  test("gapFill spans are per key, not global") {
    val ev = Seq(("a", ts(0), 1.0), ("a", ts(9), 1.0), ("b", ts(5), 1.0))
      .toDF("k", "t", "v")
    val counts = TimeSeries.gapFill(ev, "k", "t", "v", "hour")
      .groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 10L, "b" -> 1L))
  }

  test("rolling computes trailing-window stats with exact cent sums") {
    val ev = Seq(
      (1L, ts(1), 1L, 1.10), (1L, ts(2), 2L, 2.25), (1L, ts(3), 3L, 0.50),
      (2L, ts(1), 4L, 9.99))
      .toDF("user_id", "t", "event_id", "v")
    val got = TimeSeries.rolling(ev, "user_id", "t", "event_id", "v", 2)
      .orderBy("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getDouble(5),
        r.getDouble(6), r.getLong(7)))
    assert(got.toSeq == Seq(
      (1L, 1L, 1.10, 1.10, 110L),
      (1L, 2L, 1.10, 2.25, 335L), // 110 + 225 cents, exact
      (1L, 2L, 0.50, 2.25, 275L), // window slides (2 rows): 225 + 50
      (2L, 1L, 9.99, 9.99, 999L))) // floor((double)9.99*100)=999: the
    // binary double rounds up; every engine floors the same product
  }
}
