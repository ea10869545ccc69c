package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PathsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("funnel counts users by ordered step reachability") {
    // u1 completes all three in order; u2 clicks BEFORE viewing (the
    // click must not count); u3 views only; u4 view->click, no purchase.
    val ev = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "click"), (2L, ts(2), "view"),
      (3L, ts(1), "view"),
      (4L, ts(1), "view"), (4L, ts(5), "click"))
      .toDF("user_id", "t", "event_type")
    val got = Paths.funnel(ev, "user_id", "t", "event_type",
      Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((0, "view", 4L), (1, "click", 2L),
      (2, "purchase", 1L)))
  }

  test("funnel matches steps at the earliest occurrence after the prior step") {
    // view@1, purchase@2, click@3, purchase@4: the greedy chain reaches
    // purchase via click@3 -> purchase@4.
    val ev = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "purchase"),
      (1L, ts(3), "click"), (1L, ts(4), "purchase"))
      .toDF("user_id", "t", "event_type")
    val got = Paths.funnel(ev, "user_id", "t", "event_type",
      Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect().map(_.getLong(2))
    assert(got.toSeq == Seq(1L, 1L, 1L))
  }

  test("transitions counts lagged pairs in total (ts, tie) order") {
    val ev = Seq(
      (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "click"),
      (1L, ts(2), 3L, "view"), // tie broken by event_id: click -> view
      (2L, ts(1), 4L, "view"), (2L, ts(2), 5L, "click"))
      .toDF("user_id", "t", "event_id", "event_type")
    val got = Paths.transitions(ev, "user_id", "t", "event_id", "event_type")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(got == Map(("view", "click") -> 2L, ("click", "view") -> 1L))
  }

  test("transitions is invariant to input partitioning") {
    val ev = (1 to 500).map(i =>
      ((i % 7).toLong, ts(i), i.toLong,
        Seq("view", "click", "purchase")(i % 3)))
      .toDF("user_id", "t", "event_id", "event_type")
    val a = Paths.transitions(ev, "user_id", "t", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val b = Paths.transitions(ev.repartition(13), "user_id", "t", "event_id",
      "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
