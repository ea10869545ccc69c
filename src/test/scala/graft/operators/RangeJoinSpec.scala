package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val facts = Seq(
    (1L, 5.0), (2L, 15.0), (3L, 25.0), (4L, 99.0), (5L, 150.0))
    .toDF("fid", "v")

  private lazy val ranges = Seq(
    ("low", 0.0, 10.0), ("mid", 10.0, 100.0), ("high", 100.0, 1000.0),
    ("overlap", 20.0, 30.0)) // overlapping interval: row 3 matches twice
    .toDF("label", "lo", "hi")

  test("binned equals naive on all rows including overlaps and bin edges") {
    val naive = RangeJoin.naive(facts, ranges, "v", "lo", "hi")
      .select("fid", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val binned = RangeJoin.binned(facts, ranges, "v", "lo", "hi", binWidth = 7.0)
      .select("fid", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(binned == naive)
    assert(naive.contains((3L, "mid")) && naive.contains((3L, "overlap")))
    assert(naive.contains((5L, "high")))
  }

  test("half-open semantics: hi boundary excluded, lo included") {
    val f = Seq((1L, 10.0)).toDF("fid", "v")
    val out = RangeJoin.binned(f, ranges, "v", "lo", "hi", binWidth = 5.0)
      .select("label").collect().map(_.getString(0)).toSet
    assert(out == Set("mid")) // 10.0 excluded from [0,10), included in [10,100)
  }

  test("binned is an equi-join, not a nested loop") {
    val plan = RangeJoin.binned(facts, ranges, "v", "lo", "hi", binWidth = 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
