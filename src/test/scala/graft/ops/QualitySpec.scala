package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._
  import Quality._

  private lazy val df = Seq(
    (1L, Some(10.0), "O", "ok-1"),
    (2L, Some(999.0), "X", "ok-2"), // range + set violations
    (3L, None, "O", "bad 3"), // null value + regex violation
    (3L, Some(20.0), "F", "ok-4") // duplicate id
  ).toDF("id", "v", "status", "tag")

  test("row-local rules count violations in one pass") {
    val got = Quality.check(df, Seq(
      NotNull("v"),
      InRange("v", 0.0, 100.0),
      InSet("status", Seq("O", "F")),
      MatchesRe("tag", "^ok-[0-9]+$")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      "not_null(v)" -> (1L, 4L),
      "in_range(v)" -> (1L, 4L),
      "in_set(status)" -> (1L, 4L),
      "matches(tag)" -> (1L, 4L)))
  }

  test("unique and referential rules") {
    val dim = Seq(1L, 3L).toDF("k")
    val got = Quality.check(df, Seq(
      Unique("id"),
      RefIntegrity("id", dim, "k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ids 1,2,3,3 → one duplicate; id 2 is an orphan
    assert(got == Map("unique(id)" -> 1L, "ref(id)" -> 1L))
  }

  test("empty batch reports zero violations, not null") {
    val empty = df.filter(col("id") < 0)
    val got = Quality.check(empty, Seq(NotNull("v"), InRange("v", 0, 1)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq.sortBy(_._1) == Seq(("in_range(v)", 0L, 0L),
      ("not_null(v)", 0L, 0L)))
  }

  test("null keys are excluded from unique and ref checks") {
    val d = Seq(Some(1L), None, None, Some(1L)).toDF("id")
    val dim = Seq(1L).toDF("k")
    val got = Quality.check(d, Seq(Unique("id"), RefIntegrity("id", dim, "k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("unique(id)" -> 1L, "ref(id)" -> 0L))
  }
}
