package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile reports per-column nulls and exact distincts") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None), (Some(2), Some("b")), (None, Some("a")))
      .toDF("x", "y")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(p("x") == ((1L, 2L))) // one null; distinct {1,2}
    assert(p("y") == ((1L, 2L))) // one null; distinct {a,b}
  }

  test("profile of a column subset only touches those columns") {
    val df = Seq((1, "a")).toDF("x", "y")
    val p = Profile.profile(df, Seq("y")).collect()
    assert(p.map(_.getString(0)).toSeq == Seq("y"))
  }
}
