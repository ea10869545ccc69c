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

  test("histogram: clamped edges, zero-filled bins, nulls excluded") {
    val df = Seq[Option[Double]](
      Some(-5.0),         // below lo → bin 0
      Some(0.0), Some(9.9), // bin 0
      Some(25.0),         // bin 2
      Some(100.0), Some(250.0), // at/above hi → bin 9
      None                // excluded
    ).toDF("v")
    val out = Profile.histogram(df, "v", 0.0, 100.0, 10)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(out.length == 10) // every bin present
    assert(out.map(_._4).sum == 6L) // total over non-null rows
    assert(out(0) == ((0L, 0.0, 10.0, 3L)))
    assert(out(2) == ((2L, 20.0, 30.0, 1L)))
    assert(out(1)._4 == 0L) // zero-filled
    assert(out(9) == ((9L, 90.0, 100.0, 2L)))
  }
}
