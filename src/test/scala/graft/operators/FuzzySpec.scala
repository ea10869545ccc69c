package graft.operators

import graft.SparkSpec

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    "red widget", "red widgett", "red widget", // dup + typo
    "blue bolt", "blue bolts", "green gear").toDF("name")

  test("nearMatches pairs typo variants, not unrelated values") {
    val pairs = Fuzzy.nearMatches(df, "name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(pairs.contains(("red widget", "red widgett", 1)))
    assert(pairs.contains(("blue bolt", "blue bolts", 1)))
    assert(!pairs.exists { case (a, b, _) => a.contains("green") || b.contains("green") })
  }

  test("canonicalize maps every variant to the smallest in-distance value") {
    val canon = Fuzzy.canonicalize(df, "name", maxDist = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(canon("red widgett") == "red widget")
    assert(canon("blue bolts") == "blue bolt")
    assert(canon("green gear") == "green gear") // no neighbor: itself
  }
}
