package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImputeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
    ("b", Some(10.0)), ("b", None),
    ("c", None)) // all-null group
    .toDF("g", "v")

  test("median imputation fills from the group's non-null median") {
    val got = Impute.byGroup(df, "v", Seq("g")).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.count(_._1 == "a") == 3)
    assert(got.filter(t => t._1 == "a" && t._2.isDefined)
      .map(_._2.get).sorted.toSeq == Seq(1.0, 2.0, 3.0)) // null → median 2
    assert(got.filter(_._1 == "b").map(_._2).toSet == Set(Some(10.0)))
    // imputation never invents data: all-null group stays null
    assert(got.filter(_._1 == "c").forall(_._2.isEmpty))
  }

  test("constant strategy needs no aggregation, no groups, fills everywhere") {
    val got = Impute.byGroup(df, "v", Seq(), Impute.Constant(-1.0))
      .filter(col("v").isNull).select("imputed")
      .collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(-1.0, -1.0, -1.0))
  }

  test("mean strategy fills from the group average") {
    val got = Impute.byGroup(df, "v", Seq("g"), Impute.Mean)
      .filter(col("g") === "a" && col("v").isNull)
      .collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(2.0)) // avg(1, 3)
  }

  test("null group keys impute from their own group") {
    val d = Seq((Some("a"), Some(1.0)), (None, Some(5.0)),
      (None, Some(7.0)), (None, None)).toDF("g", "v")
    val nullG = Impute.byGroup(d, "v", Seq("g"))
      .filter(col("g").isNull && col("v").isNull).collect()
    assert(nullG.length == 1 && nullG(0).getDouble(2) == 6.0)
  }

  test("exact median refuses past maxExactRows; mean/approx/opt-in are exempt") {
    val big = spark.range(5000).select(lit("g").as("g"),
      col("id").cast("double").as("v"))
    val e = intercept[IllegalArgumentException](
      Impute.byGroup(big, "v", Seq("g"), maxExactRows = 1000L).count())
    assert(e.getMessage.contains("approx = true"))
    assert(Impute.byGroup(big, "v", Seq("g"), approx = true,
      maxExactRows = 1000L).count() == 5000)
    assert(Impute.byGroup(big, "v", Seq("g"), strategy = Impute.Mean,
      maxExactRows = 1000L).count() == 5000)
    assert(Impute.byGroup(big, "v", Seq("g"), maxExactRows = 5000L).count() == 5000)
  }
}
