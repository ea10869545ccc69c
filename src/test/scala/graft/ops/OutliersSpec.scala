package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("mad flags robust outliers and survives a 50% outlier rate") {
    // group g: nine values near 10, one far point. IQR fences with
    // k=1.5 would also catch it; the interesting case is below.
    val df = (Seq.fill(4)(9.0) ++ Seq.fill(5)(10.0) ++ Seq(1000.0))
      .map(("g", _)).toDF("grp", "v")
    val out = Outliers.mad(df, "v", Seq("grp"), k = 3.0).collect()
    assert(out.count(_.getAs[Boolean]("is_outlier")) == 1)
    assert(out.find(_.getAs[Boolean]("is_outlier")).get.getDouble(1) == 1000.0)
  }

  test("mad zero-MAD group flags any deviation without dividing") {
    val df = (Seq.fill(9)(5.0) :+ 5.1).map(("g", _)).toDF("grp", "v")
    val out = Outliers.mad(df, "v", Seq("grp")).collect()
    // median 5, MAD 0 → the 5.1 row deviates and flags; no NaN/Inf
    assert(out.count(_.getAs[Boolean]("is_outlier")) == 1)
  }

  test("winsorize clamps to the fences and preserves rows and nulls") {
    val df = (Seq.fill(20)(10.0).map(Option(_)) ++
      Seq(Some(1000.0), Some(-500.0), None))
      .map(("g", _)).toDF("grp", "v")
    val out = Outliers.winsorize(df, "v", Seq("grp")).collect()
    assert(out.length == 23) // row-preserving, null rows included
    val w = out.filter(!_.isNullAt(1)).map(_.getDouble(2))
    // all-10 quartiles → fences collapse to [10,10]: extremes clamp
    assert(w.forall(_ == 10.0))
    assert(out.count(_.isNullAt(1)) == 1) // null value stays null
    assert(out.filter(_.isNullAt(1)).forall(_.isNullAt(2)))
  }

  test("mad keeps null-group rows, flagging against their own group (null-safe joins)") {
    val df = (Seq.fill(9)(10.0).map((Some("g"), _)) ++ Seq((Some("g"), 1000.0)) ++
      Seq.fill(9)(20.0).map((None: Option[String], _)) ++ Seq((None: Option[String], 2000.0)))
      .toDF("grp", "v")
    val out = Outliers.mad(df, "v", Seq("grp"), k = 3.0).collect()
    assert(out.length == 20) // row-preserving: null-group rows kept
    val nullGrp = out.filter(_.isNullAt(0))
    assert(nullGrp.length == 10)
    // the null group's own median (20) drives its flag, not group g's
    assert(nullGrp.count(_.getAs[Boolean]("is_outlier")) == 1)
    assert(nullGrp.find(_.getAs[Boolean]("is_outlier")).get.getDouble(1) == 2000.0)
  }

  test("exact percentile path refuses inputs past maxExactRows; approx and opt-in pass") {
    val big = spark.range(5000).select(lit("g").as("grp"),
      col("id").cast("double").as("v"))
    for ((name, run) <- Seq[(String, () => Unit)](
      ("iqr", () => Outliers.iqr(big, "v", Seq("grp"), maxExactRows = 1000L).count()),
      ("winsorize", () => Outliers.winsorize(big, "v", Seq("grp"), maxExactRows = 1000L).count()),
      ("mad", () => Outliers.mad(big, "v", Seq("grp"), maxExactRows = 1000L).count()))) {
      val e = intercept[IllegalArgumentException](run())
      assert(e.getMessage.contains("approx = true"), name)
    }
    // approx path is exempt from the guard; explicit opt-in raises the cap
    assert(Outliers.iqr(big, "v", Seq("grp"), approx = true,
      maxExactRows = 1000L).count() == 5000)
    assert(Outliers.iqr(big, "v", Seq("grp"), maxExactRows = 5000L).count() == 5000)
  }

  test("mad approx path produces the same flags on well-separated data") {
    val df = ((1 to 99).map(_.toDouble) :+ 10000.0).map(("g", _))
      .toDF("grp", "v")
    val exact = Outliers.mad(df, "v", Seq("grp")).orderBy("v")
      .collect().map(_.getAs[Boolean]("is_outlier")).toSeq
    val approx = Outliers.mad(df, "v", Seq("grp"), approx = true)
      .orderBy("v").collect().map(_.getAs[Boolean]("is_outlier")).toSeq
    assert(exact == approx)
  }
}
