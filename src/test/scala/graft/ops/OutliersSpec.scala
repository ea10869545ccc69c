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
