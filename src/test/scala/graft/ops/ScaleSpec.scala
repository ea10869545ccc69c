package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("robust centers on the median and divides by IQR") {
    // group a: values 0..4 → med 2, q1 1, q3 3, iqr 2
    val df = (0 to 4).map(i => ("a", i.toDouble)).toDF("g", "v")
    val got = Scale.robust(df, "v", Seq("g")).orderBy("v")
      .collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(-1.0, -0.5, 0.0, 0.5, 1.0))
  }

  test("minMax maps to [0,1] and a constant group yields null") {
    val df = Seq(("a", 10.0), ("a", 30.0), ("a", 20.0),
      ("c", 5.0), ("c", 5.0)).toDF("g", "v")
    val rows = Scale.minMax(df, "v", Seq("g")).collect()
      .map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(rows.filter(_._1 == "a").map(_._3).toSet == Set(0.0, 0.5, 1.0))
    assert(rows.filter(_._1 == "c").forall(_._3 == null))
  }

  test("robust approx path agrees with exact on well-separated data") {
    val df = (0 to 100).map(i => ("a", i.toDouble)).toDF("g", "v")
    val exact = Scale.robust(df, "v", Seq("g")).orderBy("v")
      .collect().map(_.getDouble(2)).toSeq
    val approx = Scale.robust(df, "v", Seq("g"), approx = true).orderBy("v")
      .collect().map(_.getDouble(2)).toSeq
    assert(exact == approx) // 101 distinct values, sketch is exact here
  }

  test("robust zero-IQR group yields null, rows preserved") {
    val df = Seq(("z", 7.0), ("z", 7.0), ("z", 7.0)).toDF("g", "v")
    val out = Scale.robust(df, "v", Seq("g")).collect()
    assert(out.length == 3 && out.forall(_.isNullAt(2)))
  }
}
