package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantizes symmetrically with truncation toward zero") {
    val df = Seq((1L, Seq(0.5f, -1.25f, 1.0f))).toDF("id", "v")
    val r = Quantize.int8(df, "id", "v").collect().head
    val scale = r.getDouble(1)
    assert(scale == 127.0 / 1.25)
    assert(r.getSeq[Int](2) == Seq((0.5 * scale).toInt, -127, (1.0 * scale).toInt))
  }

  test("int8 null-guards the zero vector") {
    val df = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(2.0f, -1.0f)))
      .toDF("id", "v")
    val rows = Quantize.int8(df, "id", "v").orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(rows(1).getSeq[Int](2) == Seq(127, -63))
  }

  test("int8Error is bounded by 1/scale") {
    val df = Seq(
      (1L, Seq(0.37f, -0.91f, 0.44f, 0.08f)),
      (2L, Seq(1.5f, 2.5f, -3.5f, 0.1f)))
      .toDF("id", "v")
    val errs = Quantize.int8Error(df, "id", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scales = Quantize.int8(df, "id", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    errs.foreach { case (id, e) =>
      assert(e >= 0.0 && e <= 1.0 / scales(id) + 1e-12)
    }
  }
}
