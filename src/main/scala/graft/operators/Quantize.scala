package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Scalar int8 quantization for embedding columns — the standard 4×
  * shrink applied before ANN index build / shipping vectors to a
  * training job. Per-vector symmetric scheme: scale = 127 / max|v|,
  * q_i = trunc(v_i * scale) ∈ [-127, 127].
  *
  * Numeric contract (what makes the DuckDB oracle hash-match): every
  * float element is cast to DOUBLE before any arithmetic; the scale is a
  * single IEEE divide; quantized values use TRUNCATION toward zero (both
  * engines' explicit `trunc`), never round-half — rounding ties are the
  * one place engines disagree. Stateless per row: no shuffle, fully
  * codegen'd `transform`, linear scan at any scale.
  */
object Quantize {

  /** Adds `scale` (double) and `qvec` (array<int>, values in [-127,127])
    * next to `idCol`. Zero vectors get a null scale and null qvec rather
    * than a divide-by-zero Inf.
    */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val vd = transform(col(vecCol), x => x.cast(DoubleType))
    val maxAbs = array_max(transform(vd, x => abs(x)))
    val scale = lit(127.0) / nullif(maxAbs, lit(0.0))
    df.select(
      col(idCol),
      scale.as("scale"),
      when(scale.isNotNull,
        transform(vd, x => (x * scale).cast(IntegerType))).as("qvec"))
  }

  /** Reconstruction max-abs-error of the int8 scheme per vector — the
    * quality probe a pipeline runs before committing to quantized
    * storage. err = max_i |v_i - q_i/scale|, bounded by 1/scale.
    */
  def int8Error(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = int8(df, idCol, vecCol)
      .withColumnRenamed("qvec", "_q").withColumnRenamed("scale", "_s")
    val vd = transform(col(vecCol), x => x.cast(DoubleType))
    df.join(q, Seq(idCol))
      .select(col(idCol),
        array_max(zip_with(vd, col("_q"),
          (v, qi) => abs(v - qi.cast(DoubleType) / col("_s")))).as("max_err"))
  }
}
