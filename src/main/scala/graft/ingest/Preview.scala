package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** EP1 — the reference's `POST /upload` preview pipeline
  * (reference backend/index.js:84-130): parse the file, return inferred
  * headers plus the first `n` data rows (default 10, index.js:96,102).
  *
  * `df.limit(n)` early-exits the scan exactly like the reference's
  * `rl.close()` after 11 lines (index.js:100-104): Spark's CollectLimit
  * stops consuming input once `n` rows are produced, so previewing a
  * 100 TB directory costs one partial split read, not a scan.
  */
object Preview {

  /** @param headers inferred column names
    * @param rows    the first n parsed rows (already collected)
    * @param df      the FULL parsed frame (not limited) — continue the
    *                ingest pipeline from here; the preview rows are in
    *                `rows`
    */
  final case class Result(headers: Seq[String], rows: Seq[Row], df: DataFrame)

  def preview(spark: SparkSession, path: String, n: Int = 10): Result = {
    val df = Readers.read(spark, path)
    Result(df.columns.toIndexedSeq, df.limit(n).collect().toIndexedSeq, df)
  }
}
