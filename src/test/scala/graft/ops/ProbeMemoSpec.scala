package graft.ops

import graft.SparkSpec

/** ProbeMemo (round 20): process-level reuse of guard-probe results
  * keyed by (analyzed plan, knobs) with `sameResult` matching.
  */
class ProbeMemoSpec extends SparkSpec {
  import spark.implicits._

  test("same plan + knobs is served from the memo; different knobs/data are not") {
    ProbeMemo.invalidate()
    var computes = 0
    def frame = Seq((1L, 10L), (2L, 20L)).toDF("id", "fp")
    def run(knobs: String, f: org.apache.spark.sql.DataFrame = frame): Seq[Long] =
      ProbeMemo.cached(f, knobs) { computes += 1; Seq(42L) }
    assert(run("k1") == Seq(42L) && computes == 1)
    // a structurally-identical but separately-constructed frame must HIT
    // (sameResult over canonicalized plans, not reference identity)
    assert(run("k1") == Seq(42L) && computes == 1, "second call must be memo-served")
    assert(run("k2") == Seq(42L) && computes == 2, "different knobs recompute")
    val other = Seq((1L, 10L), (3L, 30L)).toDF("id", "fp")
    assert(run("k1", other) == Seq(42L) && computes == 3,
      "different literal data is a different plan")
    ProbeMemo.invalidate()
    assert(run("k1") == Seq(42L) && computes == 4, "invalidate forces recompute")
  }

  test("RDD-backed plans are computed but never stored") {
    ProbeMemo.invalidate()
    var computes = 0
    val rddDf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L, 10L))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("fp",
          org.apache.spark.sql.types.LongType))))
    def run(): Unit = {
      ProbeMemo.cached(rddDf, "k") { computes += 1; Seq(1L) }: Unit
    }
    run(); run()
    assert(computes == 2,
      "an RDD-backed plan must not be memoized (per-batch lineage retention)")
  }

  test("simhashPairs probe is memo-served across invocations with identical planted truth") {
    ProbeMemo.invalidate()
    Caches.release()
    // planted: 300 copies of one fp (over maxIdentity 256) + distinct tail
    val rows = (0L until 300L).map(i => (i, 0x1234L)) ++
      Seq((1000L, 0x0FF00FF00FF00FF0L), (1001L, 0x0FF00FF00FF00FF1L))
    val fp = rows.toDF("id", "fp")
    val first = graft.operators.Dedup.simhashPairs(fp, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val hits0 = ProbeMemo.hits.get()
    // a fresh, structurally-identical frame: probe must be memo-served
    // and the pair output identical
    val again = graft.operators.Dedup.simhashPairs(
        rows.toDF("id", "fp"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(ProbeMemo.hits.get() > hits0, "second probe must be a memo hit")
    assert(first.sameElements(again), "memo-served guards must not change pairs")
    Caches.release()
    ProbeMemo.invalidate()
  }
}
