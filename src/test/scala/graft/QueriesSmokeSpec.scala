package graft

/** Smoke: every registered gate query runs at sf0.001 and (where it
  * should) returns rows; entry() works. The full value check is the
  * DuckDB oracle gate (scripts/check_oracle.py) — this spec guards
  * against plan-breakage at the cheapest scale.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // q08 (inactive customers) is legitimately empty at some SFs.
  private val mayBeEmpty = Set("q08_inactive_customers", "q10_rich_not_big_spenders",
    "q30_minhash_near_dups", "q31_simhash_near_dups", "q32_ngram_jaccard")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf()).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle sql without query: $orphans")
  }
}
