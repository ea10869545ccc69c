package graft.operators

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("merge: update wins over base on same key; unmatched rows survive") {
    val base = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      .toDF("k", "v", "ver")
    val upd = Seq((2L, "B2", 2L), (4L, "d", 2L)).toDF("k", "v", "ver")
    val out = Upsert.merge(base, upd, Seq("k"), "ver")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
  }

  test("merge: higher version in base beats stale update") {
    val base = Seq((1L, "newer", 5L)).toDF("k", "v", "ver")
    val upd = Seq((1L, "stale", 2L)).toDF("k", "v", "ver")
    val out = Upsert.merge(base, upd, Seq("k"), "ver").collect()
    assert(out.head.getString(1) == "newer")
  }

  test("merge: version tie goes to the update side") {
    val base = Seq((1L, "old", 1L)).toDF("k", "v", "ver")
    val upd = Seq((1L, "new", 1L)).toDF("k", "v", "ver")
    val out = Upsert.merge(base, upd, Seq("k"), "ver").collect()
    assert(out.head.getString(1) == "new")
  }

  test("mergeEvolving: new update column is null on surviving base rows") {
    val base = Seq((1L, "a", 1L)).toDF("k", "v", "ver")
    val upd = Seq((2L, "b", 2L, "extra")).toDF("k", "v", "ver", "note")
    val out = Upsert.mergeEvolving(base, upd, Seq("k"), "ver")
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).isNullAt(3) && out(1).getString(3) == "extra")
  }
}
