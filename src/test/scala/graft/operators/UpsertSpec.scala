package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  // (key, seq, value) log shared by the SCD-2 tests: key 1 changes
  // a→a→b→b→a (three intervals), key 2 never changes (one interval).
  private def scd2Log = Seq(
    (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "b"),
    (1L, 50L, "a"), (2L, 10L, "x"), (2L, 60L, "x"))

  test("historize collapses unchanged runs into validity intervals") {
    import spark.implicits._
    val out = Upsert.historize(scd2Log.toDF("k", "seq", "v"),
      Seq("k"), "seq", Seq("v"))
      .orderBy("k", "valid_from")
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, "a", 10L, 30L, false),
      (1L, "b", 30L, 50L, false),
      (1L, "a", 50L, -1L, true),
      (2L, "x", 10L, -1L, true)))
  }

  test("historize: null→value and value→null both cut a new interval") {
    import spark.implicits._
    val log = Seq((1L, 1L, Option("a")), (1L, 2L, None), (1L, 3L, None),
      (1L, 4L, Option("a"))).toDF("k", "seq", "v")
    val out = Upsert.historize(log, Seq("k"), "seq", Seq("v"))
      .orderBy("valid_from").select("valid_from").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, 2L, 4L))
  }

  test("scd2Merge extends, closes, and opens intervals incrementally") {
    import spark.implicits._
    val hist = Upsert.historize(scd2Log.toDF("k", "seq", "v"),
      Seq("k"), "seq", Seq("v"))
    // key 1: same value again (extends the open interval — no new row);
    // key 2: changed value (closes x, opens y); key 3: brand new
    val updates = Seq((1L, 70L, "a"), (2L, 70L, "y"), (3L, 70L, "z"))
      .toDF("k", "seq", "v")
    val merged = Upsert.scd2Merge(hist, updates, Seq("k"), "seq", Seq("v"))
    // full-rebuild equivalence: merging increments == historizing the
    // whole concatenated log
    val rebuilt = Upsert.historize(
      scd2Log.toDF("k", "seq", "v").unionByName(updates),
      Seq("k"), "seq", Seq("v"))
    val key = Seq("k", "valid_from")
    assert(merged.orderBy(key.map(col): _*).collect().toSeq ==
      rebuilt.select(merged.columns.map(col): _*)
        .orderBy(key.map(col): _*).collect().toSeq)
    val open = merged.filter(col("is_current")).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(open.toSeq == Seq((1L, "a"), (2L, "y"), (3L, "z")))
  }

  test("applyChanges: highest-seq op decides; deletes remove the key") {
    import spark.implicits._
    val changes = Seq(
      (1L, 1L, "I", "a"), (1L, 2L, "U", "b"),          // ends as b
      (2L, 1L, "I", "x"), (2L, 2L, "D", "x"),          // deleted
      (3L, 1L, "D", "-"), (3L, 2L, "I", "y")           // delete superseded
    ).toDF("k", "seq", "op", "v")
    val out = Upsert.applyChanges(changes, Seq("k"), "seq", "op")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(3)))
    assert(out.toSeq == Seq((1L, "b"), (3L, "y")))
  }

  test("applyChangesTo: base rows lose to any change, survive untouched keys") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq((1L, 5L, "U", "A"), (2L, 5L, "D", "b"), (4L, 5L, "I", "d"))
      .toDF("k", "seq", "op", "v")
    val out = Upsert.applyChangesTo(base, changes, Seq("k"), "seq", "op")
      .orderBy("k").select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "A"), (3L, "c"), (4L, "d")))
  }
}
