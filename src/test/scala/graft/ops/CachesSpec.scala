package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scoped operator-cache ownership: Caches.release() drops exactly the
  * operator-owned frames and never a user persist.
  */
class CachesSpec extends SparkSpec {
  import spark.implicits._

  test("release() unpersists owned frames but leaves user persists cached") {
    val user = spark.range(10).toDF("id").persist(StorageLevel.MEMORY_ONLY)
    user.count()

    val owned = Caches.owned(spark.range(5).toDF("x"))
    owned.count()
    assert(owned.storageLevel.useMemory, "owned frame should be cached")
    assert(Caches.ownedCount >= 1)

    Caches.release()
    assert(owned.storageLevel == StorageLevel.NONE,
      "owned frame should be released")
    assert(user.storageLevel.useMemory,
      "user persist must survive Caches.release()")
    assert(Caches.ownedCount == 0)
    user.unpersist()
  }

  test("operator-internal caches register and release end-to-end") {
    Caches.release() // start clean
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different text with nothing shared at all here"))
      .toDF("id", "text")
    val pairs = graft.operators.Dedup.simhashNearDups(docs, "text", "id")
    assert(pairs.count() >= 1)
    assert(Caches.ownedCount >= 1,
      "simhashNearDups should register its fingerprint cache")
    Caches.release()
    assert(Caches.ownedCount == 0)
    // results remain correct after release (plan re-derives if re-run)
    assert(pairs.count() >= 1)
  }

  test("scoped blocks release their own registrations and ONLY those") {
    Caches.release() // start clean
    // a concurrently-registered frame OUTSIDE the scope: the old
    // process-global release() in the streaming handlers would drop
    // it between registration and consumption — the scope must not
    val outside = Caches.owned(spark.range(7).toDF("y"))
    outside.count()
    var inside: org.apache.spark.sql.DataFrame = null
    Caches.scoped {
      inside = Caches.owned(spark.range(5).toDF("x"))
      inside.count()
      assert(inside.storageLevel.useMemory, "cached inside the scope")
      // scope-local: the global registry never sees it
      assert(Caches.ownedCount == 1)
    }
    assert(inside.storageLevel == StorageLevel.NONE,
      "scope exit unpersists its registrations")
    assert(outside.storageLevel.useMemory,
      "a frame registered outside the scope survives the scope exit")
    assert(Caches.ownedCount == 1)
    Caches.release()
    assert(Caches.ownedCount == 0)
  }

  test("nested scopes release innermost-first without touching the outer scope") {
    Caches.release()
    var outer: org.apache.spark.sql.DataFrame = null
    Caches.scoped {
      outer = Caches.owned(spark.range(4).toDF("a"))
      outer.count()
      Caches.scoped {
        val innerDf = Caches.owned(spark.range(3).toDF("b"))
        innerDf.count()
        assert(innerDf.storageLevel.useMemory)
      }
      assert(outer.storageLevel.useMemory,
        "inner scope exit must not release the outer scope's frame")
    }
    assert(outer.storageLevel == StorageLevel.NONE)
    assert(Caches.ownedCount == 0)
  }

  test("leak backstop: escaped global registrations drain at outermost scope exit") {
    Caches.release()
    // registrations that ESCAPE the scope (another thread — the leak
    // mode the backstop exists for): pile up past LeakBound, then one
    // scoped block's exit must drain them
    val t = new Thread(() => {
      (0 to Caches.LeakBound).foreach { i =>
        Caches.owned(spark.range(i + 1).toDF("a"))
      }
    })
    t.start(); t.join()
    assert(Caches.ownedCount > Caches.LeakBound)
    Caches.scoped { spark.range(1).count() }
    assert(Caches.ownedCount == 0,
      "outermost scope exit past LeakBound must drain the global registry")
    // under the bound, scope exits leave global registrations alone
    val kept = Caches.owned(spark.range(2).toDF("a"))
    kept.count()
    Caches.scoped { spark.range(1).count() }
    assert(Caches.ownedCount == 1 && kept.storageLevel.useMemory,
      "a healthy global registration must survive scope exits")
    Caches.release()
  }

  test("semDeDup identical-vector drop still holds after release") {
    Caches.release()
    val v1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val v2 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val df = Seq((1L, v1), (2L, v1), (3L, v2))
      .toDF("id", "vec")
    val out = graft.operators.Similarity
      .semDeDup(df, "vec", "id", nClusters = 2, dim = 4, eps = 0.01)
      .orderBy("id").collect()
    assert(out.map(_.getBoolean(2)).toSeq == Seq(true, false, true))
    assert(Caches.ownedCount >= 1, "semDeDup should register its caches")
    Caches.release()
    assert(Caches.ownedCount == 0)
  }
}
