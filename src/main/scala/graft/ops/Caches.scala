package graft.ops

import org.apache.spark.sql.Dataset

/** Scoped ownership for operator-internal caches.
  *
  * Several operators persist small intermediates that multiple plan
  * branches of the RETURNED (lazy) frame consume — banded keys,
  * fingerprints, identity-guard projections. The frames stay in the
  * session's CacheManager until released; the old convention was
  * "caller runs `spark.catalog.clearCache()`", which in a long-lived
  * session also nukes the USER's own persisted frames. This registry
  * narrows the release: operators register what they cache via
  * [[owned]], and [[release]] unpersists exactly those — nothing the
  * user persisted themselves.
  *
  * The registry holds STRONG references — it IS the owner (the
  * returned lazy plan references the cached DATA via the CacheManager,
  * not the Dataset handle, so a weak registry would lose the handle
  * before release could unpersist it). Each entry is one small Dataset
  * wrapper; the cached blocks themselves live in the CacheManager until
  * unpersist/clearCache exactly as before. `Bench` keeps using
  * `clearCache()` between reps, which subsumes this (release() then
  * merely drops already-uncached handles).
  */
object Caches {

  private val registry =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Cache `ds` and register it as operator-owned. Returns the same
    * (now cached) handle — call sites read `Caches.owned(frame)` where
    * they previously read `frame.cache()`.
    */
  def owned[T](ds: Dataset[T]): Dataset[T] = {
    ds.cache()
    registry.add(ds)
    ds
  }

  /** Unpersist every operator-owned cached frame registered since the
    * last release (non-blocking). User persists are untouched. Safe to
    * call between pipeline runs in a long-lived session; results
    * already materialized are unaffected (released plans simply
    * re-derive if re-run).
    *
    * Each unpersist is individually guarded: a handle whose session has
    * since stopped (multi-session test runs) must not abort the drain
    * and leak the entries behind it. The registry is process-global, so
    * concurrent pipelines share it — a release() here can drop another
    * in-flight pipeline's operator caches (correctness holds, the plan
    * re-derives; only the cache hit is lost). Callers needing isolation
    * release at pipeline boundaries only.
    */
  def release(): Unit = {
    var ds = registry.poll()
    while (ds != null) {
      try ds.unpersist(false) catch { case _: Exception => }
      ds = registry.poll()
    }
  }

  /** Number of currently-registered operator-owned frames.
    * Test/diagnostic hook.
    */
  def ownedCount: Int = registry.size()
}
