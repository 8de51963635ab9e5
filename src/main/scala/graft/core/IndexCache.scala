package graft.core

import java.util.concurrent.ConcurrentHashMap

/** Process-local memo for expensive, immutable index artifacts
  * (IVF centroids, PQ codebooks): a real ANN serving system trains an
  * index ONCE and answers many queries against it — retraining per
  * query would be like rebuilding a B-tree per SELECT. Spark has no
  * session-lifecycle hook for artifacts like these (they are plan
  * literals, not tables), so a keyed process cache is the idiomatic
  * stand-in for the "build once, persist, serve" index lifecycle.
  *
  * Keys must encode EVERY input that determines the artifact: the
  * data directory, the sampling rule, and all hyper-parameters.
  * The cache assumes a directory's contents are immutable for the
  * process lifetime (true for the testdata; a production deployment
  * would version the key by table snapshot id). Entries are tiny
  * (KBs of centroids), so no eviction is needed.
  */
object IndexCache {

  private val cache = new ConcurrentHashMap[String, AnyRef]()

  /** Build-once lookup. `build` may run Spark jobs; concurrent callers
    * of the same key serialize on the map entry (computeIfAbsent).
    */
  def memo[T <: AnyRef](key: String)(build: => T): T =
    cache.computeIfAbsent(key, _ => build).asInstanceOf[T]

  /** Test hook: drop all cached artifacts. */
  private[graft] def clear(): Unit = cache.clear()
}
