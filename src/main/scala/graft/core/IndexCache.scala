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

  /** Lazy holder: the map's computeIfAbsent only CREATES the cell
    * (cheap, never re-entrant); the build itself runs on first
    * `value` access, OUTSIDE the map update. A build that memoizes
    * another key (fixture chains do) would otherwise re-enter
    * computeIfAbsent mid-compute and hit ConcurrentHashMap's
    * "Recursive update" IllegalStateException whenever the two keys
    * shared a hash bin — a failure that came and went with the
    * applicationId inside the key.
    */
  private final class Cell(build0: () => AnyRef) {
    lazy val value: AnyRef = build0()
  }

  private val cache = new ConcurrentHashMap[String, Cell]()

  /** Build-once lookup. `build` may run Spark jobs and may memoize
    * OTHER keys; concurrent callers of the same key serialize on the
    * cell's lazy initializer.
    */
  def memo[T <: AnyRef](key: String)(build: => T): T =
    cache.computeIfAbsent(key, _ => new Cell(() => build)).value.asInstanceOf[T]

  /** Test hook: drop all cached artifacts. */
  private[graft] def clear(): Unit = cache.clear()
}
