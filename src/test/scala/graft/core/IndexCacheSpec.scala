package graft.core

import org.scalatest.funsuite.AnyFunSuite

class IndexCacheSpec extends AnyFunSuite {

  test("nested memoization never hits ConcurrentHashMap's recursive-update wall") {
    // pre-fix, an outer build memoizing another key threw
    // IllegalStateException("Recursive update") whenever the two keys
    // landed in the same hash bin — enough key pairs makes a shared
    // bin near-certain
    var built = 0
    (1 to 300).foreach { i =>
      val v = IndexCache.memo(s"ics-outer-$i") {
        IndexCache.memo(s"ics-inner-$i") { built += 1; s"inner-$i" } + "!"
      }
      assert(v == s"inner-$i!")
    }
    assert(built == 300)
    // still build-once: a second lookup re-runs nothing
    val again = IndexCache.memo[String]("ics-outer-1")(fail("must not rebuild"))
    assert(again == "inner-1!")
  }

  test("concurrent same-key callers build once") {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 16).map { _ =>
      new Thread(() => results.add(
        IndexCache.memo("ics-concurrent") { n.incrementAndGet(); "v" }))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(results.asScala.forall(_ == "v") && results.size == 16 && n.get() == 1)
  }
}
