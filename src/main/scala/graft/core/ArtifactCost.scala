package graft.core

/** Process-local ledger of artifact-BUILD wall seconds (the mined
  * pair tables, trained LM counts — every [[IndexCache]] artifact
  * whose steady-state consumers would otherwise hide its one-time
  * build cost behind the bench's min-of-2 policy). Builders wrap the
  * eager build in [[timed]]; [[graft.Bench]] prints the snapshot as
  * its own `artifact_builds` metric line, so the cost is visible in
  * every capture instead of vanishing into the first consumer's
  * discarded run1 (round-12 verdict, "What's wrong" #1). Nothing here
  * persists across processes — the ledger only LABELS work the
  * process already did.
  */
object ArtifactCost {
  private val costs =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** Run `build`, crediting its wall time to `name` (summed if the
    * same artifact name builds more than once in a process).
    */
  def timed[T](name: String)(build: => T): T = {
    val t0 = System.nanoTime()
    val v = build
    costs.merge(name, Double.box((System.nanoTime() - t0) / 1e9),
      (a, b) => Double.box(a.doubleValue + b.doubleValue))
    v
  }

  /** Build seconds per artifact name recorded so far. */
  def snapshot: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    costs.asScala.map { case (k, v) => k -> v.doubleValue }.toMap
  }
}
