package graft
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
object PlanDump {
  def counts(p: SparkPlan): (Int, Int) = {
    var sh = 0; var bc = 0
    def walk(n: SparkPlan): Unit = {
      n match {
        case a: AdaptiveSparkPlanExec => walk(a.initialPlan)
        case _: ShuffleExchangeExec => sh += 1
        case _: BroadcastExchangeExec => bc += 1
        case _ =>
      }
      n.children.foreach(walk)
      n.subqueries.foreach(walk)
    }
    walk(p)
    (sh, bc)
  }
  /** Dumps per-query exchange counts, then the PLANS.md footprint
    * block (`[plan-md]`-prefixed): the intro line CARRIES the table's
    * row count, so the two can never drift — regeneration is `strip
    * the prefix, paste the block` (args: sfDir [roundLabel]).
    */
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("plandump", 8)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val round = args.lift(1).getOrElse("?")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val (sh, bc) = counts(df.queryExecution.executedPlan)
        println(s"[plan] $name shuffles=$sh broadcasts=$bc")
        Some((name, sh, bc))
      } catch {
        case e: Throwable =>
          println(s"[plan] $name ERROR ${e.getClass.getSimpleName}")
          None
      }
    }
    val ok = rows.flatten
    println(s"[plan-md] Regenerated in round $round at head (${ok.size} queries, " +
      s"${rows.size - ok.size} errors; counts from PlanDump at $dir, AQE initial plans).")
    println("[plan-md] ")
    println("[plan-md] | query | shuffle exchanges | broadcast exchanges |")
    println("[plan-md] |---|---|---|")
    ok.foreach { case (n, sh, bc) => println(s"[plan-md] | $n | $sh | $bc |") }
    spark.stop()
  }
}
