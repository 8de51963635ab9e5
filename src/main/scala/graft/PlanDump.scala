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
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("plandump", 8)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val (sh, bc) = counts(df.queryExecution.executedPlan)
        println(s"[plan] $name shuffles=$sh broadcasts=$bc")
      } catch { case e: Throwable => println(s"[plan] $name ERROR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
