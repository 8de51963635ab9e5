package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end proof of the cluster wiring: a session built WITH THE
  * EXTENSION CLASS a deployment names in `spark.sql.extensions`
  * (no registerAll call, no experimental.extraOptimizations) gets
  * both the SQL function surface and the range-bin optimizer rewrite.
  * `spark.sql.extensions` itself is a static conf — it only applies
  * when the SparkContext is created, so on the suite's shared context
  * the programmatic `withExtensions(new GraftExtensions)` path (the
  * same SparkSessionExtensions hook the conf drives) is the testable
  * equivalent.
  *
  * A second SparkSession is created on the EXISTING SparkContext
  * (clearing the active/default session first — a second context in
  * one JVM is not allowed); the shared test session is restored
  * afterwards so suite order doesn't matter.
  */
class ExtensionWiringSpec extends AnyFunSuite {

  private def withExtensionSession[A](f: SparkSession => A): A = {
    val prior = graft.core.Sessions.local("graft-test", 4) // ensure context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try f(s)
      finally s.conf.unset("spark.graft.rangeJoin.binWidth")
    } finally {
      SparkSession.setActiveSession(prior)
      SparkSession.setDefaultSession(prior)
    }
  }

  test("the extensions class registers the graft_* SQL functions") {
    withExtensionSession { s =>
      val cos = s.sql(
        "SELECT graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) c").head().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-9)
      val nFps = s.sql(
        "SELECT size(graft_winnow_fps(split('a b c d e f g', ' '), 3, 4)) n")
        .head().getInt(0)
      assert(nFps >= 1)
    }
  }

  test("the extensions class injects the range-bin rewrite, off until conf'd") {
    withExtensionSession { s =>
      import s.implicits._
      val pts = Seq(1.0, 7.0, 42.0).toDF("pt")
      val iv = Seq((0.0, 5.0), (5.0, 50.0)).toDF("lo", "hi")
      def q() = pts.join(iv, $"pt" >= $"lo" && $"pt" < $"hi")
      assert(!q().queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      s.conf.set("spark.graft.rangeJoin.binWidth", "5.0")
      assert(q().queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(q().count() == 3L)
    }
  }
}
