package graft.core

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL surface of the ACID table format: `graft_tx.<name>` relations
  * resolved by [[TxRelationRule]], with SQL time travel. Built on a
  * second session over the shared context (the
  * `ExtensionWiringSpec` pattern — `spark.sql.extensions` is a static
  * conf, so `withExtensions` is the testable equivalent).
  */
class TxSqlSpec extends AnyFunSuite {

  private def withExtensionSession[A](f: SparkSession => A): A = {
    val prior = Sessions.local("graft-test", 4)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.setActiveSession(prior)
      SparkSession.setDefaultSession(prior)
    }
  }

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag).toFile
    d.delete(); d.getAbsolutePath
  }

  test("graft_tx names resolve to the live snapshot; time travel via SQL") {
    withExtensionSession { s =>
      import s.implicits._
      val t = new TxTable(s, tmpDir("txsql"))
      t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")) // v0
      t.registerSql("letters")
      assert(s.sql("SELECT v FROM graft_tx.letters WHERE k = 2").head().getString(0) == "b")

      // mutation is visible to the NEXT query (per-query snapshot)
      t.delete($"k" === 3L) // v1
      assert(s.sql("SELECT count(*) AS n FROM graft_tx.letters").head().getLong(0) == 2L)

      // SQL time travel: the pre-delete snapshot by version...
      assert(s.sql(
        "SELECT count(*) AS n FROM graft_tx.letters VERSION AS OF 0").head().getLong(0) == 3L)
      // ...and by timestamp (far future = head; granularity-proof)
      assert(s.sql(
        "SELECT count(*) AS n FROM graft_tx.letters TIMESTAMP AS OF '2100-01-01'")
        .head().getLong(0) == 2L)

      // a self-join through the SQL name resolves both sides independently
      assert(s.sql(
        """SELECT count(*) AS n FROM graft_tx.letters a
          |JOIN graft_tx.letters b ON a.k = b.k""".stripMargin).head().getLong(0) == 2L)

      // case-insensitive namespace and name
      assert(s.sql("SELECT count(*) AS n FROM GRAFT_TX.Letters").head().getLong(0) == 2L)

      // filters reach the parquet scan through the SQL path
      val planStr = s.sql("SELECT v FROM graft_tx.letters WHERE k = 2")
        .queryExecution.executedPlan.toString
      assert(planStr.contains("PushedFilters") && planStr.contains("IsNotNull(k)"),
        planStr)
    }
  }

  test("unregistered names and bad versions fail with the registry's vocabulary") {
    withExtensionSession { s =>
      val e = intercept[Exception](s.sql("SELECT * FROM graft_tx.nope").collect())
      assert(e.getMessage.contains("no TxTable registered"), e.getMessage)
      import s.implicits._
      val t = new TxTable(s, tmpDir("txsql-bad"))
      t.append(Seq((1L, "a")).toDF("k", "v"))
      t.registerSql("badver")
      val e2 = intercept[Exception](
        s.sql("SELECT * FROM graft_tx.badver VERSION AS OF 99").collect())
      assert(e2.getMessage.contains("99"), e2.getMessage)
    }
  }

  test("INSERT INTO a graft_tx name is rejected before it can bypass the log") {
    withExtensionSession { s =>
      import s.implicits._
      val t = new TxTable(s, tmpDir("txsql-ins"))
      t.append(Seq((1L, "a")).toDF("k", "v"))
      t.registerSql("readonly_t")
      val e = intercept[Exception](
        s.sql("INSERT INTO graft_tx.readonly_t VALUES (2, 'b')"))
      assert(e.getMessage.contains("read-only"), e.getMessage)
      // nothing leaked into the table or its directory
      assert(t.read().count() == 1)
    }
  }
}
