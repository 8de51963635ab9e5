package graft.sql

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.SparkTestBase
import graft.core.TxTable

/** SQL `CALL` surface of [[GraftCatalog]] ([[GraftProcedures]]): every
  * maintenance verb of the table format, driven through Spark 4's
  * `ProcedureCatalog` + `CALL` statement with named and positional
  * arguments. Each procedure must (a) route to the same one-commit
  * ACID verb the typed API exposes — asserted by re-reading through
  * [[TxTable]] — and (b) return its outcome as rows, so operators can
  * script against the result set without leaving SQL.
  */
class GraftProceduresSpec extends SparkTestBase {

  private lazy val base = tmpDir("graft-proc")
  private val cat = "graft_proc"

  private lazy val init: Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
  }

  private def sql(q: String) = { init; spark.sql(q) }

  private def mk(name: String, n: Int = 6): TxTable = {
    sql(s"CREATE TABLE $cat.$name (k BIGINT, v STRING)")
    (1 to n).foreach(i => sql(s"INSERT INTO $cat.$name VALUES ($i, 'r$i')"))
    new TxTable(spark, s"$base/$name")
  }

  test("CALL optimize: compacts many small files into few, one commit, named args") {
    val t = mk("opt")
    val before = t.detail()
    assert(before.numFiles == 6)
    val out = sql(
      s"CALL $cat.system.optimize(table => 'opt', target_bytes => ${128L << 20})")
      .collect()
    assert(out.length == 1)
    val Row(version: Long, fb: Long, fa: Long) = out.head
    assert(fb == 6 && fa == 1, s"expected 6 -> 1 files, got $fb -> $fa")
    assert(version == t.detail().version && version == before.version + 1,
      "optimize must be exactly one commit")
    assert(t.read().count() == 6, "compaction must not change data")
  }

  test("CALL optimize(where => ...): rewrites only the matching slice") {
    sql(s"CREATE TABLE $cat.optw (k BIGINT, v STRING) PARTITIONED BY (k)")
    (1 to 2).foreach { _ =>
      sql(s"INSERT INTO $cat.optw VALUES (1, 'a'), (2, 'b')")
    }
    val t = new TxTable(spark, s"$base/optw")
    assert(t.detail().numFiles == 4) // 2 inserts x 2 value-pure files
    sql(s"CALL $cat.system.optimize(table => 'optw', where => 'k = 1')")
    // k=1 files merged into one; the k=2 pair untouched
    assert(t.detail().numFiles == 3)
    assert(sql(s"SELECT count(*) AS n FROM $cat.optw WHERE k = 1")
      .collect().toSeq == Seq(Row(2L)))
  }

  test("CALL zorder: interleaved clustering, data preserved") {
    val t = mk("zo", n = 8)
    sql(s"CALL $cat.system.zorder(table => 'zo', cols => 'k', target_files => 2)")
    assert(t.detail().numFiles == 2)
    assert(t.read().count() == 8)
  }

  test("CALL vacuum: dry_run lists but keeps; real run deletes") {
    val t = mk("vac", n = 3)
    sql(s"CALL $cat.system.optimize(table => 'vac')") // orphans 3 files
    val dry = sql(
      s"CALL $cat.system.vacuum(table => 'vac', older_than_ms => 0, dry_run => true)")
      .collect().map(_.getString(0))
    assert(dry.length == 3, s"expected 3 reclaimable files, got ${dry.toSeq}")
    assert(dry.forall(p => fsExists(s"$base/vac", p)), "dry run must not delete")
    val real = sql(
      s"CALL $cat.system.vacuum(table => 'vac', older_than_ms => 0)")
      .collect().map(_.getString(0))
    assert(real.sorted.sameElements(dry.sorted), "dry run must predict the real run")
    assert(real.forall(p => !fsExists(s"$base/vac", p)))
    assert(t.read().count() == 3, "vacuum must only remove dead files")
  }

  private def fsExists(dir: String, rel: String): Boolean =
    new java.io.File(new java.io.File(dir), rel).exists()

  test("CALL restore + history + detail agree with the typed API") {
    val t = mk("meta", n = 3) // versions 0..3
    sql(s"CALL $cat.system.restore(table => 'meta', version => 2)")
    assert(t.read().count() == 2, "restore(2) leaves the first two rows")
    val hist = sql(s"CALL $cat.system.history(table => 'meta')").collect()
    assert(hist.length == t.history().length)
    assert(hist.map(_.getLong(0)).toSeq ==
      t.history().map(_.version), "same versions, same order")
    assert(hist.map(_.getString(2)).exists(_.toLowerCase.contains("restore")))
    val d = sql(s"CALL $cat.system.detail(table => 'meta')").collect().head
    val td = t.detail()
    assert(d.getLong(0) == td.version && d.getInt(1) == td.numFiles &&
      d.getInt(4) == td.numColumns)
  }

  test("CALL truncate_log + clone; namespaced tables resolve") {
    sql(s"CREATE NAMESPACE $cat.ns")
    sql(s"CREATE TABLE $cat.ns.t (k BIGINT)")
    sql(s"INSERT INTO $cat.ns.t VALUES (1)")
    sql(s"INSERT INTO $cat.ns.t VALUES (2)")
    val out = sql(
      s"CALL $cat.system.clone(source => 'ns.t', target => 'ns.t2')")
      .collect().head
    assert(out.getString(0) == "ns.t2")
    assert(sql(s"SELECT * FROM $cat.ns.t2").collect().toSet ==
      Set(Row(1L), Row(2L)))
    // clone is zero-copy until a rewrite; still fully independent
    sql(s"INSERT INTO $cat.ns.t2 VALUES (3)")
    assert(sql(s"SELECT count(*) AS n FROM $cat.ns.t").collect().toSeq ==
      Seq(Row(2L)))
    // truncate_log prunes below the newest CHECKPOINT (written every
    // 16 commits) — push ns.t2 past one, then prune
    val t2 = new TxTable(spark, s"$base/ns/t2")
    var next = 100
    while (t2.version < 16) { sql(s"INSERT INTO $cat.ns.t2 VALUES ($next)"); next += 1 }
    val cnt = t2.read().count()
    val trunc = sql(s"CALL $cat.system.truncate_log(table => 'ns.t2')")
      .collect().head.getLong(0)
    assert(t2.history().map(_.version).min == trunc && trunc == 16,
      "history must start at the checkpointed version")
    assert(t2.read().count() == cnt)
    intercept[Exception](t2.readAt(3)) // pre-checkpoint history is gone
  }

  test("CALL DDL verbs: constraint gates the next INSERT; generated + identity columns land") {
    mk("ddl", n = 1)
    val t = new TxTable(spark, s"$base/ddl")
    sql(s"CALL $cat.system.add_constraint(table => 'ddl', name => 'k_pos', expr => 'k > 0')")
    val e = intercept[Exception](sql(s"INSERT INTO $cat.ddl VALUES (-1, 'bad')"))
    assert(e.getMessage.contains("k_pos") ||
      Option(e.getCause).exists(_.getMessage.contains("k_pos")))
    assert(t.read().count() == 1, "violating INSERT must commit nothing")
    sql(s"CALL $cat.system.drop_constraint(table => 'ddl', name => 'k_pos')")
    sql(s"INSERT INTO $cat.ddl VALUES (-1, 'ok-now')")
    // declaring existing data invalid fails at DDL time, atomically
    intercept[Exception](sql(
      s"CALL $cat.system.add_constraint(table => 'ddl', name => 'k_pos2', expr => 'k > 0')")
      .collect())
    sql(s"CALL $cat.system.add_generated_column(table => 'ddl', name => 'k2', expr => 'k * 2')")
    sql(s"CALL $cat.system.add_identity_column(table => 'ddl', name => 'id', start => 100)")
    sql(s"INSERT INTO $cat.ddl (k, v) VALUES (7, 'gen')")
    val r = sql(s"SELECT k2, id FROM $cat.ddl WHERE k = 7").collect()
    assert(r.toSeq == Seq(Row(14L, 100L)),
      s"generated + identity must compute on the SQL INSERT, got ${r.toSeq}")
    // bloom index: declared, used (value-absent file prunes), dropped
    sql(s"CALL $cat.system.add_bloom_index(table => 'ddl', col => 'v', expected_items => 1000)")
    assert(t.read().where(col("v") === "gen").count() == 1)
    sql(s"CALL $cat.system.drop_bloom_index(table => 'ddl', col => 'v')")
  }

  test("SHOW PROCEDURES + bad calls fail loudly with the available set") {
    mk("err", n = 1)
    val shown = sql(s"SHOW PROCEDURES IN $cat.system")
    val nameCol = shown.columns.find(_.toLowerCase.contains("procedure"))
      .getOrElse(shown.columns.last)
    val listed = shown.select(nameCol).collect().map(_.getString(0)).toSet
    assert(listed == Set("optimize", "zorder", "vacuum", "restore",
      "history", "detail", "truncate_log", "clone",
      "add_constraint", "drop_constraint",
      "add_bloom_index", "drop_bloom_index",
      "add_generated_column", "add_identity_column"))
    val e1 = intercept[Exception](sql(s"CALL $cat.system.frobnicate(table => 'err')"))
    assert(e1.getMessage.contains("no such procedure") ||
      e1.getMessage.contains("frobnicate"))
    val e2 = intercept[Exception](
      sql(s"CALL $cat.system.detail(table => 'nope')").collect())
    assert(e2.getMessage.toLowerCase.contains("table"))
    // procedures live under system only
    intercept[Exception](sql(s"CALL $cat.other.detail(table => 'err')"))
  }
}
