package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Conditional MERGE ([[TxTable.mergeConditional]] via
  * [[TxTable.mergeBuilder]]): clause semantics, first-match-wins
  * ordering, by-source clauses, rewrite-set minimality, CDF record,
  * rename/generated-column interplay.
  */
class MergeBuilderSpec extends SparkTestBase {

  import spark.implicits._

  private def table(): TxTable = new TxTable(spark, tmpDir("mergecond"))

  private def seed(t: TxTable): Unit =
    t.append(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "v", "amt").repartition(1))
  // seed plus a second file (ids 10-12)
  private def seed2(t: TxTable): Unit = {
    seed(t)
    t.append(Seq((10L, "x", 100.0), (11L, "y", 110.0), (12L, "z", 120.0))
      .toDF("id", "v", "amt").repartition(1))
  }

  private def rows(df: DataFrame): Seq[(Long, String, Double)] =
    df.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

  test("matched update/delete with conditions + conditional insert") {
    val t = table(); seed2(t)
    val src = Seq((1L, "A", 1.0, "U"), (2L, "B", 2.0, "D"),
      (50L, "n", 5.0, "U"), (51L, "n2", 6.0, "D"))
      .toDF("id", "v", "amt", "op")
    t.mergeBuilder(src, Seq("id"))
      .whenMatchedDelete("s.op = 'D'")
      .whenMatchedUpdate(Map("v" -> "s.v", "amt" -> "t.amt + s.amt"))
      .whenNotMatchedInsertAll("s.op <> 'D'")
      .run()
    // 1 updated (amt 10+1), 2 deleted, 3 kept, 10-12 kept, 50 inserted
    // (op column evolves in; read back only the original columns here)
    assert(rows(t.read().select("id", "v", "amt")) == Seq(
      (1L, "A", 11.0), (3L, "c", 30.0), (10L, "x", 100.0),
      (11L, "y", 110.0), (12L, "z", 120.0), (50L, "n", 5.0)))
    // the evolved op column: null for carried rows, source value for 50
    val ops = t.read().select("id", "op").orderBy("id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(ops(50L) == "U" && ops(3L) == null)
  }

  test("withSchemaEvolution: explicit clauses may target new source columns") {
    val t = table(); seed2(t)
    // `noise` is never referenced by a clause — it must not leak in
    val src = Seq((1L, "A", 1.0, "fresh", 9), (50L, "n", 5.0, "born", 9))
      .toDF("id", "v", "amt", "tag", "noise")
    // without the opt-in, an explicit new-column SET fails loudly and
    // points at the opt-in
    val e = intercept[IllegalArgumentException](
      t.mergeBuilder(src, Seq("id"))
        .whenMatchedUpdate(Map("tag" -> "s.tag")).run())
    assert(e.getMessage.contains("withSchemaEvolution"))
    assert(!t.read().columns.contains("tag"), "a rejected merge must not evolve")
    t.mergeBuilder(src, Seq("id"))
      .withSchemaEvolution()
      .whenMatchedUpdate(Map("v" -> "s.v", "tag" -> "s.tag"))
      .whenNotMatchedInsert(Map(
        "id" -> "s.id", "v" -> "s.v", "amt" -> "s.amt", "tag" -> "s.tag"))
      .run()
    val got = t.read().select("id", "v", "tag").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(got == Seq((1L, "A", "fresh"), (2L, "b", null), (3L, "c", null),
      (10L, "x", null), (11L, "y", null), (12L, "z", null),
      (50L, "n", "born")),
      s"new column set on matched, inserted on new, NULL everywhere else: $got")
    // a target in NEITHER side is still a typo, even with the opt-in
    val e2 = intercept[IllegalArgumentException](
      t.mergeBuilder(src, Seq("id")).withSchemaEvolution()
        .whenMatchedUpdate(Map("nope" -> "s.v")).run())
    assert(e2.getMessage.contains("nope"))
    // unreferenced source columns never leak in under explicit clauses
    assert(!t.read().columns.contains("noise"))
  }

  test("clause order is first-match-wins") {
    val t = table(); seed(t)
    val src = Seq((1L, "s1", 0.0), (2L, "s2", 0.0)).toDF("id", "v", "amt")
    t.mergeBuilder(src, Seq("id"))
      .whenMatchedUpdate(Map("v" -> "'first'"), "t.id = 1")
      .whenMatchedUpdate(Map("v" -> "'second'")) // unconditional, later
      .run()
    assert(rows(t.read()) == Seq(
      (1L, "first", 10.0), (2L, "second", 20.0), (3L, "c", 30.0)))
  }

  test("a NULL condition does not apply (WHERE semantics); unclaimed rows keep") {
    val t = table(); seed(t)
    val src = Seq((1L, null.asInstanceOf[String], 0.0)).toDF("id", "v", "amt")
    t.mergeBuilder(src, Seq("id"))
      // s.v is null → condition NULL → clause skipped, row kept
      .whenMatchedUpdate(Map("amt" -> "0.0"), "length(s.v) > 0")
      .run()
    assert(rows(t.read()) == Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("UPDATE SET *: common columns from source, target-only kept") {
    val t = table(); seed(t)
    val src = Seq((1L, "NEW")).toDF("id", "v") // no amt column
    t.mergeBuilder(src, Seq("id")).whenMatchedUpdateAll().run()
    assert(rows(t.read()) == Seq(
      (1L, "NEW", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("by-source update and delete touch only unmatched rows") {
    val t = table(); seed2(t)
    val src = Seq((1L, "keep", 0.0)).toDF("id", "v", "amt")
    t.mergeBuilder(src, Seq("id"))
      .whenNotMatchedBySourceDelete("t.id >= 11")
      .whenNotMatchedBySourceUpdate(Map("v" -> "concat(t.v, '!')"), "t.id >= 3")
      .run()
    // 1 matched (no matched clause → kept as-is), 2 kept, 3+10 marked,
    // 11/12 deleted
    assert(rows(t.read()) == Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c!", 30.0), (10L, "x!", 100.0)))
  }

  test("matched rows never insert, even with no matched clauses") {
    val t = table(); seed(t)
    val src = Seq((1L, "dup", 0.0), (60L, "new", 6.0)).toDF("id", "v", "amt")
    t.mergeBuilder(src, Seq("id")).whenNotMatchedInsertAll().run()
    assert(rows(t.read()) == Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (60L, "new", 6.0)))
    // and no file was rewritten: insert-only commits remove nothing
    assert(t.history().last.filesRemoved == 0)
  }

  test("only files holding a matching key are rewritten") {
    val t = table(); seed2(t)
    val before = t.state().files.toSet
    val src = Seq((1L, "upd", 1.0)).toDF("id", "v", "amt")
    t.mergeBuilder(src, Seq("id")).whenMatchedUpdateAll().run()
    val h = t.history().last
    assert(h.filesRemoved == 1, s"expected 1 file rewritten, got $h")
    // the 10-12 file survived untouched
    assert(t.state().files.count(before.contains) == 1)
    assert(rows(t.read()) == Seq(
      (1L, "upd", 1.0), (2L, "b", 20.0), (3L, "c", 30.0), (10L, "x", 100.0),
      (11L, "y", 110.0), (12L, "z", 120.0)))
  }

  test("change feed: update pre/post images, deletes, inserts") {
    val t = table(); seed(t)
    val v0 = t.version
    val src = Seq((1L, "A", 1.0), (2L, "B", 2.0), (70L, "I", 7.0))
      .toDF("id", "v", "amt")
    t.mergeBuilder(src, Seq("id"))
      .whenMatchedDelete("t.id = 2")
      .whenMatchedUpdate(Map("v" -> "s.v"))
      .whenNotMatchedInsertAll()
      .run()
    val feed = t.readChangeFeed(v0, t.version)
      .select("id", "v", TxTable.ChangeTypeCol).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(feed == Set(
      (1L, "a", "update_preimage"), (1L, "A", "update_postimage"),
      (2L, "b", "delete"), (70L, "I", "insert")))
  }

  test("clause SQL speaks surface names after a rename") {
    val t = table(); seed(t)
    t.renameColumn("v", "name")
    val src = Seq((1L, "renamed", 0.0)).toDF("id", "name", "amt")
    t.mergeBuilder(src, Seq("id"))
      .whenMatchedUpdate(Map("name" -> "upper(s.name)"), "t.name = 'a'")
      .run()
    assert(rows(t.read()) == Seq(
      (1L, "RENAMED", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("generated columns recompute on update; SET on them is rejected") {
    val t = table()
    t.append(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amt").repartition(1))
    t.addGeneratedColumn("amt2", "amt * 2")
    val src = Seq((1L, 50.0)).toDF("id", "amt")
    t.mergeBuilder(src, Seq("id")).whenMatchedUpdate(Map("amt" -> "s.amt")).run()
    val got = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 50.0, 100.0), (2L, 20.0, 40.0)))
    val err = intercept[IllegalArgumentException] {
      t.mergeBuilder(src, Seq("id")).whenMatchedUpdate(Map("amt2" -> "0")).run()
    }
    assert(err.getMessage.contains("table-managed"))
  }

  test("duplicate source keys are rejected; empty table takes inserts only") {
    val t = table()
    val dup = Seq((1L, "x", 0.0), (1L, "y", 0.0)).toDF("id", "v", "amt")
    // empty table: insert path, but duplicate keys still refused
    intercept[IllegalArgumentException] {
      t.mergeBuilder(dup, Seq("id")).whenNotMatchedInsertAll().run()
    }
    val src = Seq((1L, "a", 10.0), (2L, "skip", 0.0)).toDF("id", "v", "amt")
    t.mergeBuilder(src, Seq("id"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll("s.v <> 'skip'")
      .run()
    assert(rows(t.read()) == Seq((1L, "a", 10.0)))
    // empty table + no applicable insert = no commit at all
    val t2 = table()
    t2.mergeBuilder(src, Seq("id")).whenMatchedUpdateAll().run()
    assert(t2.version == -1L)
  }

  test("null-safe key matching: a null-keyed source row updates, not duplicates") {
    val t = table()
    t.append(Seq((Some(1L), "a"), (None, "nullkey")).toDF("id", "v"))
    val src = Seq((None: Option[Long], "updated")).toDF("id", "v")
    t.mergeBuilder(src, Seq("id")).whenMatchedUpdateAll().whenNotMatchedInsertAll().run()
    val got = t.read().orderBy("id").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(1)).toSeq
    assert(got == Seq(-1L -> "updated", 1L -> "a"))
  }

  test("explicit-values insert keeps source metadata columns out of the schema") {
    val t = table(); seed(t)
    val src = Seq((1L, "u", 1.0, true), (90L, "n", 9.0, false),
      (91L, "dead", 9.0, true)).toDF("id", "v", "amt", "meta")
    t.mergeBuilder(src, Seq("id"))
      .whenMatchedUpdate(Map("v" -> "s.v"))
      .whenNotMatchedInsert(
        Map("id" -> "s.id", "v" -> "s.v", "amt" -> "s.amt"), "NOT s.meta")
      .run()
    // explicit SET/VALUES → no evolution: meta never enters the schema
    assert(!t.read().columns.contains("meta"))
    assert(rows(t.read()) == Seq(
      (1L, "u", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (90L, "n", 9.0)))
    // and an insert targeting an unknown column is rejected loudly
    val err = intercept[IllegalArgumentException] {
      t.mergeBuilder(src, Seq("id"))
        .whenNotMatchedInsert(Map("nope" -> "s.v")).run()
    }
    assert(err.getMessage.contains("unknown column"))
  }

  test("by-source clauses make ANY concurrent append a conflict") {
    val t = table(); seed(t)
    val t2 = new TxTable(spark, t.tablePath)
    t2.beforeCommitHook = () =>
      t.append(Seq((100L, "race", 0.0)).toDF("id", "v", "amt"))
    val src = Seq((1L, "u", 0.0)).toDF("id", "v", "amt")
    intercept[java.util.ConcurrentModificationException] {
      t2.mergeBuilder(src, Seq("id"))
        .whenMatchedUpdateAll()
        // never fires on any row — but its presence means the merge
        // READ every unmatched row, so the late append must abort it
        .whenNotMatchedBySourceDelete("t.id < 0")
        .run()
    }
    // the racing append itself landed; nothing of the merge did
    assert(rows(t.read()).map(_._1).contains(100L))
    assert(rows(t.read()).find(_._1 == 1L).get._2 == "a")
  }

  test("without by-source, a key-disjoint concurrent append commits through") {
    val t = table(); seed(t)
    val t2 = new TxTable(spark, t.tablePath)
    t2.beforeCommitHook = () =>
      t.append(Seq((100L, "race", 0.0)).toDF("id", "v", "amt"))
    val src = Seq((1L, "u", 1.0)).toDF("id", "v", "amt")
    t2.mergeBuilder(src, Seq("id")).whenMatchedUpdateAll().run()
    assert(rows(t.read()) == Seq(
      (1L, "u", 1.0), (2L, "b", 20.0), (3L, "c", 30.0), (100L, "race", 0.0)))
  }

  test("conditional merge is equivalent to merge() for updateAll+insertAll") {
    val t1 = table(); seed2(t1)
    val t2 = table(); seed2(t2)
    val src = Seq((1L, "u1", 1.0), (11L, "u2", 2.0), (80L, "n", 8.0))
      .toDF("id", "v", "amt")
    t1.merge(src, Seq("id"))
    t2.mergeBuilder(src, Seq("id")).whenMatchedUpdateAll().whenNotMatchedInsertAll().run()
    assert(rows(t1.read()) == rows(t2.read()))
  }
}
