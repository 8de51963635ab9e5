package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Predicate-scoped atomic overwrite ([[TxTable.replaceWhere]]):
  * slice swap semantics, out-of-scope replacement rejection, minimal
  * rewrite (untouched slices' files survive by name), row-level change
  * record across the swap, pure-delete and insert-only degenerate
  * forms, and the delete-grade concurrency rule.
  */
class ReplaceWhereSpec extends SparkTestBase {

  import spark.implicits._

  private def rows(t: TxTable): Set[(Long, Long, String)] =
    t.read().select("day", "id", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  private def seed(partitioned: Boolean = true): TxTable = {
    val t = new TxTable(spark, tmpDir("replwhere"))
    val df = (for (d <- 1L to 3L; i <- 1L to 4L)
      yield (d, d * 10 + i, s"old-$d-$i")).toDF("day", "id", "v")
    t.append(df, partitionBy = if (partitioned) Seq("day") else Nil)
    t
  }

  test("swaps exactly the predicate slice, atomically") {
    val t = seed()
    val repl = Seq((2L, 201L, "new-a"), (2L, 202L, "new-b"))
      .toDF("day", "id", "v")
    t.replaceWhere(col("day") === 2L, repl)
    val expect = (for (d <- Seq(1L, 3L); i <- 1L to 4L)
      yield (d, d * 10 + i, s"old-$d-$i")).toSet ++
      Set((2L, 201L, "new-a"), (2L, 202L, "new-b"))
    assert(rows(t) == expect)
  }

  test("value-pure partitioned layout: untouched slices' files survive by name") {
    val t = seed()
    val before = t.state().files.toSet
    t.replaceWhere(col("day") === 2L,
      Seq((2L, 200L, "new")).toDF("day", "id", "v"))
    val after = t.state().files.toSet
    // the day=1 and day=3 files must be the SAME files (no rewrite);
    // only day=2's file left the table
    val kept = before intersect after
    assert((before -- after).size == 1, s"exactly day=2's file should go: $before -> $after")
    assert(kept.size == before.size - 1)
  }

  test("rejects replacement rows outside the predicate; nothing commits") {
    val t = seed()
    val v0 = t.version
    val bad = Seq((2L, 200L, "ok"), (4L, 400L, "leak")).toDF("day", "id", "v")
    val e = intercept[IllegalArgumentException](
      t.replaceWhere(col("day") === 2L, bad))
    assert(e.getMessage.contains("must all match"), e.getMessage)
    assert(t.version == v0)
    assert(rows(t).size == 12)
  }

  test("empty replacement is a pure slice delete; empty slice is insert-only") {
    val t = seed()
    t.replaceWhere(col("day") === 3L,
      Seq.empty[(Long, Long, String)].toDF("day", "id", "v"))
    assert(rows(t).forall(_._1 != 3L))
    assert(rows(t).size == 8)
    // day=5 matches nothing live: replaceWhere degrades to an insert
    t.replaceWhere(col("day") === 5L,
      Seq((5L, 500L, "five")).toDF("day", "id", "v"))
    assert(rows(t).contains((5L, 500L, "five")))
    assert(rows(t).size == 9)
  }

  test("no-op when predicate matches nothing and replacement is empty") {
    val t = seed()
    val v0 = t.version
    t.replaceWhere(col("day") === 9L,
      Seq.empty[(Long, Long, String)].toDF("day", "id", "v"))
    assert(t.version == v0, "provable no-op must not commit")
  }

  test("change feed rides through the swap: delete + insert records") {
    val t = seed()
    val v0 = t.version
    t.replaceWhere(col("day") === 2L,
      Seq((2L, 201L, "new-a")).toDF("day", "id", "v"))
    val feed = t.readChangeFeed(v0, t.version)
      .select(col("day"), col("id"), col(TxTable.ChangeTypeCol))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val expect = (1L to 4L).map(i => (2L, 20L + i, "delete")).toSet +
      ((2L, 201L, "insert"))
    assert(feed == expect)
  }

  test("commits past a disjoint concurrent append, aborts on overlap") {
    val t = seed()
    // disjoint: day=7 appended in the race window — stats prove no
    // day=2 row, so the swap must not abort
    t.beforeCommitHook =
      () => t.append(Seq((7L, 700L, "race")).toDF("day", "id", "v"))
    t.replaceWhere(col("day") === 2L,
      Seq((2L, 200L, "new")).toDF("day", "id", "v"))
    assert(rows(t).contains((7L, 700L, "race")))
    assert(rows(t).contains((2L, 200L, "new")))
    // overlapping: a day=2 row lands concurrently — the swap would
    // silently miss it, so it must abort and demand a rerun
    t.beforeCommitHook =
      () => t.append(Seq((2L, 299L, "late")).toDF("day", "id", "v"))
    val e = intercept[java.util.ConcurrentModificationException](
      t.replaceWhere(col("day") === 2L,
        Seq((2L, 290L, "v2")).toDF("day", "id", "v")))
    assert(e.getMessage.contains("appended files"), e.getMessage)
    // the demanded rerun then swaps the late row too
    t.replaceWhere(col("day") === 2L,
      Seq((2L, 290L, "v2")).toDF("day", "id", "v"))
    assert(rows(t).filter(_._1 == 2L) == Set((2L, 290L, "v2")))
  }

  test("enforces CHECK constraints on the replacement rows") {
    val t = seed()
    t.addConstraint("pos_id", "id > 0")
    val e = intercept[IllegalArgumentException](
      t.replaceWhere(col("day") === 2L,
        Seq((2L, -1L, "bad")).toDF("day", "id", "v")))
    assert(e.getMessage.contains("pos_id"), e.getMessage)
    assert(rows(t).size == 12)
  }
}
