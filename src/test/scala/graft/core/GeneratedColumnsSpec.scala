package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** GENERATED columns: always-computed values — omitted on write →
  * computed; supplied on write → gated for exact agreement by the
  * constraint machinery.
  */
class GeneratedColumnsSpec extends SparkTestBase {

  import spark.implicits._

  private def table(): TxTable = new TxTable(spark, tmpDir("txgen"))

  test("omitted generated column is computed on append, merge and overwrite") {
    val t = table()
    t.append(Seq((1L, 10.0)).toDF("id", "amount"))
    t.addGeneratedColumn("amount_cents", "CAST(amount * 100 AS BIGINT)")
    t.append(Seq((2L, 20.5)).toDF("id", "amount"))
    t.merge(Seq((3L, 30.0)).toDF("id", "amount"), Seq("id"))
    val out = t.read().orderBy("id").collect()
    // row 1 predates the declaration: its stored value is null (the
    // table's evolution semantics — backfill via update if needed)
    assert(out(0).isNullAt(2))
    assert(out(1).getLong(2) == 2050L)
    assert(out(2).getLong(2) == 3000L)
    t.overwrite(Seq((9L, 1.25)).toDF("id", "amount"))
    assert(t.read().head().getLong(2) == 125L)
  }

  test("a supplied value must agree exactly; mismatches abort loudly") {
    val t = table()
    t.append(Seq((1L, 10.0)).toDF("id", "amount"))
    t.addGeneratedColumn("amount_cents", "CAST(amount * 100 AS BIGINT)")
    val e = intercept[IllegalArgumentException] {
      t.append(Seq((2L, 20.0, 1234L)).toDF("id", "amount", "amount_cents"))
    }
    assert(e.getMessage.contains("__generated_amount_cents"))
    assert(t.read().count() == 1, "nothing committed")
    // the CORRECT supplied value passes
    t.append(Seq((2L, 20.0, 2000L)).toDF("id", "amount", "amount_cents"))
    assert(t.read().count() == 2)
  }

  test("declaring over an existing column validates current rows") {
    val t = table()
    t.append(Seq((1L, 10.0, 1000L), (2L, 20.0, 9999L)).toDF("id", "amount", "cents"))
    assertThrows[IllegalArgumentException] {
      t.addGeneratedColumn("cents", "CAST(amount * 100 AS BIGINT)")
    }
    t.delete(col("id") === 2L) // remove the violating row
    t.addGeneratedColumn("cents", "CAST(amount * 100 AS BIGINT)")
    t.append(Seq((3L, 30.0)).toDF("id", "amount"))
    assert(t.read().where(col("id") === 3).head().getLong(2) == 3000L)
  }

  test("declarations survive renames (physical binding) and guard drops") {
    val t = table()
    t.append(Seq((1L, 10.0)).toDF("id", "amount"))
    t.addGeneratedColumn("amount_cents", "CAST(amount * 100 AS BIGINT)")
    t.renameColumn("amount", "price") // an INPUT of the expression
    t.append(Seq((2L, 20.0)).toDF("id", "price"))
    assert(t.read().orderBy("id").collect()(1).getLong(2) == 2000L,
      "generation still computes after the input rename")
    // the input cannot be dropped while the declaration stands
    assertThrows[IllegalArgumentException](t.dropColumn("price"))
    t.dropGeneratedColumn("amount_cents")
    t.dropColumn("price")
    assert(t.read().columns.toSeq == Seq("id", "amount_cents"))
  }

  test("rewrites carrying pre-declaration rows backfill instead of gate-tripping") {
    val t = table()
    // BOTH rows in one file, so any rewrite of one carries the other
    t.append(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount").coalesce(1))
    t.addGeneratedColumn("amount_cents", "CAST(amount * 100 AS BIGINT)")
    // merge on key 1: key 2 rides along as a survivor with a null
    // stored value — the rewrite must backfill it, not trip its own
    // generated gate (which would make the file permanently frozen)
    t.merge(Seq((1L, 11.0)).toDF("id", "amount"), Seq("id"))
    val after = t.read().orderBy("id").collect()
    assert(after(0).getLong(2) == 1100L)
    assert(after(1).getLong(2) == 2000L, "survivor row backfilled on rewrite")
    // update of an INPUT recomputes the generated value
    t.update(col("id") === 1L, Map("amount" -> lit(12.0)))
    assert(t.read().where(col("id") === 1L).head().getLong(2) == 1200L)
    // explicitly SETTING the generated column is still gate-validated
    val e = intercept[IllegalArgumentException] {
      t.update(col("id") === 2L, Map("amount_cents" -> lit(77L)))
    }
    assert(e.getMessage.contains("__generated_amount_cents"))
    assert(t.read().where(col("id") === 2L).head().getLong(2) == 2000L)
  }

  test("scd2 rewrites backfill pre-declaration generated nulls") {
    val t = new TxTable(spark, tmpDir("txgen-scd2"))
    t.mergeScd2(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount").coalesce(1),
      Seq("id"), 1L)
    t.addGeneratedColumn("cents", "CAST(amount * 100 AS BIGINT)")
    // a generated column joins the schema at the next append (the
    // documented evolution path) — the seed file's rows keep null
    t.append(Seq((3L, 30.0, 1L, Option.empty[Long]))
      .toDF("id", "amount", TxTable.ScdFromCol, TxTable.ScdToCol))
    // closing key 1 rewrites the shared seed file; key 2's carried
    // current row (null cents) must backfill through the gate. The
    // source carries cents per the business-column contract, validated
    t.mergeScd2(Seq((1L, 11.0, 1100L)).toDF("id", "amount", "cents").coalesce(1),
      Seq("id"), 2L)
    val cents = t.scdCurrent().orderBy("id").collect()
      .map(r => r.getLong(r.fieldIndex("id")) -> r.getLong(r.fieldIndex("cents"))).toMap
    assert(cents == Map(1L -> 1100L, 2L -> 2000L, 3L -> 3000L),
      s"carried current row must backfill: $cents")
  }

  test("writes racing a concurrent addGeneratedColumn abort loudly; reruns compute") {
    val t = table()
    t.append(Seq((1L, 10.0)).toDF("id", "amount"))
    // APPEND path: the declaration lands between staging and the claim
    // — committing would put a null in a GENERATED ALWAYS column one
    // commit after its declaration
    val t2 = new TxTable(spark, t.tablePath)
    t2.beforeCommitHook = () =>
      t.addGeneratedColumn("cents", "CAST(amount * 100 AS BIGINT)")
    val e = intercept[java.util.ConcurrentModificationException](
      t2.append(Seq((2L, 20.0)).toDF("id", "amount")))
    assert(e.getMessage.contains("generated"))
    t2.append(Seq((2L, 20.0)).toDF("id", "amount"))
    assert(t2.read().where(col("id") === 2L).head().getLong(2) == 2000L,
      "the rerun computes the new column")

    // MERGE path (the logical-conflict layer): a mid-merge declaration
    // change aborts the same way
    val t3 = new TxTable(spark, t.tablePath)
    t3.beforeCommitHook = () => t.dropGeneratedColumn("cents")
    val e2 = intercept[java.util.ConcurrentModificationException](
      t3.merge(Seq((3L, 30.0)).toDF("id", "amount"), Seq("id")))
    assert(e2.getMessage.contains("generated"))
    t3.merge(Seq((3L, 30.0)).toDF("id", "amount"), Seq("id"))
    assert(t3.read().where(col("id") === 3L).count() == 1)
  }

  test("a retired physical name cannot become a generated column") {
    val t = table()
    t.append(Seq((1L, 10.0)).toDF("id", "amount"))
    t.renameColumn("amount", "price")
    // "amount" is no surface column, but it IS price's physical slot —
    // the declaration would validate and generate against price's files
    val e = intercept[IllegalArgumentException] {
      t.addGeneratedColumn("amount", "CAST(price * 100 AS BIGINT)")
    }
    assert(e.getMessage.contains("renamed"))
    // a fresh name over the renamed input still works
    t.addGeneratedColumn("cents", "CAST(price * 100 AS BIGINT)")
    t.append(Seq((2L, 20.0)).toDF("id", "price"))
    assert(t.read().where(col("id") === 2).head().getLong(2) == 2000L)
  }

  test("the streaming sink computes generated columns per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val t = table()
    t.append(Seq((0L, 1.0)).toDF("id", "amount"))
    t.addGeneratedColumn("cents", "CAST(amount * 100 AS BIGINT)")
    val stream = MemoryStream[(Long, Double)]
    stream.addData((1L, 2.5), (2L, 3.0))
    val q = stream.toDF().toDF("id", "amount")
      .writeStream.format("graft-txtable")
      .option("path", t.tablePath)
      .option("checkpointLocation", tmpDir("txgen-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = t.read().orderBy("id").collect()
    assert(out.length == 3)
    assert(out(1).getLong(2) == 250L && out(2).getLong(2) == 300L,
      "micro-batch appends must compute the declared column")
  }

  test("declaration rides checkpoints; self-reference and dropped inputs refused") {
    val t = new TxTable(spark, tmpDir("txgen"), checkpointInterval = 2)
    t.append(Seq((1L, 10.0)).toDF("id", "amount"))
    t.addGeneratedColumn("cents", "CAST(amount * 100 AS BIGINT)")
    (0 until 3).foreach(i => t.append(Seq((10L + i, 1.0)).toDF("id", "amount")))
    t.truncateLog()
    val fresh = new TxTable(spark, t.tablePath, checkpointInterval = 2)
    assert(fresh.generatedColumns.keySet == Set("cents"))
    fresh.append(Seq((99L, 2.0)).toDF("id", "amount"))
    assert(fresh.read().where(col("id") === 99).head().getLong(2) == 200L)
    assertThrows[IllegalArgumentException](
      fresh.addGeneratedColumn("loop", "loop + 1"))
  }
}
