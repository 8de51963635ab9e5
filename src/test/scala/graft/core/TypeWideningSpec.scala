package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.SparkTestBase

/** Type widening on evolve-on-write ([[TxTable.TypeWideningProp]]):
  * off by default (the strict add-columns-only contract), opt-in per
  * table; widened columns keep every already-written file readable
  * (the vectorized reader upcasts) and every recorded stat comparable
  * (manifest stats are width-normalized).
  */
class TypeWideningSpec extends SparkTestBase {

  import spark.implicits._

  private def table(): TxTable = new TxTable(spark, tmpDir("widen"))

  test("off by default: a type change still fails with a pointer to the knob") {
    val t = table()
    t.append(Seq((1, "a")).toDF("x", "v"))
    val e = intercept[IllegalArgumentException] {
      t.append(Seq((2L, "b")).toDF("x", "v"))
    }
    assert(e.getMessage.contains(TxTable.TypeWideningProp))
  }

  test("int widens to long; old files stay readable; stats still skip") {
    val t = table()
    t.setProperty(TxTable.TypeWideningProp, "true")
    t.append(Seq((1, "a"), (100, "b")).toDF("x", "v").repartition(1))
    t.append(Seq((5000000000L, "c")).toDF("x", "v").repartition(1))
    assert(t.schemaOption.get("x").dataType == LongType)
    val got = t.read().select("x", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (100L, "b"), (5000000000L, "c")))
    // data skipping across mixed-width files: the probe must read only
    // the wide file (int-file stats were recorded as JLong)
    val pruned = t.prunedFiles(t.state(), col("x") > 1000L)
    assert(pruned.size == 1,
      s"expected the int file pruned, read ${pruned.size}/${t.state().files.size}")
    assert(t.scan(col("x") > 1000L).count() == 1L)
  }

  test("a narrower late writer upcasts into the widened schema") {
    val t = table()
    t.setProperty(TxTable.TypeWideningProp, "true")
    t.append(Seq((5000000000L, "a")).toDF("x", "v"))
    t.append(Seq((7, "late-int")).toDF("x", "v")) // int arrives after long
    assert(t.schemaOption.get("x").dataType == LongType)
    assert(t.read().select("x").as[Long].collect().toSet == Set(5000000000L, 7L))
  }

  test("float widens to double; non-widening changes still fail") {
    val t = table()
    t.setProperty(TxTable.TypeWideningProp, "true")
    t.append(Seq((1.5f, "a")).toDF("x", "v"))
    t.append(Seq((2.25d, "b")).toDF("x", "v"))
    assert(t.schemaOption.get("x").dataType == DoubleType)
    assert(t.read().select("x").as[Double].collect().toSet == Set(1.5, 2.25))
    val e = intercept[IllegalArgumentException] {
      t.append(Seq(("nope", "c")).toDF("x", "v"))
    }
    assert(e.getMessage.contains("not a legal widening"))
    // int→double is NOT in the lattice either (reader would not upcast)
    val e2 = intercept[IllegalArgumentException] {
      t.append(Seq((3, "d")).toDF("x", "v"))
    }
    assert(e2.getMessage.contains("not a legal widening"))
  }

  test("widening composes with rename and compaction") {
    val t = table()
    t.setProperty(TxTable.TypeWideningProp, "true")
    t.append(Seq((1, "a")).toDF("x", "v").repartition(1))
    t.renameColumn("x", "y")
    // widen under the RENAMED surface name: the merge must resolve
    // through the logical→physical mapping, not the surface schema
    t.append(Seq((6000000000L, "b")).toDF("y", "v").repartition(1))
    assert(t.schemaOption.get("y").dataType == LongType)
    // compaction rewrites mixed-width files under the widened schema
    t.compact()
    assert(t.read().select("y").as[Long].collect().toSet == Set(1L, 6000000000L))
    assert(t.scan(col("y") > 1000L).count() == 1L)
  }

  test("time travel keeps the pre-widening schema; merge works across widths") {
    val t = table()
    t.setProperty(TxTable.TypeWideningProp, "true")
    t.append(Seq((1, 10)).toDF("k", "x").repartition(1))
    val v0 = t.version
    t.append(Seq((2L, 20L)).toDF("k", "x").repartition(1))
    assert(t.readAt(v0).schema("x").dataType.simpleString == "int")
    t.merge(Seq((1L, 99L), (3L, 30L)).toDF("k", "x"), Seq("k"))
    assert(t.read().select("k", "x").as[(Long, Long)].collect().toSet ==
      Set((1L, 99L), (2L, 20L), (3L, 30L)))
  }
}
