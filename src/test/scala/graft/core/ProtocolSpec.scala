package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Reader/writer PROTOCOL gating: feature DDL that older clients
  * would misinterpret bumps the table's requirement, and a client
  * facing a higher requirement refuses loudly instead of serving
  * wrong results or corrupting invariants.
  */
class ProtocolSpec extends SparkTestBase {

  import spark.implicits._

  private def table(): TxTable = new TxTable(spark, tmpDir("txproto"))

  test("fresh tables are v1; v2 features bump exactly once") {
    val t = table()
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(t.protocol == (1, 1))
    t.renameColumn("v", "w")
    assert(t.protocol == (2, 2))
    t.dropColumn("w") // already v2: no second bump action needed
    assert(t.protocol == (2, 2))
  }

  test("merge-on-read delete (deletion vectors) bumps to v2") {
    val t = table()
    // ONE file, low delete fraction: the mask stays a sidecar (the
    // rewrite fallback carries no Dv action and no bump)
    t.append((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    assert(t.protocol == (1, 1))
    t.deleteMergeOnRead(col("id") === 2L)
    assert(t.protocol == (2, 2))
    assert(t.read().count() == 9)
  }

  test("a higher reader requirement refuses reads AND writes loudly") {
    val t = table()
    t.append(Seq((1L, "a")).toDF("id", "v"))
    // a future client wrote a feature this implementation predates
    val manifest = new java.io.File(t.tablePath, TxTable.LogDirName + "/" +
      "v%020d.json".format(1))
    java.nio.file.Files.writeString(manifest.toPath,
      """{"a":"protocol","minReader":99,"minWriter":99}""" + "\n")
    val fresh = new TxTable(spark, t.tablePath)
    val er = intercept[IllegalStateException](fresh.read().collect())
    assert(er.getMessage.contains("reader protocol 99"))
    val ew = intercept[IllegalStateException](
      fresh.append(Seq((2L, "b")).toDF("id", "v")))
    // the write path reads state first, so either gate may fire — both
    // name the protocol explicitly
    assert(ew.getMessage.contains("protocol 99"))
  }

  test("explicit upgrades are monotone and capped at what this client supports") {
    val t = table()
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.upgradeProtocol(2, 2)
    assert(t.protocol == (2, 2))
    assertThrows[IllegalArgumentException](t.upgradeProtocol(1, 1))
    assertThrows[IllegalArgumentException](t.upgradeProtocol(99, 99))
    val v = t.version
    t.upgradeProtocol(2, 2) // idempotent no-op commits nothing
    assert(t.version == v)
  }

  test("protocol survives checkpoint replay and truncation") {
    val t = new TxTable(spark, tmpDir("txproto"), checkpointInterval = 2)
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.renameColumn("v", "w")
    (0 until 3).foreach(i => t.append(Seq((10L + i, "x")).toDF("id", "w")))
    t.truncateLog()
    assert(new TxTable(spark, t.tablePath, checkpointInterval = 2).protocol == (2, 2))
  }
}
