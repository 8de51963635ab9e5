package graft.core

import graft.SparkTestBase

/** In-commit timestamps: `timestampAsOf` binds to the wall clock
  * RECORDED IN the manifest, not to file mtimes a copy, backup
  * restore or filesystem migration silently rewrites.
  */
class InCommitTsSpec extends SparkTestBase {

  import spark.implicits._

  test("time travel by timestamp survives mtime tampering; ts is monotone") {
    val t = new TxTable(spark, tmpDir("txts"))
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val ts0 = t.history().head.timestampMs
    Thread.sleep(5)
    t.append(Seq((2L, "b")).toDF("id", "v"))
    val h = t.history()
    assert(h.map(_.timestampMs) == h.map(_.timestampMs).sorted, "monotone")
    assert(h(1).timestampMs > ts0)
    // simulate a log copy: every manifest mtime becomes "now + 1h"
    val logDir = new java.io.File(t.tablePath, TxTable.LogDirName)
    logDir.listFiles().foreach(_.setLastModified(System.currentTimeMillis() + 3600000L))
    // the recorded commit times still resolve the versions correctly
    assert(t.versionAsOfTimestamp(ts0) == 0L)
    assert(t.readAsOfTimestamp(ts0).count() == 1)
    assert(t.versionAsOfTimestamp(h(1).timestampMs) == 1L)
    // and history reports the recorded times, not the tampered mtimes
    assert(t.history().map(_.timestampMs) == h.map(_.timestampMs))
  }

  test("a fallback table (manifests without the stamp) still resolves by mtime") {
    val t = new TxTable(spark, tmpDir("txts"))
    t.append(Seq((1L, "a")).toDF("id", "v"))
    // strip the stamp line, as a pre-feature writer would have left it
    val logDir = new java.io.File(t.tablePath, TxTable.LogDirName)
    logDir.listFiles().filter(_.getName.endsWith(".json")).foreach { f =>
      val kept = scala.io.Source.fromFile(f).getLines()
        .filterNot(_.contains("\"commitTs\"")).mkString("", "\n", "\n")
      java.nio.file.Files.writeString(f.toPath, kept)
    }
    assert(t.versionAsOfTimestamp(System.currentTimeMillis() + 1000L) == 0L)
    assert(t.read().count() == 1)
  }
}
