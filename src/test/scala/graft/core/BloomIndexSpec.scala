package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Bloom-filter file index ([[TxTable.addBloomIndex]]): point-lookup
  * file skipping where min/max stats are useless, soundness under
  * missing sidecars, auto-indexing of rewrites, checkpoint survival,
  * and vacuum sweep of dead sidecars.
  *
  * The fixture interleaves a high-cardinality key across every file
  * (id % nFiles decides the file, so each file's [min, max] spans the
  * whole domain): range stats prune NOTHING, which isolates the bloom
  * stage's contribution.
  */
class BloomIndexSpec extends SparkTestBase {

  import spark.implicits._

  private val N = 4000L
  private val Files = 8

  /** ids 0..N-1 scattered round-robin over `Files` files. */
  private def scattered(): TxTable = {
    val t = new TxTable(spark, tmpDir("bloom"))
    (0 until Files).foreach { f =>
      t.append((0L until N).filter(_ % Files == f)
        .map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    }
    t
  }

  private def plannedFiles(t: TxTable, pred: org.apache.spark.sql.Column): Int =
    t.prunedFiles(t.state(), pred).size

  test("point lookup prunes to ~1 file where min/max stats prune nothing") {
    val t = scattered()
    val probe = col("id") === 1234L
    // every file's range covers the whole key domain: stats-only
    // pruning keeps all of them
    assert(plannedFiles(t, probe) == Files)
    t.addBloomIndex("id", expectedItems = N, fpp = 0.01)
    val kept = plannedFiles(t, probe)
    assert(kept >= 1 && kept <= 2, s"expected ~1 candidate file, got $kept")
    // and the scan still answers exactly
    assert(t.scan(probe).select("v").collect().map(_.getString(0)).toSeq
      == Seq("v1234"))
  }

  test("a provably-absent key prunes every file; result is empty") {
    val t = scattered()
    t.addBloomIndex("id", expectedItems = N, fpp = 0.001)
    val kept = plannedFiles(t, col("id") === (N + 999L))
    assert(kept <= 1, s"absent key should prune ~all files, got $kept")
    assert(t.scan(col("id") === (N + 999L)).count() == 0L)
  }

  test("isin prunes to the union of the members' candidate files") {
    val t = scattered()
    t.addBloomIndex("id", expectedItems = N, fpp = 0.01)
    // two keys that land in the same file (same residue class)
    val kept = plannedFiles(t, col("id").isin(17L, 17L + Files))
    assert(kept >= 1 && kept <= 2, s"got $kept")
    assert(t.scan(col("id").isin(17L, 17L + Files)).count() == 2L)
    // keys in two different files keep both
    assert(t.scan(col("id").isin(17L, 18L)).count() == 2L)
  }

  test("a disjunction of point probes prunes to the branches' union") {
    val t = scattered()
    t.addBloomIndex("id", expectedItems = N, fpp = 0.001)
    // two point branches in different residue classes: ≤2 files survive
    val orProbe = col("id") === 17L || col("id") === 18L
    val kept = plannedFiles(t, orProbe)
    assert(kept >= 1 && kept <= 3, s"got $kept")
    assert(t.scan(orProbe).count() == 2L)
    // both branches provably absent: everything prunes
    val gone = plannedFiles(t, col("id") === (N + 7L) || col("id") === (N + 8L))
    assert(gone <= 1, s"got $gone")
    // one branch bloom-unprovable (range shape): no bloom prune, sound
    assert(t.scan(col("id") === 17L || col("id") >= N - 2L).count() == 3L)
  }

  test("string columns index through the string encoding") {
    val t = scattered()
    t.addBloomIndex("v", expectedItems = N, fpp = 0.01)
    val kept = plannedFiles(t, col("v") === "v777")
    assert(kept >= 1 && kept <= 2, s"got $kept")
    assert(t.scan(col("v") === "v777").select("id").head().getLong(0) == 777L)
  }

  test("a deleted sidecar keeps the file readable (soundness)") {
    val t = scattered()
    t.addBloomIndex("id", expectedItems = N, fpp = 0.01)
    // simulate an operator that lost the sidecars (they are derived
    // data): the scan must fall back to reading, never mis-prune
    val fsv = new org.apache.hadoop.fs.Path(t.tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsv.listStatus(new org.apache.hadoop.fs.Path(t.tablePath)).foreach { st =>
      if (st.getPath.getName.startsWith("bloom-")) fsv.delete(st.getPath, false)
    }
    // fresh table handle: the process cache may hold the old sidecars
    // for the old instance's keys, which is fine (same content); this
    // instance probes the FS and finds nothing
    val t2 = new TxTable(spark, t.tablePath)
    assert(t2.prunedFiles(t2.state(), col("id") === 1234L).size == Files)
    assert(t2.scan(col("id") === 1234L).count() == 1L)
  }

  test("rewrites re-index their output files automatically") {
    val t = scattered()
    t.addBloomIndex("id", expectedItems = N, fpp = 0.01)
    t.compact(targetBytes = 1L << 20)
    val kept = plannedFiles(t, col("id") === 99L)
    val total = t.state().files.size
    assert(kept < total || total <= 2,
      s"compacted files should carry fresh sidecars (kept $kept of $total)")
    assert(t.scan(col("id") === 99L).count() == 1L)
    // merge: the upserted file set is re-staged under the index
    t.merge(Seq((99L, "updated")).toDF("id", "v"), Seq("id"))
    assert(t.scan(col("id") === 99L).select("v").head().getString(0) == "updated")
  }

  test("the index config survives checkpoints and new table handles") {
    val t = new TxTable(spark, tmpDir("bloom-ckpt"), checkpointInterval = 2)
    (0 until 6).foreach { f =>
      t.append((0L until 600L).filter(_ % 6 == f)
        .map(i => (i, i * 2)).toDF("id", "x").coalesce(1))
    }
    t.addBloomIndex("id", expectedItems = 1000L, fpp = 0.01)
    // force commits past a checkpoint boundary so state resolves from
    // the checkpoint, not manifest replay
    t.append(Seq((9990L, 0L), (9991L, 2L)).toDF("id", "x"))
    t.append(Seq((9992L, 4L)).toDF("id", "x"))
    val t2 = new TxTable(spark, t.tablePath, checkpointInterval = 2)
    assert(t2.state().blooms.contains("id"))
    // the post-DDL appends were indexed at stage time: a lookup into
    // one of them prunes the scattered originals
    val kept = t2.prunedFiles(t2.state(), col("id") === 9992L).size
    assert(kept <= 2, s"got $kept")
    assert(t2.scan(col("id") === 9990L).count() == 1L)
  }

  test("vacuum sweeps sidecars of dead files and dropped indexes") {
    val t = scattered()
    t.addBloomIndex("id", expectedItems = N, fpp = 0.01)
    val fsv = new org.apache.hadoop.fs.Path(t.tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def sidecars(): Set[String] =
      fsv.listStatus(new org.apache.hadoop.fs.Path(t.tablePath))
        .map(_.getPath.getName).filter(_.startsWith("bloom-")).toSet
    assert(sidecars().size == Files)
    // compaction kills the original files; their sidecars must go too
    t.compact(targetBytes = 1L << 20)
    t.vacuum(retainVersions = 0, olderThanMs = 0L)
    val afterCompact = sidecars()
    val live = t.state().files.toSet
    assert(afterCompact.forall(s =>
      TxTable.bloomParse(s).exists { case (f, _) => live.contains(f) }),
      s"orphaned sidecars survived vacuum: $afterCompact")
    // dropping the index makes the remaining sidecars garbage
    t.dropBloomIndex("id")
    t.vacuum(retainVersions = 0, olderThanMs = 0L)
    assert(sidecars().isEmpty)
    // and the drop disables pruning
    assert(t.prunedFiles(t.state(), col("id") === 5L).size
      == t.state().files.size)
  }

  test("declarative reads bloom-prune through TxSkipRule") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def planned(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case lr: LogicalRelation => lr.relation match {
          case h: HadoopFsRelation => h.location.inputFiles.length
          case _ => 0
        }
      }.sum
    val t = scattered()
    t.addBloomIndex("id", expectedItems = N, fpp = 0.01)
    // .where over read(): same two-stage prune as scan(), automatic
    val probe = t.read().where(col("id") === 2718L)
    assert(planned(t.read()) == Files)
    val kept = planned(probe)
    assert(kept >= 1 && kept <= 2, s"expected ~1 planned file, got $kept")
    assert(probe.select("v").collect().map(_.getString(0)).toSeq == Seq("v2718"))
    // the batch format path too
    val viaFormat = spark.read.format("graft-txtable")
      .option("path", t.tablePath).load().where(col("id") === 2718L)
    assert(planned(viaFormat) <= 2, viaFormat.queryExecution.optimizedPlan)
    assert(viaFormat.count() == 1L)
  }

  test("DDL validation: unknown columns and unsupported types fail loudly") {
    val t = new TxTable(spark, tmpDir("bloom-bad"))
    t.append(Seq((1L, 2.5d)).toDF("id", "d"))
    val missing = intercept[IllegalArgumentException](t.addBloomIndex("nope"))
    assert(missing.getMessage.contains("not a column"))
    val dbl = intercept[IllegalArgumentException](t.addBloomIndex("d"))
    assert(dbl.getMessage.contains("unsupported type"))
    val drop = intercept[IllegalArgumentException](t.dropBloomIndex("id"))
    assert(drop.getMessage.contains("no bloom index"))
  }
}
