package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Model-based randomized check: a seeded stream of table operations
  * runs against BOTH the real [[TxTable]] and a trivial in-memory
  * model of its semantics; after every mutation the table must read
  * back exactly the model, and at the end every recorded snapshot must
  * still time-travel to its model of record. This catches interaction
  * bugs no single-operation spec enumerates (merge after cluster,
  * delete after overwrite, compact between everything).
  */
class TxTableModelSpec extends SparkTestBase {

  import spark.implicits._

  private type Model = Vector[(Long, String)]

  // multiset comparison (sorted seq): appends may legally duplicate
  // rows, and a set compare would hide lost or doubled copies
  private def readBack(t: TxTable): Seq[(Long, String)] =
    t.read().select("k", "v").as[(Long, String)].collect().toSeq.sorted

  test("random op sequences match the in-memory model, including time travel") {
    for (seed <- Seq(11, 42, 77)) {
      val rnd = new scala.util.Random(seed)
      val dir = tmpDir(s"txtable-model-$seed")
      val t = new TxTable(spark, dir, checkpointInterval = 4)
      var model: Model = Vector.empty
      // snapshots we expect time travel to reproduce: version -> model
      var snapshots = Map.empty[Long, Model]

      def rows(n: Int): Seq[(Long, String)] =
        Seq.fill(n)((rnd.nextInt(40).toLong, s"s$seed-${rnd.nextInt(1000)}"))

      (0 until 10).foreach { _ =>
        rnd.nextInt(7) match {
          case 0 | 1 => // append (duplicate keys allowed); half the
            // appends are PARTITIONED writes, so value-pure files and
            // salt splits flow through every later mutation
            val batch = rows(1 + rnd.nextInt(5))
            if (rnd.nextBoolean())
              t.append(batch.toDF("k", "v"), partitionBy = Seq("k"),
                filesPerValue = 1 + rnd.nextInt(2))
            else t.append(batch.toDF("k", "v"))
            model = model ++ batch
          case 2 => // merge: unique-keyed upsert
            val src = rows(1 + rnd.nextInt(5))
              .groupBy(_._1).map(_._2.head).toVector
            t.merge(src.toDF("k", "v"), Seq("k"))
            val srcKeys = src.map(_._1).toSet
            model = model.filterNot(r => srcKeys.contains(r._1)) ++ src
          case 3 => // delete a key range (SQL semantics: TRUE rows go)
            val lo = rnd.nextInt(40).toLong
            val hi = lo + rnd.nextInt(10)
            t.delete(col("k") >= lo && col("k") <= hi)
            model = model.filterNot(r => r._1 >= lo && r._1 <= hi)
          case 4 => // overwrite (sometimes partitioned by the string col)
            val batch = rows(1 + rnd.nextInt(4))
            if (rnd.nextBoolean()) t.overwrite(batch.toDF("k", "v"), Seq("v"))
            else t.overwrite(batch.toDF("k", "v"))
            model = batch.toVector
          case 5 => // maintenance: rows must not change
            rnd.nextInt(3) match {
              case 0 => t.compact(targetBytes = 1L << 16)
              case 1 => if (t.version >= 0 && t.read().count() > 0)
                t.cluster(Seq("k"), targetFiles = 3, bitsPerCol = 4)
              case 2 =>
                // full-window retention: every snapshot stays readable,
                // only orphans go — exercises the referenced-set fold
                if (t.version >= 0) t.vacuum(retainVersions = 1000, olderThanMs = -5000L)
            }
          case 6 => // bloom index DDL: rows must not change; every
            // later ===/isin scan probe then runs the sidecar prune
            // against whatever layout the other mutations produce
            if (t.version >= 0) {
              if (!t.state().blooms.contains("k"))
                t.addBloomIndex("k", expectedItems = 200L, fpp = 0.01)
              else if (rnd.nextBoolean()) t.dropBloomIndex("k")
            }
        }
        if (t.version >= 0) {
          assert(readBack(t) == model.sorted,
            s"seed $seed: table diverged from model at v${t.version}")
          // stat-pruned scans must ALWAYS equal the plain filtered
          // read, whatever file layout the mutations produced
          val probe = rnd.nextInt(3) match {
            case 0 => col("k") >= rnd.nextInt(40).toLong
            case 1 => col("k") === rnd.nextInt(40).toLong
            case 2 => col("k").isin(rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
          }
          assert(t.scan(probe).count() == t.read().where(probe).count(),
            s"seed $seed: scan($probe) diverged from read().where at v${t.version}")
          snapshots += t.version -> model
        }
      }
      // every recorded snapshot still time-travels to its model
      snapshots.foreach { case (v, m) =>
        val got = t.readAt(v).select("k", "v").as[(Long, String)]
          .collect().toSeq.sorted
        assert(got == m.sorted, s"seed $seed: time travel to v$v diverged")
      }
      // the log replays identically through a fresh handle (checkpoint
      // path exercised by checkpointInterval = 4)
      assert(readBack(new TxTable(spark, dir, checkpointInterval = 4)) == model.sorted)
    }
  }
}
