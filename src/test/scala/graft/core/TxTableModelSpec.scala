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
  private def readBack(t: TxTable, kc: String = "k", vc: String = "v"): Seq[(Long, String)] =
    t.read().select(kc, vc).as[(Long, String)].collect().toSeq.sorted

  test("random op sequences match the in-memory model, including time travel") {
    for (seed <- Seq(11, 42, 77)) {
      val rnd = new scala.util.Random(seed)
      val dir = tmpDir(s"txtable-model-$seed")
      val t = new TxTable(spark, dir, checkpointInterval = 4)
      var model: Model = Vector.empty
      // surface names drift under renameColumn; physical stay k/v
      var kc = "k"; var vc = "v"; var renameN = 0
      // snapshots: version -> (model, surface names at that version)
      var snapshots = Map.empty[Long, (Model, (String, String))]

      def rows(n: Int): Seq[(Long, String)] =
        Seq.fill(n)((rnd.nextInt(40).toLong, s"s$seed-${rnd.nextInt(1000)}"))

      (0 until 10).foreach { _ =>
        rnd.nextInt(8) match {
          case 0 | 1 => // append (duplicate keys allowed); half the
            // appends are PARTITIONED writes, so value-pure files and
            // salt splits flow through every later mutation
            val batch = rows(1 + rnd.nextInt(5))
            if (rnd.nextBoolean())
              t.append(batch.toDF(kc, vc), partitionBy = Seq(kc),
                filesPerValue = 1 + rnd.nextInt(2))
            else t.append(batch.toDF(kc, vc))
            model = model ++ batch
          case 2 => // merge: unique-keyed upsert
            val src = rows(1 + rnd.nextInt(5))
              .groupBy(_._1).map(_._2.head).toVector
            t.merge(src.toDF(kc, vc), Seq(kc))
            val srcKeys = src.map(_._1).toSet
            model = model.filterNot(r => srcKeys.contains(r._1)) ++ src
          case 3 => // delete a key range (SQL semantics: TRUE rows go)
            val lo = rnd.nextInt(40).toLong
            val hi = lo + rnd.nextInt(10)
            t.delete(col(kc) >= lo && col(kc) <= hi)
            model = model.filterNot(r => r._1 >= lo && r._1 <= hi)
          case 4 => // overwrite (sometimes partitioned by the string col)
            val batch = rows(1 + rnd.nextInt(4))
            if (rnd.nextBoolean()) t.overwrite(batch.toDF(kc, vc), Seq(vc))
            else t.overwrite(batch.toDF(kc, vc))
            model = batch.toVector
          case 5 => // maintenance: rows must not change
            rnd.nextInt(3) match {
              case 0 => t.compact(targetBytes = 1L << 16)
              case 1 => if (t.version >= 0 && t.read().count() > 0)
                t.cluster(Seq(kc), targetFiles = 3, bitsPerCol = 4)
              case 2 =>
                // full-window retention: every snapshot stays readable,
                // only orphans go — exercises the referenced-set fold
                if (t.version >= 0) t.vacuum(retainVersions = 1000, olderThanMs = -5000L)
            }
          case 6 => // bloom index DDL: rows must not change; every
            // later ===/isin scan probe then runs the sidecar prune
            // against whatever layout the other mutations produce
            if (t.version >= 0) {
              // blooms key by the immutable PHYSICAL name even as the
              // surface name drifts
              if (!t.state().blooms.contains("k"))
                t.addBloomIndex(kc, expectedItems = 200L, fpp = 0.01)
              else if (rnd.nextBoolean()) t.dropBloomIndex(kc)
            }
          case 7 => // metadata-only rename: rows must not change, and
            // every later op speaks the NEW surface name
            if (t.version >= 0) {
              renameN += 1
              if (rnd.nextBoolean()) {
                val n = s"k$renameN"; t.renameColumn(kc, n); kc = n
              } else {
                val n = s"v$renameN"; t.renameColumn(vc, n); vc = n
              }
            }
        }
        if (t.version >= 0) {
          assert(readBack(t, kc, vc) == model.sorted,
            s"seed $seed: table diverged from model at v${t.version}")
          // stat-pruned scans must ALWAYS equal the plain filtered
          // read, whatever file layout the mutations produced
          val probe = rnd.nextInt(3) match {
            case 0 => col(kc) >= rnd.nextInt(40).toLong
            case 1 => col(kc) === rnd.nextInt(40).toLong
            case 2 => col(kc).isin(rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
          }
          assert(t.scan(probe).count() == t.read().where(probe).count(),
            s"seed $seed: scan($probe) diverged from read().where at v${t.version}")
          snapshots += t.version -> ((model, (kc, vc)))
        }
      }
      // every recorded snapshot still time-travels to its model,
      // under the surface names the table had AT that version
      snapshots.foreach { case (v, (m, (k0, v0))) =>
        val got = t.readAt(v).select(k0, v0).as[(Long, String)]
          .collect().toSeq.sorted
        assert(got == m.sorted, s"seed $seed: time travel to v$v diverged")
      }
      // the log replays identically through a fresh handle (checkpoint
      // path exercised by checkpointInterval = 4)
      assert(readBack(new TxTable(spark, dir, checkpointInterval = 4), kc, vc)
        == model.sorted)
    }
  }
}
