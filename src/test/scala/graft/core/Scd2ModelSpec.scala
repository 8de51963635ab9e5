package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Model-based randomized SCD2 check: a seeded stream of dimension
  * epochs (random key subsets, random attrs, a null-keyed row in the
  * mix) runs against both [[TxTable.mergeScd2]] and a trivial
  * in-memory history model; after every epoch the full table must
  * read back exactly the model's history, and `scdAsOf` at every
  * past epoch must reproduce that epoch's current snapshot. Catches
  * interaction bugs targeted scd2 cases don't enumerate (no-op
  * slices between changes, null keys, re-closing re-inserted keys,
  * maintenance between epochs).
  */
class Scd2ModelSpec extends SparkTestBase {

  import spark.implicits._

  // history row: (key, attr, from, to-or-None)
  private type Hist = Vector[(Option[Long], String, Long, Option[Long])]

  private def readHist(t: TxTable): Set[(Option[Long], String, Long, Option[Long])] =
    t.read()
      .select(col("id"), col("attr"), col(TxTable.ScdFromCol), col(TxTable.ScdToCol))
      .as[(Option[Long], String, Long, Option[Long])].collect().toSet

  private val fuzzSeeds: Seq[Int] = sys.env.get("GRAFT_MODEL_SEEDS")
    .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(7, 19))
  private val fuzzIters: Int = sys.env.getOrElse("GRAFT_MODEL_ITERS", "10").toInt

  test("random dimension epochs match the in-memory history model, incl. scdAsOf") {
    for (seed <- fuzzSeeds) {
      val rnd = new scala.util.Random(seed)
      val t = new TxTable(spark, tmpDir(s"scd2-model-$seed"), checkpointInterval = 4)
      var hist: Hist = Vector.empty
      // currents: key -> attr (derived view of hist, kept for speed)
      def currents: Map[Option[Long], String] =
        hist.collect { case (k, a, _, None) => k -> a }.toMap
      var epoch = 0L
      var epochSnapshots = Map.empty[Long, Map[Option[Long], String]]

      def applyModel(src: Seq[(Option[Long], String)]): Unit = {
        val cur = currents
        src.foreach { case (k, a) =>
          cur.get(k) match {
            case Some(old) if old == a => // identical: no-op
            case Some(old) =>
              // close the current row, insert the new one
              hist = hist.map {
                case (`k`, `old`, f, None) => (k, old, f, Some(epoch))
                case r => r
              } :+ ((k, a, epoch, None))
            case None =>
              hist = hist :+ ((k, a, epoch, None))
          }
        }
      }

      (0 until fuzzIters).foreach { _ =>
        epoch += 1
        // random source: some existing keys (changed or identical),
        // some fresh, sometimes the null key
        val existing = currents.keys.toSeq.sortBy(_.getOrElse(-1L))
        val picks = rnd.shuffle(existing).take(rnd.nextInt(3))
          .map(k => k -> (if (rnd.nextBoolean()) s"e$epoch-${rnd.nextInt(5)}"
                          else currents(k))) // identical = no-op row
        val fresh = Seq.fill(rnd.nextInt(2))(
          (Option(rnd.between(100L * epoch, 100L * epoch + 50)), s"f$epoch"))
        val nullRow =
          if (rnd.nextInt(3) == 0) Seq((Option.empty[Long], s"n$epoch-${rnd.nextInt(3)}"))
          else Nil
        val src0 = (picks ++ fresh ++ nullRow)
        // mergeScd2 requires unique keys per source
        val src = src0.groupBy(_._1).map(_._2.head).toSeq
        if (src.nonEmpty) {
          t.mergeScd2(src.toDF("id", "attr").coalesce(1), Seq("id"), epoch)
          applyModel(src)
        }
        // occasional maintenance between epochs: rows must not change
        if (rnd.nextInt(4) == 0 && t.version >= 0) t.compact(targetBytes = 1L << 16)
        if (t.version >= 0) {
          assert(readHist(t) == hist.toSet,
            s"seed $seed: history diverged at epoch $epoch")
          epochSnapshots += epoch -> currents
        }
      }
      // business-time travel: every recorded epoch's current set
      epochSnapshots.foreach { case (ep, cur) =>
        val got = t.scdAsOf(ep).select(col("id"), col("attr"))
          .as[(Option[Long], String)].collect().toMap
        assert(got == cur, s"seed $seed: scdAsOf($ep) diverged")
      }
      // the log replays identically through a fresh handle
      assert(readHist(new TxTable(spark, t.tablePath, checkpointInterval = 4))
        == hist.toSet)
    }
  }

  test("schema evolution mid-history: the widened model stays exact across epochs") {
    for (seed <- Seq(11, 31)) {
      val rnd = new scala.util.Random(seed)
      val t = new TxTable(spark, tmpDir(s"scd2-evo-model-$seed"), checkpointInterval = 4)
      // history row: (key, attr, xattr, from, to) — xattr is the
      // column that does not exist before the evolution epoch
      var hist = Vector.empty[(Option[Long], String, Option[String], Long, Option[Long])]
      def currents: Map[Option[Long], (String, Option[String])] =
        hist.collect { case (k, a, x, _, None) => k -> ((a, x)) }.toMap
      val evolveAt = 3L + rnd.nextInt(3)
      var epoch = 0L
      var snapshots = Map.empty[Long, Map[Option[Long], (String, Option[String])]]

      def readHistE(tt: TxTable): Set[(Option[Long], String, Option[String], Long, Option[Long])] = {
        val hasX = tt.read().columns.contains("xattr")
        val df = if (hasX) tt.read() else tt.read().withColumn("xattr",
          lit(null).cast("string"))
        df.select(col("id"), col("attr"), col("xattr"),
            col(TxTable.ScdFromCol), col(TxTable.ScdToCol))
          .as[(Option[Long], String, Option[String], Long, Option[Long])]
          .collect().toSet
      }

      (0 until fuzzIters).foreach { _ =>
        epoch += 1
        val carriesX = epoch >= evolveAt
        val existing = currents.keys.toSeq.sortBy(_.getOrElse(-1L))
        def xval(): Option[String] =
          if (!carriesX) None
          else if (rnd.nextBoolean()) Some(s"x${rnd.nextInt(3)}") else None
        val picks = rnd.shuffle(existing).take(rnd.nextInt(3)).map { k =>
          val (a0, x0) = currents(k)
          if (rnd.nextBoolean()) (k, s"e$epoch-${rnd.nextInt(4)}", xval())
          else if (carriesX) (k, a0, xval()) // maybe only xattr changes
          else (k, a0, x0) // identical = no-op row
        }
        val fresh = Seq.fill(rnd.nextInt(2))(
          (Option(rnd.between(100L * epoch, 100L * epoch + 50)), s"f$epoch", xval()))
        val src = (picks ++ fresh).groupBy(_._1).map(_._2.head).toSeq
        if (src.nonEmpty) {
          val df =
            if (carriesX) src.toDF("id", "attr", "xattr").coalesce(1)
            else src.map(r => (r._1, r._2)).toDF("id", "attr").coalesce(1)
          t.mergeScd2(df, Seq("id"), epoch, evolveSchema = carriesX)
          // model: close on any (attr, xattr) difference (null-safe)
          val cur = currents
          src.foreach { case (k, a, x) =>
            cur.get(k) match {
              case Some((a0, x0)) if a0 == a && x0 == x => ()
              case Some((a0, x0)) =>
                hist = hist.map {
                  case (`k`, `a0`, `x0`, f, None) => (k, a0, x0, f, Some(epoch))
                  case r => r
                } :+ ((k, a, x, epoch, None))
              case None => hist = hist :+ ((k, a, x, epoch, None))
            }
          }
        }
        if (rnd.nextInt(4) == 0 && t.version >= 0) t.compact(targetBytes = 1L << 16)
        if (t.version >= 0) {
          assert(readHistE(t) == hist.toSet,
            s"seed $seed: evolved history diverged at epoch $epoch (evolveAt $evolveAt)")
          snapshots += epoch -> currents
        }
      }
      snapshots.foreach { case (ep, cur) =>
        val hasX = t.read().columns.contains("xattr")
        val df = if (hasX) t.scdAsOf(ep) else t.scdAsOf(ep)
          .withColumn("xattr", lit(null).cast("string"))
        val got = df.select(col("id"), col("attr"), col("xattr"))
          .as[(Option[Long], String, Option[String])].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        assert(got == cur, s"seed $seed: scdAsOf($ep) diverged post-evolution")
      }
    }
  }
}
