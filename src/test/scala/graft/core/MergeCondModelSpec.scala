package graft.core

import graft.SparkTestBase

/** Randomized model check for the conditional-MERGE clause engine:
  * random CLAUSE STRUCTURES (update/delete mixes, random modular
  * conditions, optional insert and by-source clauses) run against
  * random tables, and the result must equal a direct Scala mirror of
  * the published semantics (first-match-wins, WHERE-style condition
  * truth, unclaimed rows untouched). The fixed-shape spec cases in
  * [[MergeBuilderSpec]] pin each clause family; this explores their
  * compositions.
  */
class MergeCondModelSpec extends SparkTestBase {

  import spark.implicits._

  // a condition over (t.tv, s.tv) with a SQL form and a Scala mirror;
  // None = unconditional
  private case class Cond(sql: String, eval: (Long, Long) => Boolean)

  private def conds(rnd: scala.util.Random, bySource: Boolean): Option[Cond] =
    rnd.nextInt(4) match {
      case 0 => None
      case 1 =>
        val m = 2 + rnd.nextInt(3); val r = rnd.nextInt(m)
        Some(Cond(s"t.tv % $m = $r", (t, _) => t % m == r))
      case 2 if !bySource =>
        val m = 2 + rnd.nextInt(3); val r = rnd.nextInt(m)
        Some(Cond(s"s.tv % $m = $r", (_, s) => s % m == r))
      case _ =>
        val c = rnd.nextInt(50).toLong
        if (bySource) Some(Cond(s"t.tv > $c", (t, _) => t > c))
        else Some(Cond(s"s.tv > t.tv + $c", (t, s) => s > t + c))
    }

  test("random clause structures match the Scala semantics mirror") {
    for (seed <- Seq(3, 17, 29, 58, 91)) {
      val rnd = new scala.util.Random(seed)
      (0 until 6).foreach { round =>
        val t = new TxTable(spark, tmpDir(s"mcm-$seed-$round"))
        val tgt = Seq.tabulate(20 + rnd.nextInt(20))(i =>
          (rnd.nextInt(30).toLong, rnd.nextInt(100).toLong))
        t.append(tgt.toDF("k", "tv").repartition(1 + rnd.nextInt(4)))
        val src = Seq.tabulate(1 + rnd.nextInt(15))(i =>
          (rnd.nextInt(40).toLong, rnd.nextInt(100).toLong))
          .groupBy(_._1).map(_._2.head).toVector
        // random matched clauses (0-3): update sets tv from a random
        // cross-side expression, or deletes
        val matched = Vector.fill(rnd.nextInt(4)) {
          val c = conds(rnd, bySource = false)
          if (rnd.nextBoolean())
            (TxTable.MatchedUpdate(c.map(_.sql),
              if (rnd.nextBoolean()) Map("tv" -> "s.tv")
              else Map("tv" -> "t.tv + s.tv")),
              c, rnd.nextBoolean())
          else (TxTable.MatchedDelete(c.map(_.sql)), c, false)
        }
        val insert = if (rnd.nextBoolean()) {
          val c = conds(rnd, bySource = false)
          // insert condition sees only s.* — reuse the s-only templates
          val cIns = c.filter(_.sql.startsWith("s.tv %"))
          Some((TxTable.NotMatchedInsert(cIns.map(_.sql)), cIns))
        } else None
        val bySource = Vector.fill(rnd.nextInt(3)) {
          val c = conds(rnd, bySource = true)
          if (rnd.nextBoolean())
            (TxTable.BySourceUpdate(c.map(_.sql), Map("tv" -> "t.tv + 1000")),
              c, true)
          else (TxTable.BySourceDelete(c.map(_.sql)), c, false)
        }
        if (matched.nonEmpty || insert.nonEmpty || bySource.nonEmpty) {
          t.mergeConditional(src.toDF("k", "tv"), Seq("k"),
            matched.map(_._1), insert.map(_._1), bySource.map(_._1))

          // ---- Scala mirror ----
          val srcMap = src.toMap
          val tgtKeys = tgt.map(_._1).toSet
          val expected = tgt.flatMap { case (k, tv) =>
            srcMap.get(k) match {
              case Some(sv) =>
                matched.find { case (_, c, _) => c.forall(_.eval(tv, sv)) } match {
                  case Some((_: TxTable.MatchedDelete, _, _)) => None
                  case Some((TxTable.MatchedUpdate(_, set), _, fromS)) =>
                    Some((k, if (set("tv") == "s.tv") sv else tv + sv))
                  case _ => Some((k, tv)) // no clause claims: keep
                }
              case None =>
                bySource.find { case (_, c, _) => c.forall(_.eval(tv, 0L)) } match {
                  case Some((_: TxTable.BySourceDelete, _, _)) => None
                  case Some((_: TxTable.BySourceUpdate, _, _)) => Some((k, tv + 1000))
                  case _ => Some((k, tv))
                }
            }
          } ++ insert.toSeq.flatMap { case (_, c) =>
            src.filterNot(s => tgtKeys.contains(s._1))
              .filter { case (_, sv) => c.forall(_.eval(0L, sv)) }
          }
          val got = t.read().select("k", "tv").as[(Long, Long)]
            .collect().toSeq.sorted
          assert(got == expected.sorted,
            s"seed $seed round $round diverged:\n got      $got\n expected " +
              s"${expected.sorted}\n matched=$matched insert=$insert bySource=$bySource")
        }
      }
    }
  }

  test("random structures WITH schema evolution match the mirror (new column mixed in)") {
    for (seed <- Seq(5, 23, 71)) {
      val rnd = new scala.util.Random(seed)
      (0 until 5).foreach { round =>
        val t = new TxTable(spark, tmpDir(s"mcme-$seed-$round"))
        val tgt = Seq.tabulate(15 + rnd.nextInt(15))(_ =>
          (rnd.nextInt(30).toLong, rnd.nextInt(100).toLong))
        t.append(tgt.toDF("k", "tv").repartition(1 + rnd.nextInt(3)))
        // the source carries a NEW column xv the table has never seen
        val src = Seq.tabulate(1 + rnd.nextInt(12))(_ =>
          (rnd.nextInt(40).toLong, rnd.nextInt(100).toLong,
            rnd.nextInt(1000).toLong))
          .groupBy(_._1).map(_._2.head).toVector
        // each matched update either touches xv (the evolution) or not
        val matched = Vector.fill(1 + rnd.nextInt(3)) {
          val c = conds(rnd, bySource = false)
          if (rnd.nextInt(4) > 0) {
            val setsX = rnd.nextBoolean()
            val set = if (setsX) Map("tv" -> "s.tv", "xv" -> "s.xv")
              else Map("tv" -> "s.tv")
            (TxTable.MatchedUpdate(c.map(_.sql), set), c, setsX)
          } else (TxTable.MatchedDelete(c.map(_.sql)), c, false)
        }
        // star insert: every source column (xv included) rides in
        val insert = if (rnd.nextBoolean())
          Some(TxTable.NotMatchedInsert(None)) else None
        t.mergeConditional(src.toDF("k", "tv", "xv"), Seq("k"),
          matched.map(_._1), insert, Nil, evolveSchema = true)

        // ---- Scala mirror: (k, tv, Option[xv]) ----
        val srcMap = src.map(s => s._1 -> ((s._2, s._3))).toMap
        val tgtKeys = tgt.map(_._1).toSet
        val expected = tgt.flatMap { case (k, tv) =>
          srcMap.get(k) match {
            case Some((sv, sx)) =>
              matched.find { case (_, c, _) => c.forall(_.eval(tv, sv)) } match {
                case Some((_: TxTable.MatchedDelete, _, _)) => None
                case Some((_: TxTable.MatchedUpdate, _, setsX)) =>
                  Some((k, sv, if (setsX) Some(sx) else Option.empty[Long]))
                case _ => Some((k, tv, Option.empty[Long]))
              }
            case None => Some((k, tv, Option.empty[Long]))
          }
        } ++ insert.toSeq.flatMap(_ =>
          src.filterNot(s => tgtKeys.contains(s._1))
            .map(s => (s._1, s._2, Some(s._3))))
        val hasX = t.read().columns.contains("xv")
        val got =
          if (hasX) t.read().select("k", "tv", "xv").collect()
            .map(r => (r.getLong(0), r.getLong(1),
              if (r.isNullAt(2)) Option.empty[Long] else Some(r.getLong(2))))
            .toSeq.sorted
          else t.read().select("k", "tv").collect()
            .map(r => (r.getLong(0), r.getLong(1), Option.empty[Long]))
            .toSeq.sorted
        // xv exists on the table iff some clause DECLARED it and the
        // merge actually wrote (a provable no-op — no matching key, no
        // insertable row — commits nothing, so it evolves nothing)
        val declaresX = matched.exists(m =>
          m._3 && m._1.isInstanceOf[TxTable.MatchedUpdate]) || insert.nonEmpty
        val anyMatch = tgt.exists(x => srcMap.contains(x._1))
        val anyInsert = insert.nonEmpty && src.exists(s => !tgtKeys.contains(s._1))
        val expectX = declaresX && (anyMatch || anyInsert)
        assert(hasX == expectX,
          s"seed $seed round $round: xv presence $hasX, expected $expectX")
        assert(got == expected.sorted.map { case (k, v, x) =>
          (k, v, if (hasX) x else Option.empty[Long]) },
          s"seed $seed round $round diverged:\n got      $got\n expected " +
            s"${expected.sorted}\n matched=$matched insert=$insert")
      }
    }
  }
}
