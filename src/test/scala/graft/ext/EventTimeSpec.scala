package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.SparkTestBase
import graft.core.EventTime

/** Regression fixture for the events.ts encoding drift (VERDICT r5):
  * the driver's testdata has shipped ts as parquet TIMESTAMP(NANOS)
  * (→ LongType epoch-nanos under nanosAsLong) and TIMESTAMP_MICROS
  * (→ TIMESTAMP_NTZ). Every event query must produce IDENTICAL rows
  * over the same data regardless of which encoding a regeneration
  * picks, so a future flip can't silently disable the event surface.
  *
  * The same logical events are written three ways — long nanos,
  * TIMESTAMP_NTZ, and UTC-adjusted TIMESTAMP — and the full event
  * query registry (EventQueries + the as-of join) is asserted
  * row-identical across all three.
  */
class EventTimeSpec extends SparkTestBase {

  // deterministic mini-corpus: spans the 2024-01-15 q_filter_day
  // boundary, >30-min session gaps, duplicate (user, event_type)
  // pairs, view→click→purchase funnels, sub-second (micro) precision
  private lazy val dirs: Map[String, String] = {
    import spark.implicits._
    val base = java.time.Instant.parse("2024-01-14T22:00:00Z").getEpochSecond
    val rows = (0 until 600).map { i =>
      val user = i % 7L
      val etype = Seq("view", "click", "purchase", "scroll", "hover")(i % 5)
      // ragged steps: some events share a second, some jump >30 min
      val sec = base + (i / 5) * 421L + (i % 5) * 7L + (if (i % 11 == 0) 2400L else 0L)
      val micros = sec * 1000000L + (i % 3) * 250000L
      (i.toLong, micros * 1000L, user, etype, (i % 97) * 3.5d, s"""{"k":${i % 4}}""")
    }
    val nanos = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ntz = nanos.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
    val tz = nanos.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    Map("nanos" -> nanos, "ntz" -> ntz, "tz" -> tz).map { case (name, df) =>
      val dir = tmpDir(s"events-$name")
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      name -> dir
    }
  }

  private def loadedType(dir: String) =
    graft.core.Tables.load(spark, dir, "events").schema("ts").dataType

  test("the three fixture encodings load as distinct ts types") {
    assert(loadedType(dirs("nanos")) == LongType)
    assert(loadedType(dirs("ntz")) == TimestampNTZType)
    assert(loadedType(dirs("tz")) == TimestampType)
  }

  private val allQueries = EventQueries.queries ++ Map("q_asof_join" -> AsofJoin.queries("q_asof_join"))

  for ((name, q) <- allQueries.toSeq.sortBy(_._1)) {
    test(s"$name is encoding-invariant across nanos/ntz/tz") {
      val results = dirs.map { case (enc, dir) =>
        enc -> q(spark, dir).collect().map(_.toSeq).toSeq
      }
      assert(results("nanos").nonEmpty, s"$name returned no rows on the fixture")
      assert(results("ntz") == results("nanos"), s"$name: NTZ result diverges from long-nanos")
      assert(results("tz") == results("nanos"), s"$name: TIMESTAMP result diverges from long-nanos")
    }
  }

  test("q_filter_day pushes the raw-ts range predicate to the scan in every encoding") {
    for ((enc, dir) <- dirs) {
      val plan = EventQueries.qFilterDay(spark, dir).queryExecution.executedPlan.toString
      assert(plan.contains("GreaterThanOrEqual(ts"),
        s"$enc: ts range filter not pushed to parquet scan:\n" +
          plan.linesIterator.take(25).mkString("\n"))
    }
  }

  test("EventTime rejects an unsupported ts type loudly") {
    import spark.implicits._
    val bad = Seq(("x", 1)).toDF("ts", "v")
    intercept[IllegalArgumentException](EventTime.sec(bad))
    intercept[IllegalArgumentException](EventTime.atUtc(bad, "2024-01-15T00:00:00Z"))
  }
}
