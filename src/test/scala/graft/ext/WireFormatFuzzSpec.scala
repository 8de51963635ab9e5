package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Adversarial round-trips for the corpus wire formats beyond the
  * synthetic testdata: strings stuffed with the characters that break
  * naive framing (quotes, delimiters, CR/LF, unicode, emoji,
  * backslashes, leading/trailing whitespace) must survive the same
  * write→read paths the graded ingests use, byte-for-byte.
  */
class WireFormatFuzzSpec extends SparkTestBase {

  private def hostileStrings(withCr: Boolean): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(7)
    val atoms = Seq(
      "plain", "with,commas", "\"quoted\"", "embedded\nnewline",
      "tab\there", "back\\slash", "ünïcòdé",
      "日本語テキスト", "emoji 😀🎉", "  padded  ", "a\"b,c\nd",
      "trailing,", ",leading", "\"\"", "") ++
      // bare CR inside fields is NOT CSV-representable through
      // Spark's parser: univocity normalizes/mis-frames CRLF inside
      // quoted values (documented in CsvIngest) — JSONL carries it
      (if (withCr) Seq("crlf\r\nrun") else Nil)
    (1L to 300L).map { i =>
      val n = 1 + rnd.nextInt(6)
      i -> Seq.fill(n)(atoms(rnd.nextInt(atoms.length))).mkString(" ")
    }
  }

  test("CSV multiLine + doubled-quote escaping round-trips hostile strings byte-for-byte") {
    import spark.implicits._
    val strings = hostileStrings(withCr = false)
    val in = strings.toDF("id", "text")
    val dir = tmpDir("csv-fuzz")
    in.repartition(3)
      .write.option("header", "false")
      .option("quote", "\"").option("escape", "\"")
      // the fuzz's catch: Spark's CSV WRITER trims field whitespace
      // by default (ignore*WhiteSpace=true on write, unlike the
      // reader) — padded fields silently corrupt unless disabled
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("compression", "gzip")
      .mode("overwrite").csv(dir)
    val back = spark.read
      .schema("id LONG, text STRING")
      .option("multiLine", "true")
      .option("quote", "\"").option("escape", "\"")
      .csv(dir)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
      .toMap
    strings.foreach { case (id, s) =>
      assert(back(id) == s, s"CSV mangled id $id: '${back(id)}' != '$s'")
    }
  }

  test("JSONL escaping round-trips hostile strings byte-for-byte, CR included") {
    import spark.implicits._
    val strings = hostileStrings(withCr = true)
    val in = strings.toDF("id", "text")
    val dir = tmpDir("jsonl-fuzz")
    in.repartition(3)
      .select(to_json(struct($"id", $"text")).as("value"))
      .write.option("compression", "gzip").mode("overwrite").text(dir)
    val back = spark.read
      .schema("id LONG, text STRING")
      .json(dir)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
      .toMap
    strings.foreach { case (id, s) =>
      assert(back(id) == s, s"JSONL mangled id $id: '${back(id)}' != '$s'")
    }
  }
}
