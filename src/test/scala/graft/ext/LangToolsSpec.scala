package graft.ext

import graft.SparkTestBase

class LangToolsSpec extends SparkTestBase {

  test("language id picks the profile with most stopword hits") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "el perro en la casa y el gato no se ve"),
      (3L, "der hund und die katze in den garten mit sich")
    ).toDF("doc_id", "text")
    val out = LangTools.withLangId(docs).select("doc_id", "lang_pred")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "de")
  }

  test("token counts split words, numbers, punctuation") {
    import spark.implicits._
    val docs = Seq((1L, "Hello world 42 times!")).toDF("doc_id", "text")
    val r = LangTools.withTokenCounts(docs)
      .select("n_word_tokens", "n_num_tokens", "n_punct_tokens").first()
    assert(r.getLong(0) == 3) // hello, world, times
    assert(r.getLong(1) == 1) // 42
    assert(r.getLong(2) == 1) // !
  }

  test("redaction scrubs emails, IPs, and long digit runs with typed tags") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact bob.smith+x@example.co.uk or 10.0.0.1 ref 1234567 ok"),
      (2L, "clean text with short 123 number")
    ).toDF("doc_id", "text")
    val out = LangTools.withRedaction(docs)
      .select("doc_id", "n_emails", "n_ips", "n_digit_runs", "redacted")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(1L)._4 == "contact <EMAIL> or <IP> ref <NUM> ok")
    assert(out(2L) == ((0L, 0L, 0L, "clean text with short 123 number")))
  }

  test("redaction counts match tags in the output (digit run inside an email is not <NUM>)") {
    import spark.implicits._
    val docs = Seq((1L, "mail 1234567890@example.com now")).toDF("doc_id", "text")
    val r = LangTools.withRedaction(docs)
      .select("n_emails", "n_digit_runs", "redacted").first()
    assert(r.getLong(0) == 1)
    assert(r.getLong(1) == 0) // consumed by <EMAIL>, so it must not count
    assert(r.getString(2) == "mail <EMAIL> now")
  }
}
