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
}
