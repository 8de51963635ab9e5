package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Source-format surface beyond parquet: CSV and JSON with EXPLICIT
  * schemas (schema inference is an extra full scan — never acceptable
  * at 100 TB) and PERMISSIVE corrupt-record capture, the ingest-edge
  * behaviors a lakehouse boundary needs.
  */
class SourceFormatsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("documents round-trip through json and csv with explicit schemas") {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val schema = docs.schema

    val jsonOut = tmpDir("docs-json")
    docs.write.mode("overwrite").json(jsonOut)
    val backJson = spark.read.schema(schema).json(jsonOut)
    assert(backJson.count() == docs.count())

    val csvOut = tmpDir("docs-csv")
    docs.write.mode("overwrite").option("header", "true")
      .option("quoteAll", "true").csv(csvOut)
    val backCsv = spark.read.schema(schema)
      .option("header", "true").csv(csvOut)
    assert(backCsv.count() == docs.count())

    // content equality, not just counts: join on doc_id, compare text
    val joined = backJson.as("j").join(backCsv.as("c"), "doc_id")
      .where(col("j.text") =!= col("c.text"))
    assert(joined.count() == 0)
  }

  test("PERMISSIVE json scan captures corrupt records instead of failing the job") {
    val path = tmpDir("corrupt-json")
    val lines = Seq(
      """{"doc_id": 1, "lang": "en", "text": "good row"}""",
      """{"doc_id": oops not json""",
      """{"doc_id": 2, "lang": "de", "text": "also good"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "part-0.json"),
      String.join("\n", lines: _*).getBytes)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("text", StringType), StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // SPARK-26208: corrupt-record column can only be queried after
      // materializing alongside real columns
      .cache()
    assert(df.count() == 3)
    assert(df.where(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.where(col("doc_id") === 1 && col("text") === "good row").count() == 1)
    df.unpersist()
  }
}
