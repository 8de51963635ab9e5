package graft

/** The driver's smoke check, run early: `SparkEntry.entry` must
  * execute the full producer → ingest → bronze → silver → gold DAG
  * and return a non-empty gold aggregate.
  */
class EntrySpec extends SparkTestBase {

  test("entry runs the flagship DAG end-to-end and returns gold rows") {
    val gold = SparkEntry.entry(spark)
    val rows = gold.collect()
    assert(rows.nonEmpty, "driver smoke check would fail: gold aggregate is empty")
    // gold schema carries the grouped dimensions + the aggregate
    val cols = gold.columns.toSet
    assert(cols.contains("type"), s"gold columns: $cols")
  }
}
