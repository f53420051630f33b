package graft

/** Driver-contract smoke: entry() returns rows; every queries entry runs at
  * sf0.001 and every oracleSql key exists in queries.
  */
class EntrySpec extends SparkSpec {

  test("entry returns >0 rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs on sf0.001 and yields a schema") {
    val dir = SparkEntry.SmokeSfDir
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty, name)
      df.count() // executes the plan
    }
  }
}
