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

  /** Oracle type discipline (round-6 VERDICT #1/#2): DuckDB returns
    * SUM(BIGINT) as HUGEINT → Arrow decimal128(38,0), while Spark's
    * sum(long) is int64 — a final projection whose aggregate is neither
    * CAST in the oracle nor decimal-cast on the Spark side hash-reds the
    * driver gate even when every value matches. The two known-uncast
    * oracles (q_grouped_ks / q_split_balance, frozen since round 6) are
    * matched on the SPARK side with DecimalType(38,0); this pins that, and
    * fails on any NEW oracle whose final SELECT emits a bare SUM(.
    */
  test("oracle final projections carry no NEW uncast SUM aggregates") {
    // known-frozen uncast twins, matched Spark-side by a decimal cast
    val knownUncast = Set("q_grouped_ks", "q_split_balance")
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if !knownUncast.contains(name) &&
        // final projection = text after the LAST top-level SELECT
        sql.substring(sql.toUpperCase.lastIndexOf("SELECT"))
          .split("FROM")(0)
          .replaceAll("(?i)CAST\\s*\\(", "(")        // casts are fine
          .replaceAll("(?i)\\(\\s*SUM\\s*\\(", "((") // cast-wrapped sums erased
          .replaceAll("(?i)WHEN\\s+SUM\\s*\\(", "WHEN ((") // predicate sums, not projected
          .toUpperCase.contains("SUM(") => name
    }
    assert(offenders.isEmpty,
      s"uncast SUM in oracle final projection (HUGEINT vs int64 hash-red): $offenders")
  }

  test("q_grouped_ks / q_split_balance emit decimal(38,0) totals matching DuckDB's HUGEINT") {
    import org.apache.spark.sql.types.DecimalType
    Seq("q_grouped_ks", "q_split_balance").foreach { q =>
      val schema = SparkEntry.queries(q)(spark, SparkEntry.SmokeSfDir).schema
      Seq("n_ref", "n_cand").foreach { c =>
        assert(schema(c).dataType == DecimalType(38, 0),
          s"$q.$c must be decimal(38,0) to hash-match the frozen uncast oracle SUM")
      }
    }
  }
}
