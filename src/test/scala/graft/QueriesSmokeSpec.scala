package graft

/** Every registered query must run and return rows at sf0.001, and
  * every oracle key must have a matching query (driver contract).
  * Value-level correctness is the driver's DuckDB gate (tools/verify.sh
  * locally); this suite guards wiring and non-emptiness.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf0001).count() > 0, s"$name returned 0 rows")
    }
  }
}
