package graft

/** Smoke-level catalog test: every declared query runs at sf0.001 and
  * every query has either oracle SQL or a documented reason not to.
  * (Exact result parity is gated by Verify + the DuckDB oracle at
  * sf0.01 — tools/check_oracle.py.) */
class OperatorCatalogSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, sf).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracle SQL exists for every query") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("oracle keys reference existing queries") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle without query: $dangling")
  }
}
