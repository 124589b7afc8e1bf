package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Smoke-level contract checks for the driver gate: every declared query
  * runs at sf0.001 and yields rows, and every query has an oracle. (Exact
  * value parity vs DuckDB is covered by tools/check.py, which the driver
  * replicates at sf0.01.) */
class QueriesSpec extends SparkSpec {

  /** Every query now carries a DuckDB oracle: r4 made q77 replayable (the
    * integer-grid Lloyd), r6 made q64 replayable (gate output = exact
    * yardstick values + in-bound booleans; the sketch estimates stay
    * engine-internal behind in-query raise_error bounds). */
  private val noOracleByDesign = Set.empty[String]

  test("every query has an oracle entry") {
    val missing =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- noOracleByDesign
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("every oracle entry has a query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL without a query: $dangling")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no query emits duplicate column names (driver compare sorts by name)") {
    val dups = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val cols = fn(spark, sf0001).columns
      val d = cols.groupBy(identity).collect { case (c, v) if v.length > 1 => c }
      if (d.nonEmpty) Some(s"$name: ${d.mkString(",")}") else None
    }
    assert(dups.isEmpty, s"duplicate output columns: $dups")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
