package graft

/** Driver-contract smoke: entry returns rows; every query key has either an
  * oracle or is intentionally rows-only; all queries run at sf0.001.
  */
class EntrySpec extends SparkSpec {

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs and aligns column names with its oracle") {
    val ids = "(?i)\\b[a-z_][a-z0-9_]*\\b".r
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      df.count() // forces full execution
      SparkEntry.oracleSql.get(name).foreach { sql =>
        val sqlTokens = ids.findAllIn(sql.toLowerCase).toSet
        df.columns.foreach { c =>
          assert(sqlTokens.contains(c.toLowerCase),
            s"$name: output column '$c' never appears in its oracle SQL")
        }
      }
    }
  }
}
