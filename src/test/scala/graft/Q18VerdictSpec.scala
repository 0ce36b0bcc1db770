package graft

import org.apache.spark.sql.functions._

import graft.queries.RelationalQueries

/** q18's sketch-verdict tripwire (r15 ADVICE): the DuckDB oracle emits
  * constant-1 verdicts by design, so the driver's hash compare proves an
  * estimate is IN band but can never catch the verdict expression itself
  * degenerating to always-true — a band-widening typo would silently
  * stop checking the sketches while the hash stayed green. This spec
  * pins the tripwire: the SHIPPED expression strings (shared symbols —
  * the j46/j47 anti-drift rule) must flip to 0 on out-of-band estimates
  * and hold 1 at the exact band edges the Scaladoc documents.
  */
class Q18VerdictSpec extends SparkSpec {

  private def verdicts(ap: Long, nExact: Long, am: Double, medianX2: Long)
      : (Long, Long) = {
    import spark.implicits._
    val row = Seq((ap, nExact, am, medianX2))
      .toDF("ap", "n_parts_exact", "am", "median_x2")
      .select(expr(RelationalQueries.Q18PartsOkExpr).as("parts_ok"),
        expr(RelationalQueries.Q18MedianOkExpr).as("median_ok"))
      .head()
    (row.getLong(0), row.getLong(1))
  }

  test("q18 verdicts flip to 0 on out-of-band estimates") {
    // in-band on both arms
    assert(verdicts(ap = 1000, nExact = 1000, am = 25.0, medianX2 = 50) == ((1L, 1L)))
    // HLL++ arm: |ap - exact| * 10 <= exact — band edge holds, +1 flips
    assert(verdicts(ap = 1100, nExact = 1000, am = 25.0, medianX2 = 50)._1 == 1L)
    assert(verdicts(ap = 1101, nExact = 1000, am = 25.0, medianX2 = 50)._1 == 0L,
      "an HLL estimate past +10% must flip parts_ok to 0")
    assert(verdicts(ap = 899, nExact = 1000, am = 25.0, medianX2 = 50)._1 == 0L,
      "an HLL estimate past -10% must flip parts_ok to 0")
    // approx_percentile arm: |am*2 - median_x2| <= 2 — ±1 quantity unit
    assert(verdicts(ap = 1000, nExact = 1000, am = 26.0, medianX2 = 50)._2 == 1L)
    assert(verdicts(ap = 1000, nExact = 1000, am = 26.5, medianX2 = 50)._2 == 0L,
      "a percentile estimate past +1 unit must flip median_ok to 0")
    assert(verdicts(ap = 1000, nExact = 1000, am = 23.5, medianX2 = 50)._2 == 0L,
      "a percentile estimate past -1 unit must flip median_ok to 0")
    // the arms are independent: one out-of-band arm must not mask the other
    val (p, m) = verdicts(ap = 2000, nExact = 1000, am = 25.0, medianX2 = 50)
    assert(p == 0L && m == 1L)
  }
}
