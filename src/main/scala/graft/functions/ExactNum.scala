package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers that keep results bit-exact across engines.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * oracle SQL. Floating-point SUMs are order-dependent, so every money/value
  * aggregate goes through integer cents: `round(x*100)` of one double is
  * deterministic and identical in any IEEE-754 engine, and BIGINT sums are
  * exact. See SURVEY.md §4.
  */
object ExactNum {
  /** Double currency/value column → exact integer cents. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** SUM of cents — exact regardless of partitioning / add order. */
  def sumCents(c: Column): Column = sum(cents(c))
}
