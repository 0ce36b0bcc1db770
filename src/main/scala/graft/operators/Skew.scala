package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation (SURVEY.md §5): two-phase salted groupBy.
  *
  * A groupBy on a low-cardinality / hot key (events has FIVE event types —
  * at 100 TB that is five reducers doing all the work) first aggregates on
  * (key, salt) so every partition combines locally across `salts` reducers,
  * then re-aggregates on the key alone. The second shuffle moves only
  * |keys| x salts rows. Results are bit-identical to the direct groupBy for
  * any commutative-associative aggregate (SUM/COUNT/MIN/MAX) — the oracle
  * checks against the unsalted form.
  */
object Skew {

  /** @param saltCol deterministic salt expression (e.g. `id % salts`) —
    *   deterministic so re-runs and retries agg identically
    * @param partials (outputName -> partial agg of the input), summed in
    *   phase two. COUNT becomes SUM of partial counts.
    */
  def saltedAgg(df: DataFrame, key: String, saltCol: Column, salts: Int,
      partials: Seq[(String, Column)]): DataFrame = {
    val phase1 = df.withColumn("__salt", saltCol % salts)
      .groupBy(col(key), col("__salt"))
      .agg(partials.head._2.as(s"__p_${partials.head._1}"),
        partials.tail.map { case (n, c) => c.as(s"__p_$n") }: _*)
    phase1.groupBy(col(key))
      .agg(sum(col(s"__p_${partials.head._1}")).as(partials.head._1),
        partials.tail.map { case (n, _) => sum(col(s"__p_$n")).as(n) }: _*)
  }
}
