package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation (SURVEY.md §5): two-phase salted groupBy.
  *
  * A groupBy on a low-cardinality / hot key (events has FIVE event types —
  * at 100 TB that is five reducers doing all the work) first aggregates on
  * (key, salt) so every partition combines locally across `salts` reducers,
  * then re-aggregates on the key alone. The second shuffle moves only
  * |keys| x salts rows. Results are bit-identical to the direct groupBy
  * when each output's phase-2 merge matches its partial: SUM and COUNT
  * merge with `sum` (the [[saltedAgg]] default); MIN/MAX must pass their
  * own merge via [[saltedAggMerge]]. The oracle checks against the
  * unsalted form.
  */
object Skew {

  /** Sum-merged form: correct for SUM partials and COUNT partials (a COUNT
    * becomes the SUM of partial counts). For MIN/MAX use [[saltedAggMerge]].
    *
    * @param saltCol deterministic salt expression (e.g. `id % salts`) —
    *   deterministic so re-runs and retries agg identically
    * @param partials (outputName -> partial agg of the input)
    */
  def saltedAgg(df: DataFrame, key: String, saltCol: Column, salts: Int,
      partials: Seq[(String, Column)]): DataFrame =
    saltedAggMerge(df, key, saltCol, salts,
      partials.map { case (n, c) => (n, c, sum(_: Column)) })

  /** General form: each output is (name, phase-1 partial aggregate,
    * phase-2 merge of the partials) — e.g. `("lo", min(x), min)`,
    * `("n", count(x), sum)`. The merge must be the aggregate's own
    * combine function for the result to equal the direct groupBy.
    */
  def saltedAggMerge(df: DataFrame, key: String, saltCol: Column, salts: Int,
      partials: Seq[(String, Column, Column => Column)]): DataFrame = {
    val phase1 = df.withColumn("__salt", saltCol % salts)
      .groupBy(col(key), col("__salt"))
      .agg(partials.head._2.as(s"__p_${partials.head._1}"),
        partials.tail.map { case (n, c, _) => c.as(s"__p_$n") }: _*)
    phase1.groupBy(col(key))
      .agg(partials.head._3(col(s"__p_${partials.head._1}")).as(partials.head._1),
        partials.tail.map { case (n, _, m) => m(col(s"__p_$n")).as(n) }: _*)
  }
}
