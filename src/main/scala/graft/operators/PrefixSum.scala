package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe running sums (SURVEY.md §5): the two-phase sharded prefix
  * sum, shared by every packing/cumulative operator.
  *
  * A running total over `PARTITION BY key ORDER BY id` streams each key's
  * ENTIRE slice through one window task. When the key has O(1) distinct
  * values (t13 packs per 4-value `source`, m14 per 4-value `modality`)
  * that is an O(1)-parallelism plan: at 100 TB the whole corpus sorts
  * into ~4 tasks. The fix is the t30 template, generalized here:
  *
  *   1. split the id ORDER into `shards` contiguous ranges
  *      (`id div span` — monotone in id, so shard order IS id order);
  *   2. pass 1: per-(key, shard) totals — a map-side-combinable groupBy
  *      producing ≤ |keys|·shards rows, checkpointed once;
  *   3. offsets: exclusive prefix of those totals per key over the tiny
  *      aggregate (driver-scale window, ≤ |keys|·shards rows);
  *   4. pass 2: within-(key, shard) running sum + broadcast offset join —
  *      `cum = off + local` equals the global running sum by construction.
  *
  * Parallelism is min(rows, |keys|·shards) instead of |keys|; both corpus
  * scans are shuffle-free up to the (key, shard) window. Outputs are
  * hash-identical to the single-window form, which is what the DuckDB
  * oracle (kept as the global `SUM() OVER` CTE) proves on every run.
  */
object PrefixSum {

  /** Appends running-sum column `cumAs` of `valCol` over
    * `PARTITION BY keys ORDER BY idCol` without a per-key global window.
    *
    * `idCol` must be a non-negative integral column, totally ordered
    * within each key group (a unique id). Internal columns are
    * `__`-prefixed and dropped. The input is read three times (shard
    * span, pass 1 totals, pass 2 local sums), so it is checkpointed
    * once up front — pass a NARROW projection (key, id, value), never a
    * subtree still carrying document text/payload columns: the
    * materialized table is then O(rows × 3 scalars), the per-executor
    * shape a 1000-node job can hold, and the expensive upstream
    * expressions run once instead of three times (measured 2.6x on m14
    * when re-scanned).
    *
    * `valCol` must be an INTEGRAL column (the §4 exactness discipline:
    * running sums are exact BIGINT arithmetic both engines replay).
    * Both phases cast it to long, so a fractional input would silently
    * TRUNCATE per row instead of summing — rejected loudly here.
    */
  def runningSum(df: DataFrame, keys: Seq[String], idCol: String,
      valCol: String, cumAs: String, shards: Int = 64): DataFrame = {
    // resolve the guard's field case-insensitively, matching Spark's own
    // analyzer; a name only Spark can resolve (e.g. qualified) skips the
    // guard rather than throwing a misleading lookup error here
    df.schema.fields.find(_.name.equalsIgnoreCase(valCol)).foreach { f =>
      require(Seq("byte", "short", "integer", "long")
          .contains(f.dataType.typeName),
        s"PrefixSum.runningSum: valCol '$valCol' must be integral, got " +
          s"${f.dataType} (a fractional column would truncate per row " +
          "under the long cast)")
    }
    val keyCols = keys.map(col)
    val in = df.localCheckpoint()
    // one tiny agg scan fixes the shard span; greatest guards the
    // empty-input NULL (no rows flow anyway, but div NULL would poison
    // the plan's nullability)
    val mx = in.agg(max(col(idCol)).cast("long").as("__mx")).localCheckpoint()
    val o = in.crossJoin(broadcast(mx))
      .withColumn("__shard",
        expr(s"CAST($idCol AS BIGINT) div (greatest(__mx, 0L) div $shards + 1)"))
      .drop("__mx")
    val sw = o.groupBy((keyCols :+ col("__shard")): _*)
      .agg(sum(col(valCol).cast("long")).as("__sw"))
      .localCheckpoint()
    val wOff = Window.partitionBy(keyCols: _*).orderBy("__shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sw
      .withColumn("__off", coalesce(sum(col("__sw")).over(wOff), lit(0L)))
      .drop("__sw")
    val wLoc = Window.partitionBy((keyCols :+ col("__shard")): _*)
      .orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.withColumn("__cw", sum(col(valCol).cast("long")).over(wLoc))
      .join(broadcast(offsets), keys :+ "__shard")
      .withColumn(cumAs, expr("__off + __cw"))
      .drop("__shard", "__off", "__cw")
  }
}
