package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` on the same key ("state at event time").
  *
  * Spark has no native ASOF JOIN (DuckDB/Pandas do). The usual emulations
  * are a range join (O(n·m) explosion) or a per-key collect (driver-bound).
  * This implementation is the scalable union+window sort-merge: tag both
  * sides, union, one window over (key, ts) carrying the last right payload
  * forward, filter back to left rows. Exactly ONE shuffle on the join key,
  * linear work, AQE-skew-splittable — the 100 TB-safe shape.
  */
object AsOfJoin {

  /** @param rightCols right-side columns to carry (renamed as given)
    * @return left rows + carried right columns (null when no prior right row)
    */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      rightCols: Map[String, String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == key || c == tsCol)
    val l = left.select(
      Seq(col(key), col(tsCol), lit(1).as("__side")) ++
        leftCols.map(col) ++
        rightCols.values.map(v => lit(null).as(s"__r_$v")): _*)
    val r = right.select(
      Seq(col(key), col(tsCol), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).as(c)) ++
        rightCols.map { case (src, dst) => col(src).as(s"__r_$dst") }: _*)
    // right rows sort before left rows at equal ts => asof is inclusive (>=).
    // Tie-break among duplicate right rows at the same (key, ts): order by the
    // carried payload columns themselves, so the carried value is the maximum
    // payload tuple — a pure function of the data, deterministic across runs
    // and partitionings (no synthetic row ids).
    val tieBreak = rightCols.values.toSeq.sorted.map(v => col(s"__r_$v").asc)
    val w = Window.partitionBy(key)
      .orderBy(Seq(col(tsCol).asc, col("__side").asc) ++ tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.values.foldLeft(l.unionByName(r)) { (df, v) =>
      df.withColumn(v, last(col(s"__r_$v"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .drop((Seq("__side") ++ rightCols.values.map(v => s"__r_$v")): _*)
  }
}
