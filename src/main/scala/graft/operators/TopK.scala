package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed top-k per key with map-side pruning.
  *
  * The window-function form (`row_number over (partition by key order by
  * score) <= k`) shuffles EVERY row to sort it, then discards all but k per
  * key. At 100 TB that shuffle is the job. Phase 1 here keeps a bounded
  * per-key heap inside each input partition (`mapPartitions`, no shuffle),
  * so at most `keys x k` rows per partition survive; phase 2 runs the
  * ordinary window on that residue. Output rows and `rn` are identical to
  * the window form for any total ordering (callers pass a tie-break).
  *
  * Built from existing operators per SURVEY.md §5 — the semantics are
  * expressible, so no custom SparkPlan is warranted; the win is purely
  * where the data gets dropped.
  */
object TopK {

  /** @param scoreCol  ranking column (higher is better)
    * @param tieCol    unique ascending tie-break column
    * @return input columns + `rn` (1..k per key), exactly as
    *         `row_number() over (partition by keys order by score desc, tie asc)`
    */
  def perKey(df: DataFrame, keyCols: Seq[String], scoreCol: String,
      tieCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val schema = df.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    val scoreIdx = schema.fieldIndex(scoreCol)
    val tieIdx = schema.fieldIndex(tieCol)

    // (score desc, tie asc): a row is "greater" (better) if its score is
    // higher, or equal-score with a lower tie value. Typed comparison so
    // long scores beyond 2^53 stay exact.
    def cmpNum(x: Any, y: Any): Int = (x, y) match {
      case (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compare(a, b)
      case (a: java.lang.Integer, b: java.lang.Integer) => Integer.compare(a, b)
      case (a: java.lang.Number, b: java.lang.Number) =>
        java.lang.Double.compare(a.doubleValue(), b.doubleValue())
      case other => throw new IllegalArgumentException(s"non-numeric: $other")
    }
    val ord: Ordering[Row] = new Ordering[Row] {
      override def compare(a: Row, b: Row): Int = {
        val c = cmpNum(a.getAs[Any](scoreIdx), b.getAs[Any](scoreIdx))
        if (c != 0) c else -cmpNum(a.getAs[Any](tieIdx), b.getAs[Any](tieIdx))
      }
    }

    val pruned = df.mapPartitions { it =>
      val heaps = mutable.HashMap.empty[Seq[Any], mutable.PriorityQueue[Row]]
      it.foreach { r =>
        val key = keyIdx.map(r.getAs[Any])
        // min-heap of the current top-k (reverse ordering)
        val h = heaps.getOrElseUpdate(key, mutable.PriorityQueue.empty(ord.reverse))
        if (h.size < k) h.enqueue(r)
        else if (ord.gt(r, h.head)) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(schema))

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    pruned.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

}
