package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document-store semantics (Jane: re-uploading a document supersedes the
  * previous version; queries see only the latest revision).
  *
  * Latest-wins is one window + filter — a single shuffle on the document
  * key, no self-join. At 100 TB the partitionBy key is the document id, so
  * the window never concentrates data on one executor.
  */
object DocumentStore {

  /** Keep only the highest `versionCol` row per `groupCols` group. */
  def latestVersions(df: DataFrame, groupCols: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(versionCol).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Deterministic page fetch (Jane REST pagination: ordering + offset/limit).
    * Callers must pass a total ordering (include a unique id tie-break).
    */
  def page(df: DataFrame, orderCols: Seq[org.apache.spark.sql.Column],
      offset: Int, limit: Int): DataFrame =
    df.orderBy(orderCols: _*).offset(offset).limit(limit)

  /** Keyset (seek) pagination — the scale-correct cursor form of [[page]]:
    * the client passes the last row's (sortVal, id) and the next page is a
    * pushed-down predicate + sort + limit. Offset paging costs O(offset)
    * rows scanned-and-discarded per request (page 10,000 of a 100 TB
    * index reads 10,000 pages' worth); the seek predicate reaches the
    * parquet scan, so every page costs O(page). Ordering is
    * (sortCol DESC, idCol ASC) — the j09 page convention.
    */
  def pageAfter(df: DataFrame, sortCol: String, idCol: String,
      cursorSort: Long, cursorId: Long, limit: Int): DataFrame =
    df.filter(col(sortCol) < cursorSort ||
        (col(sortCol) === cursorSort && col(idCol) > cursorId))
      .orderBy(col(sortCol).desc, col(idCol).asc)
      .limit(limit)

  /** Upsert: rows from `updates` replace same-key rows in `existing`;
    * unmatched update rows are inserts (Jane: re-upload supersedes, new
    * uploads append). Plain-parquet merge semantics: one anti-join + one
    * union, both shuffling only on the key — the rewrite pattern for
    * stores without ACID merge. Deletes compose as
    * `upsert(existing.join(tombstones, "left_anti"), inserts, key)`.
    */
  def upsert(existing: DataFrame, updates: DataFrame, key: String): DataFrame =
    existing.join(updates.select(col(key)), Seq(key), "left_anti")
      .unionByName(updates)
}
