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

  /** Full version history per document group (Jane: "all versions of this
    * document") — the supersede chain j08's latest-wins view collapses:
    * every version row, flagged `is_latest`, with `superseded_by` = the id
    * of the next-higher version (NULL-safe -1 for the head). ONE window
    * over the same document-key shuffle as [[latestVersions]]; at 100 TB
    * the partition key is the document group, so state per key is the
    * (tiny) version count.
    */
  def versionHistory(df: DataFrame, groupCols: Seq[String], versionCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(versionCol).asc)
    df.withColumn("superseded_by", coalesce(lead(col(idCol), 1).over(w), lit(-1L)))
      .withColumn("is_latest",
        when(col("superseded_by") === -1L, 1L).otherwise(0L))
  }

  /** Retention vacuum — the version-debris GC a continuously upserted
    * store needs: every re-upload leaves a superseded row behind (j36
    * serves that history; at 100 TB it dominates storage unless reaped).
    * Keeps the newest `keep` versions per group; with `tombstoneCol`,
    * groups whose LATEST version is a delete marker are dropped entirely
    * (the tombstone reap — older tombstones inside the keep window stay,
    * they are history). Both decisions ride the same document-key
    * shuffle as [[latestVersions]] (spec asserts exactly one Exchange),
    * and the rewrite composes with [[graft.sources.ParquetStore.compact]]
    * in one maintenance pass.
    */
  def vacuum(df: DataFrame, groupCols: Seq[String], versionCol: String,
      keep: Int, tombstoneCol: Option[String] = None): DataFrame = {
    val byKey = Window.partitionBy(groupCols.map(col): _*)
    val ranked = df.withColumn("__rn",
      row_number().over(byKey.orderBy(col(versionCol).desc)))
    val kept = ranked.filter(col("__rn") <= keep)
    tombstoneCol.fold(kept) { t =>
      kept.withColumn("__dead",
          max(when(col("__rn") === 1 && col(t), 1).otherwise(0)).over(byKey))
        .filter(col("__dead") === 0).drop("__dead")
    }.drop("__rn")
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

  /** Attachment model (Jane: each index row may carry 0..n binary
    * attachments — rendered plots, auxiliary files — each with a
    * content-type, served by document id and filterable by type).
    *
    * The attachments table is derived deterministically from `documents`:
    * doc_id % 3 attachments per document (so a third of the corpus has
    * none — the 0-attachment case is real, not just possible). Derivations
    * are shared SQL text, DuckDB-replayable like the [[graft.operators
    * .Indexers]] tables. At 100 TB this is its own table keyed by doc_id:
    * fetch-for-document is a pushed-down point/semi-join on the key, the
    * per-type inventory one map-side-combined groupBy.
    */
  object Attachments {
    val contentTypeSql =
      "case when (doc_id + k) % 3 = 0 then 'image/png' " +
        "when (doc_id + k) % 3 = 1 then 'application/json' " +
        "else 'text/plain' end"
    val nBytesSql = "100 + (doc_id * 37 + k * 101) % 10000"
    val attIdSql = "doc_id * 4 + k"

    /** DuckDB CTE body over raw `documents`. */
    val oracleCte: String =
      s"""SELECT doc_id, $attIdSql AS att_id, $contentTypeSql AS content_type,
         |  $nBytesSql AS n_bytes
         |FROM (SELECT doc_id, unnest(range(1, doc_id % 3 + 1)) AS k
         |      FROM documents WHERE doc_id % 3 <> 0)""".stripMargin

    /** documents → attachment rows (doc_id, att_id, content_type, n_bytes). */
    def build(documents: DataFrame): DataFrame = documents
      .filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.explode(
          expr("sequence(1, doc_id % 3)")).as("k"))
      .withColumn("att_id", expr(attIdSql))
      .withColumn("content_type", expr(contentTypeSql))
      .withColumn("n_bytes", expr(nBytesSql))
      .select("doc_id", "att_id", "content_type", "n_bytes")

    /** Attachments for a document subset, optionally one content-type —
      * the REST fetch-attachments-for-document path. The doc set joins as
      * a semi-join on the store key (broadcast when small).
      */
    def forDocuments(atts: DataFrame, docs: DataFrame,
        contentType: Option[String] = None): DataFrame = {
      val filtered = contentType.fold(atts)(ct => atts.filter(col("content_type") === ct))
      filtered.join(docs.select("doc_id"), Seq("doc_id"), "left_semi")
    }

    /** Per-content-type inventory: count, distinct documents, total bytes. */
    def inventory(atts: DataFrame): DataFrame = atts
      .groupBy("content_type")
      .agg(count(lit(1)).as("n_atts"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"))
  }

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
