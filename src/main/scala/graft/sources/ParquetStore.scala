package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Index-store layout (Jane: PostgreSQL tables; graft: partitioned parquet).
  *
  * The store is written day-partitioned on event time so FDSN time-window
  * params become directory-level partition pruning at 100 TB — the scan
  * never lists, let alone reads, out-of-window days. Bucketing on the key
  * columns (saveAsTable path) additionally co-locates the frequent joins.
  */
object ParquetStore {

  /** Write `df` partitioned by the calendar day of `tsCol`. */
  def writeDayPartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_day", to_date(col(tsCol)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("p_day")
      .parquet(path)

  /** Read back; time predicates on `p_day` prune partitions at planning. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write a table bucketed (and sorted) on its join key. Two tables
    * bucketed the same way join with NO shuffle on either side — at 100 TB
    * the lineitem⋈orders join becomes a per-bucket sort-merge with zero
    * network movement, paid once at write time instead of per query.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
