package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Ingest readers (Jane: document upload endpoints; graft: file feeds).
  *
  * Schemas are explicit — schema inference reads the data twice and
  * guesses types per batch, both unacceptable at 100 TB. Corrupt records
  * land in `_corrupt_record` (PERMISSIVE) instead of failing the feed,
  * mirroring Jane's reject-but-continue upload semantics.
  */
object Ingest {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = true),
    StructField("_corrupt_record", StringType, nullable = true)))

  def readJsonEvents(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(eventSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .json(path)

  def readCsvEvents(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(eventSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)

  /** ORC interchange (columnar alternative store format; same schema). */
  def readOrcEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw text-line documents (one doc per line): deterministic doc ids
    * from a line fingerprint, not from partition-dependent counters
    * (`monotonically_increasing_id` would renumber on repartition).
    */
  def readTextDocs(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.text(path)
      .withColumnRenamed("value", "text")
      .filter(length(trim(col("text"))) > 0)
      .withColumn("doc_id", abs(xxhash64(col("text"))))
      .withColumn("n_chars", length(col("text")))
  }
}
