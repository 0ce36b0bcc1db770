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

  /** XML event documents (r19 — jane's REAL upload formats are QuakeML /
    * StationXML, i.e. XML documents per event or station epoch; Spark
    * 4.1 ships the XML source natively in spark-sql, so this is the one
    * reader arm the environment previously could not cover). One
    * `<event>` element per row inside per-file `<feed>` documents
    * (`ParquetStore.installOverwriteXml` — the per-file root is
    * load-bearing, see its Scaladoc). PERMISSIVE semantics as measured
    * on this reader (ProbeXml r19): a rejected element keeps every
    * field that parsed (the typed columns are the triage path) and
    * `_corrupt_record` carries the enclosing FILE document rather than
    * the single element — reject-but-continue like the CSV/JSON arms,
    * with element-granular routing and file-granular raw preservation.
    * Schema explicit as everywhere (inference double-reads the feed).
    * The `props` column is absent from the XML feed shape: QuakeML
    * attachments travel as separate documents, not inline fields.
    */
  val xmlEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("_corrupt_record", StringType, nullable = true)))

  def readXmlEvents(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(xmlEventSchema)
      .option("rowTag", "event")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .xml(path)

  /** Nested QuakeML-shaped event documents (r20 — the indexer loop's
    * PARSE half, closing what j32/j24 only rendered): one `<event>`
    * element per event carrying its preferred-origin/-magnitude POINTERS
    * plus repeated nested `<origin>`/`<magnitude>` child elements —
    * exactly the document shape jane's QuakeML indexer plugin receives
    * and flattens into index rows (reference: krischer/jane
    * `src/jane/quakeml/plugins.py` index_documents — each document
    * yields one index row per origin/magnitude with the preferred ids
    * resolved). The Spark 4.1 native source maps an `ArrayType(Struct)`
    * field to repeated elements of the FIELD NAME and preserves
    * DOCUMENT order in the parsed array (measured r20: a deliberately
    * non-monotonic element order reads back position-exact —
    * NewQueriesR20Spec pins it), so array position is a faithful
    * document coordinate the roundtrip oracle can check. Scalars are
    * the index's fixed-point BIGINTs (1e-2 deg, m, centi-mag) — the
    * same engine-portable integer-to-string rule every render query
    * uses. Explicit schema as everywhere (inference double-reads);
    * no corrupt-record column — the quarantine lifecycle is j49's,
    * this arm proves the nested PARSE, and an unparseable field would
    * null out and fail the hash check anyway.
    */
  val quakemlDocSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("pref_oid", LongType, nullable = false),
    StructField("pref_mid", LongType, nullable = false),
    StructField("origin", ArrayType(StructType(Seq(
      StructField("origin_id", LongType, nullable = false),
      StructField("otime_s", LongType, nullable = false),
      StructField("lat_e2", LongType, nullable = false),
      StructField("lon_e2", LongType, nullable = false),
      StructField("depth_m", LongType, nullable = false),
      StructField("n_phases", LongType, nullable = false),
      StructField("azimuthal_gap", LongType, nullable = false)))),
      nullable = false),
    StructField("magnitude", ArrayType(StructType(Seq(
      StructField("mag_id", LongType, nullable = false),
      StructField("mag_c", LongType, nullable = false),
      StructField("mtype", StringType, nullable = false)))),
      nullable = false)))

  def readEventXmlDocs(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(quakemlDocSchema)
      .option("rowTag", "event")
      .xml(path)

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
