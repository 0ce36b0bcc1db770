package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Indexer-plugin analogs (Jane: per-document-type indexer plugins that
  * extract queryable attributes from uploaded QuakeML/StationXML into index
  * tables).
  *
  * The driver's synthetic `events` table lacks geographic/seismological
  * columns, so the "extracted" attributes are derived deterministically
  * from existing columns. Each derivation is ONE SQL text constant used by
  * both the Spark plan (`expr`) and the DuckDB oracle (spliced into a CTE)
  * — bit-identical by construction (SURVEY.md §4).
  */
object Indexers {

  /** Indexer plugin contract (Jane: one plugin per document type, each
    * producing queryable index rows from raw documents). Implementations
    * must be pure DataFrame transforms so extraction runs as ordinary
    * distributed jobs and re-indexing is just re-running the plugin.
    */
  trait IndexerPlugin {
    /** Document type this plugin indexes (Jane: "quakeml", "stationxml"). */
    def documentType: String
    /** Raw document table → index table. */
    def extract(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame
  }

  /** Plugin registry, keyed by document type. */
  val plugins: Map[String, IndexerPlugin] = Seq(
    new IndexerPlugin {
      val documentType = "event"
      def extract(docs: DataFrame): DataFrame = EventIndex.attach(docs)
    },
    new IndexerPlugin {
      val documentType = "channel"
      def extract(docs: DataFrame): DataFrame = ChannelIndex.build(docs)
    }).map(p => p.documentType -> p).toMap

  /** Event index attribute derivations (QuakeML-indexer analog). The
    * catalog-provenance attributes (agency/contributor/magnitude_type —
    * every fdsnws-event federation client filters on these) and the
    * update-time column behind `updatedafter` are likewise derived
    * deterministically; each derivation is one engine-portable SQL text.
    */
  object EventIndex {
    // CAST AS DOUBLE matters for speed, not value: without it the +0.5
    // literal makes lat/lon DECIMAL and every geo predicate (notably
    // j14's ray cast) evaluates in BigDecimal — measured 2.1 s vs 0.9 s
    // at sf0.1. All values are x.5 — exactly representable, so both
    // engines still agree bit-for-bit.
    val latitudeSql = "CAST(((user_id * 37) % 180) - 90 AS DOUBLE) + 0.5"
    val longitudeSql = "CAST(((event_id * 53) % 360) - 180 AS DOUBLE) + 0.5"
    val depthSql = "CAST(event_id % 700 AS DOUBLE)"
    val magnitudeSql = "value / 50.0"
    val agencySql = "concat('AG', cast(user_id % 7 as string))"
    val contributorSql = "concat('C', cast(event_id % 5 as string))"
    val magnitudeTypeSql =
      "case when event_id % 4 = 0 then 'mb' when event_id % 4 = 1 then 'ms' " +
        "when event_id % 4 = 2 then 'mw' else 'ml' end"
    /** Upload/update time as epoch seconds (timestamp arithmetic spellings
      * differ across engines; integer seconds don't).
      */
    val updatedSparkSql = "unix_timestamp(ts) + (event_id % 97) * 3600"
    val updatedDuckSql = "CAST(floor(epoch(ts)) AS BIGINT) + (event_id % 97) * 3600"

    /** DuckDB CTE body over raw `events` producing the same index. */
    val oracleCte: String =
      s"""SELECT event_id, ts AS time, user_id, event_type, value,
         |  $latitudeSql AS latitude, $longitudeSql AS longitude,
         |  $depthSql AS depth, $magnitudeSql AS magnitude,
         |  $agencySql AS agency, $contributorSql AS contributor,
         |  $magnitudeTypeSql AS magnitude_type,
         |  $updatedDuckSql AS updated_s
         |FROM events""".stripMargin

    def attach(events: DataFrame): DataFrame = events
      .withColumn("time", col("ts"))
      .withColumn("latitude", expr(latitudeSql))
      .withColumn("longitude", expr(longitudeSql))
      .withColumn("depth", expr(depthSql))
      .withColumn("magnitude", expr(magnitudeSql))
      .withColumn("agency", expr(agencySql))
      .withColumn("contributor", expr(contributorSql))
      .withColumn("magnitude_type", expr(magnitudeTypeSql))
      .withColumn("updated_s", expr(updatedSparkSql))
  }

  /** Channel-epoch index (StationXML-indexer analog): one row per
    * (station, channel) with its observed epoch. Aggregation is a single
    * shuffle on the composite key — at 100 TB this is the map-side-combined
    * groupBy that builds the station index table.
    */
  object ChannelIndex {
    val networkSql = "concat('N', cast(user_id % 10 as string))"
    val stationSql = "concat('ST', cast(user_id as string))"
    // Station site coordinates (StationXML <Latitude>/<Longitude>): constant
    // per station = a function of user_id alone. Same x.5 exactly-
    // representable-DOUBLE convention as EventIndex (see comment there).
    val stationLatSql = "CAST(((user_id * 31) % 180) - 90 AS DOUBLE) + 0.5"
    val stationLonSql = "CAST(((user_id * 73) % 360) - 180 AS DOUBLE) + 0.5"

    /** DuckDB equivalent (VARCHAR cast spelling differs, same value). */
    val oracleCte: String =
      s"""SELECT 'N' || CAST(user_id % 10 AS VARCHAR) AS network,
        |  'ST' || CAST(user_id AS VARCHAR) AS station,
        |  user_id, event_type AS channel,
        |  $stationLatSql AS latitude, $stationLonSql AS longitude,
        |  MIN(ts) AS epoch_start, MAX(ts) AS epoch_end,
        |  COUNT(*) AS n_samples
        |FROM events GROUP BY user_id, event_type""".stripMargin

    def build(events: DataFrame): DataFrame = events
      .withColumn("network", expr(networkSql))
      .withColumn("station", expr(stationSql))
      .withColumn("channel", col("event_type"))
      .groupBy("network", "station", "user_id", "channel")
      .agg(min(col("ts")).as("epoch_start"), max(col("ts")).as("epoch_end"),
        count(lit(1)).as("n_samples"))
      // functions of the user_id group key — post-agg projection, no extra
      // grouping columns in the shuffle
      .withColumn("latitude", expr(stationLatSql))
      .withColumn("longitude", expr(stationLonSql))
  }
}
