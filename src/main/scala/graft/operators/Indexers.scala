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

  /** Origin index (QuakeML-indexer analog): jane indexes EVERY origin of a
    * QuakeML event, not just one — an event carries 1..n location
    * estimates from different agencies, and the service picks a preferred
    * one (fdsnws-event `includeallorigins`). Derivation: each event gets
    * `1 + event_id % 3` origins, each a deterministic perturbation of the
    * event's base attributes. All derived columns are BIGINT (origin
    * coordinates as 1e-2 fixed-point) so they can feed JSON rendering —
    * double→string is not engine-portable, integers are.
    *
    * Scale shape: the explode is a per-row flatMap (no shuffle); the
    * preferred-origin rank in [[FdsnQuery.eventOrigins]] is one window
    * shuffle keyed by event_id — never a self-join.
    */
  object OriginIndex {
    val originIdSql = "event_id * 4 + o"
    val latE2Sql = "CAST(round(latitude * 100) AS BIGINT) + o * 25"
    val lonE2Sql = "CAST(round(longitude * 100) AS BIGINT) + o * 25"
    val depthMSql = "CAST(depth AS BIGINT) * 1000 + o * 500"
    val nPhasesSql = "(event_id * 13 + o * 29) % 50"
    val gapSql = "(event_id * 7 + o * 17) % 360"
    val agencySql = "concat('AG', cast((user_id + o) % 7 as string))"
    val otimeSparkSql = "unix_timestamp(time) + o * 60"
    val otimeDuckSql = "CAST(floor(epoch(time)) AS BIGINT) + o * 60"

    /** DuckDB CTE body over an event-index CTE named by `evCte`. */
    def oracleCte(evCte: String): String =
      s"""SELECT event_id, user_id,
         |  $originIdSql AS origin_id, $otimeDuckSql AS otime_s,
         |  $latE2Sql AS lat_e2, $lonE2Sql AS lon_e2, $depthMSql AS depth_m,
         |  $nPhasesSql AS n_phases, $gapSql AS azimuthal_gap,
         |  'AG' || CAST((user_id + o) % 7 AS VARCHAR) AS oagency
         |FROM (SELECT *, unnest(range(0, event_id % 3 + 1)) AS o FROM $evCte)""".stripMargin

    /** Event-index rows (EventIndex.attach output) → origin rows. */
    def attach(ev: DataFrame): DataFrame = ev
      .select(col("event_id"), col("user_id"), col("time"), col("latitude"),
        col("longitude"), col("depth"),
        explode(expr("sequence(0, event_id % 3)")).as("o"))
      .withColumn("origin_id", expr(originIdSql))
      .withColumn("otime_s", expr(otimeSparkSql))
      .withColumn("lat_e2", expr(latE2Sql))
      .withColumn("lon_e2", expr(lonE2Sql))
      .withColumn("depth_m", expr(depthMSql))
      .withColumn("n_phases", expr(nPhasesSql))
      .withColumn("azimuthal_gap", expr(gapSql))
      .withColumn("oagency", expr(agencySql))
      .select("event_id", "origin_id", "otime_s", "lat_e2", "lon_e2",
        "depth_m", "n_phases", "azimuthal_gap", "oagency")
  }

  /** Arrival index (QuakeML origins carry 1..n arrivals — the phase picks
    * that located the origin; fdsnws-event `includearrivals` serves them
    * under their origin). 1..3 derived arrivals per origin with phase
    * name, epicentral distance, time residual, and azimuth — the columns
    * a pick-quality query actually filters on. Builds on
    * [[OriginIndex.attach]] output rows.
    */
  object ArrivalIndex {
    val arrivalIdSql = "origin_id * 4 + a"
    val phaseSql =
      "case when (origin_id + a) % 4 = 0 then 'P' " +
        "when (origin_id + a) % 4 = 1 then 'S' " +
        "when (origin_id + a) % 4 = 2 then 'Pn' else 'Sg' end"
    val distDegE2Sql = "(origin_id * 19 + a * 31) % 18000"
    val residualE3Sql = "(origin_id * 11 + a * 17) % 2000 - 1000"
    val azimuthSql = "(origin_id * 3 + a * 7) % 360"

    def oracleCte(originCte: String): String =
      s"""SELECT event_id, origin_id, $arrivalIdSql AS arrival_id,
         |  $phaseSql AS phase, $distDegE2Sql AS dist_deg_e2,
         |  $residualE3Sql AS residual_e3, $azimuthSql AS azimuth
         |FROM (SELECT *, unnest(range(0, origin_id % 3 + 1)) AS a
         |      FROM $originCte)""".stripMargin

    def attach(origins: DataFrame): DataFrame = origins
      .select(col("event_id"), col("origin_id"),
        explode(expr("sequence(0, origin_id % 3)")).as("a"))
      .withColumn("arrival_id", expr(arrivalIdSql))
      .withColumn("phase", expr(phaseSql))
      .withColumn("dist_deg_e2", expr(distDegE2Sql))
      .withColumn("residual_e3", expr(residualE3Sql))
      .withColumn("azimuth", expr(azimuthSql))
      .select("event_id", "origin_id", "arrival_id", "phase", "dist_deg_e2",
        "residual_e3", "azimuth")
  }

  /** Magnitude index (QuakeML events carry 1..n magnitude estimates;
    * fdsnws-event `includeallmagnitudes`). `1 + event_id % 2` magnitudes
    * per event, integer-cents values, rotating magnitude type.
    */
  object MagnitudeIndex {
    val magIdSql = "event_id * 2 + m"
    val magCSql = "CAST(round(magnitude * 100) AS BIGINT) + m * 7"
    val mtypeSql =
      "case when (event_id + m) % 4 = 0 then 'mb' " +
        "when (event_id + m) % 4 = 1 then 'ms' " +
        "when (event_id + m) % 4 = 2 then 'mw' else 'ml' end"

    def oracleCte(evCte: String): String =
      s"""SELECT event_id, $magIdSql AS mag_id, $magCSql AS mag_c,
         |  $mtypeSql AS mtype
         |FROM (SELECT *, unnest(range(0, event_id % 2 + 1)) AS m FROM $evCte)""".stripMargin

    def attach(ev: DataFrame): DataFrame = ev
      .select(col("event_id"), col("magnitude"),
        explode(expr("sequence(0, event_id % 2)")).as("m"))
      .withColumn("mag_id", expr(magIdSql))
      .withColumn("mag_c", expr(magCSql))
      .withColumn("mtype", expr(mtypeSql))
      .select("event_id", "mag_id", "mag_c", "mtype")
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
        |  COUNT(*) AS n_samples,
        |  CAST(floor(epoch(MAX(ts))) AS BIGINT) + (user_id % 50) * 3600
        |    AS updated_s
        |FROM events GROUP BY user_id, event_type""".stripMargin

    // Index-row update time (fdsnws-station `updatedafter`): when the
    // channel's metadata last changed — derived from the epoch end plus a
    // deterministic per-station re-index lag, as integer epoch seconds
    // (the DuckDB spelling is inlined in oracleCte over MAX(ts)).
    val updatedSparkSql = "unix_timestamp(epoch_end) + (user_id % 50) * 3600"

    def build(events: DataFrame): DataFrame = events
      .withColumn("network", expr(networkSql))
      .withColumn("station", expr(stationSql))
      .withColumn("channel", col("event_type"))
      .groupBy("network", "station", "user_id", "channel")
      .agg(min(col("ts")).as("epoch_start"), max(col("ts")).as("epoch_end"),
        count(lit(1)).as("n_samples"))
      // functions of the user_id group key / aggregated epoch — post-agg
      // projections, no extra grouping columns in the shuffle
      .withColumn("latitude", expr(stationLatSql))
      .withColumn("longitude", expr(stationLonSql))
      .withColumn("updated_s", expr(updatedSparkSql))
  }
}
