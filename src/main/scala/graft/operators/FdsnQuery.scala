package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions

/** FDSN web-service query compilation (Jane: fdsnws-event / fdsnws-station).
  *
  * Jane translates FDSN HTTP query params into a Django ORM / PostGIS query
  * over its index tables; graft translates the same param surface into one
  * Catalyst predicate + sort + limit over an index DataFrame. Because the
  * result is a single declarative plan, parquet pushdown and partition
  * pruning apply to every parameter for free — at 100 TB the time/bbox
  * params become scan-pruning, not post-filters.
  */
object FdsnQuery {

  /** FDSN wildcards: `*` = any run, `?` = one char (fdsnws-station
    * network/station/location/channel params). Translated to SQL LIKE with
    * LIKE-metacharacter escaping.
    */
  def fdsnWildcardToLike(pattern: String): String =
    pattern.flatMap {
      case '*'  => "%"
      case '?'  => "_"
      case '%'  => "\\%"
      case '_'  => "\\_"
      case '\\' => "\\\\"
      case c    => c.toString
    }

  def matchesFdsn(c: Column, pattern: String): Column =
    c.like(fdsnWildcardToLike(pattern))

  /** fdsnws-event query parameters (public FDSN spec surface). */
  final case class EventParams(
      starttime: Option[String] = None,
      endtime: Option[String] = None,
      minLatitude: Option[Double] = None,
      maxLatitude: Option[Double] = None,
      minLongitude: Option[Double] = None,
      maxLongitude: Option[Double] = None,
      latitude: Option[Double] = None,
      longitude: Option[Double] = None,
      minRadiusKm: Option[Double] = None,
      maxRadiusKm: Option[Double] = None,
      minDepth: Option[Double] = None,
      maxDepth: Option[Double] = None,
      minMagnitude: Option[Double] = None,
      maxMagnitude: Option[Double] = None,
      orderBy: String = "time", // time | time-asc | magnitude | magnitude-asc
      limit: Option[Int] = None,
      offset: Option[Int] = None)

  /** Compile event params over an event-index DataFrame with columns
    * `time: timestamp, latitude, longitude, depth, magnitude` (+ id cols).
    */
  def events(index: DataFrame, p: EventParams): DataFrame = {
    val preds = Seq(
      p.starttime.map(t => col("time") >= lit(t).cast("timestamp")),
      p.endtime.map(t => col("time") <= lit(t).cast("timestamp")),
      p.minLatitude.map(col("latitude") >= _),
      p.maxLatitude.map(col("latitude") <= _),
      p.minLongitude.map(col("longitude") >= _),
      p.maxLongitude.map(col("longitude") <= _),
      p.minDepth.map(col("depth") >= _),
      p.maxDepth.map(col("depth") <= _),
      p.minMagnitude.map(col("magnitude") >= _),
      p.maxMagnitude.map(col("magnitude") <= _)
    ).flatten ++ (for {
      lat <- p.latitude; lon <- p.longitude
    } yield GeoFunctions.inRadiusKm(col("latitude"), col("longitude"), lat, lon,
      p.minRadiusKm.getOrElse(0.0), p.maxRadiusKm.getOrElse(20037.5)))

    val filtered = preds.foldLeft(index)(_ filter _)
    val sorted = p.orderBy match {
      // event id as deterministic tie-break, matching Jane's stable paging
      case "time"          => filtered.orderBy(col("time").desc, col("event_id").asc)
      case "time-asc"      => filtered.orderBy(col("time").asc, col("event_id").asc)
      case "magnitude"     => filtered.orderBy(col("magnitude").desc, col("event_id").asc)
      case "magnitude-asc" => filtered.orderBy(col("magnitude").asc, col("event_id").asc)
      case other => throw new IllegalArgumentException(s"orderby: $other")
    }
    val paged = p.offset.fold(sorted)(sorted.offset)
    p.limit.fold(paged)(paged.limit)
  }

  /** fdsnws-station epoch parameters (subset: epoch + wildcard surface). */
  final case class StationParams(
      network: Option[String] = None,
      station: Option[String] = None,
      channel: Option[String] = None,
      startBefore: Option[String] = None,
      startAfter: Option[String] = None,
      endBefore: Option[String] = None,
      endAfter: Option[String] = None,
      // epoch must overlap [starttime, endtime]
      starttime: Option[String] = None,
      endtime: Option[String] = None)

  /** Compile station params over a channel-epoch DataFrame with columns
    * `network, station, channel, epoch_start, epoch_end`.
    */
  def channels(index: DataFrame, p: StationParams): DataFrame = {
    def ts(s: String): Column = lit(s).cast("timestamp")
    val preds = Seq(
      p.network.map(matchesFdsn(col("network"), _)),
      p.station.map(matchesFdsn(col("station"), _)),
      p.channel.map(matchesFdsn(col("channel"), _)),
      p.startBefore.map(col("epoch_start") < ts(_)),
      p.startAfter.map(col("epoch_start") > ts(_)),
      p.endBefore.map(col("epoch_end") < ts(_)),
      p.endAfter.map(col("epoch_end") > ts(_)),
      p.starttime.map(col("epoch_end") >= ts(_)),
      p.endtime.map(col("epoch_start") <= ts(_))
    ).flatten
    preds.foldLeft(index)(_ filter _)
  }
}
