package graft

import org.apache.spark.sql.functions._

import graft.operators.FdsnQuery
import graft.operators.FdsnQuery.{EventParams, StationParams}
import graft.operators.Indexers.{ChannelIndex, EventIndex}

/** FDSN parameter-surface behavior on the event/channel indices. */
class FdsnQuerySpec extends SparkSpec {

  private lazy val index = EventIndex.attach(Tables.events(spark, sfDir)).cache()

  test("radius params select a strict subset of the bounding circle's box") {
    val ring = FdsnQuery.events(index, EventParams(
      latitude = Some(10.5), longitude = Some(45.5),
      minRadiusKm = Some(500.0), maxRadiusKm = Some(3000.0)))
    val n = ring.count()
    assert(n > 0)
    // every hit is within the ring per the reference haversine
    val bad = ring.withColumn("d", graft.functions.GeoFunctions.haversineKm(
        lit(10.5), lit(45.5), col("latitude"), col("longitude")))
      .filter(col("d") < 500.0 || col("d") > 3000.0).count()
    assert(bad == 0)
  }

  test("orderby + limit + offset page deterministically") {
    val p1 = FdsnQuery.events(index, EventParams(
      minMagnitude = Some(2.0), orderBy = "magnitude", limit = Some(5)))
      .select("event_id").collect().map(_.getLong(0)).toSeq
    val p2 = FdsnQuery.events(index, EventParams(
      minMagnitude = Some(2.0), orderBy = "magnitude", limit = Some(5),
      offset = Some(5)))
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(p1.size == 5 && p2.size == 5)
    assert((p1.toSet & p2.toSet).isEmpty, "pages must not overlap")
    val all = FdsnQuery.events(index, EventParams(
      minMagnitude = Some(2.0), orderBy = "magnitude", limit = Some(10)))
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(all == p1 ++ p2, "offset paging must tile the full ordering")
  }

  test("unknown orderby is rejected") {
    intercept[IllegalArgumentException] {
      FdsnQuery.events(index, EventParams(orderBy = "depth"))
    }
  }

  test("station epoch window params compose") {
    val channels = ChannelIndex.build(Tables.events(spark, sfDir))
    val hits = FdsnQuery.channels(channels, StationParams(
      network = Some("N?"), channel = Some("click"),
      starttime = Some("2024-01-10"), endtime = Some("2024-01-20")))
    assert(hits.count() > 0)
    assert(hits.filter(col("channel") =!= "click").count() == 0)
  }
}
