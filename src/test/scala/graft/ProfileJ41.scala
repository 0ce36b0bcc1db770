package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for j41 stage costs (test scope, not shipped). */
object ProfileJ41 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = graft.operators.Indexers.EventIndex
      .attach(Tables.events(spark, d))
      .select(col("event_id"), col("agency"),
        expr("CAST(round(magnitude * 100) AS BIGINT)").as("mag_c"),
        unix_timestamp(col("time")).as("sec"),
        col("latitude"), col("longitude"))
    time("events scan")(e.write.format("noop").mode("overwrite").save())
    val a = e.select(col("event_id").as("aid"), col("agency").as("aag"),
      col("mag_c").as("amag"), col("sec").as("asec"),
      col("latitude").as("elat"), col("longitude").as("elon"))
    val sinHalf = math.sin(1000.0 / (2 * graft.functions.GeoFunctions.EarthRadiusKm))
    val cand = a
      .withColumn("bkt",
        explode(expr("sequence(asec div 1800 - 1, asec div 1800 + 1)")))
      .withColumn("cl", explode(expr(
        "sequence(greatest(-9, CAST(floor((elat - 9.0) / 10) AS INT)), " +
          "least(8, CAST(floor((elat + 9.0) / 10) AS INT)))")))
      .withColumn("denom", expr(
        "cos(radians(elat)) * cos(radians(least(greatest(abs(cl * 10.0), " +
          "abs(cl * 10.0 + 10.0)), 90.0)))"))
      .withColumn("wl", expr(
        s"CASE WHEN denom <= 1e-12 THEN 180.0 ELSE " +
          s"least(180.0, degrees(2 * asin(least(1.0, $sinHalf / sqrt(denom))))) END"))
      .withColumn("cg", explode(expr(
        "array_distinct(transform(" +
          "sequence(CAST(floor((elon - wl) / 10) AS INT), " +
          "CAST(floor((elon + wl) / 10) AS INT)), " +
          "x -> ((x + 18) % 36 + 36) % 36 - 18))")))
      .select("aid", "aag", "amag", "asec", "elat", "elon", "bkt", "cl", "cg")
    println("[prof] exploded rows: " + time("explode count")(cand.count()))
    val b = e
      .select(col("event_id").as("bid"), col("agency").as("bag"),
        col("mag_c").as("bmag"), col("sec").as("bsec"),
        col("latitude").as("alat"), col("longitude").as("alon"))
      .withColumn("bbkt", expr("bsec div 1800"))
      .withColumn("bcl", expr("least(8, CAST(floor(alat / 10) AS INT))"))
      .withColumn("bcg", expr(
        "((CAST(floor(alon / 10) AS INT) + 18) % 36 + 36) % 36 - 18"))
    val distSql = graft.functions.GeoFunctions
      .haversineKmSql("elat", "elon", "alat", "alon")
    val joined = cand.join(b, col("bkt") === col("bbkt") &&
        col("cl") === col("bcl") && col("cg") === col("bcg"))
    println("[prof] candidate pairs: " + time("join count")(joined.count()))
    val out = joined
      .filter(col("aid") < col("bid") && col("aag") =!= col("bag") &&
        abs(col("bsec") - col("asec")) <= 1800 &&
        abs(col("alat") - col("elat")) <= 9.0 && expr(distSql) <= 1000.0)
    println("[prof] result rows: " + time("full filter count")(out.count()))
    time("full query rep1")(SparkEntry.queries("j41_catalog_merge")(spark, d)
      .write.format("noop").mode("overwrite").save())
    time("full query rep2")(SparkEntry.queries("j41_catalog_merge")(spark, d)
      .write.format("noop").mode("overwrite").save())
    SparkEntry.queries("j41_catalog_merge")(spark, d).explain("formatted")
    spark.stop()
  }
}
