package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK

class TopKSpec extends SparkSpec {

  test("map-side pruned top-k equals the window row_number form") {
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"))
      .repartition(7) // several partitions so phase-1 pruning actually runs
    val got = TopK.perKey(events, Seq("user_id"), "value", "event_id", 3)
      .select("user_id", "event_id", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id").asc)
    val want = events.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("user_id", "event_id", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(got == want)
    assert(got.nonEmpty)
  }

  test("ties on score are broken by the tie column, matching the window") {
    import spark.implicits._
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 9.0))
      .toDF("k", "id", "score").repartition(3)
    val got = TopK.perKey(df, Seq("k"), "score", "id", 2)
      .select("id", "rn").as[(Long, Long)].collect().toSet
    assert(got == Set((13L, 1L), (10L, 2L))) // 9.0 first, then lowest id among 5.0s
  }
}
