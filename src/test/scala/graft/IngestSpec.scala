package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Ingest

class IngestSpec extends SparkSpec {

  test("json feed parses good rows and quarantines corrupt ones") {
    val dir = Files.createTempDirectory("graft_ingest_")
    Files.writeString(dir.resolve("feed.json"),
      """{"event_id":1,"ts":"2024-01-01 00:00:01","user_id":7,"event_type":"click","value":1.5,"props":"{\"k\":1}"}
        |{"event_id":2,"ts":"2024-01-01 00:00:02","user_id":8,"event_type":"view","value":2.0,"props":null}
        |this is not json at all
        |""".stripMargin)
    val df = Ingest.readJsonEvents(spark, dir.toString).cache()
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() == 1 && bad.select("event_id").head().isNullAt(0))
    val ids = df.filter(col("_corrupt_record").isNull)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L))
  }

  test("orc round-trips events losslessly") {
    val dir = Files.createTempDirectory("graft_orc_").toString
    val events = Tables.events(spark, sfDir)
    events.write.mode("overwrite").orc(dir)
    val back = Ingest.readOrcEvents(spark, dir)
    assert(back.count() == events.count())
    val a = events.agg(sum(expr("CAST(round(value*100) AS BIGINT)"))).head().getLong(0)
    val b = back.agg(sum(expr("CAST(round(value*100) AS BIGINT)"))).head().getLong(0)
    assert(a == b)
  }

  test("text-line docs get deterministic ids and skip blank lines") {
    val dir = Files.createTempDirectory("graft_text_")
    Files.writeString(dir.resolve("docs.txt"), "first doc\n\nsecond doc\n")
    val d1 = Ingest.readTextDocs(spark, dir.toString).collect()
    val d2 = Ingest.readTextDocs(spark, dir.toString).collect()
    assert(d1.length == 2)
    assert(d1.map(_.getAs[Long]("doc_id")).toSet ==
      d2.map(_.getAs[Long]("doc_id")).toSet) // stable across reads
  }

  test("csv feed round-trips the same schema") {
    val dir = Files.createTempDirectory("graft_ingest_csv_")
    Files.writeString(dir.resolve("feed.csv"),
      """event_id,ts,user_id,event_type,value,props
        |5,2024-01-02 10:00:00,9,purchase,42.25,
        |6,2024-01-02 10:00:05,9,click,0.5,
        |""".stripMargin)
    val df = Ingest.readCsvEvents(spark, dir.toString).cache()
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
    val r = df.filter(col("event_id") === 5).head()
    assert(r.getAs[String]("event_type") == "purchase")
    assert(r.getAs[Double]("value") == 42.25)
  }
}
