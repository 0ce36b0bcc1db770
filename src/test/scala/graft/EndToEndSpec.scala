package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, FdsnQuery, Indexers}
import graft.sources.{Ingest, ParquetStore}

/** The "switch from Jane" narrative in one flow: upload feed → indexer
  * plugin → FDSN query → near-dup scan → partitioned store.
  */
class EndToEndSpec extends SparkSpec {

  test("ingest -> index -> query -> dedup -> store") {
    // 1. upload: a JSON feed lands (with one corrupt record rejected)
    val feed = Files.createTempDirectory("graft_e2e_")
    Files.writeString(feed.resolve("u.json"),
      """{"event_id":1,"ts":"2024-03-01 00:00:00","user_id":1,"event_type":"click","value":120.0,"props":"{\"k\":1}"}
        |{"event_id":2,"ts":"2024-03-01 00:05:00","user_id":1,"event_type":"purchase","value":400.0,"props":"{\"k\":2}"}
        |{"event_id":3,"ts":"2024-03-02 09:00:00","user_id":2,"event_type":"view","value":10.0,"props":"{\"k\":3}"}
        |garbage line
        |""".stripMargin)
    val uploaded = Ingest.readJsonEvents(spark, feed.toString).cache()
    val accepted = uploaded.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    assert(accepted.count() == 3)

    // 2. index: the event plugin derives queryable attributes
    val index = Indexers.plugins("event").extract(accepted)
    assert(index.columns.contains("magnitude") && index.columns.contains("latitude"))

    // 3. query: FDSN-style search over the fresh index
    val hits = FdsnQuery.events(index, FdsnQuery.EventParams(
      starttime = Some("2024-03-01"), minMagnitude = Some(2.0),
      orderBy = "magnitude", limit = Some(10)))
    assert(hits.count() == 2) // value 120 and 400 => mag 2.4, 8.0

    // 4. store: day-partitioned write, pruned read-back
    val store = Files.createTempDirectory("graft_e2e_store_").toString
    ParquetStore.writeDayPartitioned(accepted, "ts", store)
    val day1 = ParquetStore.read(spark, store).filter(col("p_day") === "2024-03-01")
    assert(day1.count() == 2)

    // 5. dedup: the corpus-side pipeline accepts the same shape
    import spark.implicits._
    val docs = Seq((10L, "the quick brown fox jumps over the lazy dog", 43),
      (11L, "the quick brown fox jumps over the lazy dog", 43),
      (12L, "completely different text with other content here", 49))
      .toDF("doc_id", "text", "n_chars")
    val pairs = Dedup.minHashLshPairs(docs, k = 16, bands = 2)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L)))
  }
}
