package graft

/** r13 addition: j46_ingest_json_quarantine — the JSON arm of the
  * reject-but-continue ingest family (the DuckDB hash oracle is the
  * cross-engine replay; these pin the reader-path claims the oracle
  * cannot see: that the reject is the MALFORMED-document path, that
  * the raw broken line is preserved, and that triage recovers every
  * rejected id from the raw text).
  */
class NewQueriesR13Spec extends SparkSpec {

  test("j46 JSON quarantine: structural reject routing exact, raw line preserved") {
    import org.apache.spark.sql.functions.{col, sum}
    val card = SparkEntry.queries("j46_ingest_json_quarantine")(spark, sfDir)
      .collect()
    val quar = card.filter(_.getString(0) == "__quarantined__")
    assert(quar.length == 1 && quar(0).getLong(1) > 0,
      "the % 17 rule must quarantine some rows at sf0.001")
    // nothing is dropped: good + quarantined partition the corpus
    val events = Tables.events(spark, sfDir)
    assert(card.map(_.getLong(1)).sum == events.count())
    // triage recovered every rejected id from the broken line's text
    val expect = events.filter(col("event_id") % 17 === 0)
      .agg(sum(col("event_id"))).head.getLong(0)
    assert(quar(0).getLong(2) == expect, "recovered-id checksum mismatch")
    // PERMISSIVE shape on the MALFORMED path: a rejected row keeps its
    // raw (brace-less) line and parses no typed field; a kept row
    // parses every field (the feed renders none as JSON null)
    val raw = graft.sources.Ingest.readJsonEvents(spark,
      s"/tmp/graft_stores/ingest_feed_json_${new java.io.File(sfDir).getName}")
      .select(col("event_id"), col("value"), col("_corrupt_record"))
      .localCheckpoint()
    assert(raw.filter(col("_corrupt_record").isNotNull &&
      (col("value").isNotNull || col("event_id").isNotNull)).count() == 0)
    assert(raw.filter(col("_corrupt_record").isNotNull &&
      !col("_corrupt_record").startsWith("{")).count() == 0,
      "the raw rejected line must be the rendered (truncated) JSON text")
    assert(raw.filter(col("_corrupt_record").isNull &&
      (col("value").isNull || col("event_id").isNull)).count() == 0)
  }
}
