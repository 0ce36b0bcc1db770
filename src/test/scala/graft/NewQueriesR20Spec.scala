package graft

/** r20 addition: j50_quakeml_roundtrip — the nested-schema XML PARSE
  * closing jane's indexer loop (QuakeML documents in → index rows out;
  * j24/j32 only ever rendered the nested shape). The DuckDB oracle
  * replays the index derivation over parquet, so these pin exactly what
  * the oracle cannot see: that the native XML source preserves nested
  * element ORDER (the load-bearing measured fact behind using array
  * position as a document coordinate), that the parsed documents equal
  * the pre-write structured frames field-for-field, and that the serve
  * path reads ONLY the document store — never the parquet corpus.
  */
class NewQueriesR20Spec extends SparkSpec {

  test("nested XML arrays round-trip order-exactly (non-monotonic order preserved)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // DELIBERATELY non-monotonic element order: if the reader sorted,
    // hashed, or otherwise re-ordered repeated elements, this pin —
    // not an accidentally-sorted production write — is what fails.
    val df = Seq(
      (1L, 9L, 5L, Seq(9L, 4L, 7L), Seq(5L, 2L)),
      (2L, 8L, 6L, Seq(8L), Seq(6L, 3L, 1L)))
      .toDF("event_id", "pref_oid", "pref_mid", "oids", "mids")
      .withColumn("origin", expr("transform(oids, (x, i) -> named_struct(" +
        "'origin_id', x, 'otime_s', x * 60L, 'lat_e2', x * 100L, " +
        "'lon_e2', x * 200L, 'depth_m', x * 500L, 'n_phases', x % 50L, " +
        "'azimuthal_gap', x % 360L))"))
      .withColumn("magnitude", expr("transform(mids, x -> named_struct(" +
        "'mag_id', x, 'mag_c', 600L + x, 'mtype', " +
        "CASE WHEN x % 2 = 0 THEN 'mw' ELSE 'mb' END))"))
      .select("event_id", "pref_oid", "pref_mid", "origin", "magnitude")
    val path = "/tmp/graft_stores/quakeml_order_pin"
    graft.sources.ParquetStore.installOverwriteXml(df, path, "event", "quakeml")
    val back = graft.sources.Ingest.readEventXmlDocs(spark, path)
    val got = back.orderBy("event_id")
      .select(col("event_id"),
        expr("transform(origin, x -> x.origin_id)").as("oids"),
        expr("transform(magnitude, x -> x.mag_id)").as("mids"))
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(got(0).getSeq[Long](1) == Seq(9L, 4L, 7L),
      "origin element order must survive the write+parse verbatim")
    assert(got(0).getSeq[Long](2) == Seq(5L, 2L))
    assert(got(1).getSeq[Long](1) == Seq(8L))
    assert(got(1).getSeq[Long](2) == Seq(6L, 3L, 1L),
      "magnitude element order must survive the write+parse verbatim")
    // and every nested field round-trips, not just the ids
    val diff = back.exceptAll(df).count() + df.exceptAll(back).count()
    assert(diff == 0, "parsed documents must equal the written frames exactly")
  }

  test("j50: parsed store equals the builder's structured frames exactly") {
    import org.apache.spark.sql.functions.col
    // run the query once so the store exists (buildIfStale inside)
    assert(SparkEntry.queries("j50_quakeml_roundtrip")(spark, sfDir)
      .collect().length > 0)
    val docs = graft.queries.JaneQueries.quakemlDocs(spark, sfDir)
    val back = graft.sources.Ingest.readEventXmlDocs(spark,
      graft.queries.JaneQueries.quakemlStorePath(sfDir))
    assert(back.count() == docs.count())
    val diff = back.exceptAll(docs).count() + docs.exceptAll(back).count()
    assert(diff == 0,
      "XML-parsed documents must equal the parquet-derived frames — " +
        "pointers, nested arrays, and scalars alike")
  }

  test("j50: flatten semantics — one preferred origin per event, positions dense") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("j50_quakeml_roundtrip")(spark, sfDir)
      .localCheckpoint()
    // exactly one preferred origin per event (the pointer resolved)
    val badPref = out.groupBy("event_id")
      .agg(sum(col("is_preferred")).as("np"))
      .filter(col("np") =!= 1L).count()
    assert(badPref == 0, "each event must resolve exactly one preferred origin")
    // positions are dense 0..n-1 in origin_id order (document order ==
    // the writer's sort — the oracle's row_number replay relies on it)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id").orderBy("origin_id")
    val badPos = out
      .withColumn("rk", row_number().over(w).cast("long") - 1L)
      .filter(col("rk") =!= col("pos")).count()
    assert(badPos == 0, "array position must equal the origin_id rank")
    // 1 + event_id % 3 origins per event — the flatten lost nothing
    val badN = out.groupBy("event_id").agg(count(lit(1)).as("n"))
      .filter(col("n") =!= (col("event_id") % 3 + 1)).count()
    assert(badN == 0)
  }

  test("j50 serve: the returned plan reads the XML store, never the parquet corpus") {
    // store-build runs inside the closure; the RETURNED frame is the
    // serve and must not rescan events.parquet (the d31/q36 serving-
    // split discipline, here for the document store)
    val plan = SparkEntry.queries("j50_quakeml_roundtrip")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("events.parquet"),
      "the serve plan must read only the quakeml document store")
    assert(plan.contains("quakeml_docs_"),
      "the serve plan must scan the persisted XML store")
  }
}
