package graft

/** r12 addition: j44_store_maintenance card invariants (the DuckDB hash
  * oracle is the cross-engine replay; these pin the structural claims
  * the card makes regardless of data — in particular that the
  * `03_compacted` row, computed FROM the post-swap store read, is
  * content-identical to the pre-compact vacuumed set).
  */
class NewQueriesR12Spec extends SparkSpec {

  test("j44 maintenance card: upsert is in-place, compact is content-identical") {
    import spark.implicits._
    val card = SparkEntry.queries("j44_store_maintenance")(spark, sfDir)
      .select("stage", "n_rows", "n_groups", "checksum")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(card.map(_._1) ==
      Seq("00_raw", "01_upserted", "02_vacuumed", "03_compacted"))
    val Seq(raw, up, vac, comp) = card
    // upsert replaces in place: same keys, same groups, revised content
    assert(up._2 == raw._2 && up._3 == raw._3)
    assert(up._4 != raw._4, "revision batch must change the checksum")
    // vacuum keeps <= 2 versions per surviving group and reaps groups
    assert(vac._2 <= 2 * vac._3)
    assert(vac._2 < up._2 && vac._3 < up._3,
      "sf0.001 derives both prunable versions and tombstoned groups")
    // compact (read back from the post-swap store) is pure layout:
    // row/group/checksum identical to the vacuumed content
    assert(comp == vac.copy(_1 = "03_compacted"),
      s"compact changed content: $vac vs $comp")
  }

  test("j45 quarantine is reject-but-continue: routing exact, raw line preserved") {
    import org.apache.spark.sql.functions.{col, sum}
    val card = SparkEntry.queries("j45_ingest_quarantine")(spark, sfDir)
      .collect()
    val quar = card.filter(_.getString(0) == "__quarantined__")
    assert(quar.length == 1 && quar(0).getLong(1) > 0,
      "the % 13 rule must quarantine some rows at sf0.001")
    // nothing is dropped: good + quarantined partition the corpus
    val events = Tables.events(spark, sfDir)
    assert(card.map(_.getLong(1)).sum == events.count())
    // triage recovered every rejected id from the raw line text
    val expect = events.filter(col("event_id") % 13 === 0)
      .agg(sum(col("event_id"))).head.getLong(0)
    assert(quar(0).getLong(2) == expect, "recovered-id checksum mismatch")
    // PERMISSIVE shape: a rejected row keeps its raw line, typed field null
    val raw = graft.sources.Ingest.readCsvEvents(spark,
      s"/tmp/graft_stores/ingest_feed_${new java.io.File(sfDir).getName}")
      .select(col("value"), col("_corrupt_record")).localCheckpoint()
    assert(raw.filter(col("_corrupt_record").isNotNull &&
      col("value").isNotNull).count() == 0)
  }

  test("q45 serves from the co-bucketed stores: zero-Exchange join, no corpus rescan") {
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled")
    val bjt = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge shape the 100 TB claim is about
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val card = SparkEntry.queries("q45_bucketed_join_serve")(spark, sfDir)
      // the returned (serve) plan reads ONLY the bucketed stores — the
      // raw tables are touched at build time, never at serve time
      val scans = card.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("FileScan")).mkString("\n")
      assert(scans.contains("bucketed_sf0_001"), s"serve must read the store:\n$scans")
      assert(!scans.contains("testdata"), s"serve must not rescan the corpus:\n$scans")
      // the fact-fact join itself moves nothing: the only Exchanges in
      // the whole card are the 5-row priority rollup's (+ its sort)
      import org.apache.spark.sql.functions.col
      val join = spark.table("lineitem_bkt_sf0_001")
        .join(spark.table("orders_bkt_sf0_001"),
          col("l_orderkey") === col("o_orderkey"))
      val jp = join.queryExecution.executedPlan.toString
      assert(!jp.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$jp")
      // and the store answers the same rows as the logical join
      assert(card.count() == 5)
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", bjt)
    }
  }
}
