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
    // ONE path symbol with the query builder (r13 verdict item 4): a
    // store rename in JaneQueries can no longer silently point these
    // asserts at a stale feed directory
    val raw = graft.sources.Ingest.readJsonEvents(spark,
      graft.queries.JaneQueries.jsonFeedPath(sfDir))
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

  test("j47 serves the snapshot via PARTITION PRUNING: 4 of 8 day dirs, no corpus rescan") {
    import org.apache.spark.sql.functions.col
    val df = SparkEntry.queries("j47_time_travel_served")(spark, sfDir)
    // AQE wraps the plan in AdaptiveSparkPlanExec (a leaf to collect):
    // unwrap to its current inner plan before looking for the scan
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "serve plan must contain a FileScan")
    // loop-invariant: one full-store day listing, not one per scan
    val daysOnDisk = spark.read.parquet(
        graft.queries.JaneQueries.ttravelStorePath(sfDir))
      .select("ingest_day").distinct().collect()
      .map(_.get(0).toString.toInt).toSet // partition col type is inferred
    val expectDays = daysOnDisk.count(_ <= 3)
    assert(expectDays >= 1, s"store must have day dirs <= 3: $daysOnDisk")
    // the serve reads ONLY the partitioned store, never the corpus
    scans.foreach { f =>
      val loc = f.relation.location.rootPaths.mkString(",")
      assert(loc.contains("ttravel_days"), s"serve must read the store: $loc")
      assert(!loc.contains("testdata"), s"serve must not rescan the corpus: $loc")
      // the T cutoff is a PARTITION filter (pruned before any row read),
      // not a post-scan data filter
      assert(f.partitionFilters.exists(_.toString.contains("ingest_day")),
        s"cutoff must be a partition filter: ${f.partitionFilters}")
      // the cutoff lists exactly the surviving day directories into the
      // plan — expected count derived from the store's ACTUAL day set
      // (r13 ADVICE: hardcoding 4 assumed all 8 doc_id%8 residues
      // survive the %3 hash filter at whatever SF the spec runs on; a
      // smaller corpus or regenerated ids could drop a day directory
      // and fail the spec without any product bug)
      assert(f.selectedPartitions.partitionCount == expectDays,
        s"expected $expectDays pruned day partitions, got " +
          s"${f.selectedPartitions.partitionCount}")
    }
    // and the pruned serve still answers exactly j37's T1 snapshot half
    import org.apache.spark.sql.functions.{expr, max}
    val expect = Tables.documents(spark, sfDir)
      .filter(expr("((doc_id * 2654435761) % 1000000007) % 3 = 0"))
      .select(col("doc_id"), expr("doc_id div 8").as("group_id"),
        expr("doc_id % 8").as("version"))
      .filter(col("version") <= 3)
      .groupBy("group_id")
      .agg(expr("max_by(doc_id, version)").as("doc_t1"),
        max(col("version")).as("v_t1"))
    assert(df.exceptAll(expect).isEmpty && expect.exceptAll(df).isEmpty,
      "served snapshot must equal the logical replay")
  }

  test("j48 reads the ORC export, never the parquet corpus") {
    val df = SparkEntry.queries("j48_orc_interchange")(spark, sfDir)
    val plan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(plan.nonEmpty)
    plan.foreach { f =>
      val loc = f.relation.location.rootPaths.mkString(",")
      assert(loc.contains("orc_events"), s"must read the ORC store: $loc")
      assert(!loc.contains("testdata"), s"must not rescan the corpus: $loc")
      assert(f.relation.fileFormat.toString.toLowerCase.contains("orc"),
        s"store must actually be ORC: ${f.relation.fileFormat}")
    }
  }
}
