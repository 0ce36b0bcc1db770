package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams

/** Structured Streaming path: MemoryStream → transform → memory sink. */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("tumblingCounts aggregates a stream into 5-minute windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.tumblingCounts(events).writeStream
      .format("memory").queryName("tumbling_test").outputMode(OutputMode.Append()).start()
    try {
      mem.addData((ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(6), "view", 3.0))
      q.processAllAvailable()
      // advance event time far enough to close the first windows
      mem.addData((ts(59), "click", 4.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT window_start, event_type, n, value_c FROM tumbling_test")
        .as[(Timestamp, String, Long, Long)].collect().toSet
      assert(rows.contains((ts(0), "click", 2L, 300L)), s"got $rows")
      assert(rows.contains((ts(5), "view", 1L, 300L)), s"got $rows")
    } finally q.stop()
  }

  test("slidingCounts lands each event in its two covering windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.slidingCounts(events).writeStream
      .format("memory").queryName("sliding_test").outputMode(OutputMode.Append()).start()
    try {
      // 00:06 is covered by the [00:00,00:10) and [00:05,00:15) windows
      mem.addData((ts(6), "click", 1.0))
      q.processAllAvailable()
      mem.addData((ts(59), "click", 4.0)) // advance watermark to close both
      q.processAllAvailable()
      val rows = spark.sql("SELECT window_start, event_type, n, value_c FROM sliding_test")
        .as[(Timestamp, String, Long, Long)].collect().toSet
      assert(rows.contains((ts(0), "click", 1L, 100L)), s"got $rows")
      assert(rows.contains((ts(5), "click", 1L, 100L)), s"got $rows")
    } finally q.stop()
  }

  test("runningUserTotals carries custom state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val events = mem.toDF().toDF("user_id", "value")
    val q = graft.streaming.EventStreams.runningUserTotals(spark, events)
      .writeStream.format("memory").queryName("running_test")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData((1L, 1.0), (1L, 2.0), (2L, 5.0))
      q.processAllAvailable()
      mem.addData((1L, 4.0)) // second batch: state must accumulate
      q.processAllAvailable()
      val byUser = spark.sql("SELECT * FROM running_test")
        .as[graft.streaming.UserRunning].collect()
        .groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n_events) }
      assert(byUser(1L).n_events == 3L && byUser(1L).value_c == 700L,
        s"state did not accumulate: ${byUser(1L)}")
      assert(byUser(2L).n_events == 1L && byUser(2L).value_c == 500L)
    } finally q.stop()
  }

  test("stream-static join enriches streaming events with the station index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stations = graft.operators.Indexers.ChannelIndex
      .build(Tables.events(spark, sfDir))
    val mem = MemoryStream[(Long, Long, Timestamp, String)]
    val events = mem.toDF().toDF("event_id", "user_id", "ts", "event_type")
    val q = EventStreams.enrichWithStations(events, stations).writeStream
      .format("memory").queryName("enrich_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((100L, 1L, ts(0), "click"), (101L, 2L, ts(1), "view"),
        (102L, 999999L, ts(2), "click")) // unknown station -> dropped
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT event_id, network, station, latitude FROM enrich_test")
        .as[(Long, String, String, Double)].collect()
      // exactly one enriched row per known-station event (distinct on the
      // static side must prevent per-channel fan-out)
      assert(rows.map(_._1).sorted.toSeq == Seq(100L, 101L), s"got ${rows.toSeq}")
      val byId = rows.map(r => r._1 -> r).toMap
      assert(byId(100L)._2 == "N1" && byId(100L)._3 == "ST1")
      // site coordinate matches the index derivation for user_id = 1
      assert(byId(100L)._4 == ((1 * 31) % 180) - 90 + 0.5)
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with recent signups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pm = MemoryStream[(Timestamp, Long)]
    val sm = MemoryStream[(Timestamp, Long)]
    val purchases = pm.toDF().toDF("ts", "user_id")
    val signups = sm.toDF().toDF("ts", "user_id")
    val q = graft.streaming.EventStreams.purchaseSignupJoin(purchases, signups)
      .writeStream.format("memory").queryName("ssj_test")
      .outputMode(OutputMode.Append()).start()
    try {
      sm.addData((ts(0), 1L), (ts(0), 2L))
      pm.addData((ts(30), 1L))   // within 2h of user 1's signup
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id FROM ssj_test")
        .as[Long].collect().toSeq
      assert(rows == Seq(1L), s"got $rows") // user 2 never purchased
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched purchases with a " +
    "null signup once the watermark closes the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pm = MemoryStream[(Timestamp, Long)]
    val sm = MemoryStream[(Timestamp, Long)]
    val q = graft.streaming.EventStreams
      .purchaseSignupLeftJoin(pm.toDF().toDF("ts", "user_id"),
        sm.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("ssj_left")
      .outputMode(OutputMode.Append()).start()
    try {
      sm.addData((ts(0), 1L))
      pm.addData((ts(30), 1L), (ts(30), 2L)) // user 2 has no signup
      q.processAllAvailable()
      // the matched row emits promptly; the unmatched one is HELD in
      // state (a signup could still arrive inside its window)
      val early = spark.sql("SELECT user_id FROM ssj_left")
        .as[Long].collect().toSeq
      assert(early == Seq(1L), s"got $early")
      // advance both watermarks a day past the window end, then run the
      // extra microbatch that evicts + emits the null row
      val far = Timestamp.valueOf("2024-01-02 12:00:00")
      sm.addData((far, 99L))
      pm.addData((far, 98L))
      q.processAllAvailable()
      pm.addData((far, 97L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, signup_ts FROM ssj_left WHERE user_id IN (1, 2)")
        .as[(Long, Option[Timestamp])].collect().toSet
      assert(rows == Set((1L, Some(ts(0))), (2L, None)), s"got $rows")
    } finally q.stop()
  }

  test("closedSessions emits a session when a later event breaks the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "user_id")
    val q = graft.streaming.EventStreams.closedSessions(spark, events, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((ts(0), 1L), (ts(10), 1L))
      q.processAllAvailable()
      // 50-minute gap: the next event closes session [00:00, 00:10]
      mem.addData((Timestamp.valueOf("2024-01-01 01:00:00"), 1L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, session_start, session_end, n_events FROM sess_test")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(rows == Set((1L, ts(0), ts(10), 2L)), s"got $rows")
    } finally q.stop()
  }

  test("rateAnomalies keeps a bounded trailing ring and flags 1.5x spikes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.streaming.BucketCount]
    val q = EventStreams.rateAnomalies(spark, mem.toDS())
      .writeStream.format("memory").queryName("rate_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        graft.streaming.BucketCount(0L, "click", 10L),
        graft.streaming.BucketCount(300L, "click", 12L),
        graft.streaming.BucketCount(600L, "click", 11L))
      q.processAllAvailable()
      // 50 >= 1.5 * mean(10,12,11) -> anomaly; the next normal bucket
      // sees the spike in ITS trailing sum and stays quiet
      mem.addData(
        graft.streaming.BucketCount(900L, "click", 50L),
        graft.streaming.BucketCount(1200L, "click", 10L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT bucket_s, n, trail_sum, n_prev, anomaly FROM rate_test")
        .as[(Long, Long, Long, Long, Boolean)].collect().toSet
      assert(rows == Set(
        (0L, 10L, 0L, 0L, false),
        (300L, 12L, 10L, 1L, false),
        (600L, 11L, 22L, 2L, false),
        (900L, 50L, 33L, 3L, true),
        (1200L, 10L, 83L, 4L, false)), s"got $rows")
    } finally q.stop()
  }

  test("windowedTopK keeps k triples per window and matches the batch " +
    "leaderboard after all totals arrive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.streaming.WindowUserTotal]
    // evictAfter = None: timeout-check trigger batches livelock
    // processAllAvailable in this harness; eviction is orthogonal to
    // the ranking semantics asserted here
    val q = EventStreams.windowedTopK(spark, mem.toDS(), k = 3,
      evictAfter = None)
      .writeStream.format("memory").queryName("topk_test")
      .outputMode(OutputMode.Update()).start()
    def table(): Seq[(Long, Long, Long, Long, Long)] = spark.sql(
      "SELECT window_s, user_id, n, value_c, rn FROM topk_test")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    try {
      mem.addData(
        graft.streaming.WindowUserTotal(0L, 1L, 5L, 100L),
        graft.streaming.WindowUserTotal(0L, 2L, 7L, 50L),
        graft.streaming.WindowUserTotal(3600L, 9L, 2L, 10L))
      q.processAllAvailable()
      val snap1 = table()
      // window 0: user 2 (7) > user 1 (5); window 3600: user 9 alone
      assert(snap1.toSet == Set((0L, 2L, 7L, 50L, 1L), (0L, 1L, 5L, 100L, 2L),
        (3600L, 9L, 2L, 10L, 1L)), s"got $snap1")
      // batch 2: a new leader, an equal-count tie (user_id asc wins),
      // and a small entry that pushes user 1 off the podium
      mem.addData(
        graft.streaming.WindowUserTotal(0L, 3L, 9L, 1L),
        graft.streaming.WindowUserTotal(0L, 0L, 7L, 2L),
        graft.streaming.WindowUserTotal(3600L, 4L, 1L, 1L))
      q.processAllAvailable()
      val emitted2 = {
        val c1 = scala.collection.mutable.Map.empty[
          (Long, Long, Long, Long, Long), Int]
        snap1.foreach(r => c1(r) = c1.getOrElse(r, 0) + 1)
        table().filter { r =>
          val left = c1.getOrElse(r, 0)
          if (left > 0) { c1(r) = left - 1; false } else true
        }
      }
      // update-mode memory sink appends each batch's emission; the
      // second batch's rows are the refreshed leaderboards only
      assert(emitted2.toSet == Set(
        (0L, 3L, 9L, 1L, 1L), (0L, 0L, 7L, 2L, 2L), (0L, 2L, 7L, 50L, 3L),
        (3600L, 9L, 2L, 10L, 1L), (3600L, 4L, 1L, 1L, 2L)), s"got $emitted2")
    } finally q.stop()
  }

  test("foreachBatch upsert sink merges micro-batches latest-wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_").toString
    val mem = MemoryStream[(Long, Timestamp, String)]
    val stream = mem.toDF().toDF("doc_id", "ts", "payload")
    val q = graft.streaming.EventStreams.upsertSink(
      spark, stream, "doc_id", s"$dir/store", s"$dir/ckpt")
    try {
      mem.addData((1L, ts(0), "v1"), (2L, ts(0), "a"))
      q.processAllAvailable()
      mem.addData((1L, ts(5), "v2"), (3L, ts(5), "new"))
      q.processAllAvailable()
      val state = spark.read.parquet(s"$dir/store")
        .select("doc_id", "payload").as[(Long, String)].collect().toMap
      assert(state == Map(1L -> "v2", 2L -> "a", 3L -> "new"),
        s"got $state") // doc 1 superseded, others intact
    } finally q.stop()
  }

  test("upsert sink survives a corrupt store read instead of wiping it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_corrupt_").toString
    // a store directory whose parquet footer is garbage: reading it must FAIL
    // the batch (checkpoint retries), never be mistaken for an empty store
    val storeDir = java.nio.file.Paths.get(dir, "store")
    java.nio.file.Files.createDirectories(storeDir)
    val corrupt = storeDir.resolve("part-00000.parquet")
    java.nio.file.Files.write(corrupt, "not parquet at all".getBytes)
    val mem = MemoryStream[(Long, Timestamp, String)]
    val stream = mem.toDF().toDF("doc_id", "ts", "payload")
    val q = graft.streaming.EventStreams.upsertSink(
      spark, stream, "doc_id", s"$dir/store", s"$dir/ckpt")
    try {
      mem.addData((1L, ts(0), "v1"))
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
    } finally q.stop()
    // the corrupt store was not deleted or overwritten with the lone batch
    assert(java.nio.file.Files.exists(corrupt),
      "upsert sink destroyed the store on a read failure")
  }

  test("upsert sink heals an interrupted rename-aside swap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_heal_").toString
    // simulate a crash between `path`→`path.old` and tmp→`path`: only the
    // aside copy exists; the next batch must recover it, not start empty
    Seq((1L, ts(0), "survivor")).toDF("doc_id", "ts", "payload")
      .write.parquet(s"$dir/store.old")
    val mem = MemoryStream[(Long, Timestamp, String)]
    val stream = mem.toDF().toDF("doc_id", "ts", "payload")
    val q = graft.streaming.EventStreams.upsertSink(
      spark, stream, "doc_id", s"$dir/store", s"$dir/ckpt")
    try {
      mem.addData((2L, ts(5), "new"))
      q.processAllAvailable()
      val state = spark.read.parquet(s"$dir/store")
        .select("doc_id", "payload").as[(Long, String)].collect().toMap
      assert(state == Map(1L -> "survivor", 2L -> "new"), s"got $state")
    } finally q.stop()
  }

  test("decontaminateStream flags docs sharing a span with the static corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val span = "a protected benchmark answer sentence that must not leak"
    val corpus = Seq((100L, "eval item one contains " + span + " verbatim"),
      (101L, "another unrelated eval item of fresh words")).toDF("doc_id", "text")
    val corpusFps = graft.queries.TextQueries.winnowFps(corpus)
      .withColumnRenamed("doc_id", "corpus_doc")
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = EventStreams.decontaminateStream(docs, corpusFps).writeStream
      .format("memory").queryName("decon_test").outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (1L, "clean training document with entirely novel phrasing"),
        (2L, "a crawled page quoting " + span + " in the middle"))
      q.processAllAvailable()
      val flagged = spark.sql("SELECT DISTINCT doc_id, corpus_doc FROM decon_test")
        .as[(Long, Long)].collect().toSet
      assert(flagged.map(_._1) == Set(2L),
        s"only the contaminated doc must surface, got $flagged")
      assert(flagged.forall(_._2 == 100L), "match must name its corpus source")
    } finally q.stop()
  }

  test("dedupCandidatesStream equals batch d14 candidates against the persisted index") {
    // round-5 verdict item 5: the d14 MinHash-band shape as a stream —
    // incoming docs stream-static joined against the persisted corpus
    // band index must surface EXACTLY the candidate set the batch
    // incremental dedup computes on the same rows, across micro-batches.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").cache()
    val isNew = col("doc_id") % 10 === 7
    // persist the corpus band index (the table the batch pipeline owns)
    val path = s"/tmp/graft_stores/band_index_${System.nanoTime()}"
    graft.operators.Dedup.bandSignatures(docs.filter(!isNew), 16, 2)
      .select(col("doc_id").as("dup_of"), col("band"), col("sig"))
      .write.mode("overwrite").parquet(path)
    val corpusBands = spark.read.parquet(path)
    val incoming = docs.filter(isNew).as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = EventStreams.dedupCandidatesStream(stream, corpusBands).writeStream
      .format("memory").queryName("dedup_cand_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = incoming.splitAt(incoming.length / 2)
      mem.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT DISTINCT new_id, dup_of FROM dedup_cand_test")
        .as[(Long, Long)].collect().toSet
      val batch = graft.operators.Dedup.minHashLshCrossPairs(docs, isNew, 16, 2)
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
      assert(streamed.nonEmpty, "the sf0.001 corpus must yield candidates")
    } finally q.stop()
  }

  test("packSegments reproduces m15's boundary-cut packing across batches, 1-long state per modality") {
    // r11 (r10 verdict item 6): m15's incremental/streaming twin — the
    // online boundary-cut packer over the SAME item derivation
    // (TextQueries.packItems) must roll up to exactly the batch query's
    // per-bin card, with state = one running-cum long per modality.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val items = graft.queries.TextQueries.packItems(spark, sfDir)
      .as[graft.streaming.PackItem].collect().sortBy(_.doc_id)
    assert(items.nonEmpty)
    val mem = MemoryStream[graft.streaming.PackItem]
    val q = EventStreams.packSegments(spark, mem.toDS()).writeStream
      .format("memory").queryName("pack_seg_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // three in-order micro-batches (the packer's in-order contract:
      // doc_id within batch, arrival order across batches)
      items.grouped(items.length / 3 + 1).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.sql(
        "SELECT modality, bin, count(1) AS n_segments, " +
          "sum(CASE WHEN split THEN 1 ELSE 0 END) AS n_split_segments, " +
          "sum(seg_tokens) AS bin_tokens, " +
          "sum(seg_tokens) * 10000 div 4096 AS fill_e4 " +
          "FROM pack_seg_test GROUP BY modality, bin")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      val batch = SparkEntry.queries("m15_pack_split")(spark, sfDir)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
      // the split semantics must actually be exercised at this SF
      assert(streamed.exists(_._4 > 0), "expected at least one split segment")
    } finally q.stop()
  }

  test("ingestQuarantineStream rolls up equal to the batch j45 card across micro-batches") {
    // r12: j45's streaming twin — the same feed recipe written as 3
    // files, streamed one file per trigger (3 REAL micro-batches), must
    // route and checksum exactly like the batch card; state is one
    // counter row per bucket regardless of feed size.
    val dir = "/tmp/graft_stores/ingest_feed_stream_test"
    graft.sources.ParquetStore.installOverwriteCsv(
      graft.queries.JaneQueries.ingestFeed(spark, sfDir).repartition(3), dir)
    val q = EventStreams.ingestQuarantineStream(spark, dir, maxFilesPerTrigger = 1)
      .writeStream.format("memory").queryName("ingest_q_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      assert(q.lastProgress.batchId >= 2,
        s"expected >= 3 micro-batches, got ${q.lastProgress.batchId + 1}")
      val streamed = spark.table("ingest_q_test")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val batch = SparkEntry.queries("j45_ingest_quarantine")(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
    } finally q.stop()
  }

  test("funnelProgress advances strict-order steps across batches with 2-long state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val events = mem.toDF().toDF("ts", "user_id", "event_type")
    val q = EventStreams.funnelProgress(spark, events).writeStream
      .format("memory").queryName("funnel_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: full ordered funnel split across two batches
      // user 2: clicks BEFORE viewing -> the click must not count, and
      //         the later view then anchors step 1
      mem.addData((ts(0), 1L, "view"), (ts(1), 1L, "click"),
        (ts(0), 2L, "click"), (ts(1), 2L, "view"))
      q.processAllAvailable()
      mem.addData((ts(2), 1L, "purchase"), (ts(2), 2L, "error"))
      q.processAllAvailable()
      val steps = spark.sql("SELECT user_id, step, stage FROM funnel_test")
        .as[(Long, Long, String)].collect().toSet
      assert(steps == Set((1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
        (2L, 1L, "view")),
        s"got $steps")
    } finally q.stop()
  }

  test("distinctSketch registers equal the batch HLL over the same rows, 64-long state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val events = mem.toDF().toDF("user_id")
    val q = EventStreams.distinctSketch(spark, events).writeStream
      .format("memory").queryName("sketch_test")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(1L to 40L: _*)
      q.processAllAvailable()
      mem.addData(21L to 90L: _*) // overlap: sketch must not double-count
      q.processAllAvailable()
      // latest state per register from the update stream
      val streamed = spark.sql(
        """SELECT reg, max(rho_max) AS rho_max FROM sketch_test GROUP BY reg""")
        .as[(Long, Long)].collect().toMap
      val batch = (1L to 90L).toDF("user_id")
        .selectExpr("(user_id * 2654435761) % 2147483647 AS h1")
        .selectExpr("((h1 ^ (h1 div 65536)) * 40503) % 2147483647 AS h")
        .selectExpr("h % 64 AS reg",
          "CASE WHEN h div 64 = 0 THEN 26 " +
            "ELSE bit_count(((h div 64) & -(h div 64)) - 1) + 1 END AS rho")
        .groupBy("reg").agg(org.apache.spark.sql.functions.max("rho").as("rho_max"))
        .as[(Long, Long)].collect().toMap
      assert(streamed == batch,
        s"streamed registers must equal batch: ${streamed.toSeq.sorted} vs ${batch.toSeq.sorted}")
      assert(streamed.size <= 64)
    } finally q.stop()
  }

  test("cmsSketch counters equal the batch sketch over the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val events = mem.toDF().toDF("user_id")
    val q = EventStreams.cmsSketch(spark, events).writeStream
      .format("memory").queryName("cms_test")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(1L to 30L: _*)
      q.processAllAvailable()
      mem.addData(1L to 30L: _*) // same ids again: counters must double
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT i, c, max(n) AS n FROM cms_test GROUP BY i, c")
        .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      val P = 2147483647L
      val rows = Seq((2654435761L, 17L), (2246822519L, 101L),
        (3266489917L, 419L), (668265263L, 1009L)).zipWithIndex.map {
        case ((a, b), i) =>
          s"struct(CAST($i AS BIGINT) AS i, ((user_id * ${a}L + ${b}L) % $P) % 256 AS c)"
      }.mkString(", ")
      val batch = ((1L to 30L) ++ (1L to 30L)).toDF("user_id")
        .selectExpr(s"explode(array($rows)) AS rc")
        .groupBy("rc.i", "rc.c").count()
        .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(streamed == batch)
      assert(streamed.size <= 1024)
    } finally q.stop()
  }

  test("mvRefreshSink merges mergeable partials across micro-batches into the persisted MV") {
    // q41's streaming twin: each micro-batch reduces to count/sum
    // partials and merges into the stored MV by + — the final store must
    // equal the batch recompute over everything fed, including a month
    // whose rows arrived in DIFFERENT batches (the merge, not just
    // appends).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val orders = mem.toDF().toDF("o_orderdate", "o_orderstatus", "o_totalprice")
    val path = s"/tmp/graft_stores/mv_stream_spec_${System.nanoTime()}"
    val q = EventStreams.mvRefreshSink(spark, orders, path, s"$path.ckpt",
      graft.queries.RelationalQueries.mvPartials, Seq("mon", "o_orderstatus"))
    try {
      mem.addData((Timestamp.valueOf("2001-01-03 00:00:00"), "O", 10.50),
        (Timestamp.valueOf("2001-01-20 00:00:00"), "F", 2.25))
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2001-01-28 00:00:00"), "O", 1.00),
        (Timestamp.valueOf("2001-02-02 00:00:00"), "O", 5.00))
      q.processAllAvailable()
      val got = spark.read.parquet(path)
        .orderBy("mon", "o_orderstatus")
        .select("mon", "o_orderstatus", "n_orders", "rev_cents")
        .as[(java.sql.Date, String, Long, Long)].collect().toSeq
      assert(got == Seq(
        (java.sql.Date.valueOf("2001-01-01"), "F", 1L, 225L),
        (java.sql.Date.valueOf("2001-01-01"), "O", 2L, 1150L),
        (java.sql.Date.valueOf("2001-02-01"), "O", 1L, 500L)), s"got $got")
    } finally q.stop()
  }

  test("mvRefreshBatch replayed after a successful publish is a no-op (at-least-once idempotence)") {
    // the r6 ADVICE failure: driver dies after the publish rename but
    // before the checkpoint commit, foreachBatch re-runs the SAME batchId
    // — a second sum-merge must not double-count. Drive the factored-out
    // batch body directly with explicit batchIds: apply batch 0, replay
    // batch 0 (same id — must no-op), then batch 1 (new id — must merge).
    import spark.implicits._
    val path = s"/tmp/graft_stores/mv_replay_spec_${System.nanoTime()}"
    val rows = Seq((Timestamp.valueOf("2001-01-03 00:00:00"), "O", 10.50))
      .toDF("o_orderdate", "o_orderstatus", "o_totalprice")
    def store() = spark.read.parquet(path)
      .select("mon", "o_orderstatus", "n_orders", "rev_cents")
      .as[(java.sql.Date, String, Long, Long)].collect().toSeq.sorted
    EventStreams.mvRefreshBatch(spark, rows, 0L, path,
      graft.queries.RelationalQueries.mvPartials, Seq("mon", "o_orderstatus"))
    val after0 = store()
    EventStreams.mvRefreshBatch(spark, rows, 0L, path,
      graft.queries.RelationalQueries.mvPartials, Seq("mon", "o_orderstatus"))
    assert(store() == after0,
      s"replayed batch 0 double-counted: ${store()} vs $after0")
    EventStreams.mvRefreshBatch(spark, rows, 1L, path,
      graft.queries.RelationalQueries.mvPartials, Seq("mon", "o_orderstatus"))
    assert(store() == Seq(
      (java.sql.Date.valueOf("2001-01-01"), "O", 2L, 2100L)),
      s"batch 1 must merge: ${store()}")
  }

  test("dedupeStream drops duplicate ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "event_id")
    val q = EventStreams.dedupeStream(events, "event_id").writeStream
      .format("memory").queryName("dedupe_test").outputMode(OutputMode.Append()).start()
    try {
      mem.addData((ts(0), 1L), (ts(1), 1L), (ts(2), 2L))
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM dedupe_test").as[Long].head()
      assert(n == 2L, s"expected 2 distinct ids, got $n")
    } finally q.stop()
  }
}
