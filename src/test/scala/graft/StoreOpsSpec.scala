package graft

import org.apache.spark.sql.functions._

import graft.operators.{DocumentStore, Skew}

class StoreOpsSpec extends SparkSpec {

  test("saltedAgg equals the direct groupBy for sum-mergeable aggregates") {
    val events = Tables.events(spark, sfDir)
    val salted = Skew.saltedAgg(events, "event_type", col("event_id"), 16,
      Seq("n" -> count(lit(1)), "vc" -> sum(expr("CAST(round(value*100) AS BIGINT)"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(expr("CAST(round(value*100) AS BIGINT)")).as("vc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("saltedAggMerge equals the direct groupBy for MIN/MAX merges") {
    val events = Tables.events(spark, sfDir)
    val salted = Skew.saltedAggMerge(events, "event_type", col("event_id"), 16,
      Seq(("lo", min(col("event_id")), min(_)), ("hi", max(col("event_id")), max(_)),
        ("n", count(lit(1)), sum(_))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val direct = events.groupBy("event_type")
      .agg(min(col("event_id")).as("lo"), max(col("event_id")).as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(salted == direct)
  }

  test("upsert replaces matched keys and appends unmatched ones") {
    import spark.implicits._
    val existing = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val updates = Seq((2L, "B"), (3L, "c")).toDF("k", "v")
    val got = DocumentStore.upsert(existing, updates, "k")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("vacuum keeps the newest k versions and reaps tombstoned groups") {
    import spark.implicits._
    val rows = Seq(
      // group a: 4 live versions — keep the newest 2
      ("a", 1L, false), ("a", 2L, false), ("a", 3L, false), ("a", 4L, false),
      // group b: latest version is a delete marker — reaped entirely
      ("b", 1L, false), ("b", 2L, true),
      // group c: an OLD tombstone superseded by a live row — stays (history)
      ("c", 1L, true), ("c", 2L, false)
    ).toDF("k", "version", "deleted")
    val out = DocumentStore.vacuum(rows, Seq("k"), "version",
      keep = 2, tombstoneCol = Some("deleted"))
    val got = out.select("k", "version").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 3L), ("a", 4L), ("c", 1L), ("c", 2L)))
    // both decisions ride ONE document-key shuffle
    val nEx = "Exchange".r
      .findAllMatchIn(out.queryExecution.executedPlan.toString).size
    assert(nEx == 1, s"vacuum must ride one key shuffle, got $nEx")
  }

  test("latestVersions keeps exactly the max version per group") {
    import spark.implicits._
    val df = Seq((1L, 1L, "old"), (1L, 3L, "new"), (2L, 5L, "only"))
      .toDF("g", "ver", "v")
    val got = DocumentStore.latestVersions(df, Seq("g"), "ver")
      .select("g", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "new"), (2L, "only")))
  }

  test("attachments: cardinality doc_id%3, unique ids, type filter, inventory totals") {
    val docs = Tables.documents(spark, sfDir)
    val atts = DocumentStore.Attachments.build(docs).cache()
    // per-document cardinality is doc_id % 3 (including the zero case)
    val counts = docs.select("doc_id")
      .join(atts.groupBy("doc_id").count(), Seq("doc_id"), "left")
      .withColumn("n", coalesce(col("count"), lit(0L)))
    assert(counts.filter(col("n") =!= col("doc_id") % 3).count() == 0)
    // attachment ids are globally unique
    assert(atts.select("att_id").distinct().count() == atts.count())
    // forDocuments honors both the doc subset and the content-type filter
    val en = docs.filter(col("lang") === "en")
    val fetched = DocumentStore.Attachments
      .forDocuments(atts, en, Some("image/png")).cache()
    assert(fetched.filter(col("content_type") =!= "image/png").count() == 0)
    assert(fetched.join(en.select("doc_id"), Seq("doc_id"), "left_anti").count() == 0)
    // inventory partitions the table: per-type counts sum to the total
    val inv = DocumentStore.Attachments.inventory(atts)
    assert(inv.agg(sum(col("n_atts"))).head().getLong(0) == atts.count())
  }

  test("page returns the exact slice of the total ordering") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, 100 - i)).toDF("id", "rankv")
    val got = DocumentStore.page(df, Seq(col("rankv").desc, col("id").asc), 10, 5)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(11L, 12L, 13L, 14L, 15L)) // rankv desc == id asc
  }
}
