package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ExactNum.sumCents
import graft.operators.{AsOfJoin, TopK}

/** Streaming-shaped operators, verified through their batch equivalents
  * (SURVEY.md §2.H). The same transforms run on `readStream` sources via
  * [[graft.streaming.EventStreams]] (spec-tested with MemoryStream); the
  * oracle checks the batch semantics. All gap/bucket arithmetic uses
  * floor-to-second epochs on BOTH engines so ns-vs-µs precision can't
  * flip a boundary (SURVEY.md §4).
  */
object StreamingQueries {

  type Q = (SparkSession, String) => DataFrame

  /** s09's per-(day, type) PSI term over columns (c, nd, r, nr) —
    * (p−q)·ln(p/q), e9-quantized BEFORE summing (t39's integer-sum
    * doctrine). Types absent from either side contribute 0 (the
    * deterministic stand-in for the epsilon-smoothing production
    * monitors apply). One text, both dialects.
    */
  private val psiContribSql: String =
    "CAST(round((CASE WHEN c = 0 OR r IS NULL OR r = 0 THEN 0.0 " +
      "ELSE (CAST(c AS DOUBLE) / nd - CAST(r AS DOUBLE) / nr) * " +
      "ln((CAST(c AS DOUBLE) / nd) / (CAST(r AS DOUBLE) / nr)) END" +
      ") * 1000000000.0) AS BIGINT)"

  val queries: Map[String, Q] = Map(
    "s09_psi_drift" -> { (s, d) =>
      // Population-stability-index DRIFT monitor — the day-over-day
      // distribution-shift readout a continuous pipeline alarms on
      // (PSI is the industry-standard drift score; > 0.2 ≈ "population
      // changed"): each utc-day's event_type mix scored against the
      // FIRST day's reference mix, per-term contributions e9-quantized
      // integers (shared formula text), so the daily PSI is an
      // order-independent BIGINT sum. Plan: one (day, type) map-side-
      // combined aggregate feeds totals, the broadcast reference row
      // set, and the scoring join — type cardinality is tiny, so every
      // join side after the first aggregate is broadcast-size at any
      // stream length. The streaming twin is rateAnomalies' discipline
      // applied to s01's finalized buckets: per-type state is the
      // reference share, a pure Update-mode fold.
      val daily = Tables.events(s, d)
        .select(expr("unix_timestamp(ts) div 86400").as("day"),
          col("event_type"))
        .groupBy("day", "event_type").agg(count(lit(1)).as("c"))
        .localCheckpoint() // feeds totals, the reference, and the join
      val totals = daily.groupBy("day").agg(sum(col("c")).as("nd"))
      val refDay = daily.agg(min(col("day")).as("rd"))
      val ref = daily.join(broadcast(refDay), col("day") === col("rd"))
        .select(col("event_type"), col("c").as("r"))
      val refTot = ref.agg(sum(col("r")).as("nr"))
      daily.join(totals, "day")
        .join(broadcast(ref), Seq("event_type"), "left")
        .crossJoin(broadcast(refTot))
        .withColumn("contrib_e9", expr(psiContribSql))
        .groupBy("day", "nd")
        .agg(count(lit(1)).as("n_types"), sum(col("contrib_e9")).as("psi_e9"))
        .select(col("day"), col("nd"), col("n_types"), col("psi_e9"))
        .orderBy("day")
    },

    "s01_tumbling_counts" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("bucket_s", expr("(unix_timestamp(ts) div 300) * 300"))
        .groupBy("bucket_s", "event_type")
        .agg(count(lit(1)).as("n"), sumCents(col("value")).as("value_c"))
        .orderBy("bucket_s", "event_type")
    },

    "s05_sliding_counts" -> { (s, d) =>
      // 10-min windows sliding every 5 min via Spark's native
      // window(slide) — each event expands to its TWO covering windows
      // executor-side (no shuffle for the expansion; one map-side-combined
      // shuffle on (window, event_type)). Streaming twin:
      // EventStreams.slidingCounts. Window assignment runs on the
      // floor-second timestamp so both engines bucket identically
      // (boundaries are integer seconds — SURVEY.md §4).
      Tables.events(s, d)
        .withColumn("sec", unix_timestamp(col("ts")))
        .groupBy(window(timestamp_seconds(col("sec")),
          "600 seconds", "300 seconds").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumCents(col("value")).as("value_c"))
        .select(unix_timestamp(col("w.start")).as("window_s"),
          col("event_type"), col("n"), col("value_c"))
        .orderBy("window_s", "event_type")
    },

    "s02_sessionization" -> { (s, d) =>
      val byUser = Window.partitionBy("user_id").orderBy("sec", "event_id")
      val sessions = Tables.events(s, d)
        .withColumn("sec", unix_timestamp(col("ts")))
        .withColumn("prev", lag(col("sec"), 1).over(byUser))
        .withColumn("nf",
          when(col("prev").isNull || col("sec") - col("prev") > 1800, 1L).otherwise(0L))
        .withColumn("sid", sum(col("nf")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n"))
      sessions.groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"),
          max(col("n")).as("max_sess_events"))
        .orderBy("user_id")
    },

    "s03_transitions" -> { (s, d) =>
      // Per-user event-type transition counts (Markov edges over the
      // session stream) via lag window — the behavioral-analytics shape.
      val byUser = Window.partitionBy("user_id").orderBy("sec", "event_id")
      Tables.events(s, d)
        .withColumn("sec", unix_timestamp(col("ts")))
        .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("prev_type", "next_type")
    },

    "s06_rate_anomaly" -> { (s, d) =>
      // Windowed rate-anomaly detection (the monitoring op a continuous
      // ingest pipeline runs on its own s01 aggregate): per event_type,
      // a 5-min bucket is anomalous when its count is >= 1.5x the mean of
      // the up-to-6 preceding OBSERVED buckets (integer cross-multiplied:
      // 4n >= trail_sum, since 1.5/6 = 1/4 — no float thresholds), with a
      // >= 3-bucket history gate so startup never alarms. Row-framed over
      // observed buckets: empty buckets produce no rows, so the baseline
      // is "recent activity", not wall-clock — the same frame a
      // foreachBatch consumer keeps as bounded per-key state (7 counts per
      // event_type, O(keys) state) over the s01 streaming sink.
      val w = Window.partitionBy("event_type").orderBy("bucket_s")
        .rowsBetween(-6, -1)
      Tables.events(s, d)
        .withColumn("bucket_s", expr("(unix_timestamp(ts) div 300) * 300"))
        .groupBy("bucket_s", "event_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("trail_sum", coalesce(sum(col("n")).over(w), lit(0L)))
        .withColumn("n_prev", count(col("n")).over(w))
        .withColumn("anomaly",
          col("n_prev") >= 3 && col("n") * 4 >= col("trail_sum"))
        .select(col("bucket_s"), col("event_type"), col("n"),
          col("trail_sum"), col("n_prev"), col("anomaly"))
        .orderBy("bucket_s", "event_type")
    },

    "s04_late_data" -> { (s, d) =>
      // Watermark semantics replayed in batch: each event arrives after a
      // deterministic 0–2 h delivery delay (hash jitter — the synthetic
      // stream is otherwise perfectly ordered, which would make lateness
      // vacuous); per key (user), an event whose event time trails the
      // key's high-water mark (max event time seen so far in ARRIVAL
      // order) by more than 600 s is dropped as late — the bounded-state
      // discipline `withWatermark` enforces on the streaming side
      // (EventStreams.dedupeStream / closedSessions carry the real
      // watermark operators). Per-key watermarks keep the running max a
      // partitioned window — no single-partition window at 100 TB.
      val byArrival = Window.partitionBy("user_id").orderBy("arr", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("sec", unix_timestamp(col("ts")))
        .withColumn("arr", expr("sec + (event_id * 2654435761) % 7200"))
        .withColumn("hw", max(col("sec")).over(byArrival))
        .withColumn("is_late",
          col("hw").isNotNull && col("sec") < col("hw") - 600)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("is_late"), 1L).otherwise(0L)).as("n_late"))
        .orderBy("event_type")
    },

    "s08_windowed_topk" -> { (s, d) =>
      // Windowed TOP-K leaderboard — the per-window "heaviest keys"
      // readout every ops dashboard serves (top users per hour here; top
      // talkers / hot shards in general): 1-h tumbling windows, per-
      // (window, user) count + value cents, top-3 users per window by
      // count with user_id tie-break. Batch plan: one map-side-combined
      // (window, user) aggregate, then TopK.perKey map-side heaps — at
      // most windows×3 rows reach the rank exchange, never the full
      // aggregate. Streaming twin: EventStreams.windowedTopK consumes
      // the finalized windowed totals and keeps THREE triples of state
      // per window (rank-after-close — each candidate is final when the
      // watermark closes its window, so the leaderboard never needs the
      // full user list).
      val g = Tables.events(s, d)
        .withColumn("window_s", expr("(unix_timestamp(ts) div 3600) * 3600"))
        .groupBy("window_s", "user_id")
        .agg(count(lit(1)).as("n"), sumCents(col("value")).as("value_c"))
      TopK.perKey(g, Seq("window_s"), "n", "user_id", 3)
        .select("window_s", "user_id", "n", "value_c", "rn")
        .orderBy("window_s", "rn")
    },

    "s07_attribution" -> { (s, d) =>
      // Per-purchase ATTRIBUTION detail — the batch twin of the
      // left-outer stream-stream interval join
      // (EventStreams.purchaseSignupLeftJoin): every purchase emits
      // exactly one row, carrying the latest signup by the same user in
      // the preceding 2 h (NULL when unattributed) and the in-window
      // signup count. Differs from q14 (unbounded as-of, no nulls
      // readout) and q30 (cohort funnel aggregate): this is the
      // event-level outer-join shape with bounded lookback. Floor-second
      // BIGINTs end to end (§4). Plan: user-keyed equi-join with the
      // interval as a residual predicate + one map-side-combined
      // groupBy(event_id) — both shuffles on uniform keys.
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("psec"))
      val sg = ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("su"), unix_timestamp(col("ts")).as("ssec"))
      p.join(sg, col("user_id") === col("su") &&
          col("ssec") <= col("psec") && col("ssec") >= col("psec") - 7200,
          "left")
        .groupBy("event_id", "user_id", "psec")
        .agg(max(col("ssec")).as("last_signup_s"),
          count(col("ssec")).as("n_signups_2h"))
        .select(col("event_id"), col("user_id"), col("psec").as("purchase_s"),
          col("last_signup_s"), col("n_signups_2h"))
        .orderBy("event_id")
    },

    "q14_asof_join" -> { (s, d) =>
      // Floor-second BIGINT timestamps end to end (SURVEY §4): raw-ts
      // asof would compare at µs on Spark but ns in DuckDB, and duplicate
      // right timestamps would leave the tie choice to DuckDB's ASOF
      // (unspecified). Deduping signups to one row per (user, sec) with
      // the max id makes both sides tie-free and granularity-aligned;
      // AsOfJoin itself also tie-breaks deterministically (spec-proven).
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("sec"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), unix_timestamp(col("ts")).as("sec"), col("event_id"))
        .groupBy("user_id", "sec")
        .agg(max(col("event_id")).as("signup_event_id"))
      AsOfJoin.leftAsOf(purchases, signups, key = "user_id", tsCol = "sec",
        rightCols = Map("signup_event_id" -> "signup_event_id"))
        .select(col("event_id"), col("user_id"),
          col("sec").as("ts_s"), col("signup_event_id"))
        .orderBy("event_id")
    })

  val oracle: Map[String, String] = Map(
    "s09_psi_drift" ->
      s"""WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         |    event_type FROM events),
         |daily AS (SELECT day, event_type, COUNT(*) AS c
         |  FROM e GROUP BY day, event_type),
         |totals AS (SELECT day, CAST(SUM(c) AS BIGINT) AS nd
         |  FROM daily GROUP BY day),
         |rd AS (SELECT MIN(day) AS rd FROM daily),
         |ref AS (SELECT event_type, c AS r FROM daily, rd WHERE day = rd),
         |rt AS (SELECT CAST(SUM(r) AS BIGINT) AS nr FROM ref),
         |scored AS (SELECT daily.day, nd, $psiContribSql AS contrib_e9
         |  FROM daily JOIN totals USING (day)
         |  LEFT JOIN ref USING (event_type) CROSS JOIN rt)
         |SELECT day, nd, COUNT(*) AS n_types,
         |  CAST(SUM(contrib_e9) AS BIGINT) AS psi_e9
         |FROM scored GROUP BY day, nd ORDER BY day""".stripMargin,

    "s01_tumbling_counts" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS bucket_s,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM events GROUP BY bucket_s, event_type
        |ORDER BY bucket_s, event_type""".stripMargin,

    "s05_sliding_counts" ->
      """SELECT window_s, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM (SELECT event_type, value,
        |        (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 - 300 * u
        |          AS window_s
        |      FROM events
        |      CROSS JOIN (SELECT unnest([0, 1]) AS u) covering)
        |GROUP BY window_s, event_type
        |ORDER BY window_s, event_type""".stripMargin,

    "s02_sessionization" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |flags AS (SELECT *, CASE WHEN lag(sec) OVER w IS NULL
        |      OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS nf
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |sess AS (SELECT *, SUM(nf) OVER (PARTITION BY user_id
        |    ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM flags),
        |per_sess AS (SELECT user_id, sid, COUNT(*) AS n
        |  FROM sess GROUP BY user_id, sid)
        |SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n) AS BIGINT) AS n_events,
        |  MAX(n) AS max_sess_events
        |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin,

    "s03_transitions" ->
      """SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        |FROM (SELECT event_type,
        |        lag(event_type) OVER (PARTITION BY user_id
        |          ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev_type
        |      FROM events)
        |WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, next_type ORDER BY prev_type, next_type""".stripMargin,

    "s06_rate_anomaly" ->
      """WITH b AS (SELECT
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS bucket_s,
        |    event_type, COUNT(*) AS n
        |  FROM events GROUP BY bucket_s, event_type),
        |w AS (SELECT *,
        |    CAST(coalesce(SUM(n) OVER (PARTITION BY event_type
        |      ORDER BY bucket_s ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING),
        |      0) AS BIGINT) AS trail_sum,
        |    CAST(COUNT(n) OVER (PARTITION BY event_type
        |      ORDER BY bucket_s ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
        |      AS BIGINT) AS n_prev
        |  FROM b)
        |SELECT bucket_s, event_type, n, trail_sum, n_prev,
        |  (n_prev >= 3 AND n * 4 >= trail_sum) AS anomaly
        |FROM w ORDER BY bucket_s, event_type""".stripMargin,

    "s04_late_data" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN hw IS NOT NULL AND sec < hw - 600
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        |FROM (SELECT event_type, sec,
        |        max(sec) OVER (PARTITION BY user_id ORDER BY arr, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw
        |      FROM (SELECT event_type, user_id, event_id,
        |              CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |              CAST(floor(epoch(ts)) AS BIGINT) +
        |                (event_id * 2654435761) % 7200 AS arr
        |            FROM events))
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "s08_windowed_topk" ->
      """WITH g AS (SELECT
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_s,
        |    user_id, COUNT(*) AS n,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
        |  FROM events GROUP BY window_s, user_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY window_s
        |    ORDER BY n DESC, user_id ASC) AS rn FROM g)
        |SELECT window_s, user_id, n, value_c, rn FROM r WHERE rn <= 3
        |ORDER BY window_s, rn""".stripMargin,

    "s07_attribution" ->
      """SELECT p.event_id, p.user_id, p.psec AS purchase_s,
        |  MAX(s.ssec) AS last_signup_s,
        |  CAST(COUNT(s.ssec) AS BIGINT) AS n_signups_2h
        |FROM (SELECT event_id, user_id,
        |        CAST(floor(epoch(ts)) AS BIGINT) AS psec FROM events
        |      WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT user_id AS su,
        |        CAST(floor(epoch(ts)) AS BIGINT) AS ssec FROM events
        |      WHERE event_type = 'signup') s
        |  ON p.user_id = s.su AND s.ssec <= p.psec
        |    AND s.ssec >= p.psec - 7200
        |GROUP BY p.event_id, p.user_id, p.psec
        |ORDER BY p.event_id""".stripMargin,

    "q14_asof_join" ->
      """SELECT p.event_id, p.user_id, p.sec AS ts_s, l.signup_event_id
        |FROM (SELECT event_id, user_id,
        |        CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id,
        |        CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |        MAX(event_id) AS signup_event_id
        |      FROM events WHERE event_type = 'signup'
        |      GROUP BY user_id, sec) l
        |  ON p.user_id = l.user_id AND p.sec >= l.sec
        |ORDER BY p.event_id""".stripMargin)
}
