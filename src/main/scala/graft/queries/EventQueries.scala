package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.streaming.Streams

/** Event-stream operator coverage: windowed aggregation and gap
  * sessionization — the batch twins of the Structured Streaming forms in
  * [[graft.streaming.Streams]]. Timestamps are emitted as formatted strings
  * (µs precision) so engine-level timestamp encodings can't skew the hash
  * compare.
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  val queries: Map[String, Q] = Map(
    // Tumbling 1h window per event type.
    "q16_events_hourly" -> ((s, d) =>
      Streams.hourlyTypeCounts(events(s, d))
        .select(date_format(col("hour"), TsFmt).as("hour"),
          col("event_type"), col("n"), col("value_sum"))),

    // Gap-based sessions (30 min) per user.
    "q17_sessionize" -> ((s, d) =>
      Streams.sessionizeBatch(events(s, d), gapMinutes = 30)
        .select(col("user_id"), col("session_seq"),
          date_format(col("session_start"), TsFmt).as("session_start"),
          date_format(col("session_end"), TsFmt).as("session_end"),
          col("n_events"), col("value_sum"))),

    // Per-type value distribution stats.
    "q18_event_stats" -> ((s, d) =>
      events(s, d)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("value")), 4).as("avg_value"),
          round(min(col("value")), 4).as("min_value"),
          round(max(col("value")), 4).as("max_value"),
          round(stddev_samp(col("value")), 4).as("sd_value"))
        .orderBy(col("event_type"))),

    // Daily active users — count-distinct per day (shuffle on day+user
    // partial-distinct first at scale, which Spark's planner does).
    "q19_daily_active" -> ((s, d) =>
      events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(countDistinct(col("user_id")).as("dau"), count(lit(1)).as("n_events"))
        .orderBy(col("day"))),

    // Backward as-of join (union + window fill, one shuffle): each event
    // picks its user's most recent order as of the event time.
    "q35_asof_join" -> ((s, d) => {
      val ords = orders(s, d).select(
        col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
      graft.operators.AsOfJoin.backward(
        events(s, d).select(col("event_id"), col("user_id"), col("ts")),
        ords, keyCols = Seq("user_id"),
        leftTime = "ts", rightTime = "o_orderdate",
        rightPayload = Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"))
        .orderBy(col("event_id"))
    }),

    // The same backward as-of join through the custom physical operator
    // (plans.AsOfJoinExec: LogicalPlan + Strategy + merge-walk SparkPlan)
    // - graded against the identical DuckDB ASOF oracle as q35.
    "q48_asof_exec" -> ((s, d) => {
      val ords = orders(s, d).select(
        col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
      graft.plans.AsOfJoinPlan.backward(
        events(s, d).select(col("event_id"), col("user_id"), col("ts")),
        ords, keyCols = Seq("user_id"),
        leftTime = "ts", rightTime = "o_orderdate",
        rightPayload = Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"))
        .orderBy(col("event_id"))
    }),

    // Forward as-of join: each event picks its user's NEXT order at or
    // after the event time (same one-shuffle union+window plan, reversed
    // timeline).
    "q47_asof_forward" -> ((s, d) => {
      val ords = orders(s, d).select(
        col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
      graft.operators.AsOfJoin.forward(
        events(s, d).select(col("event_id"), col("user_id"), col("ts")),
        ords, keyCols = Seq("user_id"),
        leftTime = "ts", rightTime = "o_orderdate",
        rightPayload = Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"))
        .orderBy(col("event_id"))
    }),

    // Sketch contracts: HLL++ cardinality and quantile-sketch medians —
    // THE cardinality/quantile tools at 100 TB (bounded state, one
    // pass, mergeable partials) — graded against their exact twins
    // computed in the same aggregate. The oracle pins the CONTRACT
    // (exact values + within-5% booleans = true): if either sketch
    // drifts out of tolerance the hash compare fails. Both sketches
    // are deterministic (hash-based, no RNG), so the gate is stable.
    "q103_sketches" -> ((s, d) =>
      events(s, d).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), rsd = 0.02).as("hll"),
          expr("percentile(value, 0.5)").as("p50_exact"),
          percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50_sketch"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("hll") - col("exact_users")) /
            col("exact_users") <= 0.05).as("hll_within_5pct"),
          round(col("p50_exact"), 2).as("p50"),
          (abs(col("p50_sketch") - col("p50_exact")) /
            col("p50_exact") <= 0.05).as("p50_within_5pct"))
        .orderBy(col("event_type"))),

    // Semi-structured JSON props: extraction is a per-row codegen'd path
    // lookup (get_json_object), then an ordinary aggregate — no UDF, no
    // driver-side parsing; the JSON column stays opaque until the one
    // field the query needs is plucked in the scan projection.
    "q77_json_props" -> ((s, d) =>
      events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          round(avg(col("k")), 6).as("avg_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),

    // Native session_window sessionization (the built-in operator twin of
    // q17's manual gaps-and-islands): one groupBy pass, sessions merge
    // while consecutive events are < 30 min apart (a gap of EXACTLY 30
    // min starts a new session — session windows are half-open
    // [ts, ts+gap)), which the oracle mirrors with `diff >= 1800`.
    "q78_session_native" -> ((s, d) =>
      events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("value_sum"))
        .select(col("user_id"),
          date_format(col("w.start"), TsFmt).as("session_start"),
          col("n_events"), col("value_sum"))
        .orderBy(col("user_id"), col("session_start"))),

    // Gap-filled hourly series (dimension densification): the full
    // (event_type x hour) grid over the data's span, zero-filled where
    // no events landed. The grid is generated (types x sequence of
    // hours — thousands of rows, broadcast-scale), the observed counts
    // aggregate once, and a left join fills the gaps; the fact table is
    // never crossed with anything.
    "q93_gapfill" -> ((s, d) => {
      // ONE fact scan: the span and the type set both derive from the
      // (tiny) hourly aggregate — min/max commute with date_trunc, and
      // every present type appears in at least one count row
      val counts = events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val hours = counts
        .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
        .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
      val grid = counts.select(col("event_type")).distinct().crossJoin(hours)
      grid.join(counts, Seq("event_type", "hour"), "left")
        .select(col("event_type"),
          date_format(col("hour"), TsFmt).as("hour"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy(col("event_type"), col("hour"))
    }),

    // RANGE-framed moving window (vs q5's ROWS frame): per-user trailing
    // 1-hour average — the frame is defined by the ORDER-BY VALUE
    // (epoch seconds), so peers and near-peers join the frame no matter
    // how many rows share a second. One shuffle on user_id; the frame
    // walk is a per-partition two-pointer, never quadratic.
    "q85_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-3600L, Window.currentRow)
      events(s, d).select(col("event_id"), col("user_id"),
          round(avg(col("value")).over(w), 4).as("avg_1h"),
          count(lit(1)).over(w).as("n_1h"))
        .orderBy(col("event_id"))
    }),

    // Interval range join: per user, pairs of events within one minute.
    // Time-bucketed equi-join (user_id, minute) — a hot user in one
    // minute stays bounded to that minute's bucket, not the whole user.
    "q36_range_join" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"), col("ts"), col("event_id"))
      graft.operators.RangeJoin.pairsWithin(e, Seq("user_id"), "ts", windowSec = 60)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    }),

    // Behavior-sequence assembly: each gap-delimited session rendered
    // as its ordered event_type chain (the "training on interaction
    // logs" step — next-event prediction corpora, funnel mining). Same
    // single user-partitioned sort as q17; the rendering fold is
    // bounded by ONE session's events, never corpus state. Ties on ts
    // order by event_id so the chain is deterministic.
    "q183_event_sequences" -> ((s, d) =>
      Streams.sessionSequences(events(s, d), gapMinutes = 30)
        .select(col("user_id"), col("session_seq"),
          date_format(col("session_start"), TsFmt).as("session_start"),
          col("n_events"), col("seq_text"))),

    // Preference-pair mining (RLHF/DPO construction): events as the
    // scored candidate pool — user_id the prompt, event_id the
    // candidate, value the reward — the per-prompt best-vs-worst pair
    // kept when the gap clears the margin floor. ONE hash aggregation
    // (struct min/max extremes, map-side combined), no window; the
    // oracle re-derives both extremes with rank-1 windows and must
    // agree on every tie-break.
    "q194_pref_pairs" -> ((s, d) =>
      graft.operators.Sft.minePreferencePairs(
          events(s, d).select(col("user_id"), col("event_id"), col("value")),
          "user_id", "event_id", "value", minMargin = 1.0)
        .orderBy(col("user_id")))
  )

  val oracles: Map[String, String] = Map(
    "q103_sketches" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        | true AS hll_within_5pct,
        | round(quantile_cont(value, 0.5), 2) AS p50,
        | true AS p50_within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q77_json_props" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
        | max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        | FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q78_session_native" ->
      """WITH lagged AS (
        |  SELECT user_id, ts, value,
        |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events),
        | flagged AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |    OR epoch(ts) - epoch(prev_ts) >= 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM lagged),
        | numbered AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged)
        |SELECT user_id,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        | count(*) AS n_events, round(sum(value), 2) AS value_sum
        | FROM numbered GROUP BY user_id, session_seq
        | ORDER BY user_id, session_start""".stripMargin,
    "q16_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S.%f') AS hour,
        | event_type, count(*) AS n, round(sum(value), 2) AS value_sum
        | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q17_sessionize" ->
      """WITH lagged AS (
        |  SELECT user_id, ts, value,
        |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events),
        | flagged AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |    OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM lagged),
        | numbered AS (
        |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        | strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        | count(*) AS n_events, round(sum(value), 2) AS value_sum
        | FROM numbered GROUP BY user_id, session_seq
        | ORDER BY user_id, session_seq""".stripMargin,
    "q18_event_stats" ->
      """SELECT event_type, count(*) AS n,
        | round(avg(value), 4) AS avg_value,
        | round(min(value), 4) AS min_value,
        | round(max(value), 4) AS max_value,
        | round(stddev_samp(value), 4) AS sd_value
        | FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q19_daily_active" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        | count(DISTINCT user_id) AS dau, count(*) AS n_events
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q35_asof_join" ->
      """SELECT e.event_id, e.user_id, o.o_orderkey
        | FROM events e ASOF LEFT JOIN (
        |  SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2) o
        | ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
        | ORDER BY e.event_id""".stripMargin,
    "q48_asof_exec" ->
      """SELECT e.event_id, e.user_id, o.o_orderkey
        | FROM events e ASOF LEFT JOIN (
        |  SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2) o
        | ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
        | ORDER BY e.event_id""".stripMargin,
    "q93_gapfill" ->
      """WITH span AS (
        |  SELECT date_trunc('hour', min(ts)) AS h0,
        |         date_trunc('hour', max(ts)) AS h1 FROM events),
        | hours AS (
        |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |  FROM span),
        | grid AS (
        |  SELECT t.event_type, h.hour
        |  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN hours h),
        | counts AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT g.event_type,
        | strftime(g.hour, '%Y-%m-%d %H:%M:%S.%f') AS hour,
        | coalesce(c.n, 0) AS n
        |FROM grid g LEFT JOIN counts c
        | ON g.event_type = c.event_type AND g.hour = c.hour
        |ORDER BY g.event_type, g.hour""".stripMargin,
    "q85_moving_avg" ->
      """SELECT event_id, user_id,
        | round(avg(value) OVER w, 4) AS avg_1h,
        | count(*) OVER w AS n_1h
        | FROM events
        | WINDOW w AS (PARTITION BY user_id
        |   ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        | ORDER BY event_id""".stripMargin,
    "q36_range_join" ->
      """SELECT a.user_id, count(*) AS n_pairs
        | FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 MINUTE
        | GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
    "q47_asof_forward" ->
      """SELECT e.event_id, e.user_id, o.o_orderkey
        | FROM events e ASOF LEFT JOIN (
        |  SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2) o
        | ON e.user_id = o.user_id AND e.ts <= o.o_orderdate
        | ORDER BY e.event_id""".stripMargin,

    // the q17 session chain re-derived, plus the ordered event_type
    // rendering per session
    "q183_event_sequences" ->
      """WITH lagged AS (
        |  SELECT user_id, ts, event_id, event_type,
        |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events),
        | flagged AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |    OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM lagged),
        | numbered AS (
        |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        | CAST(count(*) AS BIGINT) AS n_events,
        | string_agg(event_type, ' -> ' ORDER BY ts, event_id) AS seq_text
        | FROM numbered GROUP BY user_id, session_seq
        | ORDER BY user_id, session_seq""".stripMargin,

    // best = rank 1 by (value DESC, event_id), worst = rank 1 by
    // (value ASC, event_id) — the window twin of the struct extremes;
    // the margin filter applies to the ROUNDED margin on both sides
    "q194_pref_pairs" ->
      """WITH s AS (SELECT user_id, event_id, value FROM events
        |   WHERE value IS NOT NULL),
        | r AS (SELECT user_id, event_id, value,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY value DESC, event_id) AS rb,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY value ASC, event_id) AS rw
        |  FROM s),
        | c AS (SELECT user_id, event_id AS chosen_id, value AS cs
        |   FROM r WHERE rb = 1),
        | w AS (SELECT user_id, event_id AS rejected_id, value AS ws
        |   FROM r WHERE rw = 1)
        |SELECT c.user_id, c.chosen_id, w.rejected_id,
        |  round(c.cs - w.ws, 6) AS margin
        |FROM c JOIN w USING (user_id)
        |WHERE c.chosen_id <> w.rejected_id
        |  AND round(c.cs - w.ws, 6) >= 1.0
        |ORDER BY c.user_id""".stripMargin
  )
}
