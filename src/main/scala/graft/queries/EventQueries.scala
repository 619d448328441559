package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.streaming.EventStreams

/** Batch formulations of the streaming transforms (graft.streaming
  * .EventStreams) over the events table. The exact same plan-building
  * functions run under readStream with a watermark (covered in scalatest);
  * here the batch run is oracle-checked against DuckDB.
  */
object EventQueries {

  private def eventsTumbling(s: SparkSession, dir: String): DataFrame =
    EventStreams.tumblingCounts(Tables.events(s, dir))
      .orderBy(col("win_start"), col("event_type"))

  private val eventsTumblingSql =
    """SELECT strftime(time_bucket(INTERVAL '15 minutes', ts),
      |                '%Y-%m-%d %H:%M:%S') AS win_start,
      |  event_type, COUNT(*) AS n_events,
      |  SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // the streaming quality gate's batch form: per-window violation
  // counters over deterministically planted violations (the harness
  // events are clean; same device as text_pii) — the stream-vs-batch
  // equivalence lives in EventStreamsSpec
  private def eventsQualityWindow(s: SparkSession, dir: String): DataFrame =
    EventStreams.qualityMonitor(Tables.events(s, dir))
      .orderBy(col("win_start"))

  private val eventsQualityWindowSql =
    """WITH t AS (
      |  SELECT time_bucket(INTERVAL '15 minutes', ts) AS w,
      |    CASE WHEN event_id % 7 = 0 THEN value - 500.0 ELSE value END AS v,
      |    CASE WHEN event_id % 13 = 0 THEN 'bad_' || event_type
      |         ELSE event_type END AS et,
      |    CASE WHEN event_id % 11 = 0 THEN NULL ELSE user_id END AS uid
      |  FROM events)
      |SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS win_start,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg_value,
      |  CAST(SUM(CASE WHEN et NOT IN ('click','view','purchase','signup','error')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_type,
      |  CAST(SUM(CASE WHEN uid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_null_user
      |FROM t GROUP BY w ORDER BY win_start""".stripMargin

  private def eventsSessionize(s: SparkSession, dir: String): DataFrame =
    EventStreams.sessionize(Tables.events(s, dir))

  private val eventsSessionizeSql =
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events
      |), m AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN prev_ts IS NULL
      |           OR (epoch_us(ts) // 1000000) - (epoch_us(prev_ts) // 1000000) > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM e
      |), s AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM m
      |)
      |SELECT user_id, session_seq, COUNT(*) AS n_events,
      |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  (epoch_us(MAX(ts)) // 1000000) - (epoch_us(MIN(ts)) // 1000000) AS duration_sec
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // batch form of the stream-stream interval join: views attributed to
  // each click of the same user within the prior 30 minutes
  private def eventsClickAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    EventStreams.clickAttribution(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"))
      .groupBy(col("click_id"))
      .agg(count(lit(1)).as("n_views"), max(col("view_id")).as("last_view_id"))
      .orderBy(col("click_id"))
  }

  private val eventsClickAttributionSql =
    """SELECT c.event_id AS click_id, COUNT(*) AS n_views,
      |  MAX(v.event_id) AS last_view_id
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id
      | AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 30 MINUTE
      |GROUP BY c.event_id ORDER BY c.event_id""".stripMargin

  private def eventsSliding(s: SparkSession, dir: String): DataFrame =
    EventStreams.slidingCounts(Tables.events(s, dir))
      .orderBy(col("win_start"), col("event_type"))

  // each event belongs to the 3 slide-aligned windows starting at
  // bucket(5min, ts) - k*5min, k in 0..2 — the same window set Spark's
  // window(ts, 15min, 5min) generates (epoch-aligned in both engines)
  private val eventsSlidingSql =
    """WITH w AS (
      |  SELECT event_type, value,
      |    time_bucket(INTERVAL '5 minutes', ts) - k.k * INTERVAL '5 minutes' AS ws
      |  FROM events CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) k
      |)
      |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
      |  COUNT(*) AS n_events,
      |  SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
      |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- sequential conversion funnel: signup -> first view after signup
  // -> first click after that view -> first purchase after that click,
  // per user. ONE user-partitioned shuffle: each stage's timestamp is a
  // whole-partition window min over the previous stage's column (strict
  // > comparisons make the stages genuinely sequential, not mere
  // per-type presence), then a single global count of users per reached
  // stage. The per-user event group is the unit of state — the shape
  // that scales to any fact size with per-user cardinality bounded.
  private def eventsFunnel(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    def firstAfter(etype: String, prevTs: Column): Column =
      min(when(col("event_type") === etype && col("ts") > prevTs, col("ts")))
        .over(w)
    Tables.events(s, dir)
      .withColumn("t1",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("t2", firstAfter("view", col("t1")))
      .withColumn("t3", firstAfter("click", col("t2")))
      .withColumn("t4", firstAfter("purchase", col("t3")))
      // stage times are constant per user: collapse to one row per user
      // (no extra shuffle — same partitioning as the window), then count
      // non-nulls; a countDistinct-per-stage would Expand every event 4x
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("u1"), max(col("t2")).as("u2"),
        max(col("t3")).as("u3"), max(col("t4")).as("u4"))
      .agg(
        count(col("u1")).as("n_signup"),
        count(col("u2")).as("n_then_view"),
        count(col("u3")).as("n_then_click"),
        count(col("u4")).as("n_then_purchase"))
  }

  private val eventsFunnelSql =
    """WITH s1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY 1
      |), s2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1
      |), s3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s2.t2 GROUP BY 1
      |), s4 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t4 FROM events e JOIN s3 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s3.t3 GROUP BY 1
      |)
      |SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
      |  (SELECT COUNT(*) FROM s2) AS n_then_view,
      |  (SELECT COUNT(*) FROM s3) AS n_then_click,
      |  (SELECT COUNT(*) FROM s4) AS n_then_purchase""".stripMargin

  // ---- z-score anomaly counts per event type (the metric-outlier
  // data-quality screen). Both moments accumulate as EXACT integers
  // (cents and squared cents), so mean and std are identical doubles in
  // both engines regardless of aggregation order, and the 2-sigma
  // predicate can't straddle engines. Stats are one tiny broadcast back
  // onto the fact scan. The squared moment goes through decimal(38,0):
  // a long*long product overflows (and throws under ANSI) at |value| >
  // ~30M cents^2-wise, while DuckDB's SUM(BIGINT) silently widens to
  // HUGEINT — decimal keeps the Spark side exact AND non-divergent, and
  // the decimal->double conversion at the /10000.0 step is the same
  // correctly-rounded double DuckDB gets from HUGEINT.
  private def eventsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir).select(col("event_type"),
      round(col("value") * lit(100)).cast("long").as("vc"))
    val stats = base.groupBy(col("event_type"))
      .agg(sum(col("vc")).as("s1"),
        sum(col("vc").cast("decimal(19,0)") * col("vc").cast("decimal(19,0)"))
          .as("s2"),
        count(lit(1)).as("n"))
    base.join(broadcast(stats), "event_type")
      .withColumn("mean", col("s1") / lit(100.0) / col("n"))
      .withColumn("std",
        sqrt(col("s2") / lit(10000.0) / col("n") - col("mean") * col("mean")))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_events"),
        count(when(abs(col("vc") / lit(100.0) - col("mean")) > lit(2.0) * col("std"), 1))
          .as("n_outliers"),
        round(max(col("mean")), 4).as("mean_value"),
        round(max(col("std")), 4).as("std_value"))
      .orderBy(col("event_type"))
  }

  private val eventsAnomalySql =
    """WITH c AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc FROM events
      |), st AS (
      |  SELECT event_type, SUM(vc) AS s1, SUM(vc * vc) AS s2, COUNT(*) AS n
      |  FROM c GROUP BY 1
      |), j AS (
      |  SELECT c.event_type, vc, n,
      |    s1 / 100.0 / n AS mean,
      |    sqrt(s2 / 10000.0 / n - (s1 / 100.0 / n) * (s1 / 100.0 / n)) AS std
      |  FROM c JOIN st USING (event_type)
      |)
      |SELECT event_type, MAX(n) AS n_events,
      |  COUNT(CASE WHEN abs(vc / 100.0 - mean) > 2.0 * std THEN 1 END) AS n_outliers,
      |  ROUND(MAX(mean), 4) AS mean_value,
      |  ROUND(MAX(std), 4) AS std_value
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- semi-structured extraction: pull a typed field out of the JSON
  // props column in the scan (codegen'd get_json_object path — no UDF,
  // no schema inference job) and aggregate it. Exact integer sums.
  private def eventsJsonProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_parsed"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  private val eventsJsonPropsSql =
    """WITH p AS (
      |  SELECT event_type,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events
      |)
      |SELECT event_type, COUNT(k) AS n_parsed, CAST(SUM(k) AS BIGINT) AS sum_k,
      |  MIN(k) AS min_k, MAX(k) AS max_k
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- weekly cohort retention (the engagement-decay table every
  // product analytics stack derives). Weeks are pure integer epoch
  // arithmetic (floor(epoch_seconds / 604800)) — no calendar/timezone
  // semantics to diverge across engines. ONE user-keyed shuffle: the
  // per-user week set is collected in the same aggregation that takes
  // the cohort min, then exploded — per-user state is bounded by the
  // number of distinct weeks in the corpus, so the shape holds at any
  // fact size.
  private def eventsRetention(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), expr("unix_timestamp(ts) div 604800").as("wk"))
      .groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort_week"), collect_set(col("wk")).as("wks"))
      .select(col("cohort_week"), explode(col("wks")).as("wk"))
      .groupBy(col("cohort_week"),
        (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))

  private val eventsRetentionSql =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, epoch_ms(ts) // 1000 // 604800 AS wk
      |  FROM events
      |), c AS (
      |  SELECT user_id, wk,
      |    MIN(wk) OVER (PARTITION BY user_id) AS cohort_week
      |  FROM uw
      |)
      |SELECT cohort_week, wk - cohort_week AS week_offset,
      |  COUNT(*) AS n_users
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- event-type transition matrix (the Markov-chain input for
  // behavioral modeling / next-event prediction): count of consecutive
  // (from, to) event-type pairs per user. One user-keyed shuffle for the
  // lag window (per-user partitions — bounded state at any scale), then
  // a tiny |types|^2 aggregation. (ts, event_id) is a deterministic
  // total order within a user on both engines.
  private def eventsTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy(col("from_type"), col("to_type"))
  }

  private val eventsTransitionsSql =
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS from_type
      |  FROM events
      |)
      |SELECT from_type, event_type AS to_type, COUNT(*) AS n_transitions
      |FROM s WHERE from_type IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("events_tumbling_window", Some(eventsTumblingSql), eventsTumbling),
    QueryDef("events_quality_window", Some(eventsQualityWindowSql), eventsQualityWindow),
    QueryDef("events_retention", Some(eventsRetentionSql), eventsRetention),
    QueryDef("events_transitions", Some(eventsTransitionsSql), eventsTransitions),
    QueryDef("events_json_props", Some(eventsJsonPropsSql), eventsJsonProps),
    QueryDef("events_anomaly", Some(eventsAnomalySql), eventsAnomaly),
    QueryDef("events_funnel", Some(eventsFunnelSql), eventsFunnel),
    QueryDef("events_sliding_window", Some(eventsSlidingSql), eventsSliding),
    QueryDef("events_sessionize", Some(eventsSessionizeSql), eventsSessionize),
    QueryDef("events_click_attribution",
      Some(eventsClickAttributionSql), eventsClickAttribution),
  )
}
