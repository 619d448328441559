package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  // per user. Each stage is one filtered aggregation joined on user_id
  // (per-user stage frames are one row each — broadcastable at any fact
  // scale); strict > comparisons make the stages genuinely sequential,
  // not mere per-type presence.
  private def eventsFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def stage(etype: String, prev: DataFrame, prevTs: String, out: String) =
      ev.filter(col("event_type") === etype)
        .join(prev, "user_id")
        .filter(col("ts") > col(prevTs))
        .groupBy(col("user_id")).agg(min(col("ts")).as(out))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = stage("view", s1, "t1", "t2")
    val s3 = stage("click", s2, "t2", "t3")
    val s4 = stage("purchase", s3, "t3", "t4")
    s1.agg(count(lit(1)).as("n_signup"))
      .crossJoin(s2.agg(count(lit(1)).as("n_then_view")))
      .crossJoin(s3.agg(count(lit(1)).as("n_then_click")))
      .crossJoin(s4.agg(count(lit(1)).as("n_then_purchase")))
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

  val all: Seq[QueryDef] = Seq(
    QueryDef("events_tumbling_window", Some(eventsTumblingSql), eventsTumbling),
    QueryDef("events_funnel", Some(eventsFunnelSql), eventsFunnel),
    QueryDef("events_sliding_window", Some(eventsSlidingSql), eventsSliding),
    QueryDef("events_sessionize", Some(eventsSessionizeSql), eventsSessionize),
    QueryDef("events_click_attribution",
      Some(eventsClickAttributionSql), eventsClickAttribution),
  )
}
