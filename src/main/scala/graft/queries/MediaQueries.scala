package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.operators.Multimodal

/** Multimodal-pipeline harness queries over the synthetic media corpus
  * (documents' UTF-8 bytes standing in for opaque image/audio/video
  * payloads — see graft.operators.Multimodal). Metadata-driven plans
  * (frame sampling, resize) are exact and oracle-checked, and so is the
  * decode path: the stub decoder's md5-based fake replays identically
  * in DuckDB, so all three media queries carry full oracles.
  */
object MediaQueries {

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.fromDocuments(Tables.documents(s, dir))

  // ---- binary payload decode -> per-kind feature stats. The stub
  // decoder's md5-based fake is portable (see Multimodal.StubDecoder),
  // so even the decode path is fully oracle-checked: DuckDB recomputes
  // feature[0] as (md5_byte0 / 127.5f) - 1.0f in float arithmetic.
  private def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFeatureStats(s, Tables.documents(s, dir))

  // strlen(text) = raw UTF-8 byte count (CAST(text AS BLOB) would
  // interpret backslash escapes: '\xHH' collapses to one byte and a
  // bare backslash errors). Feature micro-units are summed as exact
  // integers (see Multimodal.mediaFeatureStats) so the average is
  // aggregation-order independent on both engines.
  private val mediaFeaturesSql =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    CAST(strlen(text) AS BIGINT) AS n_bytes,
      |    CAST(CONCAT('0x', substr(md5(text), 1, 2)) AS INT) AS b0
      |  FROM documents
      |)
      |SELECT kind, COUNT(*) AS n_media,
      |  CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
      |  ROUND(SUM(CAST(ROUND((CAST(b0 AS FLOAT) / CAST(127.5 AS FLOAT)
      |        - CAST(1.0 AS FLOAT)) * 1000000.0) AS BIGINT))
      |      / 1000000.0 / COUNT(*), 6) AS avg_f0
      |FROM m GROUP BY kind ORDER BY kind""".stripMargin

  // ---- metadata-driven frame sampling: every 3rd frame of each video.
  private def mediaFrameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(media(s, dir), everyN = 3)
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("media_id")).as("n_videos"),
        sum(col("frame_idx")).as("sum_idx"))

  private val mediaFrameSampleSql =
    """WITH v AS (
      |  SELECT doc_id AS media_id, CAST(doc_id % 30 + 1 AS INT) AS nframes
      |  FROM documents WHERE doc_id % 3 = 2
      |), f AS (
      |  SELECT media_id, unnest(range(0, nframes, 3)) AS frame_idx FROM v
      |)
      |SELECT COUNT(*) AS n_frames, COUNT(DISTINCT media_id) AS n_videos,
      |  CAST(SUM(frame_idx) AS BIGINT) AS sum_idx
      |FROM f""".stripMargin

  // ---- resize planning: aspect-preserving fit into a 224-px box,
  // metadata arithmetic only.
  private def mediaResizePlan(s: SparkSession, dir: String): DataFrame =
    Multimodal.resizePlan(media(s, dir), maxSide = 224)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("target_w")).as("sum_w"),
        sum(col("target_h")).as("sum_h"))
      .orderBy(col("kind"))

  private val mediaResizePlanSql =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    CAST(doc_id % 8 * 64 + 256 AS INT) AS w,
      |    CAST(doc_id % 8 * 48 + 192 AS INT) AS h
      |  FROM documents
      |)
      |SELECT kind, COUNT(*) AS n_media,
      |  CAST(SUM(CAST(ROUND(w * LEAST(224.0 / w, 224.0 / h, 1.0)) AS INT)) AS BIGINT) AS sum_w,
      |  CAST(SUM(CAST(ROUND(h * LEAST(224.0 / w, 224.0 / h, 1.0)) AS INT)) AS BIGINT) AS sum_h
      |FROM m GROUP BY kind ORDER BY kind""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("media_features", Some(mediaFeaturesSql), mediaFeatures),
    QueryDef("media_frame_sample", Some(mediaFrameSampleSql), mediaFrameSample),
    QueryDef("media_resize_plan", Some(mediaResizePlanSql), mediaResizePlan),
  )
}
