package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: payloads are opaque `binary` columns with a typed metadata
  * struct; decode/feature-extraction runs per-partition in bounded
  * batches so executor memory stays flat regardless of corpus size.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape, typed
  * Dataset API — is real and tested. The codec itself is STUBBED
  * (StubDecoder): this container has no image/audio libraries, so the
  * decode step is a deterministic fake with the exact signature a real
  * decoder (JPEG -> pixels -> embedding, PCM -> mel features, ...) would
  * plug into.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  final case class MediaMeta(format: String, width: Int, height: Int, nFrames: Int)

  final case class MediaRow(media_id: Long, kind: String,
      payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Long, feature: Array[Float])

  /** Decode + feature-extract contract. `decodeBatch` receives a bounded
    * batch (the mapInPandas/Arrow batch shape): real decoders amortize
    * model/codec setup across the batch. */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    def decodeBatch(batch: Seq[MediaRow]): Seq[Array[Float]]
  }

  /** STUB DECODER — deterministic fake. A real deployment replaces this
    * with an actual codec + model (e.g. libjpeg/ffmpeg + an ONNX
    * encoder); nothing else in the pipeline changes. The fake maps the
    * payload's 16 md5 bytes to a fixed-dim pseudo-feature in [-1, 1):
    * md5 is PORTABLE (identical in any engine), each byte is exact in
    * float, and u/127.5f - 1.0f is two correctly-rounded float ops — so
    * the features replay bit-for-bit cross-engine and the decode query
    * carries a full DuckDB oracle despite the stubbed codec. */
  object StubDecoder extends MediaDecoder {
    override val featureDim = 16
    override def decodeBatch(batch: Seq[MediaRow]): Seq[Array[Float]] = {
      // one JCA lookup per batch, not per row; digest() resets the state
      val md5 = java.security.MessageDigest.getInstance("MD5")
      batch.map { row =>
        val md = md5.digest(row.payload)
        Array.tabulate(featureDim)(i => ((md(i) & 0xff).toFloat / 127.5f) - 1.0f)
      }
    }
  }

  /** Synthetic media table derived deterministically from documents —
    * a stand-in corpus: the UTF-8 text bytes play the opaque payload
    * role so the binary plumbing is exercised end-to-end on the harness
    * data. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        element_at(array(lit("jpeg"), lit("pcm16"), lit("h264")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
        (pmod(col("doc_id"), lit(8)) * 64 + 256).cast("int").as("width"),
        (pmod(col("doc_id"), lit(8)) * 48 + 192).cast("int").as("height"),
        (pmod(col("doc_id"), lit(30)) + 1).cast("int").as("nFrames")).as("meta"))

  /** Per-partition batched decode: iterator-in/iterator-out, `batchSize`
    * rows materialized at a time (never the whole partition), so a 100 TB
    * scan holds O(batchSize x payload) bytes per task. */
  def extractFeatures(media: Dataset[MediaRow], decoder: MediaDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val feats = decoder.decodeBatch(batch)
        batch.lazyZip(feats).map { (row, f) =>
          MediaFeatures(row.media_id, row.kind, row.payload.length.toLong, f)
        }
      }
    }
  }

  /** Frame sampling as a relational plan: one output row per sampled
    * frame index (every `everyN`-th frame, metadata-driven) — the
    * explode happens before decode so only sampled frames are ever
    * decoded downstream. */
  def sampleFrames(media: DataFrame, everyN: Int): DataFrame =
    media
      .filter(col("kind") === "video" && col("meta.nFrames") > 0)
      .select(col("media_id"), col("payload"), col("meta"),
        explode(sequence(lit(0), col("meta.nFrames") - 1, lit(everyN)))
          .as("frame_idx"))

  /** Resize planning: pure metadata arithmetic (target box, preserved
    * aspect ratio) — the actual pixel work belongs to the decoder stub. */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide.toDouble) / col("meta.width"),
      lit(maxSide.toDouble) / col("meta.height"),
      lit(1.0))
    media.select(col("media_id"), col("kind"), col("meta"),
      round(col("meta.width") * scale).cast("int").as("target_w"),
      round(col("meta.height") * scale).cast("int").as("target_h"))
  }

  /** Harness query: features + per-kind stats over the synthetic media
    * corpus. Feature values come from the stub decoder, whose md5-based
    * fake is portable — the query carries a full DuckDB oracle. */
  def mediaFeatureStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media = fromDocuments(docs).as[MediaRow]
    // feature values are quantized to exact integer micro-units before
    // the sum (the embed_centroids/text_surprisal pattern): a plain
    // avg() of fractional doubles is aggregation-ORDER-dependent in the
    // last ulp, which can flip the 6th rounded decimal between engines
    extractFeatures(media, StubDecoder).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("sum_bytes"),
        sum(round(element_at(col("feature"), 1) * lit(1000000.0))
          .cast(org.apache.spark.sql.types.LongType)).as("qsum"))
      .select(col("kind"), col("n_media"), col("sum_bytes"),
        round(col("qsum") / lit(1000000.0) / col("n_media"), 6).as("avg_f0"))
      .orderBy(col("kind"))
  }
}
