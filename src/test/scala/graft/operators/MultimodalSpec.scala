package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.SparkTestBase
import graft.operators.Multimodal._

class MultimodalSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("media table: opaque binary payload + typed metadata struct") {
    val m = Multimodal.fromDocuments(docs)
    assert(m.schema("payload").dataType === BinaryType)
    val meta = m.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq === Seq("format", "width", "height", "nFrames"))
    val row = m.orderBy("media_id").head()
    assert(Set("image", "audio", "video").contains(row.getString(1)))
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
  }

  test("extractFeatures decodes in bounded batches, never whole partitions") {
    import spark.implicits._
    val sizes = spark.sparkContext.collectionAccumulator[Int]("batch_sizes")
    class RecordingDecoder extends MediaDecoder {
      override val featureDim = 4
      override def decodeBatch(batch: Seq[MediaRow]): Seq[Array[Float]] = {
        sizes.add(batch.size)
        batch.map(r => Array.fill(featureDim)(r.payload.length.toFloat))
      }
    }
    val media = Multimodal.fromDocuments(docs).as[MediaRow].repartition(2)
    val out = Multimodal.extractFeatures(media, new RecordingDecoder, batchSize = 7)
    val n = out.count()
    assert(n === docs.count())
    val observed = sizes.value.toArray(Array.empty[Integer]).map(_.toInt)
    assert(observed.nonEmpty && observed.max <= 7)
    assert(observed.sum === n)
  }

  test("stub features are deterministic across runs and partitionings") {
    import spark.implicits._
    def run(parts: Int) =
      Multimodal.extractFeatures(
          Multimodal.fromDocuments(docs).as[MediaRow].repartition(parts),
          StubDecoder)
        .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    assert(run(2) === run(5))
  }

  test("sampleFrames emits every Nth frame index per video") {
    val m = Multimodal.fromDocuments(docs)
    val got = Multimodal.sampleFrames(m, everyN = 3)
      .groupBy("media_id").agg(collect_list(col("frame_idx")).as("idx"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).sorted).toMap
    val expected = m.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.nFrames"))
      .collect().map(r => r.getLong(0) -> (0 until r.getInt(1) by 3).toSeq).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("resizePlan preserves aspect ratio and never upscales") {
    val got = Multimodal.resizePlan(Multimodal.fromDocuments(docs), maxSide = 224)
      .collect()
    got.foreach { r =>
      val meta = r.getStruct(2)
      val (w, h) = (meta.getInt(1), meta.getInt(2))
      val (tw, th) = (r.getInt(3), r.getInt(4))
      assert(tw <= 224 && th <= 224)
      assert(tw <= w && th <= h)
      assert(math.abs(tw.toDouble / th - w.toDouble / h) < 0.02)
    }
    assert(got.nonEmpty)
  }
}
