package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def bruteIds(k: Int): Seq[Long] =
    Similarity.bruteForceTopK(emb, queryVecId = 0L, k = k)
      .collect().map(_.getLong(0)).toSeq

  test("brute-force top-k is ordered by similarity desc, excludes the query") {
    val rows = Similarity.bruteForceTopK(emb, 0L, 10).collect()
    assert(rows.length === 10)
    assert(!rows.map(_.getLong(0)).contains(0L))
    val sims = rows.map(_.getDouble(2))
    assert(sims.sorted.reverse.toSeq === sims.toSeq)
  }

  test("IVF top-k recalls most of the exact top-k while probing a fraction " +
    "of the corpus") {
    val exact = bruteIds(10).toSet
    val ivf = Similarity.ivfTopK(emb, queryVecId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & ivf).size / 10.0
    info(s"IVF recall@10 = $recall (probing 6/16 cells)")
    assert(recall >= 0.5, s"recall too low: got $ivf vs exact $exact")
  }

  test("batch IVF top-k agrees with the single-query path") {
    val queries = emb.filter(col("vec_id").isin(0L, 5L, 9L))
    val batch = Similarity.ivfBatchTopK(emb, queries, k = 10)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(batch.keySet === Set(0L, 5L, 9L))
    Seq(0L, 5L, 9L).foreach { q =>
      val single = Similarity.ivfTopK(emb, q, k = 10)
        .collect().map(_.getLong(0)).toSet
      assert(batch(q) === single, s"query $q")
    }
  }

  test("int8-quantized index preserves most of the exact top-k") {
    import graft.functions.VectorFunctions.{dequantize8, quantize8}
    val exact = bruteIds(10).toSet
    val quantized = Similarity.bruteForceTopK(
        emb.withColumn("embedding", dequantize8(quantize8(col("embedding")))),
        queryVecId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert((exact & quantized).size >= 8,
      s"quantized recall too low: $quantized vs $exact")
  }

  test("sign-LSH top-k finds a planted near-duplicate (its design regime)") {
    import spark.implicits._
    // plant a vector nearly identical to vec 0: same hyperplane signs,
    // same bucket, so even probeRadius 0 would surface it
    val base = emb.filter(col("vec_id") === 0L)
      .head().getSeq[Float](1).toArray
    val planted = base.map(x => x * 1.01f + 0.001f)
    val corpus = emb.select(col("vec_id"), col("embedding"), col("label"))
      .unionByName(Seq((999999L, planted.toSeq, 0))
        .toDF("vec_id", "embedding", "label")
        .select(col("vec_id"), col("embedding").cast("array<float>"), col("label")))
    val top = Similarity.lshTopK(spark, corpus, queryVecId = 0L, k = 3)
      .collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(0) === 999999L, top.mkString(","))
    assert(top.head.getDouble(2) > 0.999)
  }

  test("IVF centroid assignment is total and deterministic") {
    val cents = Similarity.ivfCentroids(emb, dim = 64, c = 16, iters = 2, seed = 7L)
    assert(cents.length === 16)
    val assigned = emb
      .withColumn("cluster", Similarity.assignCluster(col("embedding"), cents))
    val counts = assigned.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keys.forall(c => c >= 0 && c < 16))
    assert(counts.values.sum === emb.count())
  }
}
