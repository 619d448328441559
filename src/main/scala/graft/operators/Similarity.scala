package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.VectorFunctions._

/** Similarity search over array<float> embedding columns.
  *
  * Brute force is the exact baseline: one broadcast of the query vector,
  * one codegen'd dot-product scan, TakeOrderedAndProject for top-k
  * (partition-local heaps + driver merge of k rows — this IS the scalable
  * plan for single-query scans; no shuffle of the fact table).
  *
  * The LSH variant is the high-QPS scale path: 16 random-hyperplane sign
  * bits bucket the corpus; a query probes its bucket plus all buckets
  * within Hamming distance `probeRadius`, then scores only candidates.
  */
object Similarity {

  val Dim = 64
  val NPlanes = 16
  val Seed = 7L

  /** Exact cosine top-k of `queryVecId`'s embedding against the corpus. */
  def bruteForceTopK(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"))
    embeddings.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("label").cast(LongType).as("label"),
        round(cosine(col("embedding"), col("q_emb")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** LSH-bucketed approximate top-k: candidates from multi-probe bucket
    * lookup, exact cosine only on candidates. */
  def lshTopK(spark: SparkSession, embeddings: DataFrame, queryVecId: Long,
      k: Int, probeRadius: Int = 3): DataFrame = {
    val signed = embeddings
      .withColumn("sig", hyperplaneBits(col("embedding"), Dim, NPlanes, Seed))
    val q = signed.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"), col("sig").as("q_sig"))
    // all signatures within Hamming <= probeRadius of the query's
    val masks = probeMasks(probeRadius)
    import spark.implicits._
    val maskDf = masks.toDF("mask")
    val probes = q.crossJoin(broadcast(maskDf))
      .select(col("q_emb"), expr("q_sig ^ mask").as("probe_sig"))
    signed.join(broadcast(probes), col("sig") === col("probe_sig"))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("label").cast(LongType).as("label"),
        round(cosine(col("embedding"), col("q_emb")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** XOR masks enumerating all signatures within Hamming distance r. */
  def probeMasks(r: Int): Seq[Long] = {
    def combos(bits: List[Int], choose: Int): Seq[Long] =
      if (choose == 0) Seq(0L)
      else bits match {
        case Nil => Seq.empty
        case h :: t => combos(t, choose - 1).map(_ | (1L << h)) ++ combos(t, choose)
      }
    (0 to r).flatMap(c => combos((0 until NPlanes).toList, c))
  }

  /** Exact near-duplicate pairs by cosine threshold over the first
    * `maxVectors` vectors (honest cap for the O(n^2) baseline — the LSH
    * path above is the scale story; the cap is part of the query name). */
  def nearDupPairs(embeddings: DataFrame, threshold: Double, maxVectors: Long): DataFrame = {
    // norms are computed once per vector, not once per pair — the pair
    // loop then costs a single dot product (same double arithmetic as
    // cosine(), so results are bit-identical)
    val e = embeddings.filter(col("vec_id") < maxVectors)
      .select(col("vec_id"), col("embedding"), vecNorm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
      col("nrm").as("nrm_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
      col("nrm").as("nrm_b"))
    val den = col("nrm_a") * col("nrm_b")
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_raw",
        when(den =!= 0.0, vecDot(col("emb_a"), col("emb_b")) / den))
      .filter(col("cos_raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_raw"), 6).as("cos_sim"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
