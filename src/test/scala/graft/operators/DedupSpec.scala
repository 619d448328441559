package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("exact dedup keeps min doc_id per identical text") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma"), (4L, "alpha beta"))
      .toDF("doc_id", "text")
    val got = Dedup.exactKeepers(df).orderBy("keeper_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 3L), (3L, 1L)))
  }

  test("minhash candidates are a subset of exact ngram-Jaccard pairs and " +
    "recover every high-similarity pair") {
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val mh = Dedup.minhashPairs(docs, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both paths verify exact Jaccard >= threshold, so every minhash pair
    // must also be an exact pair
    assert(mh.subsetOf(exact.keySet))
    // banding (16 bands x 4 rows) misses a jaccard>=0.9 pair with
    // probability (1 - 0.9^4)^16 ~= 4e-8 — treat as deterministic recall
    val high = exact.filter(_._2 >= 0.9).keySet
    assert(high.subsetOf(mh), s"missed high-sim pairs: ${high -- mh}")
  }

  test("simhash blocks identical and near-identical docs at hamming 0") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words about entirely other topics here now"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashPairs(df, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 0L)))
  }

  test("simhash pairs agree with brute-force hamming over all doc pairs") {
    import graft.functions.{HashFunctions, TextFunctions}
    val sims = docs
      .select(col("doc_id"),
        HashFunctions.simhash(TextFunctions.tokens(col("text"))).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val expected = (for {
      (ida, sa) <- sims; (idb, sb) <- sims if ida < idb
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ida, idb, h.toLong)).toSet
    val got = Dedup.simhashPairs(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // chunk blocking guarantees recall only through hamming 3 (4 chunks)
    assert(got === expected)
  }
}
