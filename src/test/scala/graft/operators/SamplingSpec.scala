package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("hash sample is deterministic across partitionings and close to pct") {
    def ids(parts: Int) =
      Sampling.hashSample(docs.repartition(parts), Seq(col("doc_id")), 20)
        .collect().map(_.getLong(0)).toSet
    val a = ids(2)
    assert(a === ids(7))
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.12 && frac < 0.28, s"fraction $frac")
  }

  test("holdout split is disjoint, exhaustive, and append-stable") {
    val (train, held) = Sampling.holdoutSplit(docs, Seq(col("doc_id")), 10)
    val t = train.collect().map(_.getLong(0)).toSet
    val h = held.collect().map(_.getLong(0)).toSet
    assert((t & h).isEmpty)
    assert(t.size + h.size === docs.count())
    // the same keys land on the same side when sampled from a subset
    val (train2, _) = Sampling.holdoutSplit(
      docs.filter(col("doc_id") < 100), Seq(col("doc_id")), 10)
    assert(train2.collect().map(_.getLong(0)).toSet === t.filter(_ < 100))
  }

  test("stratified sampling caps chosen strata only") {
    val sampled = Sampling.stratifiedSample(docs, col("lang"),
      Seq(col("doc_id")), Map("en" -> 20), defaultPct = 100)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") < full("en") / 2)
    (full.keySet - "en").foreach(l => assert(byLang(l) === full(l), l))
  }

  test("balanced sample takes exactly cap per stratum, stable across partitionings") {
    def sampled(parts: Int) =
      Sampling.balancedSample(docs.repartition(parts), col("lang"),
        Seq(col("doc_id")), cap = 30, seed = 7L)
        .select(col("lang"), col("doc_id"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    val a = sampled(2)
    assert(a === sampled(11), "membership must not depend on partitioning")
    val perLang = a.groupBy(_._1).view.mapValues(_.size)
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (l, n) =>
      assert(perLang(l) === math.min(30L, n), s"lang $l")
    }
  }

  test("balanced sample keeps whole strata smaller than the cap") {
    val got = Sampling.balancedSample(docs, col("lang"), Seq(col("doc_id")),
      cap = 1000000, seed = 7L).count()
    assert(got === docs.count())
  }

  test("importance weights separate a planted target vocabulary") {
    import spark.implicits._
    // target docs carry a marker token the raw-only docs never do, plus
    // the shared vocabulary; the learned log-ratio must score every
    // target doc positive and every raw-only doc non-positive
    val rows = (0L until 40L).map { i =>
      val base = s"alpha beta gamma delta tok$i"
      if (i % 4 == 0) (i, s"$base wiki wiki wiki", true)
      else (i, base, false)
    }
    val df = rows.toDF("id", "text", "is_tgt")
    val w = Sampling.importanceWeights(df, "text", col("is_tgt"), buckets = 64)
    val got = w.select(col("id"), col("is_tgt"), col("dsir_millinats"),
      col("dsir_n_toks")).collect()
    assert(got.length === 40)
    got.foreach { r =>
      val (tgtRow, mn, n) = (r.getBoolean(1), r.getLong(2), r.getLong(3))
      if (tgtRow) {
        assert(mn > 0, s"target doc ${r.getLong(0)} scored $mn")
        assert(n === 8L)
      } else assert(mn <= 0, s"raw doc ${r.getLong(0)} scored $mn")
    }
  }

  test("importance weights are partitioning-invariant and handle empty docs") {
    import spark.implicits._
    val df = Seq((1L, "a b wiki", true), (2L, "a b", false), (3L, "", false))
      .toDF("id", "text", "is_tgt")
    def run(parts: Int) =
      Sampling.importanceWeights(df.repartition(parts), "text",
          col("is_tgt"), buckets = 32)
        .select("id", "dsir_millinats", "dsir_n_toks")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = run(1)
    assert(a === run(5), "weights must not depend on partitioning")
    // the empty doc gets weight 0 over 0 tokens, not null/missing
    assert(a.exists { case (id, mn, n) => id == 3L && mn == 0L && n == 0L })
  }
}
