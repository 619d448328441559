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
}
