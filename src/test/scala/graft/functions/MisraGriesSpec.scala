package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** MisraGries sketch: exactness below capacity, the n/capacity error
  * bound and heavy-hitter recall above it, and stability across
  * partitionings (which exercises serialize + the mergeable-summaries
  * merge).
  */
class MisraGriesSpec extends SparkTestBase {

  private def summarize(df: org.apache.spark.sql.DataFrame, capacity: Int) =
    df.agg(AggregateFunctions.heavyHitters(col("item"), capacity).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact counts while distinct items <= capacity, any partitioning") {
    import spark.implicits._
    val data = (1 to 2000).map(i => s"k${i % 40}")
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    Seq(1, 3, 13).foreach { parts =>
      val got = summarize(data.toDF("item").repartition(parts), capacity = 64)
      assert(got === truth, s"parts=$parts")
    }
  }

  test("above capacity: heavy hitters survive with n/capacity error") {
    import spark.implicits._
    // one true heavy hitter (2000 of n=7000) among 5000 singletons
    val data = Seq.fill(2000)("HH") ++ (1 to 5000).map(i => s"rare$i")
    val n = data.size
    val capacity = 64
    val got = summarize(data.toDF("item").repartition(7), capacity)
    assert(got.size <= capacity)
    val bound = n.toLong / capacity
    assert(got.contains("HH"),
      s"a ${2000}/$n hitter must survive capacity $capacity (bound $bound)")
    val est = got("HH")
    assert(est <= 2000L && est >= 2000L - bound, s"estimate $est")
  }

  test("streaming heavy hitters (update mode) converge to the batch counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val stream = MemoryStream[String](spark)
    val agg = stream.toDF().toDF("item")
      .agg(AggregateFunctions.heavyHitters(col("item"), 32).as("mg"))
    val q = agg.writeStream.format("memory").queryName("mg_out")
      .outputMode("update").start()
    try {
      stream.addData("a", "b", "a")
      q.processAllAvailable()
      stream.addData("a", "c", "b", "a")
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("mg_out").collect()
    val latest = rows.last.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // distinct (3) < capacity (32) -> incremental counts are exact
    assert(latest === Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
  }

  test("gen10x saturation: the eps*N bound and heavy-hitter guarantee " +
    "hold when distinct items exceed capacity ~1000-fold") {
    // the non-replicated gen-model corpus at scale 10 (50k docs,
    // ~2.7M tokens), generated in-memory — no /tmp fixture dependency.
    // ~60% of tokens are doc-local uniques, so the distinct-item count
    // (~1.7M) saturates any practical capacity: this is the ABOVE-
    // capacity regime the fixture-scale bound test cannot reach, where
    // the sketch spends its whole life decrementing.
    val capacity = 1024
    val toks = graft.GenScaledCorpus.documentsDf(spark, scale = 10)
      .select(explode(TextFunctions.tokens(col("text"))).as("item"))
      .localCheckpoint() // truth and sketch must see the SAME stream
    val n = toks.count()
    val distinct = toks.distinct().count()
    assert(distinct > capacity * 100L,
      s"corpus must saturate the sketch: $distinct distinct vs capacity $capacity")
    val got = summarize(toks, capacity)
    assert(got.size <= capacity)
    val bound = n / capacity // eps*N with eps = 1/capacity (>= 1/(k+1))
    // exact truth for the reported items plus every true heavy hitter
    val truth = toks.groupBy(col("item")).count()
      .filter(col("count") > bound || col("item").isin(got.keys.toSeq: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // (1) every estimate is an undercount by at most eps*N
    got.foreach { case (item, est) =>
      val t = truth(item)
      assert(est <= t, s"$item overcounted: $est > $t")
      assert(est >= t - bound, s"$item undercounted past eps*N: $est < $t - $bound")
    }
    // (2) every item with true count > eps*N survives the sketch
    val mustSurvive = truth.filter(_._2 > bound).keySet
    assert(mustSurvive.nonEmpty, "gen corpus must have true heavy hitters")
    val missed = mustSurvive -- got.keySet
    assert(missed.isEmpty, s"true heavy hitters lost above capacity: $missed")
    info(s"n=$n distinct=$distinct capacity=$capacity bound=$bound " +
      s"hitters=${mustSurvive.size} reported=${got.size}")
  }

  test("sketch top-10 equals the exact top-10 on the documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(TextFunctions.tokens(col("text"))).as("item"))
    val sk = summarize(docs, capacity = 512).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(10)
    val exact = docs.groupBy(col("item")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(10)
    assert(sk === exact)
  }
}
