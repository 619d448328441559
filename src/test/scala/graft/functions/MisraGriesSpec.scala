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
