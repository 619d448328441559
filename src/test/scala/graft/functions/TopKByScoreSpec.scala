package graft.functions

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TopKByScoreSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("grouped top-k matches the window-rank formulation") {
    import org.apache.spark.sql.expressions.Window
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val got = o.groupBy(col("o_orderstatus"))
      .agg(AggregateFunctions.topKBy(col("o_totalprice"), col("o_orderkey"), 5)
        .as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .orderBy(col("o_orderstatus"), col("rn"))
      .collect().groupBy(_.getString(2))
      .view.mapValues(_.map(_.getLong(0)).toSeq).toMap
    assert(got === expected)
  }

  test("ties on score keep the smaller payload") {
    import spark.implicits._
    val df = Seq((1.0, 10L), (1.0, 3L), (1.0, 7L), (0.5, 1L)).toDF("s", "p")
    val got = df.agg(AggregateFunctions.topKBy(col("s"), col("p"), 2))
      .head().getSeq[Long](0)
    assert(got === Seq(3L, 7L))
  }

  test("NaN scores never occupy top-k slots") {
    import spark.implicits._
    val df = Seq((Double.NaN, 1L), (2.0, 2L), (1.0, 3L)).toDF("s", "p")
    val got = df.agg(AggregateFunctions.topKBy(col("s"), col("p"), 2))
      .head().getSeq[Long](0)
    assert(got === Seq(2L, 3L))
  }

  test("topk_by works from SQL after registration") {
    org.apache.spark.sql.graft.GraftFunctionRegistry.register(spark)
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("orders_v")
    val got = spark.sql(
      """SELECT o_orderstatus, topk_by(o_totalprice, o_orderkey, 2) AS top
        |FROM orders_v GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1))
    assert(got.nonEmpty && got.forall(_._2.length == 2))
  }

  test("incremental top-k over a stream (update mode) converges to batch") {
    import spark.implicits._
    val stream = MemoryStream[(String, Double, Long)](spark)
    val agg = stream.toDF().toDF("grp", "score", "id")
      .groupBy(col("grp"))
      .agg(AggregateFunctions.topKBy(col("score"), col("id"), 3).as("top"))
    val q = agg.writeStream.format("memory").queryName("topk_out")
      .outputMode("update").start()
    try {
      stream.addData(("a", 1.0, 1L), ("a", 5.0, 2L), ("b", 2.0, 3L))
      q.processAllAvailable()
      stream.addData(("a", 3.0, 4L), ("a", 9.0, 5L), ("b", 1.0, 6L))
      q.processAllAvailable()
    } finally q.stop()
    // memory sink in update mode appends each update; take the latest row
    // per group
    val rows = spark.table("topk_out").collect()
    val latest = rows.zipWithIndex.groupBy(_._1.getString(0))
      .view.mapValues(_.maxBy(_._2)._1.getSeq[Long](1)).toMap
    assert(latest("a") === Seq(5L, 2L, 4L))
    assert(latest("b") === Seq(3L, 6L))
  }
}
