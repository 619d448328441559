package graft.cnj

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SURVEY §2.9 north star: the CNJ ingest as a Structured Streaming file
  * source. The stream shares the batch parse stage, so a per-court
  * aggregation over the stream (complete mode) must equal the same
  * aggregation over the batch read of the same directory.
  */
class CnjStreamSpec extends SparkTestBase {

  test("streaming directory ingest aggregates like the batch read") {
    val dir = resourcePath("cnj/dados")
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("sigla_tribunal"))
      .agg(count(lit(1)).as("n"),
        sum(col("casos_novos_2025")).as("s_casos"),
        sum(col("julgm2_a")).as("s_j2a"))

    val q = agg(Reader.readDirStream(spark, dir))
      .writeStream.format("memory").queryName("cnj_stream_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    def key(r: org.apache.spark.sql.Row) = (
      r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) null else r.getDouble(2),
      if (r.isNullAt(3)) null else r.getDouble(3))
    val got = spark.table("cnj_stream_out").collect().map(key).toSet
    val expected = agg(Reader.readDir(spark, dir)).collect().map(key).toSet
    assert(got === expected)
    assert(got.size == 11) // same 11 courts as the batch reader spec
  }
}
