package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.TextFunctions

/** Packing.packShards: the distributed two-phase prefix sum must equal a
  * single-threaded sequential model exactly, and its plan must never fall
  * back to the single-partition global window.
  */
class PackingSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def weighted = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"),
      size(TextFunctions.tokens(col("text"))).cast("long").as("w"))

  test("packShards equals the sequential prefix-sum model") {
    val budget = 1000L
    val got = Packing.packShards(weighted, col("doc_id"), col("w"), budget,
        numParts = 8)
      .select(col("doc_id"), col("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val rows = weighted.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var cum = 0L
    val expected = rows.map { case (id, w) =>
      val shard = cum / budget
      cum += w
      id -> shard
    }.toMap

    assert(got.size === expected.size)
    expected.foreach { case (id, shard) =>
      assert(got(id) === shard, s"doc $id")
    }
    // multi-partition path genuinely exercised, and shards are contiguous
    assert(expected.values.max > 0, "budget too large to exercise >1 shard")
  }

  test("packing plan has no single-partition exchange") {
    val out = Packing.packShards(weighted, col("doc_id"), col("w"), 1000L,
      numParts = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"two-phase cumsum must not sort globally in one task:\n$plan")
  }

  test("null and zero weights pack without gaps") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(0L)), (4L, Some(7L)))
      .toDF("id", "w")
    val got = Packing.packShards(df, col("id"), col("w"), 6L, numParts = 2)
      .select(col("id"), col("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cum before: 1->0, 2->5, 3->5, 4->5 ; floor(/6): 0,0,0,0
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("negative weights are rejected, not silently mis-packed") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, -3L), (3L, 7L)).toDF("id", "w")
    val ex = intercept[Exception] {
      Packing.packShards(df, col("id"), col("w"), 6L, numParts = 2)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("negative weight")), ex.toString)
  }
}
