package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.SparkTestBase

/** Locks the [[Compute.toComputeBudget]] contract: floor-only
  * repartitioning on scan-stage frames, loud rejection of post-shuffle
  * inputs (whose `.rdd` probe would double-execute upstream stages
  * under AQE).
  */
class ComputeSpec extends SparkTestBase {

  private val intSchema = StructType(Seq(StructField("x", IntegerType)))

  private def frameWith(nParts: Int) = spark.createDataFrame(
    spark.sparkContext.parallelize((1 to 100).map(Row(_)), nParts), intSchema)

  test("narrow frame is widened to the parallelism budget") {
    val out = Compute.toComputeBudget(frameWith(2))
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(out.count() == 100)
  }

  test("already-wide frame passes through with its layout untouched") {
    val wide = frameWith(spark.sparkContext.defaultParallelism + 7)
    val out = Compute.toComputeBudget(wide)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism + 7)
  }

  test("post-shuffle frames are rejected, not silently double-executed") {
    import spark.implicits._
    val base = (1 to 10).toDF("x")
    val agg = base.groupBy($"x").agg(count("*").as("n"))
    val joined = base.join(agg, "x")
    val sorted = base.orderBy($"x")
    val repart = base.repartition(8)
    val dedup = base.dropDuplicates("x")
    Seq(agg, joined, sorted, repart, dedup).foreach { bad =>
      val e = intercept[IllegalArgumentException](Compute.toComputeBudget(bad))
      assert(e.getMessage.contains("scan-stage only"), e.getMessage)
    }
  }

  test("scan + narrow transforms stay accepted") {
    import spark.implicits._
    val df = (1 to 10).toDF("x")
      .withColumn("y", $"x" * 2).filter($"y" > 2).select($"x", $"y")
    assert(Compute.toComputeBudget(df).count() == 9)
  }

  test("sortWithinPartitions (non-global Sort) stays accepted — only a " +
    "global orderBy is an exchange") {
    import spark.implicits._
    val df = (1 to 10).toDF("x").sortWithinPartitions($"x")
    assert(Compute.toComputeBudget(df).count() == 10)
  }
}
