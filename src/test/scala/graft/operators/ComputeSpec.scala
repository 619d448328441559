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

  test("checkpointSer persists SERIALIZED (MEMORY_AND_DISK_SER), " +
    "truncates lineage, preserves data") {
    import org.apache.spark.storage.StorageLevel
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cp = Compute.checkpointSer(
      (1 to 100).toDF("x").withColumn("arr", array((1 to 50).map(lit): _*)))
    assert(cp.count() == 100)
    // lineage is truncated: the plan is a materialized RDD scan, not the
    // original project
    assert(cp.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.getClass.getSimpleName.contains("LogicalRDD")))
    // the newly persisted RDD from THIS call is serialized — the default
    // deserialized level is the one that OOM'd the sf~1 gate. (No
    // blanket unpersist here: the session is shared across suites and
    // yanking another suite's live localCheckpoint would corrupt it.)
    val mine = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }.values
    assert(mine.exists(_.getStorageLevel == StorageLevel.MEMORY_AND_DISK_SER),
      s"expected a MEMORY_AND_DISK_SER RDD, got ${mine.map(_.getStorageLevel)}")
  }
}
