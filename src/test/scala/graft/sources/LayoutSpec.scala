package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LayoutSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // the in-memory catalog forgets tables between JVMs but their warehouse
  // directories survive — clear both before (re)creating
  Seq("orders_b", "customer_b").foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = Paths.get(s"${System.getProperty("java.io.tmpdir")}/graft-test-warehouse/$t")
    if (Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      Files.walk(loc).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  test("co-bucketed tables join with zero shuffle exchanges") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    Layout.writeBucketed(orders, "orders_b", "o_custkey", 4, Seq("o_custkey"))
    Layout.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"),
      "customer_b", "o_custkey", 4, Seq("o_custkey"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and the answer is still the plain join's
      assert(joined.count() ===
        orders.join(customer, orders("o_custkey") === customer("c_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("aggregation on the bucket key needs no exchange") {
    val agg = spark.table("orders_b").groupBy("o_custkey")
      .agg(sum(col("o_totalprice")).as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed aggregation must not shuffle:\n$plan")
  }

  test("partitioned write prunes directories at plan time") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-test-partitioned"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    Layout.writePartitioned(orders, dir, Seq("o_orderstatus"))

    val pruned = spark.read.parquet(dir).filter(col("o_orderstatus") === "O")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("o_orderstatus"),
      s"expected partition filter in scan:\n$scan")
    assert(pruned.count() ===
      orders.filter(col("o_orderstatus") === "O").count())
  }
}
