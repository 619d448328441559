package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class JoinsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("asOf picks the latest right row at-or-before each left ts, " +
    "inclusive, max-id on ties") {
    import spark.implicits._
    val left = Seq(
      ("k1", 100L, 1L), ("k1", 205L, 2L), ("k1", 50L, 3L),
      ("k2", 100L, 4L), ("k3", 10L, 5L))
      .toDF("key", "ts", "lid")
    val right = Seq(
      ("k1", 100L, 10L), ("k1", 100L, 11L), ("k1", 200L, 12L),
      ("k2", 90L, 13L), ("k2", 101L, 14L))
      .toDF("key", "ts", "rid")
    val got = Joins.asOf(left, right, "key", "ts", "lid", "rid")
      .orderBy("lid")
      .collect()
      .map(r => r.getLong(2) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.toSeq === Seq(
      1L -> Some(11L), // inclusive ts=100, tie -> max rid
      2L -> Some(12L), // latest at-or-before 205
      3L -> None,      // nothing at-or-before 50
      4L -> Some(13L), // k2: 90 <= 100, 101 is in the future
      5L -> None))     // k3: no right rows
  }

  test("rangeJoin equals the plain range-predicate join") {
    val pts = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"))
    val bands = spark.read.parquet(s"$sf/nation.parquet").select(
      col("n_nationkey").as("band_id"),
      (col("n_nationkey") * 400).as("lo"),
      (col("n_nationkey") * 400 + 599).as("hi"))
    val got = Joins.rangeJoin(pts, bands, "c_acctbal", "lo", "hi", 200)
      .select(col("c_custkey"), col("band_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = pts.join(bands,
        col("c_acctbal") >= col("lo") && col("c_acctbal") <= col("hi"))
      .select(col("c_custkey"), col("band_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("rangeJoin tolerates inverted ranges (they match nothing)") {
    import spark.implicits._
    val pts = Seq((1L, 50.0), (2L, 150.0)).toDF("pid", "v")
    val ranges = Seq((10L, 0, 100), (11L, 200, 100)).toDF("rid", "lo", "hi")
    val got = Joins.rangeJoin(pts, ranges, "v", "lo", "hi", 50)
      .select("pid", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L)))
  }

  test("saltedJoin equals the plain equi-join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_quantity"))
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    val got = Joins.saltedJoin(li, supp, "l_suppkey", 8, col("l_orderkey"))
      .groupBy("s_nationkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val expected = li.join(supp, "l_suppkey")
      .groupBy("s_nationkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
