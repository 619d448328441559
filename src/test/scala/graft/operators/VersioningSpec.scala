package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class VersioningSpec extends SparkTestBase {

  import spark.implicits._

  private val oldSnap = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "fp")
  private val newSnap = Seq(
    (1L, "a"),            // unchanged
    (2L, "B"),            // changed
    // 3 removed, 4 removed
    (5L, "e")).toDF("id", "fp") // added

  test("diffSnapshots classifies added / removed / changed, drops unchanged") {
    val got = Versioning.diffSnapshots(oldSnap, newSnap, "id", "fp")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq(
      (2L, "changed"), (3L, "removed"), (4L, "removed"), (5L, "added")))
  }

  test("diffSnapshots: null fingerprints compare null-safely") {
    val o = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "fp")
    val n = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "fp")
    val got = Versioning.diffSnapshots(o, n, "id", "fp").collect()
    // id 1: null == null -> unchanged (dropped); id 2: x -> null = changed
    assert(got.map(_.getLong(0)).toSeq === Seq(2L))
    assert(got.head.getString(1) === "changed")
  }

  test("upsert: batch wins on key match, inserts append, rest passes through") {
    val corpus = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "fp", "v")
    val batch = Seq((2L, "B", 21), (9L, "z", 90)).toDF("id", "fp", "v")
    val got = Versioning.upsert(corpus, batch, "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.toSeq === Seq((1L, "a", 10), (2L, "B", 21), (3L, "c", 30), (9L, "z", 90)))
  }

  test("upsert is idempotent and keeps the corpus off the shuffle (broadcast anti)") {
    val corpus = Seq((1L, "a"), (2L, "b")).toDF("id", "fp")
    val batch = Seq((2L, "B")).toDF("id", "fp")
    val once = Versioning.upsert(corpus, batch, "id")
    val twice = Versioning.upsert(once, batch, "id")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
    val plan = once.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast anti-join:\n$plan")
  }

  private val ts1 = "2026-01-01 00:00:00"
  private val ts2 = "2026-02-01 00:00:00"

  private def hist0 = Seq(
    (1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "fp")
    .withColumn("valid_from", lit(ts1).cast("timestamp"))
    .withColumn("valid_to", lit(null).cast("timestamp"))

  test("scd2Apply closes changed/removed versions and opens new ones") {
    val snap = Seq((1L, "a"), (2L, "B"), (5L, "e")).toDF("id", "fp")
    val got = Versioning.scd2Apply(hist0, snap, "id", "fp", ts2)
      .orderBy(col("id"), col("valid_from")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toString, Option(r.getTimestamp(3)).map(_.toString)))
    assert(got.toSeq === Seq(
      (1L, "a", "2026-01-01 00:00:00.0", None),                       // untouched open
      (2L, "b", "2026-01-01 00:00:00.0", Some("2026-02-01 00:00:00.0")), // closed
      (2L, "B", "2026-02-01 00:00:00.0", None),                       // new version
      (3L, "c", "2026-01-01 00:00:00.0", Some("2026-02-01 00:00:00.0")), // removed -> closed
      (5L, "e", "2026-02-01 00:00:00.0", None)))                      // first version
  }

  test("scd2Apply invariants: one open row per key; same-snapshot re-apply is a no-op") {
    val snap = Seq((1L, "a"), (2L, "B"), (5L, "e")).toDF("id", "fp")
    val h1 = Versioning.scd2Apply(hist0, snap, "id", "fp", ts2)
    val openPerKey = h1.filter(col("valid_to").isNull)
      .groupBy("id").count().agg(max("count")).head().getLong(0)
    assert(openPerKey === 1L)
    val h2 = Versioning.scd2Apply(h1, snap, "id", "fp", "2026-03-01 00:00:00")
    assert(h1.exceptAll(h2).isEmpty && h2.exceptAll(h1).isEmpty)
    // closed rows must not have joined: their count is stable and their
    // valid_to values are untouched
    assert(h2.filter(col("valid_to").isNotNull).count() === 2L)
  }
}
