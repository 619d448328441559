package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Merge-on-read corpus store: last-writer-wins resolution, tombstones,
  * idempotent same-seq replay, compaction equivalence, and the scale
  * contract — the base side of a read must reach the anti-join as a
  * broadcast, never an exchange.
  */
class CorpusStoreSpec extends SparkTestBase {

  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft-test-store-$tag"
    val p = new org.apache.hadoop.fs.Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    d
  }

  test("read resolves upserts, tombstones, and last-writer-wins across deltas") {
    val dir = freshDir("basic")
    CorpusStore.init(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "fp"), dir)
    CorpusStore.append(spark, dir, 1L, "id",
      Seq((2L, "B1"), (4L, "d")).toDF("id", "fp"),
      deleteKeys = Some(Seq(Tuple1(3L)).toDF("id")))
    CorpusStore.append(spark, dir, 2L, "id",
      Seq((2L, "B2")).toDF("id", "fp"))
    val got = CorpusStore.read(spark, dir, "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "a"), (2L, "B2"), (4L, "d")))
  }

  test("same-seq re-append overwrites (idempotent replay); delete then re-add wins") {
    val dir = freshDir("replay")
    CorpusStore.init(Seq((1L, "a")).toDF("id", "fp"), dir)
    CorpusStore.append(spark, dir, 1L, "id", Seq((1L, "WRONG")).toDF("id", "fp"))
    CorpusStore.append(spark, dir, 1L, "id", Seq((1L, "right")).toDF("id", "fp"))
    assert(CorpusStore.read(spark, dir, "id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "right")))
    // tombstone at seq 2, re-add at seq 3: latest wins
    CorpusStore.append(spark, dir, 2L, "id",
      Seq.empty[(Long, String)].toDF("id", "fp"),
      deleteKeys = Some(Seq(Tuple1(1L)).toDF("id")))
    CorpusStore.append(spark, dir, 3L, "id", Seq((1L, "back")).toDF("id", "fp"))
    assert(CorpusStore.read(spark, dir, "id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "back")))
  }

  test("a key upserted AND tombstoned in one append resolves to the tombstone, deterministically") {
    val dir = freshDir("tie")
    CorpusStore.init(Seq((1L, "a"), (5L, "e")).toDF("id", "fp"), dir)
    CorpusStore.append(spark, dir, 1L, "id",
      Seq((5L, "E-new"), (6L, "f")).toDF("id", "fp"),
      deleteKeys = Some(Seq(Tuple1(5L)).toDF("id")))
    // repeat the read: the winner must be stable run to run
    (1 to 3).foreach { _ =>
      val got = CorpusStore.read(spark, dir, "id")
        .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq === Seq((1L, "a"), (6L, "f")),
        "within one seq the tombstone must win")
    }
  }

  test("compact folds deltas into the base and preserves the read exactly") {
    val dir = freshDir("compact")
    CorpusStore.init(Seq((1L, "a"), (2L, "b")).toDF("id", "fp"), dir)
    CorpusStore.append(spark, dir, 5L, "id", Seq((2L, "B"), (9L, "z")).toDF("id", "fp"),
      deleteKeys = Some(Seq(Tuple1(1L)).toDF("id")))
    val before = CorpusStore.read(spark, dir, "id").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    CorpusStore.compact(spark, dir, "id")
    val after = CorpusStore.read(spark, dir, "id").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(after.toSeq === before.toSeq)
    // deltas are gone; appends continue from the compacted base
    CorpusStore.append(spark, dir, 6L, "id", Seq((9L, "z2")).toDF("id", "fp"))
    val next = CorpusStore.read(spark, dir, "id").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(next.toSeq === Seq((2L, "B"), (9L, "z2")))
  }

  test("scale contract: the base side reads through a broadcast anti-join, no exchange") {
    val dir = freshDir("plan")
    CorpusStore.init(Seq((1L, "a"), (2L, "b")).toDF("id", "fp"), dir)
    CorpusStore.append(spark, dir, 1L, "id", Seq((2L, "B")).toDF("id", "fp"))
    val plan = CorpusStore.read(spark, dir, "id").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"base must anti-join via broadcast:\n$plan")
  }

  test("appendStream applies one delta per microbatch; batch replay is exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = freshDir("stream")
    CorpusStore.init(Seq((1L, "a"), (2L, "b")).toDF("id", "fp"), dir)
    val stream = MemoryStream[(Long, String)](spark)
    val q = CorpusStore.appendStream(
      stream.toDF().toDF("id", "fp"), dir, "id").start()
    try {
      // one processAllAvailable per addData: distinct microbatches, so
      // the (3L, ...) rewrite exercises cross-DELTA last-writer-wins
      // (within one delta, keys are contract-unique)
      stream.addData(Seq((2L, "B"), (3L, "c")))
      q.processAllAvailable()
      stream.addData(Seq((3L, "C2")))
      q.processAllAvailable()
    } finally q.stop()
    val got = CorpusStore.read(spark, dir, "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "a"), (2L, "B"), (3L, "C2")))
    // simulate the post-failure replay of the LAST batch under its own
    // batchId (what Structured Streaming does on restart): same-seq
    // overwrite keeps the state identical instead of double-applying
    CorpusStore.append(spark, dir, 1L, "id", Seq((3L, "C2")).toDF("id", "fp"))
    val replayed = CorpusStore.read(spark, dir, "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(replayed.toSeq === got.toSeq)
  }

  test("read without deltas is the base; store survives an empty upsert batch") {
    val dir = freshDir("nodelta")
    CorpusStore.init(Seq((1L, "a")).toDF("id", "fp"), dir)
    assert(CorpusStore.read(spark, dir, "id").count() === 1)
    CorpusStore.append(spark, dir, 1L, "id",
      Seq.empty[(Long, String)].toDF("id", "fp"))
    assert(CorpusStore.read(spark, dir, "id").count() === 1)
  }
}
