package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.EventStreams.Ev

/** The streaming transforms run the same plan functions as the batch
  * (oracle-checked) formulations; these specs drive them through a real
  * micro-batch engine via MemoryStream and compare against batch output.
  */
class EventStreamsSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2025-01-01 10:$minute%02d:00")
  private def tsH(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2025-01-01 $hour%02d:$minute%02d:00")

  test("tumblingCountsStream over MemoryStream matches the batch plan") {
    import spark.implicits._
    val events = Seq(
      Ev(1, ts(0), 1, "view", 1.0), Ev(2, ts(5), 1, "view", 2.0),
      Ev(3, ts(14), 2, "click", 3.0), Ev(4, ts(16), 2, "view", 4.0),
      Ev(5, ts(31), 1, "click", 5.0), Ev(6, ts(44), 3, "view", 6.0))
    val stream = MemoryStream[Ev](spark)
    stream.addData(events)
    // one more batch far in the future so the 30-min watermark closes
    // every window above
    stream.addData(Seq(Ev(99, tsH(20, 0), 9, "late", 0.0)))

    val q = EventStreams.tumblingCountsStream(stream.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("tumbling_out")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val expected = EventStreams.tumblingCounts(events.toDF())
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("slidingCountsStream over MemoryStream matches the batch plan") {
    import spark.implicits._
    val events = Seq(
      Ev(1, ts(0), 1, "view", 1.0), Ev(2, ts(5), 1, "view", 2.0),
      Ev(3, ts(14), 2, "click", 3.0), Ev(4, ts(16), 2, "view", 4.0),
      Ev(5, ts(31), 1, "click", 5.0), Ev(6, ts(44), 3, "view", 6.0))
    val stream = MemoryStream[Ev](spark)
    stream.addData(events)
    stream.addData(Seq(Ev(99, tsH(20, 0), 9, "late", 0.0)))

    val q = EventStreams.slidingCountsStream(stream.toDF())
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sliding_out")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val expected = EventStreams.slidingCounts(events.toDF())
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === expected)
    // every event must appear in exactly 3 windows: sum of n_events = 3 * |events|
    val totalBatch = EventStreams.slidingCounts(events.toDF())
      .agg(sum(col("n_events"))).head().getLong(0)
    assert(totalBatch === 3L * events.size)
  }

  test("stream-stream click attribution matches the batch interval join") {
    import spark.implicits._
    val events = Seq(
      Ev(1, ts(0), 1, "view", 0), Ev(2, ts(10), 1, "view", 0),
      Ev(3, ts(20), 1, "click", 0),   // attributes views 1, 2
      Ev(4, ts(55), 1, "click", 0),   // attributes only view at :40
      Ev(5, ts(40), 1, "view", 0),
      Ev(6, ts(5), 2, "view", 0), Ev(7, ts(50), 2, "click", 0)) // out of window
    val stream = MemoryStream[Ev](spark)
    stream.addData(events)
    stream.addData(Seq(Ev(99, tsH(22, 0), 9, "late", 0)))

    val q = EventStreams.clickAttributionStream(stream.toDF())
      .select(col("click_id"), col("view_id"))
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("attr_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = EventStreams.clickAttribution(
        events.toDF().filter(col("event_type") === "click"),
        events.toDF().filter(col("event_type") === "view"))
      .select(col("click_id"), col("view_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === batch)
    assert(got === Set((3L, 1L), (3L, 2L), (4L, 5L)))
  }

  test("dedupStream drops duplicate keys across micro-batches within the watermark") {
    import spark.implicits._
    val stream = MemoryStream[Ev](spark)
    val q = EventStreams.dedupStream(stream.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        Ev(1, ts(0), 1, "view", 1.0), Ev(2, ts(1), 1, "view", 2.0),
        Ev(1, ts(2), 1, "view", 1.0))) // dup within batch
      q.processAllAvailable()
      stream.addData(Seq(
        Ev(2, ts(3), 1, "view", 2.0), // dup across batches
        Ev(3, ts(4), 1, "view", 3.0)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_out").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("sessionizeStream emits the same sessions as batch sessionize " +
    "once the watermark passes every gap") {
    import spark.implicits._
    val events = Seq(
      // user 1: two sessions (gap > 30 min between minute 10 and hour 11)
      Ev(1, ts(0), 1, "view", 0), Ev(2, ts(10), 1, "click", 0),
      Ev(3, tsH(11, 0), 1, "view", 0), Ev(4, tsH(11, 20), 1, "view", 0),
      // user 2: one session
      Ev(5, ts(5), 2, "view", 0), Ev(6, ts(25), 2, "view", 0))
    val stream = MemoryStream[Ev](spark)
    stream.addData(events)
    stream.addData(Seq(Ev(99, tsH(23, 0), 9, "late", 0)))

    val q = EventStreams.sessionizeStream(stream.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sessions_out")
      .filter(col("user_id") =!= 9)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    // batch sessionize: (user_id, n_events, duration_sec)
    val expected = EventStreams.sessionize(events.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
    assert(got === expected)
    assert(got.size === 3)
  }
}
