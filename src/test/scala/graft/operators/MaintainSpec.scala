package graft.operators

import org.apache.hadoop.fs.Path

import graft.SparkTestBase

/** The two-tier LSM maintenance policy ([[CorpusStore.maintain]]), the
  * `foldBelowSeq` replay fence on both fold tiers, self-maintaining
  * [[CorpusStore.appendStream]] ingestion, and the time-based half of
  * the retention contract (`minRetainMs` on vacuum/compact) — the
  * round-14 follow-through on the store's maintenance story.
  */
class MaintainSpec extends SparkTestBase {

  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft-test-maintain-$tag"
    val p = new Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    d
  }

  private def hfs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def state(dir: String): Seq[(Long, String)] =
    CorpusStore.read(spark, dir, "id").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  private def liveDeltaDirs(dir: String): Seq[String] = {
    val fs = hfs(dir)
    fs.listStatus(new Path(dir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("delta_")
        && !fs.exists(new Path(st.getPath, "_folded"))
        && (!st.getPath.getName.endsWith(".m") ||
          fs.exists(new Path(st.getPath, "_SUCCESS"))))
      .map(_.getPath.getName).sorted
  }

  private def dirNames(dir: String): Set[String] =
    hfs(dir).listStatus(new Path(dir)).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).toSet

  // base {1..6}, three small appends (override, tombstone, re-add)
  private def buildStore(dir: String): Unit = {
    CorpusStore.init(
      (1L to 6L).map(i => (i, s"v$i")).toDF("id", "fp"), dir)
    CorpusStore.append(spark, dir, 1L, "id",
      Seq((2L, "B1"), (7L, "g")).toDF("id", "fp"),
      deleteKeys = Some(Seq(Tuple1(3L)).toDF("id")))
    CorpusStore.append(spark, dir, 2L, "id",
      Seq((2L, "B2")).toDF("id", "fp"),
      deleteKeys = Some(Seq(Tuple1(7L)).toDF("id")))
    CorpusStore.append(spark, dir, 3L, "id",
      Seq((7L, "G2"), (8L, "h")).toDF("id", "fp"))
  }

  test("maintain picks the tier: none under thresholds, minor by dir count, major by row ratio") {
    val dir = freshDir("tiers")
    buildStore(dir)
    val before = state(dir)
    // 3 live deltas, 7 delta rows on a 6-row base: both thresholds clear
    assert(CorpusStore.maintain(spark, dir, "id",
      maxLiveDeltas = 4, maxDeltaToBaseRatio = 1000.0) === "none")
    assert(liveDeltaDirs(dir).size === 3)
    // dir count trips (3 >= 3), ratio doesn't: MINOR fold, base untouched
    assert(CorpusStore.maintain(spark, dir, "id",
      maxLiveDeltas = 3, maxDeltaToBaseRatio = 1000.0) === "minor")
    assert(liveDeltaDirs(dir) === Seq(f"delta_${3L}%019d.m"))
    assert(!dirNames(dir).exists(_.startsWith("base_gen_")),
      "a minor fold must not create a base generation")
    assert(state(dir) === before)
    // one more append puts 2 live deltas / ratio over 0.2: MAJOR fold
    CorpusStore.append(spark, dir, 4L, "id", Seq((9L, "i")).toDF("id", "fp"))
    assert(CorpusStore.maintain(spark, dir, "id",
      maxLiveDeltas = 16, maxDeltaToBaseRatio = 0.2) === "major")
    assert(liveDeltaDirs(dir).isEmpty)
    assert(dirNames(dir).exists(_.startsWith("base_gen_")))
    assert(state(dir) === before :+ (9L, "i"))
    // idempotent: nothing left to do
    assert(CorpusStore.maintain(spark, dir, "id") === "none")
  }

  test("a store past BOTH thresholds takes the major fold, not minor-then-major") {
    val dir = freshDir("both")
    buildStore(dir)
    assert(CorpusStore.maintain(spark, dir, "id",
      maxLiveDeltas = 2, maxDeltaToBaseRatio = 0.2) === "major")
    assert(liveDeltaDirs(dir).isEmpty)
  }

  test("foldBelowSeq fences BOTH tiers: the bounded seq stays live and replayable") {
    val dir = freshDir("fence")
    buildStore(dir)
    val before = state(dir)
    // minor, fenced at 3: only seqs 1-2 fold; delta_3 stays a plain live dir
    assert(CorpusStore.maintain(spark, dir, "id",
      maxLiveDeltas = 2, maxDeltaToBaseRatio = 1000.0,
      foldBelowSeq = 3L) === "minor")
    assert(liveDeltaDirs(dir) ===
      Seq(f"delta_${2L}%019d.m", f"delta_${3L}%019d"))
    assert(state(dir) === before)
    // the fenced seq replays (same-seq overwrite), exactly what a
    // restarted stream does — an unfenced fold would have put seq 3 at
    // the horizon and this append would throw
    CorpusStore.append(spark, dir, 3L, "id",
      Seq((7L, "G2"), (8L, "h")).toDF("id", "fp"))
    assert(state(dir) === before)
    // a seq INSIDE the fold is dead — the fence the fold advanced
    val ex = intercept[IllegalArgumentException] {
      CorpusStore.append(spark, dir, 2L, "id",
        Seq((2L, "stale")).toDF("id", "fp"))
    }
    assert(ex.getMessage.contains("fold horizon"))
  }

  test("maintain with every delta fenced off does nothing") {
    val dir = freshDir("allfenced")
    buildStore(dir)
    assert(CorpusStore.maintain(spark, dir, "id",
      maxLiveDeltas = 2, maxDeltaToBaseRatio = 0.001,
      foldBelowSeq = 1L) === "none")
    assert(liveDeltaDirs(dir).size === 3)
  }

  test("major compact under foldBelowSeq keeps newer deltas live over the new base") {
    val dir = freshDir("majorfence")
    buildStore(dir)
    val before = state(dir)
    CorpusStore.compact(spark, dir, "id", foldBelowSeq = 3L)
    assert(dirNames(dir).exists(_.startsWith("base_gen_")))
    assert(liveDeltaDirs(dir) === Seq(f"delta_${3L}%019d"),
      "the fenced delta must remain live over the new generation")
    assert(state(dir) === before)
    // replay of the fenced seq still lands (horizon is 2, not 3)
    CorpusStore.append(spark, dir, 3L, "id",
      Seq((7L, "G2"), (8L, "h")).toDF("id", "fp"))
    assert(state(dir) === before)
  }

  test("appendStream maintainEvery self-maintains: dir count bounded, newest batch never folded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = freshDir("selfmaint")
    CorpusStore.init(Seq((1L, "a"), (2L, "b")).toDF("id", "fp"), dir)
    val stream = MemoryStream[(Long, String)](spark)
    val q = CorpusStore.appendStream(
      stream.toDF().toDF("id", "fp"), dir, "id",
      checkpointLocation = freshDir("selfmaint-ckpt"),
      maintainEvery = 2, maxLiveDeltas = 2,
      maxDeltaToBaseRatio = 1000.0).start()
    try {
      (0 until 6).foreach { i =>
        stream.addData(Seq((10L + i, s"s$i")))
        q.processAllAvailable()
      }
    } finally q.stop()
    // 6 microbatches with a fold every 2: the live set stays small
    // instead of 6 dirs, and the newest batch (seq 5) is always fenced
    // out of its own stride's fold (foldBelowSeq = batchId)
    val live = liveDeltaDirs(dir)
    assert(live.size <= 3, s"live deltas must be bounded by maintenance: $live")
    assert(live.contains(f"delta_${5L}%019d"),
      s"the newest batch's delta must stay live for replay: $live")
    val got = state(dir)
    assert(got === Seq((1L, "a"), (2L, "b")) ++
      (0 until 6).map(i => (10L + i, s"s$i")))
    // the last batch replays without tripping the horizon fence
    CorpusStore.append(spark, dir, 5L, "id", Seq((15L, "s5")).toDF("id", "fp"))
    assert(state(dir) === got)
  }

  test("writer-lease heartbeat: a live long mutation keeps its lease fresh past the stale bound") {
    val dir = freshDir("heartbeat")
    CorpusStore.init(Seq((1L, "a")).toDF("id", "fp"), dir)
    val lock = new java.io.File(dir, "_writer_lock")
    // the body outlives the stale bound 2.5x; without the heartbeat a
    // rival would age the lease out and take it over mid-mutation.
    // Asserted with scheduler headroom (age < sleep proves a re-touch
    // happened mid-body; the tight in-period bound would flake on a
    // loaded CI box whose timer thread got descheduled)
    CorpusStore.withWriterLock(spark, dir, staleLockMs = 600L) {
      val t0 = System.currentTimeMillis()
      Thread.sleep(1500L)
      assert(lock.exists, "the lease must be held for the body's whole life")
      val age = System.currentTimeMillis() - lock.lastModified
      assert(age < System.currentTimeMillis() - t0,
        s"heartbeat must have re-touched the lease during the body (age ${age}ms)")
    }
    assert(!lock.exists, "released on exit")
  }

  test("writer-lease release never resurrects the lock (heartbeat/release race)") {
    val dir = freshDir("hbrace")
    CorpusStore.init(Seq((1L, "a")).toDF("id", "fp"), dir)
    val lock = new java.io.File(dir, "_writer_lock")
    // Timer.cancel() does not stop a task already mid-run: an
    // unsynchronized release could delete the lease between the task's
    // existence check and its rewrite, and the late rewrite would leak a
    // lease that blocks every writer for the whole stale bound. Exercise
    // the window repeatedly with the body ending right at a heartbeat
    // period boundary, then assert the lock STAYS gone past two periods.
    (1 to 12).foreach { i =>
      CorpusStore.withWriterLock(spark, dir, staleLockMs = 150L) {
        Thread.sleep(48L + (i % 5)) // straddle the 50ms heartbeat period
      }
      Thread.sleep(120L)
      assert(!lock.exists,
        s"iteration $i: a released lease was resurrected by a late heartbeat")
    }
  }

  test("appendStream forwards the retention knobs to auto-maintenance") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = freshDir("retpass")
    CorpusStore.init(Seq((1L, "a"), (2L, "b")).toDF("id", "fp"), dir)
    val stream = MemoryStream[(Long, String)](spark)
    // ratio 0.001 majors on every maintenance stride (batches 1, 3, 5 ->
    // generations 1, 2, 3); at the third major, generation 1 is out of a
    // ONE-cycle window but inside the requested TWO-cycle one — without
    // the passthrough, auto-maintenance purges it at the default
    val q = CorpusStore.appendStream(
      stream.toDF().toDF("id", "fp"), dir, "id",
      checkpointLocation = freshDir("retpass-ckpt"),
      maintainEvery = 2, maxLiveDeltas = 16,
      maxDeltaToBaseRatio = 0.001, retainGenerations = 2).start()
    try {
      (0 until 6).foreach { i =>
        stream.addData(Seq((10L + i, s"s$i")))
        q.processAllAvailable()
      }
    } finally q.stop()
    val names = dirNames(dir)
    assert(names.contains(f"base_gen_${3L}%019d"), s"current gen: $names")
    assert(names.contains(f"base_gen_${1L}%019d"),
      s"a generation inside the 2-cycle window must survive auto-maintenance: $names")
    assert(!names.contains("base"),
      s"gen-0 is out of even the 2-cycle window by the third major: $names")
    assert(state(dir) === Seq((1L, "a"), (2L, "b")) ++
      (0 until 6).map(i => (10L + i, s"s$i")))
  }

  test("seqAtTime/readAtTime: a wall-clock instant resolves to the newest committed seq") {
    val dir = freshDir("timetravel")
    CorpusStore.init(Seq((1L, "a"), (2L, "b")).toDF("id", "fp"), dir)
    val t0 = System.currentTimeMillis()
    Thread.sleep(30L)
    CorpusStore.append(spark, dir, 1L, "id", Seq((2L, "B")).toDF("id", "fp"))
    Thread.sleep(30L)
    val t1 = System.currentTimeMillis()
    Thread.sleep(30L)
    CorpusStore.append(spark, dir, 2L, "id", Seq((3L, "c")).toDF("id", "fp"))
    Thread.sleep(30L)
    val t2 = System.currentTimeMillis()
    assert(CorpusStore.seqAtTime(spark, dir, t0) === -1L,
      "an instant before the first append resolves below every seq")
    assert(CorpusStore.seqAtTime(spark, dir, t1) === 1L)
    assert(CorpusStore.seqAtTime(spark, dir, t2) === 2L)
    def readAt(ms: Long): Seq[(Long, String)] =
      CorpusStore.readAtTime(spark, dir, "id", ms).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(readAt(t0) === Seq((1L, "a"), (2L, "b")))
    assert(readAt(t1) === Seq((1L, "a"), (2L, "B")))
    assert(readAt(t2) === Seq((1L, "a"), (2L, "B"), (3L, "c")))
    // a fold's commit instant REPLACES its constituents': interior
    // instants truncate to the pre-fold boundary, readAt's contract
    assert(CorpusStore.compactDeltas(spark, dir, "id"))
    assert(CorpusStore.seqAtTime(spark, dir, t2) === -1L)
    assert(readAt(t2) === Seq((1L, "a"), (2L, "b")))
    assert(CorpusStore.seqAtTime(spark, dir,
      System.currentTimeMillis()) === 2L)
    assert(readAt(System.currentTimeMillis())
      === Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("the replay fence SURVIVES vacuum: a folded seq stays dead after the retired dirs purge") {
    val dir = freshDir("fencevacuum")
    buildStore(dir)
    CorpusStore.compact(spark, dir, "id")
    // purge the grace window: the retired `_folded` dirs — the fence's
    // listing FALLBACK — are gone; only the `_horizon` file remains.
    // (Before the recordedHorizon fix, writeHorizon compared against
    // foldHorizon, whose fallback already equaled the fold seq once the
    // markers landed, so the file was never written and this append
    // sailed through, resurrecting a folded seq as a live delta.)
    assert(CorpusStore.vacuum(spark, dir) > 0)
    val ex = intercept[IllegalArgumentException] {
      CorpusStore.append(spark, dir, 2L, "id",
        Seq((2L, "stale")).toDF("id", "fp"))
    }
    assert(ex.getMessage.contains("fold horizon"))
    // strictly newer seqs still land
    CorpusStore.append(spark, dir, 4L, "id", Seq((9L, "i")).toDF("id", "fp"))
    assert(state(dir).exists(_ == (9L, "i")))
  }

  test("an append batch without the key column fails at the write, not at a later read") {
    val dir = freshDir("keyless")
    CorpusStore.init(Seq((1L, "a")).toDF("id", "fp"), dir)
    val ex = intercept[IllegalArgumentException] {
      CorpusStore.append(spark, dir, 1L, "id",
        Seq(("x", "y")).toDF("not_id", "fp"))
    }
    assert(ex.getMessage.contains("no 'id' column"))
    assert(state(dir) === Seq((1L, "a")), "the bad batch must not land")
  }

  test("describe reports the replay fence and an in-flight writer's lease") {
    val dir = freshDir("describe")
    buildStore(dir)
    def kinds(): Map[String, Option[Long]] =
      CorpusStore.describe(spark, dir).collect()
        .map(r => r.getString(0) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(!kinds().contains("horizon"), "nothing folded, no fence yet")
    assert(!kinds().contains("writer_lock"))
    CorpusStore.compactDeltas(spark, dir, "id")
    assert(kinds().get("horizon") === Some(Some(3L)),
      "the fence row carries the newest folded seq")
    val lock = new java.io.File(dir, "_writer_lock")
    assert(lock.createNewFile())
    assert(kinds().contains("writer_lock"))
    assert(lock.delete())
  }

  test("minRetainMs holds out-of-cycle artifacts until they age; 0 purges them now") {
    val dir = freshDir("timefloor")
    buildStore(dir)
    CorpusStore.compact(spark, dir, "id")
    // gen-0 base + 3 folded deltas are out of CYCLE retention but
    // seconds old: the hour floor retains every one of them
    assert(CorpusStore.vacuum(spark, dir, retainGenerations = 1,
      minRetainMs = 3600000L) === 0)
    val withGrace = dirNames(dir)
    assert(withGrace.contains("base"))
    assert(withGrace.count(_.startsWith("delta_")) === 3)
    // the time floor also fences compact's built-in purge
    CorpusStore.append(spark, dir, 4L, "id", Seq((9L, "i")).toDF("id", "fp"))
    CorpusStore.compact(spark, dir, "id", minRetainMs = 3600000L)
    assert(dirNames(dir).contains("base"),
      "compact's purge must honor the time floor")
    // floor 0 = pure cycle retention: the grace window purges
    assert(CorpusStore.vacuum(spark, dir) > 0)
    val after = dirNames(dir)
    assert(!after.contains("base"))
    assert(!after.exists(n => n.startsWith("delta_") &&
      hfs(dir).exists(new Path(new Path(dir, n), "_folded"))))
  }
}
