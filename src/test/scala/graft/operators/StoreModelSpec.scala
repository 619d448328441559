package graft.operators

import scala.util.Random

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.ScanPruning

/** Model-based randomized testing of the CorpusStore verb family — the
  * table-format torture test: drive seeded-random interleavings of
  * append / deleteWhere / updateWhere / maintain / compactDeltas /
  * compact / vacuum against a driver-side in-memory model of the
  * store's contract, and after every step assert
  *
  *   1. [[CorpusStore.read]] equals the model's current state;
  *   2. [[CorpusStore.readAt]](s) equals the model's snapshot at s for
  *      every seq at or above the fold horizon (below it, folds truncate
  *      history by contract — those seqs are exempt, exactly as the
  *      readAt scaladoc states);
  *   3. [[CorpusStore.changesSince]](s) applied to the model's snapshot
  *      at s reconstructs the current state, for every s at or above the
  *      last MAJOR fold — the CDC completeness law: a MINOR fold may
  *      coarsen the feed (re-delivering already-applied net ops, which
  *      are idempotent) but may never LOSE a change; a MAJOR fold moves
  *      changes into the base and truncates the feed below it (the
  *      documented retention contract), so sync points below it are
  *      exempt.
  *
  * The point of the random walk is the interleavings no hand-written
  * spec enumerates: a minor fold between two DML verbs, a vacuum in the
  * middle of a fold chain, maintenance tripping a major right after a
  * tombstone-only append. Seeds are FIXED so a failure replays
  * deterministically (the failure message carries seed + step).
  */
class StoreModelSpec extends SparkTestBase {

  import spark.implicits._

  private type State = Map[Long, (String, Long)] // id -> (v, n)

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft-test-model-$tag"
    val p = new Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    d
  }

  private def toDf(s: Seq[(Long, String, Long)]) = s.toDF("id", "v", "n")

  private def readState(dir: String): State =
    CorpusStore.read(spark, dir, "id").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  private def readAtState(dir: String, seq: Long): State =
    CorpusStore.readAt(spark, dir, "id", seq).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  private def horizonOf(dir: String): Long =
    CorpusStore.describe(spark, dir).filter(col("kind") === "horizon")
      .collect().headOption.map(_.getLong(2)).getOrElse(-1L)

  /** Apply a changesSince feed (netted: one row per key) to a snapshot. */
  private def applyFeed(snap: State, dir: String, sinceSeq: Long): State =
    CorpusStore.changesSince(spark, dir, "id", sinceSeq).collect()
      .foldLeft(snap) { (acc, r) =>
        val id = r.getLong(0)
        if (r.getAs[String]("op") == "d") acc - id
        else acc + (id -> (r.getString(1), r.getLong(2)))
      }

  private def runWalk(seed: Long, steps: Int): Unit = {
    val rnd = new Random(seed)
    val dir = freshDir(s"walk$seed")
    val init: State =
      (0L until 12L).map(i => i -> (s"v$i", i % 5)).toMap
    CorpusStore.init(
      toDf(init.toSeq.map { case (id, (v, n)) => (id, v, n) }), dir)

    var model = init
    // model snapshot AFTER each landed seq (seq -> state)
    var snapshots = Map[Long, State]()
    var nextSeq = 0L
    // newest seq consumed by a MAJOR fold: CDC sync points below it are
    // truncated by contract. Every landed seq is represented by a live
    // delta at or re-stamped to the max of its (minor-)fold group, so a
    // successful major fold always consumes up to the newest landed seq.
    var majorH = -1L
    def recordMajor(): Unit = majorH = math.max(majorH, nextSeq - 1)

    def ctx(step: Int, op: String) = s"seed=$seed step=$step op=$op"

    (0 until steps).foreach { step =>
      val roll = rnd.nextInt(100)
      val op =
        if (roll < 45) { // append: random upserts + tombstones
          val seq = nextSeq; nextSeq += 1
          val ups = (0 until 1 + rnd.nextInt(4)).map { _ =>
            val id = rnd.nextInt(40).toLong
            (id, s"s$seq-$id", rnd.nextInt(10).toLong)
          }.distinctBy(_._1)
          val dels = (0 until rnd.nextInt(3)).map(_ => rnd.nextInt(40).toLong)
            .distinct.filterNot(ups.map(_._1).contains)
          CorpusStore.append(spark, dir, seq, "id", toDf(ups),
            deleteKeys =
              if (dels.isEmpty) None else Some(dels.map(Tuple1(_)).toDF("id")))
          model = model -- dels ++ ups.map(u => u._1 -> (u._2, u._3))
          snapshots += seq -> model
          s"append($seq)"
        } else if (roll < 55) { // deleteWhere on a random n-predicate
          val seq = nextSeq; nextSeq += 1
          val r = rnd.nextInt(5).toLong
          val nDel = CorpusStore.deleteWhere(spark, dir, "id", seq,
            cond = col("n") === r)
          val dead = model.collect { case (id, (_, n)) if n == r => id }
          assert(nDel == dead.size, ctx(step, s"deleteWhere n=$r"))
          model = model -- dead
          snapshots += seq -> model
          s"deleteWhere($seq, n=$r)"
        } else if (roll < 65) { // updateWhere: set sees the pre-update row
          val seq = nextSeq; nextSeq += 1
          val r = rnd.nextInt(5).toLong
          val nUpd = CorpusStore.updateWhere(spark, dir, "id", seq,
            cond = col("n") >= lit(10L - r),
            set = Map("v" -> concat(col("v"), lit("+")), "n" -> (col("n") - 1)))
          val hit = model.filter { case (_, (_, n)) => n >= 10L - r }
          assert(nUpd == hit.size, ctx(step, s"updateWhere r=$r"))
          model = model ++ hit.map { case (id, (v, n)) => id -> (v + "+", n - 1) }
          snapshots += seq -> model
          s"updateWhere($seq, r=$r)"
        } else if (roll < 75) {
          val tier = CorpusStore.maintain(spark, dir, "id",
            maxLiveDeltas = 2 + rnd.nextInt(4),
            maxDeltaToBaseRatio = if (rnd.nextBoolean()) 0.3 else 2.0)
          if (tier == "major") recordMajor()
          s"maintain->$tier"
        } else if (roll < 82) {
          s"compactDeltas->${CorpusStore.compactDeltas(spark, dir, "id")}"
        } else if (roll < 89) {
          // a no-op compact (no live deltas) folds nothing
          if (nextSeq - 1 > majorH) recordMajor()
          CorpusStore.compact(spark, dir, "id",
            retainGenerations = 1 + rnd.nextInt(2))
          "compact"
        } else {
          s"vacuum->${CorpusStore.vacuum(spark, dir,
            retainGenerations = 1 + rnd.nextInt(2))}"
        }

      // invariant 1: read == model, after EVERY step
      assert(readState(dir) == model, s"${ctx(step, op)}: read != model")

      // invariants 2+3 every few steps (each is a handful of Spark jobs)
      if (step % 5 == 4 && snapshots.nonEmpty) {
        val h = horizonOf(dir)
        val seqs = snapshots.keys.toSeq
        // readAt at a retained boundary (>= fold horizon)
        seqs.filter(_ >= h).sorted.takeRight(2).foreach { s =>
          assert(readAtState(dir, s) == snapshots(s),
            s"${ctx(step, op)}: readAt($s) != snapshot (horizon=$h)")
        }
        // CDC completeness from any sync point the retention contract
        // still covers (at or above the last MAJOR fold) — minor folds
        // in the range only coarsen the feed, never lose a change
        val replayable = seqs.filter(_ >= majorH)
        if (replayable.nonEmpty) {
          val s = replayable(rnd.nextInt(replayable.size))
          assert(applyFeed(snapshots(s), dir, s) == model,
            s"${ctx(step, op)}: changesSince($s) replay != model " +
              s"(horizon=$h majorH=$majorH)")
        }
        // a consumer synced before everything still reaches the current
        // state when nothing major has folded yet
        if (majorH < 0)
          assert(applyFeed(init, dir, -1L) == model,
            s"${ctx(step, op)}: from-scratch changesSince(-1) replay != model")
      }
    }
    // close the walk: a final major fold and vacuum must preserve state
    CorpusStore.compact(spark, dir, "id")
    CorpusStore.vacuum(spark, dir)
    assert(readState(dir) == model, s"seed=$seed: state lost at final fold")
  }

  /** The manifested variant: same random verb walk over a store built
    * WITH stats + bloom manifest, adding the pruned-path invariants —
    * [[CorpusStore.lookup]], [[CorpusStore.prunedRead]], and DML with a
    * `prune` hint must return exactly the model's answer at every
    * step, across appendManifest parts landing per append, dropParts
    * on minor folds and vacuums, and rebuildManifest on majors. Probe
    * keys deliberately mix Int and Long literals to exercise the
    * recorded-type cast (`<c>_bloom_dt`) on every walk. */
  private def runManifestWalk(seed: Long, steps: Int): Unit = {
    val rnd = new Random(seed)
    val dir = freshDir(s"mwalk$seed")
    val init: State =
      (0L until 12L).map(i => i -> (s"v$i", i % 5)).toMap
    CorpusStore.init(
      toDf(init.toSeq.map { case (id, (v, n)) => (id, v, n) }), dir,
      statsCols = Seq("id", "n"), bloomCols = Seq("id"))
    var model = init
    var nextSeq = 0L

    def ctx(step: Int, op: String) = s"seed=$seed step=$step op=$op"

    (0 until steps).foreach { step =>
      val roll = rnd.nextInt(100)
      val op =
        if (roll < 45) {
          val seq = nextSeq; nextSeq += 1
          val ups = (0 until 1 + rnd.nextInt(4)).map { _ =>
            val id = rnd.nextInt(40).toLong
            (id, s"s$seq-$id", rnd.nextInt(10).toLong)
          }.distinctBy(_._1)
          val dels = (0 until rnd.nextInt(3)).map(_ => rnd.nextInt(40).toLong)
            .distinct.filterNot(ups.map(_._1).contains)
          CorpusStore.append(spark, dir, seq, "id", toDf(ups),
            deleteKeys =
              if (dels.isEmpty) None else Some(dels.map(Tuple1(_)).toDF("id")))
          model = model -- dels ++ ups.map(u => u._1 -> (u._2, u._3))
          s"append($seq)"
        } else if (roll < 55) { // DML with a prune hint implied by cond
          val seq = nextSeq; nextSeq += 1
          val r = rnd.nextInt(5).toLong
          CorpusStore.deleteWhere(spark, dir, "id", seq,
            cond = col("n") === r,
            prune = Some(ScanPruning.boxPredicate(Seq(("n", r, r)))))
          model = model.filterNot { case (_, (_, n)) => n == r }
          s"deleteWhere($seq, n=$r, pruned)"
        } else if (roll < 70) {
          val tier = CorpusStore.maintain(spark, dir, "id",
            maxLiveDeltas = 2 + rnd.nextInt(4),
            maxDeltaToBaseRatio = if (rnd.nextBoolean()) 0.3 else 2.0)
          s"maintain->$tier"
        } else if (roll < 80) {
          s"compactDeltas->${CorpusStore.compactDeltas(spark, dir, "id")}"
        } else if (roll < 90) {
          CorpusStore.compact(spark, dir, "id")
          "compact"
        } else {
          s"vacuum->${CorpusStore.vacuum(spark, dir)}"
        }

      assert(readState(dir) == model, s"${ctx(step, op)}: read != model")

      // bloom lookup: mixed Int/Long probe literals, present + absent keys
      val probe: Seq[Any] = Seq(
        rnd.nextInt(40),            // Int literal on a Long column (cast path)
        rnd.nextInt(40).toLong,     // exact-type literal
        999L)                       // never present
      val got = CorpusStore.lookup(spark, dir, "id", probe).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      val want = model.view.filterKeys(
        probe.map { case i: Int => i.toLong; case l: Long => l }.toSet).toMap
      assert(got == want, s"${ctx(step, op)}: lookup($probe) != model")

      // box-pruned read: transparent pruning, caller re-applies the filter
      if (step % 3 == 2) {
        val lo = rnd.nextInt(30).toLong
        val hi = lo + 8
        val pr = CorpusStore.prunedRead(spark, dir, "id",
            keep = ScanPruning.boxPredicate(Seq(("id", lo, hi))))
          .filter(col("id").between(lo, hi)).collect()
          .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
        assert(pr == model.view.filterKeys(k => k >= lo && k <= hi).toMap,
          s"${ctx(step, op)}: prunedRead([$lo,$hi]) != model")
      }
    }
  }

  test("random walk, seed 1: read/readAt/changesSince match the model at every step") {
    runWalk(seed = 1L, steps = 30)
  }

  test("manifested random walk, seed 7: lookup/prunedRead/pruned-DML match the model at every step") {
    runManifestWalk(seed = 7L, steps = 24)
  }

  test("soak: six more seeds at longer walks (gated on SPARK_GRAFT_SOAK=1)") {
    // opt-in depth: ~6x the default walk budget, for pre-release shakes
    // rather than every CI pass. Run green on the round-14 close tree.
    assume(sys.env.get("SPARK_GRAFT_SOAK").contains("1"),
      "set SPARK_GRAFT_SOAK=1 to run the soak walks")
    Seq(11L, 17L, 23L, 99L).foreach(runWalk(_, steps = 40))
    Seq(13L, 29L).foreach(runManifestWalk(_, steps = 30))
  }

  test("random walk, seed 42: read/readAt/changesSince match the model at every step") {
    runWalk(seed = 42L, steps = 30)
  }

  test("random walk, seed 2026: read/readAt/changesSince match the model at every step") {
    runWalk(seed = 2026L, steps = 30)
  }
}
