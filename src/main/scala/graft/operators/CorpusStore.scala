package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.ScanPruning

/** Merge-on-read corpus store: the incremental-refresh layout that makes
  * [[Versioning.upsert]] affordable as a CONTINUOUS process. A plain
  * upsert rewrites the corpus per batch — O(corpus) writes for an
  * O(batch) change. This store keeps an immutable `base/` plus small
  * `delta_<seq>/` parquet dirs (upserts and tombstones), so:
  *
  *   - [[append]] costs O(batch): one delta dir written, nothing read.
  *   - [[read]] resolves last-writer-wins at scan time: the delta union
  *     (small) takes one window for latest-per-key; the base — the
  *     100 TB side — streams through a LEFT ANTI join on the distinct
  *     delta keys. The anti side is broadcast ONLY when the delta mass
  *     is counted small (parquet footer counts — a metadata read), so a
  *     store past its compaction cadence degrades to a shuffled
  *     anti-join instead of OOMing an executor on an unbounded
  *     broadcast (plan-asserted both ways in CorpusStoreSpec).
  *   - [[compact]] folds deltas into a new base when their mass warrants
  *     it, amortizing the O(corpus) rewrite over many appends — the
  *     LSM / merge-on-read pattern of the lakehouse table formats,
  *     expressed in plain parquet. [[compactIfNeeded]] makes the cadence
  *     a checked contract rather than an advisory comment.
  *   - An optional per-file stats manifest ([[graft.sources.ScanPruning]])
  *     is maintained INCREMENTALLY: [[init]] builds it, [[append]]
  *     extends it with one O(batch) aggregate over the new delta files,
  *     [[compact]] rebuilds it over the new base — so [[prunedRead]] can
  *     skip base files by min/max box (and [[lookup]] by per-file key
  *     bloom, layout-free) at any point in the append lifecycle without
  *     an O(corpus) manifest rescan.
  *   - [[readAt]] time-travels to any seq not yet folded by compaction;
  *     [[changesSince]] is the O(changes) CDC feed — the net per-key op
  *     since a consumer's last sync, read from the newer deltas alone.
  *
  * Sequence numbers are CALLER-supplied (a stream's batchId, a crawl
  * drop id): re-appending the same seq OVERWRITES that delta, so replays
  * after a failure are idempotent — and seqs must land NONDECREASING
  * across the store's life (checked: a seq at or below the fold horizon
  * fails loudly, see the guard in the append path). Contracts: keys
  * unique within base and within each delta. Single-writer is ENFORCED,
  * not promised: every mutation ([[append]], [[compact]],
  * [[compactDeltas]], [[vacuum]], DML) takes a create-exclusive lease
  * file (`_writer_lock`) and a second concurrent writer fails loudly
  * instead of corrupting silently; a lease abandoned by a crashed
  * writer is taken over after [[DefaultStaleLockMs]] (or immediately
  * via [[breakLock]] — the operator-intervention verb every table
  * format's lock story has).
  *
  * SNAPSHOT ISOLATION for readers: a compact never renames or deletes
  * what the current snapshot's readers hold — it writes the fold as a
  * NEW base generation (`base_gen_<n>`, committed by its `_SUCCESS`
  * marker), retires folded deltas with an in-dir marker new plans skip,
  * and purges the previous generation's files only at the START of the
  * NEXT compact. Readers therefore get a one-compact-cycle grace
  * window (the VACUUM-retention contract of the table formats,
  * expressed in plain parquet); a plan overlapping TWO compacts loses
  * its files and must re-run. See [[compact]]'s crash-state and
  * retention notes.
  */
object CorpusStore {

  private val SeqCol = "__seq"
  private val OpCol = "__op"

  /** Bound on the delta rows [[read]] will broadcast as an anti-join key
    * set. Footer row count, not distinct keys — a cheap upper bound.
    * Same order as [[Dedup]]'s maxBroadcastCandidates: ~2M ids is tens
    * of MB on the wire, safely under the 64 MB session threshold. */
  val DefaultMaxBroadcastKeys = 2000000L

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- writer lease -------------------------------------------------

  /** Lease file every store MUTATION holds for its duration: created
    * create-exclusive (the atomic primitive plain filesystems offer), so
    * a second concurrent writer fails loudly instead of silently
    * interleaving with a compact — the optimistic-commit/lock-file
    * discipline of the table formats, in its simplest sound form. */
  private val LockFile = "_writer_lock"

  /** Age past which an existing lease is presumed abandoned (its writer
    * crashed without the release running) and may be taken over. Ten
    * minutes bounds how long a crash can wedge the store; a LIVE writer
    * legitimately holding the lock longer (a multi-hour 100 TB compact)
    * should re-touch the lease or raise the bound via `staleLockMs`. */
  val DefaultStaleLockMs: Long = 600000L

  /** Run `body` holding the store's writer lease. Acquisition order:
    * create-exclusive; on conflict, take over a lease older than
    * `staleLockMs` (one delete + one retry — two racers both seeing a
    * stale lease still serialize on the exclusive create); otherwise
    * fail loudly with the holder's age. While `body` runs, a daemon
    * heartbeat re-touches the lease every staleLockMs/3, so a LIVE
    * long-running mutation (a multi-hour 100 TB compact) never ages
    * past the stale bound and loses its lock to a takeover — staleness
    * then means "no heartbeat for the bound", a crash signal, not a
    * duration cap on honest work. Released on every exit path; a
    * crashed JVM stops heartbeating and leaks the lease until
    * staleness or [[breakLock]]. Package-private for the spec. */
  /** ONE shared daemon timer for every lease heartbeat: a
    * java.util.Timer spawns its thread at construction, and a
    * per-acquisition timer would churn an OS thread per microbatch on a
    * streaming writer. Tasks are scheduled/cancelled per lock. */
  private lazy val LeaseTimer = new java.util.Timer("graft-writer-lease", true)

  private[operators] def withWriterLock[T](spark: SparkSession, dir: String,
      staleLockMs: Long = DefaultStaleLockMs)(body: => T): T = {
    val d = fs(spark, dir)
    d.mkdirs(new Path(dir))
    val p = new Path(dir, LockFile)
    val content =
      s"${java.util.UUID.randomUUID()} ${System.currentTimeMillis()}"
    def tryAcquire(): Boolean = {
      val uri = p.toUri
      if (uri.getScheme == null || uri.getScheme == "file") {
        // Hadoop's LOCAL create(overwrite = false) is exists-then-create
        // (a TOCTOU race two same-box writers can both win — observed as
        // doubled rows when two compacts' committers merged one
        // generation dir); O_EXCL via CREATE_NEW is the atomic form
        try {
          java.nio.file.Files.write(java.nio.file.Paths.get(uri.getPath),
            content.getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW)
          true
        } catch { case _: java.io.IOException => false }
      } else try {
        // HDFS/object-store create(overwrite = false) is atomic server-side
        val out = d.create(p, false)
        try out.write(content.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
    if (!tryAcquire()) {
      val ageMs =
        try System.currentTimeMillis() - d.getFileStatus(p).getModificationTime
        catch { case _: java.io.IOException => Long.MaxValue } // vanished: retry
      if (ageMs > staleLockMs) d.delete(p, false)
      if (ageMs <= staleLockMs || !tryAcquire())
        throw new IllegalStateException(
          s"another writer holds $p (age ${ageMs / 1000}s <= stale bound " +
            s"${staleLockMs / 1000}s): the store is single-writer — wait, " +
            "or breakLock() if the holder is known dead")
    }
    val period = math.max(staleLockMs / 3, 50L)
    // release and heartbeat serialize on this monitor: Timer.cancel()
    // does not stop a task already MID-RUN, so an unsynchronized release
    // could delete the lease between the task's existence check and its
    // rewrite — the task would then re-create the file after release,
    // leaking a lease no one deletes that blocks every writer for the
    // whole stale bound
    val releaseGate = new Object
    @volatile var released = false
    val heartbeat = new java.util.TimerTask {
      override def run(): Unit = releaseGate.synchronized {
        // REWRITE, not setTimes: FileSystem.setTimes is a silent no-op in
        // the base class (object-store connectors inherit it, and object
        // mtime is creation time anyway) — an overwrite PUT refreshes the
        // lease's mtime on every filesystem. Guarded on existence so a
        // broken lock is not resurrected (the next verb's acquire
        // surfaces that conflict instead).
        try {
          if (!released && d.exists(p)) {
            val out = d.create(p, true)
            try out.write(content.getBytes("UTF-8")) finally out.close()
          }
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    LeaseTimer.schedule(heartbeat, period, period)
    try body finally {
      heartbeat.cancel()
      releaseGate.synchronized {
        released = true
        d.delete(p, false)
      }
    }
  }

  /** Remove an abandoned writer lease NOW (a crashed [[appendStream]]
    * writer's restart, a killed compact) instead of waiting out
    * [[DefaultStaleLockMs]]. Caller asserts the holder is dead — breaking
    * a LIVE writer's lease reintroduces exactly the double-writer
    * corruption the lease exists to prevent. Returns whether a lease
    * file was removed. */
  def breakLock(spark: SparkSession, dir: String): Boolean = {
    val d = fs(spark, dir)
    val p = new Path(dir, LockFile)
    d.exists(p) && d.delete(p, false)
  }

  // ---- fold horizon -------------------------------------------------

  /** Store-root file recording the newest FOLDED seq (major or minor
    * compaction) — the replay fence: an append or DML at a seq at or
    * below it would overwrite a retired delta dir (destroying
    * grace-window files concurrent readers may hold) or silently give a
    * "current-state" verb a post-fold snapshot, so the write path
    * rejects it loudly. Monotonic; absent on a never-compacted store. */
  private val HorizonFile = "_horizon"

  /** The `_horizon` file's recorded seq, -1 when absent or torn. */
  private def recordedHorizon(spark: SparkSession, dir: String): Long = {
    val d = fs(spark, dir)
    val p = new Path(dir, HorizonFile)
    if (!d.exists(p)) -1L
    else try {
      val in = d.open(p)
      try {
        val buf = new Array[Byte](32) // a decimal Long is <= 20 bytes
        val n = in.read(buf)
        new String(buf, 0, math.max(n, 0), "UTF-8").trim.toLong
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => -1L } // torn write
  }

  /** The newest folded seq: the `_horizon` file when present and
    * parseable, else the max seq among still-on-disk retired delta dirs
    * (pre-horizon stores / a crash between marking and the horizon
    * write), else -1 (nothing folded — every seq >= 0 is appendable). */
  private def foldHorizon(spark: SparkSession, dir: String): Long = {
    val d = fs(spark, dir)
    def foldedMax: Long =
      if (!d.exists(new Path(dir))) -1L
      else d.listStatus(new Path(dir)).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("delta_")
          && isFolded(d, st.getPath))
        .map(st => deltaSeqOf(st.getPath.toString)).maxOption.getOrElse(-1L)
    math.max(recordedHorizon(spark, dir), foldedMax)
  }

  /** Advance the horizon to `seq` (never backwards — a re-run compact
    * must not lower the fence). Monotonic against the RECORDED value
    * only: comparing against [[foldHorizon]] would see the just-marked
    * dirs' fallback already AT `seq` and skip the write — leaving the
    * fence to live in the retired dirs alone, which the next
    * [[vacuum]]/compact purges, silently dropping the fence to -1 and
    * reopening every folded seq to replay (the bug a fence-after-vacuum
    * spec caught). Torn writes parse as absent and fall back to the
    * folded-dir listing until the next fold rewrites the file. */
  private def writeHorizon(spark: SparkSession, dir: String, seq: Long): Unit = {
    val d = fs(spark, dir)
    if (seq > recordedHorizon(spark, dir)) {
      val out = d.create(new Path(dir, HorizonFile), true)
      try out.write(seq.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Marker file a [[compact]] drops inside each delta it folded: the
    * delta's content now lives in the new base generation, so every NEW
    * plan skips the dir, while its FILES stay on disk until the next
    * compact for the benefit of plans that listed them earlier (the
    * snapshot grace window). Underscore-prefixed, so parquet readers and
    * the [[changesStream]] file source ignore the marker itself. */
  private val FoldedMarker = "_folded"

  private def isFolded(d: org.apache.hadoop.fs.FileSystem, p: Path): Boolean =
    d.exists(new Path(p, FoldedMarker))

  /** Suffix of a MINOR-compaction delta dir (`delta_<seq>.m`): the
    * level-0 → level-1 fold of [[compactDeltas]] — many small live
    * deltas netted into ONE delta, base untouched. The suffix keeps the
    * fold's name distinct from the plain `delta_<seq>` it supersedes
    * (which stays on disk, retired, for the grace window) while parsing
    * and string-sorting to the same seq position. */
  private val MinorSuffix = ".m"

  private def isMinorName(name: String): Boolean = name.endsWith(MinorSuffix)

  /** A minor-fold dir is reader-visible only once its write COMMITTED
    * (`_SUCCESS`): unlike a plain append — whose torn write is covered
    * by the caller's same-seq replay contract — a crashed fold has no
    * replaying writer, so the commit marker is the liveness gate and
    * uncommitted fold debris is invisible until purged. */
  private def minorCommitted(d: org.apache.hadoop.fs.FileSystem, p: Path): Boolean =
    !isMinorName(p.getName) || d.exists(new Path(p, "_SUCCESS"))

  /** Live (unfolded) delta dirs — what every read resolves against. */
  private def deltaPaths(spark: SparkSession, dir: String): Seq[String] = {
    val d = fs(spark, dir)
    if (!d.exists(new Path(dir))) Seq.empty
    else d.listStatus(new Path(dir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("delta_")
        && !isFolded(d, st.getPath) && minorCommitted(d, st.getPath))
      .map(_.getPath.toString).sorted
  }

  private def manifestPath(dir: String): String = s"$dir/manifest"

  private def hasManifest(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(manifestPath(dir)))

  /** Compacted base generations live in `base_gen_<n>` dirs; [[init]]'s
    * original snapshot is generation 0 at `base`. */
  private val GenPrefix = "base_gen_"

  /** COMPLETE base generations (their Spark write committed — `_SUCCESS`
    * present), newest last. An in-flight or crashed fold attempt has no
    * `_SUCCESS` and is invisible here. */
  private def genDirs(spark: SparkSession, dir: String): Seq[(Long, String)] = {
    val d = fs(spark, dir)
    if (!d.exists(new Path(dir))) Seq.empty
    else d.listStatus(new Path(dir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(GenPrefix)
        && d.exists(new Path(st.getPath, "_SUCCESS")))
      .map(st => (st.getPath.getName.stripPrefix(GenPrefix).toLong,
        st.getPath.toString))
      .sortBy(_._1)
  }

  /** The store's current base: the newest COMPLETE generation, else the
    * gen-0 `base` [[init]] wrote. The `_SUCCESS` marker is the commit
    * point — a fold that died mid-write never becomes current, and the
    * previous generation keeps serving reads. */
  private def currentBase(spark: SparkSession, dir: String): (Long, String) =
    genDirs(spark, dir).lastOption.getOrElse {
      require(fs(spark, dir).exists(new Path(s"$dir/base")),
        s"no base snapshot in $dir: init the store first")
      (0L, s"$dir/base")
    }

  /** Create/replace the base snapshot (generation 0) and drop any
    * existing deltas, folded markers, and older generations.
    * With `statsCols`, also build the file-skipping manifest over the
    * new base (one column-pruned scan) — [[append]] then maintains it
    * incrementally and [[prunedRead]] consumes it. `bloomCols` adds
    * per-file key blooms to the manifest for point lookups on
    * hash-laid-out (unclustered) corpora, where min/max boxes cannot
    * prune — see [[lookup]]. */
  def init(df: DataFrame, dir: String, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    withWriterLock(spark, dir) {
      val d = fs(spark, dir)
      df.write.mode(SaveMode.Overwrite).parquet(s"$dir/base")
      if (d.exists(new Path(dir)))
        d.listStatus(new Path(dir)).toSeq.foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith("delta_") || n.startsWith(GenPrefix))
            require(d.delete(st.getPath, true), s"init: could not clear ${st.getPath}")
        }
      d.delete(new Path(dir, HorizonFile), false) // a fresh store has no fold fence
      if (statsCols.nonEmpty || bloomCols.nonEmpty)
        ScanPruning.writeManifest(spark, s"$dir/base", manifestPath(dir),
          statsCols, bloomCols)
      else d.delete(new Path(manifestPath(dir)), true)
    }
  }

  /** Append one refresh batch as `delta_<seq>`: `upserts` rows replace
    * base/earlier-delta rows with their key; `deleteKeys` (a 1-column
    * frame of keys) tombstone theirs. Same-seq re-append overwrites —
    * idempotent replay (including the manifest: the delta's old file
    * entries are dropped before the new ones land). O(batch) IO; the
    * corpus is not read. A key named in BOTH sides of one append
    * resolves deterministically to the tombstone (within a seq, delete
    * wins — see [[read]]'s tie-break). */
  def append(spark: SparkSession, dir: String, seq: Long, key: String,
      upserts: DataFrame, deleteKeys: Option[DataFrame] = None): Unit =
    withWriterLock(spark, dir) {
      doAppend(spark, dir, seq, key, upserts, deleteKeys)
    }

  /** [[append]] without the lease (callers already hold it). The fold
    * fence: a seq at or below the horizon names a RETIRED delta — its
    * overwrite would delete a `_folded` dir's files out from under
    * grace-window readers and resurrect pre-fold content as live, so it
    * fails loudly (a stream replaying a batch the store folded mid-crash
    * hits this; advance the consumer's checkpoint or re-init the store —
    * compaction past an in-flight writer's uncommitted batch is the
    * operational error, and this guard is where it surfaces). */
  private def doAppend(spark: SparkSession, dir: String, seq: Long, key: String,
      upserts: DataFrame, deleteKeys: Option[DataFrame] = None): Unit = {
    require(seq >= 0, s"seq must be >= 0, got $seq")
    // fail at the WRITE, not two verbs later: a keyless batch would land
    // fine and then blow up every read's latest-per-key window with an
    // unresolved-column error pointing nowhere near the bad append.
    // Matches the session's resolution rules: case-insensitive unless
    // spark.sql.caseSensitive — a differently-cased key that every read
    // resolves fine must not be rejected at the write
    val hasKey =
      if (spark.sessionState.conf.caseSensitiveAnalysis)
        upserts.columns.contains(key)
      else upserts.columns.exists(_.equalsIgnoreCase(key))
    require(hasKey,
      s"append batch has no '$key' column (found: " +
        s"${upserts.columns.mkString(", ")}) — every upsert row must carry " +
        "the store's key")
    val horizon = foldHorizon(spark, dir)
    require(seq > horizon,
      s"append at seq $seq is at or below the fold horizon $horizon: that " +
        "delta was retired by a compaction and its files may be held by " +
        "grace-window readers — seqs must be strictly newer than every fold")
    val up = upserts.withColumn(OpCol, lit("u"))
    val all = deleteKeys match {
      case Some(dk) => up.unionByName(
        dk.select(col(key)).withColumn(OpCol, lit("d")),
        allowMissingColumns = true)
      case None => up
    }
    val deltaDir = deltaDirOf(dir, seq)
    all.withColumn(SeqCol, lit(seq))
      .write.mode(SaveMode.Overwrite).parquet(deltaDir)
    if (hasManifest(spark, dir))
      ScanPruning.appendManifest(spark, manifestPath(dir), deltaDir)
  }

  /** Last-writer-wins resolution of a delta union over a base frame —
    * shared by [[read]]/[[readAt]]/[[prunedRead]]/[[lookup]]. The base
    * never shuffles while the delta mass is within `maxBroadcastKeys`
    * (footer-counted preflight — `deltaRows`, the caller's driver-side
    * [[graft.sources.ParquetMeta]] read over the delta dirs, the same
    * number a count-star job would return without the job; total delta
    * rows bounds the distinct key count from above); past the bound the
    * resolution degrades to a plain shuffled anti-join with identical
    * output instead of an unbounded broadcast. */
  private def resolve(base: DataFrame, du: DataFrame, key: String,
      deltaRows: Long, maxBroadcastKeys: Long,
      evolveSchema: Boolean = false): DataFrame = {
    // secondary tie-break on __op: within one seq, 'd' sorts before 'u',
    // so a key upserted AND tombstoned in the same append deterministically
    // resolves to the tombstone (not whichever row the shuffle saw first)
    val latest = du.withColumn("__rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col(SeqCol).desc, col(OpCol).asc)))
      .filter(col("__rn") === 1)
    val survivors = latest.filter(col(OpCol) === "u")
      .drop(OpCol, SeqCol, "__rn")
    val keys = du.select(col(key)).distinct()
    val anti = if (deltaRows <= maxBroadcastKeys) broadcast(keys) else keys
    val kept = base.join(anti, Seq(key), "left_anti")
    if (evolveSchema) kept.unionByName(survivors, allowMissingColumns = true)
    else {
      // null-fill base columns the delta schema omits instead of selecting
      // unresolved names: keeps the "every crash point leaves a readable
      // store" invariant when an evolveSchema [[compact]] died after its
      // base swap (widened base, old-schema deltas still present) — those
      // delta rows read null in the added columns, exactly what the
      // evolve read would say, instead of an AnalysisException
      val sCols = survivors.columns.toSet
      kept.unionByName(survivors.select(base.schema.map(f =>
        if (sCols.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)).toIndexedSeq: _*))
    }
  }

  /** Read the delta dirs; with `evolveSchema`, merge their parquet
    * schemas (an O(deltas) footer read) so a widened delta's new columns
    * survive a multi-dir scan instead of being dropped to the first
    * file's schema. */
  private def readDeltas(spark: SparkSession, deltas: Seq[String],
      evolveSchema: Boolean): DataFrame =
    if (evolveSchema)
      spark.read.option("mergeSchema", "true").parquet(deltas: _*)
    else spark.read.parquet(deltas: _*)

  /** The current corpus: base minus overridden/tombstoned keys, plus the
    * latest surviving delta row per key — [[resolve]]'s contract over
    * all deltas.
    *
    * `evolveSchema = true` is the lakehouse schema-evolution read: a
    * refresh batch may ADD columns without rewriting the corpus — the
    * result schema is base ∪ delta columns (base order first), base
    * rows read null in the added columns, and a delta row reads null in
    * any base column its schema omits (an upsert replaces the WHOLE
    * row; callers wanting carry-over include the columns in the batch).
    * The default (false) keeps the base schema exactly and is only
    * correct while every delta carries it. */
  def read(spark: SparkSession, dir: String, key: String,
      maxBroadcastKeys: Long = DefaultMaxBroadcastKeys,
      evolveSchema: Boolean = false): DataFrame = {
    val base = spark.read.parquet(currentBase(spark, dir)._2)
    val deltas = deltaPaths(spark, dir)
    if (deltas.isEmpty) return base
    resolve(base, readDeltas(spark, deltas, evolveSchema), key,
      graft.sources.ParquetMeta.rows(spark, deltas), maxBroadcastKeys,
      evolveSchema)
  }

  /** The seq encoded in a delta dir name (`delta_<%019d>`, minor folds
    * `delta_<%019d>.m`). */
  private def deltaSeqOf(p: String): Long = {
    val n = new Path(p).getName.stripPrefix("delta_")
    (if (isMinorName(n)) n.dropRight(MinorSuffix.length) else n).toLong
  }

  private def deltaDirOf(dir: String, seq: Long): String =
    f"$dir/delta_$seq%019d"

  /** Time travel: the corpus as of `asOfSeq` — base plus only the deltas
    * with seq <= asOfSeq (selected by DIR NAME, so newer deltas are
    * never even opened). History reaches back to the last [[compact]]:
    * compaction folds the deltas it consumes into the base, so seqs at
    * or below the fold point all read as the folded state (the
    * lakehouse VACUUM contract — retained history is bounded by
    * compaction cadence, by design, not accident). */
  def readAt(spark: SparkSession, dir: String, key: String, asOfSeq: Long,
      maxBroadcastKeys: Long = DefaultMaxBroadcastKeys,
      evolveSchema: Boolean = false): DataFrame = {
    val base = spark.read.parquet(currentBase(spark, dir)._2)
    val deltas = deltaPaths(spark, dir).filter(p => deltaSeqOf(p) <= asOfSeq)
    if (deltas.isEmpty) return base
    resolve(base, readDeltas(spark, deltas, evolveSchema), key,
      graft.sources.ParquetMeta.rows(spark, deltas), maxBroadcastKeys,
      evolveSchema)
  }

  /** A delta's commit instant: the mtime of the `_SUCCESS` its write
    * dropped last (the dir's own mtime as fallback — markers touch the
    * dir, never the commit file). */
  private def commitTimeOf(d: org.apache.hadoop.fs.FileSystem,
      p: Path): Long = {
    val s = new Path(p, "_SUCCESS")
    try (if (d.exists(s)) d.getFileStatus(s) else d.getFileStatus(p))
      .getModificationTime
    catch { case scala.util.control.NonFatal(_) => Long.MaxValue } // vanished mid-listing: never "already committed"
  }

  /** Resolve a wall-clock instant to a SEQ — the TIMESTAMP-AS-OF half
    * of time travel, done the way the table formats do it: the
    * timestamp picks a committed version, the version read does the
    * rest. Returns the newest live delta seq whose commit instant
    * (its `_SUCCESS` mtime — the store filesystem's clock) is at or
    * before `asOfMs`, or -1 when none is (a [[readAt]] at -1 is the
    * bare current base). Resolving by commit time and THEN reading by
    * seq keeps the snapshot coherent when mtime order and seq order
    * disagree (a replayed older seq carries a newer mtime): a seq read
    * can never include seq n+1 while excluding seq n. Same truncation
    * contract as [[readAt]] — history reaches back to the last fold,
    * and a minor fold's commit instant REPLACES its constituents'
    * (the fold is their only surviving carrier). O(live deltas)
    * metadata, nothing scanned. */
  def seqAtTime(spark: SparkSession, dir: String, asOfMs: Long): Long = {
    val d = fs(spark, dir)
    deltaPaths(spark, dir)
      .filter(p => commitTimeOf(d, new Path(p)) <= asOfMs)
      .map(deltaSeqOf).maxOption.getOrElse(-1L)
  }

  /** [[readAt]] addressed by wall-clock instead of seq (the
    * TIMESTAMP AS OF form): [[seqAtTime]] resolves the instant to the
    * newest seq committed at or before it, then the seq read runs as
    * usual. The clock is the store FILESYSTEM's (commit-file mtimes),
    * not the ingesting stream's event time; a same-seq replay
    * refreshes its commit instant (the replay IS a new commit of the
    * same content). Compose the same way with [[changesSince]] for a
    * time-addressed CDC sync point. */
  def readAtTime(spark: SparkSession, dir: String, key: String, asOfMs: Long,
      maxBroadcastKeys: Long = DefaultMaxBroadcastKeys,
      evolveSchema: Boolean = false): DataFrame =
    readAt(spark, dir, key, seqAtTime(spark, dir, asOfMs),
      maxBroadcastKeys, evolveSchema)

  /** Change-data feed: the NET change per key since `sinceSeq` — the
    * latest op ('u' with the row's new values, or 'd') across the deltas
    * with seq > sinceSeq, as data columns + `op` + `seq`. O(changes):
    * only the newer delta dirs are read, the base never is — the
    * incremental-consumer primitive (index refresh, downstream sync)
    * that costs what changed, not what exists. A consumer that applies
    * the feed to its copy of the `sinceSeq` state reaches the
    * [[read]]/[[readAt]] state for the newest seq ('d' for a key the
    * consumer never had is an idempotent no-op). Same truncation
    * contract as [[readAt]]: changes folded by a [[compact]] are no
    * longer individually replayable. */
  def changesSince(spark: SparkSession, dir: String, key: String,
      sinceSeq: Long): DataFrame = {
    val deltas = deltaPaths(spark, dir).filter(p => deltaSeqOf(p) > sinceSeq)
    if (deltas.isEmpty)
      return spark.read.parquet(currentBase(spark, dir)._2).filter(lit(false))
        .withColumn("op", lit("")).withColumn("seq", lit(0L))
    // mergeSchema unconditionally: the feed must carry a widened delta's
    // added columns even when older deltas in the range lack them (an
    // O(deltas) footer read — metadata scale)
    spark.read.option("mergeSchema", "true").parquet(deltas: _*)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col(SeqCol).desc, col(OpCol).asc)))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumnRenamed(OpCol, "op").withColumnRenamed(SeqCol, "seq")
  }

  /** [[read]] with manifest-driven file skipping on the base: only base
    * files whose min/max box satisfies `keep` are opened; resolution
    * still anti-joins on ALL delta keys (a pruned-away delta could
    * otherwise resurrect the stale base version of a key), and delta
    * survivors are returned in full. Same answer-transparency contract
    * as [[ScanPruning.prunedScan]]: callers re-apply their row-level
    * predicate on the result — `keep` prunes, it never answers.
    * Requires a manifest (init/append with `statsCols`). `evolveSchema`
    * as in [[read]] — the escape hatch for reading widened deltas'
    * added columns before the widening compact has folded them.
    * Self-heal: a compact that died between committing its new base
    * generation and rebuilding the manifest leaves the manifest pointing
    * at the PREVIOUS generation — detected here as zero manifest entries
    * under the current base dir, repaired by one rebuild (the crash
    * window costs one extra O(corpus-files) stat pass, once).
    * `asOfSeq` time-travels the DELTA side exactly as [[readAt]] does
    * (deltas selected by dir name; same compaction-bounded history
    * contract) — the manifest pruning is unaffected, it only ever
    * covers the base. */
  def prunedRead(spark: SparkSession, dir: String, key: String, keep: Column,
      maxBroadcastKeys: Long = DefaultMaxBroadcastKeys,
      evolveSchema: Boolean = false,
      asOfSeq: Option[Long] = None): DataFrame = {
    val baseDir = currentBase(spark, dir)._2
    require(hasManifest(spark, dir),
      s"prunedRead needs a manifest: init the store with statsCols, got none in $dir")
    val basePrefix = new Path(baseDir).toUri.getPath
    // stale-manifest detection (compact crash state 5) by PART NAME, a
    // driver metadata check instead of a limit(1) Spark job: the part
    // covering a data dir is named `<dirname>.parquet` by construction
    // (ScanPruning.writePart), so "no part named after the current base
    // generation" IS "no entry covers the current generation" — silent
    // empty pruning would LOSE base rows, so rebuild first
    val basePart = new Path(manifestPath(dir),
      s"${new Path(baseDir).getName}.parquet")
    if (!fs(spark, dir).exists(basePart))
      ScanPruning.rebuildManifest(spark, baseDir, manifestPath(dir))
    val m = spark.read.parquet(manifestPath(dir))
    val baseSlice = m.filter(col("file").startsWith(basePrefix))
    val prunedBase = ScanPruning.prunedScan(spark, baseDir, baseSlice, keep)
    val deltas = asOfSeq.fold(deltaPaths(spark, dir))(a =>
      deltaPaths(spark, dir).filter(p => deltaSeqOf(p) <= a))
    if (deltas.isEmpty) return prunedBase
    resolve(prunedBase, readDeltas(spark, deltas, evolveSchema), key,
      graft.sources.ParquetMeta.rows(spark, deltas), maxBroadcastKeys,
      evolveSchema)
  }

  /** Point/small-IN lookup by key: open only the base files whose bloom
    * may contain one of `keys` (manifest built with
    * `bloomCols = Seq(key)`), resolve deltas as usual, and return exactly
    * the matching rows. On a hash-laid-out 100 TB corpus this touches
    * ~(1 + fpp·files) base files instead of every one — the layout-free
    * complement to min/max pruning (which needs clustering to bite).
    * `keys` are bounded driver-side literals (an id list, not a join
    * side). */
  def lookup(spark: SparkSession, dir: String, key: String, keys: Seq[Any],
      maxBroadcastKeys: Long = DefaultMaxBroadcastKeys,
      evolveSchema: Boolean = false): DataFrame = {
    require(hasManifest(spark, dir),
      s"lookup needs a manifest: init the store with bloomCols = Seq(\"$key\")")
    val pred = ScanPruning.keyLookupPredicate(spark, manifestPath(dir), key, keys)
    prunedRead(spark, dir, key, pred, maxBroadcastKeys, evolveSchema)
      .filter(col(key).isin(keys: _*))
  }

  /** Bound on the distinct probe-side keys [[lookupJoin]] will collect to
    * the driver to drive bloom file pruning: 100k longs/strings is a few
    * MB on the driver and one array-literal probe expression
    * ([[graft.sources.ScanPruning.keyLookupPredicate]]'s big-set form) —
    * past it the join falls back to a full [[read]] with no file
    * skipping, never an unbounded collect. */
  val DefaultMaxPruneKeys = 100000L

  /** Semi-join the store against an arbitrary KEYS FRAME with
    * bloom-driven base-file skipping — the runtime-file-pruning form of
    * [[lookup]] (whose keys are caller literals): the dynamic-partition-
    * pruning idea applied to the store's manifest. The distinct probe
    * keys are PINNED first (localCheckpoint — the probe side is the
    * SMALL side by contract), so the guard count, the collected bloom
    * probe, and the semi-join all see the SAME key set even when the
    * caller's frame is nondeterministic (a sample, a limit): a key set
    * that re-sampled differently between pruning and joining would
    * silently drop rows. When the pinned distinct keys fit
    * `maxPruneKeys`, they are collected and
    * probed against the per-file key blooms, so the base opens
    * ~(files holding a key + fpp·files) files regardless of layout; the
    * keys frame is then broadcast for the row-level semi-join. Past the
    * bound (or with no bloom manifest for `key`) the semi-join still
    * returns the identical answer over a full [[read]] — pruning is an
    * optimization, never a semantics change. Delta resolution is as in
    * [[read]]: an overridden key returns its delta version, a tombstoned
    * key is absent even if the probe side names it. `asOfSeq` makes it a
    * time-travel lookup ([[readAt]]'s delta selection; the blooms cover
    * the base, so pruning is snapshot-independent) — the primitive that
    * lets an incremental consumer fetch the PRE-batch version of just
    * the changed keys at O(changed keys) file opens. */
  def lookupJoin(spark: SparkSession, dir: String, key: String,
      keysDf: DataFrame, maxPruneKeys: Long = DefaultMaxPruneKeys,
      maxBroadcastKeys: Long = DefaultMaxBroadcastKeys,
      evolveSchema: Boolean = false,
      asOfSeq: Option[Long] = None): DataFrame = {
    def full = asOfSeq.fold(
      read(spark, dir, key, maxBroadcastKeys, evolveSchema))(a =>
      readAt(spark, dir, key, a, maxBroadcastKeys, evolveSchema))
    val bloomed = hasManifest(spark, dir) &&
      ScanPruning.manifestBloomCols(spark, manifestPath(dir)).contains(key)
    // pinned (eager, lineage-free) so guard/probe/join share one key set
    val ks0 = keysDf.select(col(key)).distinct()
    val ks = if (bloomed) ks0.localCheckpoint(true) else ks0
    val n = if (bloomed) ks.count() else Long.MaxValue
    if (bloomed && n == 0L) return full.filter(lit(false))
    if (bloomed && n <= maxPruneKeys) {
      val keyVals = ks.collect().toIndexedSeq.map(_.get(0))
      val pred = ScanPruning.keyLookupPredicate(spark, manifestPath(dir),
        key, keyVals)
      prunedRead(spark, dir, key, pred, maxBroadcastKeys, evolveSchema,
          asOfSeq)
        .join(broadcast(ks), Seq(key), "left_semi")
    } else full.join(ks, Seq(key), "left_semi")
  }

  /** The snapshot a DML verb at `seq` mutates: the store as of `seq - 1`,
    * optionally through the manifest (`prune` skips base files like
    * [[prunedRead]]'s `keep` — an optimization with the same answer-
    * transparency contract: the verb re-applies its row predicate).
    * Guarded against misuse: a DML seq OLDER than a live delta would
    * silently mutate a historical snapshot while claiming current-state
    * semantics — fail loudly instead. Equality is allowed: that is the
    * verb's own crashed delta being replayed. The guard also checks the
    * FOLD HORIZON: right after a compact the live set is empty, so a
    * stale/reused seq would pass the live check alone — but its readAt
    * snapshot would silently resolve to the post-fold state rather than
    * a pre-seq one, and its append would clobber a retired delta dir. */
  private def dmlSnapshot(spark: SparkSession, dir: String, key: String,
      seq: Long, prune: Option[Column], maxBroadcastKeys: Long): DataFrame = {
    val horizon = foldHorizon(spark, dir)
    require(seq > horizon,
      s"DML at seq $seq is at or below the fold horizon $horizon: its " +
        "pre-seq snapshot was folded away by a compaction, so current-state " +
        "semantics cannot be honored — use a seq newer than every fold")
    val newestLive = deltaPaths(spark, dir).map(deltaSeqOf).maxOption
    newestLive.foreach(m => require(seq >= m,
      s"DML at seq $seq is older than live delta seq $m: row-level " +
        "DELETE/UPDATE has current-state semantics, so its seq must be " +
        "the newest (same-seq replay of the verb itself is allowed)"))
    prune match {
      case Some(keep) => prunedRead(spark, dir, key, keep, maxBroadcastKeys,
        asOfSeq = Some(seq - 1))
      case None => readAt(spark, dir, key, seq - 1, maxBroadcastKeys)
    }
  }

  /** Rows written to `delta_<seq>` — a parquet footer count, no scan
    * (driver-side footer read, no Spark job). */
  private def deltaRowCount(spark: SparkSession, dir: String, seq: Long): Long =
    graft.sources.ParquetMeta.rows(spark, Seq(deltaDirOf(dir, seq)))

  /** Row-level DELETE by predicate — `DELETE FROM store WHERE cond`, the
    * DML verb of the table formats, expressed in the merge-on-read log:
    * resolve the corpus AS OF `seq - 1` ([[readAt]]'s snapshot), filter
    * to `cond`, and append the matching keys as `delta_<seq>`
    * tombstones. The corpus is never rewritten — O(scan) read +
    * O(matches) write, folded away at the next [[compact]] like any
    * other change (and the tombstone delta extends a manifest with the
    * same O(batch) part [[append]] always writes).
    *
    * Matching against the PRE-`seq` snapshot rather than the current
    * read is what makes a same-seq replay IDEMPOTENT BY CONSTRUCTION: a
    * delete that crashed mid-write and re-runs under the same seq
    * recomputes the identical key set and overwrites its own partial
    * delta — where a current-state match would see its own surviving
    * tombstones, shrink the set, and silently resurrect rows. It also
    * means the matching plan never lists `delta_<seq>` while [[append]]
    * overwrites it (no read-own-write hazard, no pinning needed).
    *
    * `seq` must be newer than every live delta for current-state DELETE
    * semantics (the normal append contract); a zero-match delete still
    * writes an (empty) delta, so the seq is consumed either way.
    * `prune` optionally file-skips the base via the manifest; like
    * every [[ScanPruning]] `keep`, it must be implied by `cond` (it
    * prunes, it never answers). Single-writer, like every store
    * mutation. Returns the number of keys tombstoned. */
  def deleteWhere(spark: SparkSession, dir: String, key: String, seq: Long,
      cond: Column, prune: Option[Column] = None,
      maxBroadcastKeys: Long = DefaultMaxBroadcastKeys): Long =
    withWriterLock(spark, dir) {
      val snap = dmlSnapshot(spark, dir, key, seq, prune, maxBroadcastKeys)
      doAppend(spark, dir, seq, key,
        upserts = snap.limit(0),
        deleteKeys = Some(snap.filter(cond).select(col(key))))
      deltaRowCount(spark, dir, seq)
    }

  /** Row-level UPDATE by predicate — `UPDATE store SET c = expr WHERE
    * cond`: resolve the corpus as of `seq - 1`, filter to `cond`, apply
    * `set`, and append the rewritten rows as `delta_<seq>` upserts.
    * O(scan) read + O(matches) write; same pre-`seq` snapshot contract
    * as [[deleteWhere]] (same-seq replay recomputes the identical
    * update, so crash-and-replay is idempotent and the plan never reads
    * the delta it writes).
    *
    * ALL `set` expressions see the PRE-update row (one projection, not
    * a `withColumn` chain) — `Map("a" -> col("b"), "b" -> col("a"))`
    * swaps, exactly like SQL UPDATE. The key column cannot be set (an
    * upsert replaces the row WITH its key; rekeying is a delete+insert,
    * not an update). A `set` column outside the current schema is a
    * schema-WIDENING update: only the matched rows carry it, and it
    * rides the store's evolveSchema read/compact contract. Returns the
    * number of rows updated. */
  def updateWhere(spark: SparkSession, dir: String, key: String, seq: Long,
      cond: Column, set: Map[String, Column],
      prune: Option[Column] = None,
      maxBroadcastKeys: Long = DefaultMaxBroadcastKeys): Long = {
    require(set.nonEmpty, "updateWhere: empty SET")
    require(!set.contains(key),
      s"updateWhere cannot set the key column '$key': rekeying is a " +
        "delete + insert, not an update")
    withWriterLock(spark, dir) {
      val snap = dmlSnapshot(spark, dir, key, seq, prune, maxBroadcastKeys)
      doAppend(spark, dir, seq, key, snap.filter(cond).withColumns(set))
      deltaRowCount(spark, dir, seq)
    }
  }

  /** Continuous ingestion: apply a streaming frame of upserts to the
    * store, one delta per microbatch, keyed by the stream's batchId.
    * Exactly-once falls out of the seq contract: after a failure,
    * Structured Streaming replays the last uncommitted batch under the
    * SAME batchId, and the same-seq re-append overwrites the partial
    * delta instead of double-applying it (spec-locked in
    * CorpusStoreSpec; cross-JVM kill-and-recover measured in
    * StoreStreamBench). `checkpointLocation` is REQUIRED, not optional:
    * batchIds are durable and monotonic only under a stable checkpoint —
    * restarting without one resets batchIds to 0 and would silently
    * clobber delta_0, delta_1, ... written by the previous incarnation.
    * Manual [[append]]s sharing a streamed store must use seqs from a
    * disjoint range (e.g. reserve seqs >= 2^40 for manual drops); the
    * stream owns the low batchId range. A writer JVM killed mid-append
    * leaves its lease behind — call [[breakLock]] before restarting the
    * stream (or wait out [[DefaultStaleLockMs]]). Caller starts/stops
    * the returned query.
    *
    * `maintainEvery` > 0 runs the [[maintain]] policy after every that
    * many batches — the self-maintaining form: without it, a
    * long-running stream accumulates one delta dir + one manifest part
    * PER MICROBATCH (O(appends) listings and window inputs — exactly
    * the degradation [[compactDeltas]] exists to bound), and the folds
    * run on the writer's own foreachBatch thread, which is the one
    * place the single-writer lease makes them safe by construction.
    * Maintenance is deliberately NOT per-batch: the decision is cheap
    * but a fold inside every commit interval would stall the stream's
    * cadence; a stride of ~maxLiveDeltas keeps folds amortized. A
    * maintenance failure fails that microbatch (the stream stops loudly
    * and the restart replays it — the append is already committed and
    * the same-seq overwrite makes the replay idempotent). Downstream
    * [[changesStream]] consumers of a self-maintaining store must keep
    * within the retention window — majors happen when the ratio trips,
    * so size `maxDeltaToBaseRatio` AND the passthrough retention knobs
    * (`retainGenerations` cycles / `minRetainMs` — [[vacuum]]'s
    * contract, forwarded to every auto-triggered fold) to the laggiest
    * consumer: without them an auto-maintained store majors at the
    * classic one-cycle window, which a streaming cadence can turn over
    * in minutes. */
  def appendStream(stream: DataFrame, dir: String, key: String,
      checkpointLocation: String, maintainEvery: Int = 0,
      maxLiveDeltas: Int = 16, maxDeltaToBaseRatio: Double = 0.2,
      retainGenerations: Int = 1, minRetainMs: Long = 0L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(checkpointLocation.nonEmpty,
      "appendStream needs a checkpointLocation: without one a restarted " +
        "stream re-counts batchIds from 0 and overwrites existing deltas")
    stream.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        append(batch.sparkSession, dir, batchId, key, batch)
        // foldBelowSeq = batchId: this batch's checkpoint commit hasn't
        // landed yet, so its delta must stay live for a possible replay
        // — folding it would put the replayed append at or below the
        // horizon fence and wedge the restarted stream
        if (maintainEvery > 0 && (batchId + 1) % maintainEvery == 0) {
          maintain(batch.sparkSession, dir, key, maxLiveDeltas,
            maxDeltaToBaseRatio, retainGenerations = retainGenerations,
            minRetainMs = minRetainMs, foldBelowSeq = batchId)
          ()
        }
      }
  }

  /** The store's deltas as a STREAMING source — the continuous form of
    * [[changesSince]]: a Structured Streaming file source over
    * `delta_*`, so each new append (manual or [[appendStream]]) is
    * discovered and emitted as raw change rows (data columns + `op` +
    * `seq`) in its next microbatch. The subscriber model of a log store,
    * over plain parquet: downstream consumers (index refresh, replica
    * sync) attach with their own checkpoint and pay O(changes), never
    * touching the base. Contracts the caller owns:
    *   - RAW rows, not netted: apply ops in `seq` order; within one seq
    *     apply 'u' before 'd', so the tombstone lands last and WINS —
    *     the same resolution [[read]]/[[changesSince]] use for a key
    *     upserted and deleted in a single append. (Or net per (seq, key)
    *     first with the same op tie-break — what [[replicateTo]] does,
    *     which also makes the outcome independent of file arrival
    *     order.)
    *   - A same-seq replayed append rewrites its delta dir with NEW part
    *     files, which the file source emits again — delivery across
    *     WRITER failures is at-least-once per seq; idempotent consumers
    *     key their apply on `seq` (e.g. foreachBatch into a second
    *     store, which the seq-overwrite contract makes exactly-once).
    *   - [[compact]] retires the deltas it folds from new plans and
    *     PURGES their files at the next compact; run compacts only past
    *     the consumers' sync horizon (the retention contract every log
    *     store has — cadence is the caller's checked knob via
    *     [[compactIfNeeded]]; the grace window covers a consumer
    *     already mid-batch, not one that lags a full cycle).
    *   - LIVENESS IS EVALUATED AT ATTACH: the stream's source covers
    *     exactly the deltas LIVE when it starts plus every later seq
    *     (the monotone-seq contract) — a delta already retired by a
    *     compact (major or minor) at attach time is excluded, so a
    *     fresh consumer attaching during the grace window neither
    *     re-ingests the folded history (O(folded mass) wasted IO) nor
    *     races the next compact's purge of those files mid-backfill.
    *     A RUNNING stream that already listed a delta keeps its
    *     snapshot, exactly like a batch reader.
    *   - The stream's schema is pinned at STREAM START: base ∪ columns
    *     of the deltas present at that moment (merged parquet footers —
    *     O(deltas) metadata, the same merge [[changesSince]] does). A
    *     delta widened AFTER start is read with this schema, its added
    *     columns absent — RESTART the stream to pick them up, the
    *     restart-to-widen contract every lakehouse CDC stream has
    *     (a running Structured Streaming query cannot change schema
    *     mid-flight).
    * `options` passes file-source knobs through (e.g.
    * `maxFilesPerTrigger` to rate-limit a backlog drain so one huge
    * catch-up doesn't become a single giant microbatch). */
  def changesStream(spark: SparkSession, dir: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val baseSchema = spark.read.parquet(currentBase(spark, dir)._2).schema
    val deltas = deltaPaths(spark, dir)
    val dataSchema =
      if (deltas.isEmpty) baseSchema
      else {
        val ds = spark.read.option("mergeSchema", "true").parquet(deltas: _*)
          .schema.filterNot(f => baseSchema.fieldNames.contains(f.name) ||
            f.name == OpCol || f.name == SeqCol)
        ds.foldLeft(baseSchema)((s, f) => s.add(f)) // base order first
      }
    val schema = dataSchema
      .add(OpCol, org.apache.spark.sql.types.StringType)
      .add(SeqCol, org.apache.spark.sql.types.LongType)
    // attach-time liveness: name the live dirs explicitly and cover every
    // FUTURE seq with strictly-greater digit patterns — a bare `delta_*`
    // would also match already-retired (`_folded`) dirs, re-ingesting the
    // whole folded history on a fresh attach and racing the next
    // compact's purge of exactly those files
    val d = fs(spark, dir)
    val maxSeen =
      if (!d.exists(new Path(dir))) -1L
      else d.listStatus(new Path(dir)).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("delta_"))
        .map(st => deltaSeqOf(st.getPath.toString)).maxOption.getOrElse(-1L)
    val pats = deltas.map(p => new Path(p).getName) ++ seqGtPatterns(maxSeen)
    val glob = if (pats.size == 1) s"$dir/${pats.head}"
    else s"$dir/{${pats.mkString(",")}}"
    spark.readStream.schema(schema).options(options).parquet(glob)
      .withColumnRenamed(OpCol, "op").withColumnRenamed(SeqCol, "seq")
  }

  /** Glob alternatives matching a plain `delta_<19 digits>` dir whose
    * seq is strictly GREATER than `m`: one fixed-width digit-prefix
    * pattern per position (the standard way to express ">" in glob
    * syntax — for each position, pin the prefix and range the next
    * digit above it). Minor-fold dirs (`.m` suffix) deliberately do NOT
    * match: a fold created after stream start only restates seqs the
    * stream already covers via the originals. */
  private def seqGtPatterns(m: Long): Seq[String] =
    if (m < 0L) Seq("delta_" + "[0-9]" * 19)
    else {
      val pad = f"$m%019d"
      (0 until 19).flatMap { i =>
        val digit = pad(i)
        if (digit == '9') None
        else Some("delta_" + pad.take(i) + s"[${(digit + 1).toChar}-9]" +
          "[0-9]" * (18 - i))
      }
    }

  /** Continuous replication: [[changesStream]] composed with
    * [[append]] — apply one store's change feed to a second store, the
    * downstream half of the CDC story. Each microbatch is applied PER
    * SOURCE SEQ: the batch's rows for seq s land as the replica's
    * `delta_s`, netted per key with read's 'd'-beats-'u' tie-break. When
    * `delta_s` already exists on the replica it is MERGED, not
    * overwritten — a microbatch boundary can straddle one primary
    * append's files (e.g. under `maxFilesPerTrigger`), splitting a key's
    * same-seq 'u' and 'd' rows across two batches, and only re-resolving
    * the tie-break over the merged set keeps the outcome independent of
    * arrival order (applying slices in arrival order would let whichever
    * op arrived LAST win — the first cut of this operator had exactly
    * that bug, caught by the cross-JVM bench's parity-vs-primary gate).
    * The merge is also what makes every redelivery idempotent: a
    * replayed replicator microbatch, or a rewritten primary delta's
    * re-emitted files, nets into content already applied. Contracts:
    *   - `replicaDir` is an initialized store (e.g. [[init]] from the
    *     primary's base, or empty for a from-scratch rebuild with the
    *     stream started before the first primary append).
    *   - `replica.read == primary.read` once synced; replica deltas are
    *     keyed by PRIMARY seq, so [[readAt]] boundaries align with the
    *     primary's (within-seq u+d pairs net to the tombstone — the
    *     identical outcome under read/readAt/changesSince resolution).
    *   - Primary seqs must land nondecreasing (what [[appendStream]]
    *     guarantees: a restart replays its failed batch BEFORE producing
    *     newer seqs).
    *   - Schema is pinned at stream start ([[changesStream]]'s
    *     restart-to-widen contract); don't [[compact]] the REPLICA while
    *     the replicator runs (a late slice of an already-folded seq
    *     would resurrect it as a fresh delta).
    * Crash recovery: a replicator that dies mid-apply leaves some seqs
    * of its batch applied and at most one partial replica delta; the
    * restarted stream replays the SAME microbatch and every seq's merge
    * nets the redelivered rows into whatever landed — exactly-once by
    * content (measured cross-JVM in StoreStreamBench). Caller
    * starts/stops the returned query. */
  def replicateTo(spark: SparkSession, primaryDir: String, replicaDir: String,
      key: String, checkpointLocation: String,
      options: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(checkpointLocation.nonEmpty,
      "replicateTo needs a checkpointLocation: without one a restarted " +
        "replicator re-counts batchIds from 0 and overwrites replica deltas")
    changesStream(spark, primaryDir, options).writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyChangeSlice(batch.sparkSession, replicaDir, key, batch)
      }
  }

  /** One [[replicateTo]] microbatch: apply raw change rows (data + op +
    * seq) to `replicaDir`, one replica delta per source seq, merging
    * into an existing same-seq delta. Driver work is O(distinct seqs in
    * the batch) — bounded by the batch's file count. */
  private[graft] def applyChangeSlice(spark: SparkSession, replicaDir: String,
      key: String, batch: DataFrame): Unit = withWriterLock(spark, replicaDir) {
    val seqs = batch.select(col("seq")).distinct().collect()
      .map(_.getLong(0)).sorted
    seqs.foreach { s =>
      val incoming = batch.filter(col("seq") === s).drop("seq")
      val deltaDir = deltaDirOf(replicaDir, s)
      val exists = fs(spark, replicaDir).exists(new Path(deltaDir))
      val merged = if (!exists) incoming
        else spark.read.parquet(deltaDir)
          .withColumnRenamed(OpCol, "op").drop(SeqCol)
          .unionByName(incoming, allowMissingColumns = true)
      val net = merged.withColumn("__brn", row_number().over(
          Window.partitionBy(col(key)).orderBy(col("op").asc)))
        .filter(col("__brn") === 1).drop("__brn")
      // the merge READS delta_s while append OVERWRITES it — pin the net
      // rows first (eager, lineage-free) so the write cannot consume its
      // own input; a lost block just fails the batch, which the stream
      // replays (the merge makes the replay idempotent)
      val pinned = if (exists) net.localCheckpoint(true) else net
      doAppend(spark, replicaDir, s, key,
        pinned.filter(col("op") === "u").drop("op"),
        deleteKeys = Some(pinned.filter(col("op") === "d").select(col(key))))
    }
  }

  /** Fold the live deltas into a NEW base generation. O(corpus) — run at
    * compaction cadence ([[compactIfNeeded]]), not per batch.
    * Single-writer contract for compact itself; concurrent READERS get a
    * one-compact-cycle snapshot grace window (below).
    *
    * Nothing the previous snapshot's readers hold is renamed or deleted:
    * the fold lands in `base_gen_<g+1>` (its `_SUCCESS` is the commit
    * point), each folded delta gets a [[FoldedMarker]] making it
    * invisible to NEW plans while its files stay on disk, and the
    * PREVIOUS generation + previously-folded deltas are purged only at
    * the START of the NEXT compact. A plan that listed its files before
    * this compact therefore keeps reading the pre-compact snapshot and
    * completes — the retention window is one full compaction cycle (the
    * same VACUUM-retention statement every table format makes), not
    * zero. Readers must still complete within ONE cycle: a plan that
    * overlaps TWO compacts loses its files to the purge
    * (FileNotFoundException; safe to re-run — both are spec-locked in
    * CorpusStoreSpec).
    *
    * Every crash point leaves a readable store:
    *   1. purge of expired artifacts is idempotent (re-runs next time).
    *   2. die mid-fold-write: the new generation has no `_SUCCESS`, so
    *      [[currentBase]] never selects it; reads are exactly
    *      pre-compact, and the next compact deletes the debris.
    *   3. die after `_SUCCESS`, before marking: the new generation
    *      already FOLDS every delta, so re-resolving the still-live
    *      deltas over it is idempotent — for each delta key the
    *      latest-per-key value equals the folded one.
    *   4. marking runs in ASCENDING seq order, so a crash leaves the
    *      NEWEST suffix live — exactly the subset whose latest-per-key
    *      values the folded base already carries (descending would
    *      leave an OLDER delta live to wrongly win resolution).
    *   5. die before the manifest rebuild: the manifest still points at
    *      the previous generation's files — [[prunedRead]] detects that
    *      no entry matches the current base and self-heals by
    *      rebuilding (see its doc).
    */
  def compact(spark: SparkSession, dir: String, key: String,
      evolveSchema: Boolean = false, clusterBy: Seq[String] = Nil,
      clusterFiles: Int = 0, retainGenerations: Int = 1,
      minRetainMs: Long = 0L, foldBelowSeq: Long = Long.MaxValue): Unit =
    withWriterLock(spark, dir) {
      doCompact(spark, dir, key, evolveSchema, clusterBy, clusterFiles,
        retainGenerations, minRetainMs, foldBelowSeq)
    }

  private def doCompact(spark: SparkSession, dir: String, key: String,
      evolveSchema: Boolean, clusterBy: Seq[String],
      clusterFiles: Int, retainGenerations: Int,
      minRetainMs: Long = 0L, foldBelowSeq: Long = Long.MaxValue): Unit = {
    val d = fs(spark, dir)
    // purge the grace window left by PREVIOUS compacts ([[vacuum]]):
    // generations older than the retention horizon (including incomplete
    // fold debris), the gen-0 base once out of retention, and retired
    // deltas past their cycle. Hadoop FileSystem delete reports failure
    // by RETURNING false, not throwing — vacuum aborts via require while
    // the store is still readable.
    doVacuum(spark, dir, retainGenerations, minRetainMs)
    val (gen, baseDir) = currentBase(spark, dir)
    // foldBelowSeq (default unbounded) is the same replay fence as
    // [[compactDeltas]]': deltas at or above it stay LIVE over the new
    // base — they are strictly newer than everything folded, so
    // resolution over (new base + remaining deltas) is unchanged
    val deltas = deltaPaths(spark, dir).filter(p => deltaSeqOf(p) < foldBelowSeq)
    if (deltas.isEmpty) return
    // evolveSchema folds widened deltas into a WIDENED base — the one
    // O(corpus) write schema evolution ever pays, amortized over the
    // same cadence as any compact; plain reads carry the new columns
    // from then on
    val folded = resolve(spark.read.parquet(baseDir),
      readDeltas(spark, deltas, evolveSchema), key,
      graft.sources.ParquetMeta.rows(spark, deltas),
      DefaultMaxBroadcastKeys, evolveSchema)
    val newDir = f"$dir/$GenPrefix${gen + 1}%019d"
    // clusterBy: compaction is already the O(corpus) rewrite, so it is
    // the natural (free-shuffle) moment to LAY OUT the new base — range
    // for one column, z-order for several — making every file's min/max
    // box tight again after appends scattered the key space; the
    // manifest rebuild below then prunes like a fresh landing. Content
    // is unchanged (Layout's answer-transparency contract).
    // clusterFiles > 0 pins the output file count (an explicit
    // repartition is exempt from AQE coalescing); 0 lets the session
    // size the files — the right default at scale, where AQE's
    // bytes-per-partition target IS the row-group sizing policy.
    clusterBy match {
      case Nil =>
        folded.write.mode(SaveMode.Overwrite).parquet(newDir)
      case Seq(c) =>
        val ranged = if (clusterFiles > 0)
          folded.repartitionByRange(clusterFiles, col(c))
        else folded.repartitionByRange(col(c))
        ranged.sortWithinPartitions(col(c))
          .write.mode(SaveMode.Overwrite).parquet(newDir)
      case cs =>
        graft.sources.Layout.zorderWrite(folded, newDir, cs,
          files = clusterFiles)
    }
    // the write's _SUCCESS committed the new generation; retire the
    // folded deltas from NEW plans (ascending — see crash state 4). The
    // marker records the RETIRING generation, so retention-aware vacuum
    // can age folded deltas by cycle instead of purging them all.
    deltas.foreach { p =>
      val out = d.create(new Path(p, FoldedMarker), true)
      try out.write((gen + 1).toString.getBytes("UTF-8")) finally out.close()
    }
    // advance the replay fence: seqs at or below the fold are dead
    writeHorizon(spark, dir, deltas.map(deltaSeqOf).max)
    if (hasManifest(spark, dir))
      ScanPruning.rebuildManifest(spark, newDir, manifestPath(dir))
  }

  /** MINOR (delta-level) compaction — the LSM level-0 → level-1 fold:
    * net the live deltas into ONE committed delta dir
    * (`delta_<maxSeq>.m`, every row re-stamped at the newest folded seq)
    * and retire the originals, WITHOUT touching the base. [[compact]]
    * bounds the delta/base ROW ratio; this bounds the delta DIR and
    * manifest-part COUNT — at streaming cadence (thousands of appends
    * per major fold) file listing, the latest-per-key window's input
    * width, and the manifest part union all degrade as O(appends) long
    * before the row ratio trips [[compactIfNeeded]]. O(delta mass)
    * compute and IO; the base — the 100 TB side — is never read.
    *
    * Answer contracts (spec-locked in MinorCompactSpec):
    *   - [[read]] / [[readAt]](s >= fold seq) / [[lookup]] /
    *     [[lookupJoin]] / [[prunedRead]]: identical answers — the
    *     net-per-key fold IS resolution's own algebra ('d' beats 'u'
    *     within a seq, newest seq wins).
    *   - [[changesSince]](s): the same net op per key; the `seq` column
    *     is RE-ATTRIBUTED to the fold seq (folded history is no longer
    *     individually replayable — [[compact]]'s truncation contract at
    *     delta granularity). A consumer synced INSIDE the folded range
    *     re-receives the whole folded net; net-state ops are idempotent
    *     to re-apply, so the feed stays correct, just coarser.
    *   - [[readAt]](s INSIDE the folded range): resolves to the nearest
    *     retained boundary BELOW (base + deltas older than the fold) —
    *     where major compaction truncates old seqs UP to the folded
    *     state, a minor fold truncates interior seqs DOWN to the
    *     pre-fold boundary. Keep history by folding less often, not by
    *     expecting folds to preserve it.
    *
    * Crash discipline mirrors [[compact]]'s:
    *   1. an uncommitted fold (no `_SUCCESS`) is invisible to every
    *      reader ([[deltaPaths]]' commit gate) and purged by the next
    *      compactDeltas/vacuum.
    *   2. die after `_SUCCESS`, before marking: the fold RESTATES the
    *      originals' latest-per-key content at the max seq, so the
    *      union of fold + still-live originals resolves identically
    *      (duplicate keys agree in content; the fold's seq wins).
    *   3. a re-run detects the committed-but-unmarked fold and FINISHES
    *      the marking instead of re-folding (a refold would overwrite
    *      the fold dir while reading it).
    *   4. markers land ascending; the originals' manifest parts drop
    *      last (stale delta parts are inert — base pruning never
    *      consults them).
    * `foldBelowSeq` bounds the fold to live deltas with seq STRICTLY
    * below it (default unbounded): the replay fence for a writer whose
    * seq source can re-issue its newest seq — [[appendStream]]'s
    * maintenance passes its current batchId, so a batch whose
    * checkpoint commit hasn't landed yet can never be folded out from
    * under its own replay (a folded seq is at or below the horizon, and
    * the replayed append would fail [[doAppend]]'s fence loudly).
    * Returns whether a fold ran (needs >= 2 live deltas in bound). */
  def compactDeltas(spark: SparkSession, dir: String, key: String,
      foldBelowSeq: Long = Long.MaxValue): Boolean =
    withWriterLock(spark, dir) {
      doCompactDeltas(spark, dir, key, foldBelowSeq)
    }

  private def doCompactDeltas(spark: SparkSession, dir: String,
      key: String, foldBelowSeq: Long = Long.MaxValue): Boolean = {
    val d = fs(spark, dir)
    if (!d.exists(new Path(dir))) return false
    // crash state 1: purge uncommitted fold debris (reader-invisible)
    d.listStatus(new Path(dir)).toSeq.foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("delta_") && isMinorName(n) && !isFolded(d, st.getPath)
          && !d.exists(new Path(st.getPath, "_SUCCESS")))
        require(d.delete(st.getPath, true),
          s"compactDeltas: could not clear fold debris ${st.getPath}")
    }
    val gen = currentBase(spark, dir)._1
    def mark(p: String): Unit = {
      val out = d.create(new Path(p, FoldedMarker), true)
      try out.write((gen + 1).toString.getBytes("UTF-8")) finally out.close()
    }
    // crash state 3: a committed fold whose originals are still live —
    // finish retiring them (each is a restatement the fold already holds)
    val pre = deltaPaths(spark, dir)
    pre.filter(p => isMinorName(new Path(p).getName))
      .maxByOption(deltaSeqOf).foreach { f =>
        val fSeq = deltaSeqOf(f)
        val stale = pre.filter(p => p != f && deltaSeqOf(p) <= fSeq).sorted
        stale.foreach(mark)
        if (stale.nonEmpty && hasManifest(spark, dir))
          ScanPruning.dropParts(spark, manifestPath(dir),
            stale.map(new Path(_).getName))
      }
    val live = deltaPaths(spark, dir).filter(p => deltaSeqOf(p) < foldBelowSeq)
    if (live.size < 2) return false
    val maxSeq = live.map(deltaSeqOf).max
    // net per key across the live deltas — resolution's own window —
    // re-stamped at the fold seq (one delta dir = one seq, like an append)
    val net = spark.read.option("mergeSchema", "true").parquet(live: _*)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col(SeqCol).desc, col(OpCol).asc)))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn(SeqCol, lit(maxSeq))
    val foldDir = deltaDirOf(dir, maxSeq) + MinorSuffix
    net.write.mode(SaveMode.Overwrite).parquet(foldDir) // _SUCCESS commits
    live.foreach(mark) // ascending (deltaPaths sorts)
    writeHorizon(spark, dir, maxSeq)
    if (hasManifest(spark, dir)) {
      ScanPruning.appendManifest(spark, manifestPath(dir), foldDir)
      ScanPruning.dropParts(spark, manifestPath(dir),
        live.map(new Path(_).getName))
    }
    true
  }

  /** The generation whose creation retired a folded delta (the marker's
    * recorded content); markers from before the retention feature are
    * empty and age as generation 0 (always purgeable — the pre-feature
    * behavior). */
  private def foldedGenOf(d: org.apache.hadoop.fs.FileSystem, p: Path): Long =
    try {
      val in = d.open(new Path(p, FoldedMarker))
      try {
        val buf = new Array[Byte](32)
        val n = in.read(buf)
        new String(buf, 0, math.max(n, 0), "UTF-8").trim.toLong
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => 0L }

  /** Purge the snapshot grace window NOW instead of at the next
    * [[compact]]: base generations out of retention (and fold debris
    * without a `_SUCCESS`), the gen-0 `base` once out of retention,
    * retired (`_folded`) delta dirs past their cycle, and crashed
    * minor-fold debris. The explicit VACUUM verb of the table formats —
    * same single-writer contract (lease-enforced) and the same reader
    * consequence as compact's built-in purge: a plan that listed the
    * purged files before this call loses them (FileNotFoundException;
    * safe to re-run). Running it is never REQUIRED for correctness —
    * every compact does this housekeeping first — it exists for storage
    * pressure between compacts.
    *
    * `retainGenerations` is the VACUUM-retention knob of the table
    * formats, in cycles: generation `q` is purged only once the current
    * generation reaches `q + retainGenerations`, and a delta retired by
    * generation `f` only once it reaches `f + retainGenerations - 1`.
    * The default (1) is the classic one-compact-cycle grace window; at
    * 2+ a reader's plan survives that many compacts before losing its
    * files — the knob long-running 100 TB readers size to their longest
    * plan (pass the same value to [[compact]], whose built-in purge
    * honors it too).
    *
    * `minRetainMs` is the TIME half of the retention contract (the
    * VACUUM-retention DURATION of the table formats): an artifact out
    * of CYCLE retention is still held while younger than this many
    * milliseconds — aged from its RETIREMENT (a superseded generation
    * from its successor's `_SUCCESS` commit, a retired delta from its
    * `_folded` marker), the moment it left the live set — never from
    * its creation, so time served as current costs an artifact none of
    * its grace window. Cycles bound the artifact COUNT on a slow-compacting
    * store; the time floor protects a long-running plan on a
    * FAST-compacting one (an auto-maintained streaming store can cycle
    * generations in minutes — size the floor to the longest reader).
    * Uncommitted debris purges unconditionally under either knob (no
    * reader can hold a dir whose write never committed). Returns the
    * number of dirs purged. */
  def vacuum(spark: SparkSession, dir: String, retainGenerations: Int = 1,
      minRetainMs: Long = 0L): Int =
    withWriterLock(spark, dir) {
      doVacuum(spark, dir, retainGenerations, minRetainMs)
    }

  private def doVacuum(spark: SparkSession, dir: String,
      retainGenerations: Int, minRetainMs: Long = 0L): Int = {
    require(retainGenerations >= 1,
      s"retainGenerations must be >= 1, got $retainGenerations")
    require(minRetainMs >= 0L, s"minRetainMs must be >= 0, got $minRetainMs")
    val d = fs(spark, dir)
    if (!d.exists(new Path(dir))) return 0
    val (gen, baseDir) = currentBase(spark, dir)
    // the stamp a time-floored artifact ages from is its RETIREMENT
    // moment, not its creation: a retired delta ages from its `_folded`
    // marker, and a superseded generation from its SUCCESSOR's `_SUCCESS`
    // commit — a generation that served as current for hours would
    // otherwise be "old" the instant it was superseded, giving the
    // long-running readers the floor exists for zero protection.
    // An unreadable stamp counts as infinitely old — the cycle knob is
    // then the only fence, exactly the pre-feature behavior.
    def stampOf(p: Path, markFile: String): Long =
      try {
        val mp = new Path(p, markFile)
        (if (d.exists(mp)) d.getFileStatus(mp) else d.getFileStatus(p))
          .getModificationTime
      } catch { case scala.util.control.NonFatal(_) => 0L }
    lazy val gens = genDirs(spark, dir)
    def retireStampOf(g: Long): Long =
      gens.find(_._1 > g)
        .map(t => stampOf(new Path(t._2), "_SUCCESS")).getOrElse(0L)
    def aged(stamp: Long): Boolean =
      minRetainMs <= 0L || System.currentTimeMillis() - stamp >= minRetainMs
    val expired = d.listStatus(new Path(dir)).toSeq.filter { st =>
      val n = st.getPath.getName
      if (n.startsWith(GenPrefix) && st.getPath.toString != baseDir) {
        // uncommitted fold debris purges unconditionally (no reader can
        // hold it); complete generations age out by the retention window
        !d.exists(new Path(st.getPath, "_SUCCESS")) ||
          (gen >= n.stripPrefix(GenPrefix).toLong + retainGenerations &&
            aged(retireStampOf(n.stripPrefix(GenPrefix).toLong)))
      } else if (n == "base" && gen > 0L) {
        // gen-0 ages like any other generation
        gen >= retainGenerations && aged(retireStampOf(0L))
      } else if (n.startsWith("delta_")) {
        if (isFolded(d, st.getPath))
          gen >= foldedGenOf(d, st.getPath) + retainGenerations - 1 &&
            aged(stampOf(st.getPath, FoldedMarker))
        else isMinorName(n) && !d.exists(new Path(st.getPath, "_SUCCESS"))
      } else false
    }
    expired.foreach(st => require(d.delete(st.getPath, true),
      s"vacuum: could not purge expired ${st.getPath}"))
    // purged delta dirs take their manifest parts with them (delta parts
    // are never consulted for base pruning, but a part pointing at
    // deleted files is clutter the multi-part layout can simply drop)
    val purgedDeltas = expired.map(_.getPath.getName).filter(_.startsWith("delta_"))
    if (purgedDeltas.nonEmpty && hasManifest(spark, dir))
      ScanPruning.dropParts(spark, manifestPath(dir), purgedDeltas)
    expired.size
  }

  /** Operational snapshot of a store's on-disk state, one row per
    * artifact dir: `kind` (base | delta | folded_delta | expired_gen |
    * incomplete_gen | manifest), `name`, `seq` (delta seq or generation
    * number, null for gen-0 base and the manifest), `n_rows` (parquet
    * footer count — a metadata read; null for incomplete debris, and
    * for a dir a concurrent [[vacuum]]/[[compact]] deleted mid-census),
    * `live` (participates in the current snapshot's reads). O(dirs)
    * driver work + one footer read per COMPLETE dir, live or not (the
    * grace-window mass is exactly what a vacuum decision needs);
    * nothing is scanned. The monitoring surface for cadence decisions
    * ([[compactIfNeeded]]'s inputs, the grace-window mass [[vacuum]]
    * would free, manifest presence). */
  def describe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = fs(spark, dir)
    val gen = currentBase(spark, dir)._1
    def rowsOf(p: String): Option[Long] =
      try Some(graft.sources.ParquetMeta.rows(spark, Seq(p))) catch {
        case scala.util.control.NonFatal(_) => None
      }
    val rows = d.listStatus(new Path(dir)).toSeq
      .filter(_.isDirectory).sortBy(_.getPath.getName).flatMap { st =>
        val p = st.getPath
        val n = p.getName
        if (n.startsWith("delta_")) {
          val folded = isFolded(d, p)
          val committed = minorCommitted(d, p)
          val kind =
            if (!committed) "incomplete_delta" // crashed minor-fold debris
            else if (folded) "folded_delta"
            else "delta"
          Some((kind, n, Some(deltaSeqOf(p.toString)),
            if (committed) rowsOf(p.toString) else None, !folded && committed))
        } else if (n == "base" || n.startsWith(GenPrefix)) {
          val complete = n == "base" || d.exists(new Path(p, "_SUCCESS"))
          val thisGen = if (n == "base") 0L else n.stripPrefix(GenPrefix).toLong
          val seq = if (n == "base") None else Some(thisGen)
          // compare by generation NUMBER, not path string: listed paths
          // carry the filesystem scheme, currentBase's gen-0 form doesn't
          val current = complete && thisGen == gen
          val kind =
            if (current) "base"
            else if (!complete) "incomplete_gen"
            else "expired_gen"
          Some((kind, n, seq, if (complete) rowsOf(p.toString) else None, current))
        } else if (n == "manifest") {
          Some(("manifest", n, None, rowsOf(p.toString), true))
        } else None
      }
    // the two store-root state FILES the r14 hardening added: the replay
    // fence (seq = newest folded seq) and an in-flight writer's lease —
    // the remaining state an operator would otherwise read off disk
    val horizon = foldHorizon(spark, dir)
    val horizonRow =
      if (horizon >= 0L) Seq(("horizon", HorizonFile, Some(horizon),
        None: Option[Long], true))
      else Nil
    val lockRow =
      if (d.exists(new Path(dir, LockFile)))
        Seq(("writer_lock", LockFile, None: Option[Long],
          None: Option[Long], true))
      else Nil
    (rows ++ horizonRow ++ lockRow).toDF("kind", "name", "seq", "n_rows", "live")
  }

  /** Checked compaction cadence: fold when the delta row mass exceeds
    * `maxDeltaToBaseRatio` of the base (both parquet footer counts — a
    * metadata read, no data scan). Returns whether it compacted. Call
    * after appends (or on a timer) to keep [[read]] on its broadcast
    * fast path by contract instead of by comment. The major-only form
    * of [[maintain]] (one decision implementation, so the two public
    * cadence verbs cannot drift): an unreachable minor threshold leaves
    * exactly the ratio check. */
  def compactIfNeeded(spark: SparkSession, dir: String, key: String,
      maxDeltaToBaseRatio: Double = 0.2, evolveSchema: Boolean = false,
      clusterBy: Seq[String] = Nil): Boolean =
    maintain(spark, dir, key, maxLiveDeltas = Int.MaxValue,
      maxDeltaToBaseRatio, evolveSchema, clusterBy) == "major"

  /** The two-tier LSM maintenance policy — ONE checked verb deciding
    * both folds, so a store under continuous ingestion needs a single
    * call at its cadence instead of two hand-sequenced ones:
    *
    *   - MAJOR ([[compact]]) when the delta ROW mass exceeds
    *     `maxDeltaToBaseRatio` of the base — the read path's
    *     latest-per-key window and anti-join side are delta-mass-sized,
    *     so row mass is what degrades query plans.
    *   - else MINOR ([[compactDeltas]]) when the live delta DIR count
    *     reaches `maxLiveDeltas` — at streaming cadence the dir count,
    *     not the row mass, is what grows without bound (O(appends) file
    *     listings, window inputs, and manifest parts long before the
    *     row ratio trips).
    *   - else nothing.
    *
    * The decision is METADATA-ONLY (one dir listing + parquet footer
    * counts — no data scan), so calling it after every append costs
    * nothing when there is nothing to do. Tier order matters: a store
    * past BOTH thresholds takes the major fold (which subsumes the
    * minor one); checking the dir count first would pay the minor
    * fold's O(delta mass) write and then re-trip the ratio anyway.
    * Returns which tier ran: `"major"`, `"minor"`, or `"none"`.
    *
    * Caveats the caller owns (both inherited, not new): a major fold
    * retires deltas, so [[changesStream]] consumers must stay within
    * the retention window (`retainGenerations` cycles and at least
    * `minRetainMs` — size them to the laggiest consumer); and
    * maintenance takes the writer lease, so call it from the writer's
    * thread (e.g. [[appendStream]]'s `maintainEvery`), never
    * concurrently with it. */
  def maintain(spark: SparkSession, dir: String, key: String,
      maxLiveDeltas: Int = 16, maxDeltaToBaseRatio: Double = 0.2,
      evolveSchema: Boolean = false, clusterBy: Seq[String] = Nil,
      clusterFiles: Int = 0, retainGenerations: Int = 1,
      minRetainMs: Long = 0L, foldBelowSeq: Long = Long.MaxValue): String = {
    require(maxLiveDeltas >= 2,
      s"maxLiveDeltas must be >= 2 (a fold needs two inputs), got $maxLiveDeltas")
    require(maxDeltaToBaseRatio > 0,
      s"ratio must be > 0, got $maxDeltaToBaseRatio")
    // decide over the FOLDABLE set only (seq < foldBelowSeq): a delta
    // the fence excludes must neither trip a threshold nor be folded
    val deltas = deltaPaths(spark, dir).filter(p => deltaSeqOf(p) < foldBelowSeq)
    if (deltas.isEmpty) return "none"
    // driver-side footer reads (ParquetMeta): the cadence decision is
    // metadata-only by contract — paying a Spark job per count would
    // make "call it after every append" cost two stages when idle
    val deltaRows = graft.sources.ParquetMeta.rows(spark, deltas)
    val baseRows = graft.sources.ParquetMeta.rows(spark,
      Seq(currentBase(spark, dir)._2))
    if (deltaRows > maxDeltaToBaseRatio * math.max(baseRows, 1L)) {
      compact(spark, dir, key, evolveSchema, clusterBy, clusterFiles,
        retainGenerations, minRetainMs, foldBelowSeq)
      "major"
    } else if (deltas.size >= maxLiveDeltas) {
      if (compactDeltas(spark, dir, key, foldBelowSeq)) "minor" else "none"
    } else "none"
  }
}
