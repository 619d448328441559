package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge-on-read corpus store: the incremental-refresh layout that makes
  * [[Versioning.upsert]] affordable as a CONTINUOUS process. A plain
  * upsert rewrites the corpus per batch — O(corpus) writes for an
  * O(batch) change. This store keeps an immutable `base/` plus small
  * `delta_<seq>/` parquet dirs (upserts and tombstones), so:
  *
  *   - [[append]] costs O(batch): one delta dir written, nothing read.
  *   - [[read]] resolves last-writer-wins at scan time: the delta union
  *     (small) takes one window for latest-per-key; the base — the
  *     100 TB side — streams through a broadcast LEFT ANTI join on the
  *     distinct delta keys and NEVER shuffles (plan-asserted in
  *     CorpusStoreSpec).
  *   - [[compact]] folds deltas into a new base when their mass warrants
  *     it, amortizing the O(corpus) rewrite over many appends — the
  *     LSM / merge-on-read pattern of the lakehouse table formats,
  *     expressed in plain parquet.
  *
  * Sequence numbers are CALLER-supplied (a stream's batchId, a crawl
  * drop id): re-appending the same seq OVERWRITES that delta, so replays
  * after a failure are idempotent. Contracts: keys unique within base
  * and within each delta; single writer for [[compact]] (plain
  * parquet has no commit protocol — a production deployment puts a
  * table format's atomic commit around the same plan shapes).
  */
object CorpusStore {

  private val SeqCol = "__seq"
  private val OpCol = "__op"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def deltaPaths(spark: SparkSession, dir: String): Seq[String] = {
    val d = fs(spark, dir)
    if (!d.exists(new Path(dir))) Seq.empty
    else d.listStatus(new Path(dir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("delta_"))
      .map(_.getPath.toString).sorted
  }

  /** Create/replace the base snapshot and drop any existing deltas. */
  def init(df: DataFrame, dir: String): Unit = {
    val d = fs(df.sparkSession, dir)
    df.write.mode(SaveMode.Overwrite).parquet(s"$dir/base")
    deltaPaths(df.sparkSession, dir).foreach(p => d.delete(new Path(p), true))
  }

  /** Append one refresh batch as `delta_<seq>`: `upserts` rows replace
    * base/earlier-delta rows with their key; `deleteKeys` (a 1-column
    * frame of keys) tombstone theirs. Same-seq re-append overwrites —
    * idempotent replay. O(batch) IO; the corpus is not read. A key named
    * in BOTH sides of one append resolves deterministically to the
    * tombstone (within a seq, delete wins — see [[read]]'s tie-break). */
  def append(spark: SparkSession, dir: String, seq: Long, key: String,
      upserts: DataFrame, deleteKeys: Option[DataFrame] = None): Unit = {
    require(seq >= 0, s"seq must be >= 0, got $seq")
    val up = upserts.withColumn(OpCol, lit("u"))
    val all = deleteKeys match {
      case Some(dk) => up.unionByName(
        dk.select(col(key)).withColumn(OpCol, lit("d")),
        allowMissingColumns = true)
      case None => up
    }
    all.withColumn(SeqCol, lit(seq))
      .write.mode(SaveMode.Overwrite).parquet(f"$dir/delta_$seq%019d")
  }

  /** The current corpus: base minus overridden/tombstoned keys, plus the
    * latest surviving delta row per key. Base never shuffles (broadcast
    * anti on the distinct delta keys); the per-key window runs over the
    * SMALL delta union only. */
  def read(spark: SparkSession, dir: String, key: String): DataFrame = {
    val base = spark.read.parquet(s"$dir/base")
    val deltas = deltaPaths(spark, dir)
    if (deltas.isEmpty) return base
    val du = spark.read.parquet(deltas: _*)
    // secondary tie-break on __op: within one seq, 'd' sorts before 'u',
    // so a key upserted AND tombstoned in the same append deterministically
    // resolves to the tombstone (not whichever row the shuffle saw first)
    val latest = du.withColumn("__rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col(SeqCol).desc, col(OpCol).asc)))
      .filter(col("__rn") === 1)
    val survivors = latest.filter(col(OpCol) === "u")
      .drop(OpCol, SeqCol, "__rn")
    base.join(broadcast(du.select(col(key)).distinct()), Seq(key), "left_anti")
      .unionByName(survivors.select(base.columns.map(col).toIndexedSeq: _*))
  }

  /** Continuous ingestion: apply a streaming frame of upserts to the
    * store, one delta per microbatch, keyed by the stream's batchId.
    * Exactly-once falls out of the seq contract: after a failure,
    * Structured Streaming replays the last uncommitted batch under the
    * SAME batchId, and the same-seq re-append overwrites the partial
    * delta instead of double-applying it (spec-locked in
    * CorpusStoreSpec). Caller starts/stops the returned query; pair
    * with a checkpointLocation for recovery across JVMs. */
  def appendStream(stream: DataFrame, dir: String, key: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        append(batch.sparkSession, dir, batchId, key, batch)
    }

  /** Fold the deltas into a new base and remove them. O(corpus) — run at
    * compaction cadence, not per batch. Single-writer contract: the
    * tmp-write/swap below is not a transactional commit. */
  def compact(spark: SparkSession, dir: String, key: String): Unit = {
    val d = fs(spark, dir)
    val deltas = deltaPaths(spark, dir)
    if (deltas.isEmpty) return
    read(spark, dir, key).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/base_compacting")
    // Hadoop FileSystem delete/rename report failure by RETURNING false,
    // not throwing — abort BEFORE touching the deltas, or a silently
    // failed swap would strand the new base and lose every delta
    require(d.delete(new Path(s"$dir/base"), true),
      s"compact: could not remove $dir/base; new base left at base_compacting, deltas untouched")
    require(d.rename(new Path(s"$dir/base_compacting"), new Path(s"$dir/base")),
      s"compact: rename base_compacting -> base failed in $dir; deltas untouched")
    deltas.foreach(p => d.delete(new Path(p), true))
  }
}
