package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CorpusStore

/** Cross-JVM kill-and-recover measurement for
  * [[graft.operators.CorpusStore.appendStream]] — the store-side analogue
  * of CnjStreamBench's `cnj_stream_recovery`. The in-JVM idempotent-replay
  * contract is spec-locked (CorpusStoreSpec); this tool proves it across a
  * REAL process death at corpus scale: the victim JVM is `Runtime.halt`ed
  * mid-batch with a PARTIAL delta on disk and the batch's offset
  * uncommitted, and a second JVM restarts the stream from the checkpoint.
  * Structured Streaming replays the interrupted batch under the SAME
  * batchId, CorpusStore.append's same-seq overwrite replaces the partial
  * delta with the full batch, and the drained store must read identically
  * to an uninterrupted control run over the same input.
  *
  * Three phases, each its own JVM (sbt `run / fork` makes every runMain a
  * fresh process; the halt in `victim` kills only that process):
  *
  *   prep <work> [scale] [chunks]   stage the corpus: gen-model documents
  *     (GenScaledCorpus, scale x 5k docs) split into a base snapshot
  *     (CorpusStore.init) plus `chunks` OVERLAPPING single-file upsert
  *     chunks under <work>/input for the file stream source — overlap
  *     exercises cross-delta last-writer-wins, a `rev` column makes which
  *     write won observable.
  *   victim <work> <killAfter>      stream the chunks into the store
  *     (maxFilesPerTrigger=1, one delta per batch, appendStream's exact
  *     append call); on batchId == killAfter append only HALF the batch's
  *     rows — the on-disk state of a writer that died mid-delta — then
  *     halt(137) before foreachBatch returns, so the checkpoint never
  *     commits the batch. Exits 137 by design.
  *   recover <work>                 restart the REAL appendStream against
  *     the same checkpoint and drain; assert the killed batch replayed
  *     under its original batchId and its delta now holds the FULL chunk;
  *     then run the uninterrupted control (fresh store + checkpoint, same
  *     input) and compare CorpusStore.read row-for-row. Emits one
  *     `store_stream_recovery` JSON line; exit 1 on any parity failure.
  */
object StoreStreamBench {

  private val Key = "doc_id"

  private def fmt(v: Double) =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  private def session(): SparkSession = {
    val spark = GraftSession.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def inputStream(spark: SparkSession, work: String): DataFrame = {
    val schema = spark.read.parquet(s"$work/input").schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/input")
  }

  def main(args: Array[String]): Unit = args(0) match {
    case "prep"    => prep(args(1),
      if (args.length > 2) args(2).toInt else 100,
      if (args.length > 3) args(3).toInt else 8)
    case "victim"  => victim(args(1), args(2).toLong)
    case "recover" => recover(args(1))
    case other => sys.error(s"unknown phase '$other' (prep|victim|recover)")
  }

  /** Stage base + overlapping upsert chunks. Chunk i covers doc_ids
    * [i*step, i*step + chunkRows) with step = 0.8*chunkRows, so each
    * chunk overwrites the tail of the previous one — the replayed batch
    * must win against its predecessor and lose to its successor exactly
    * as the uninterrupted run does. Each chunk is ONE parquet file so
    * maxFilesPerTrigger=1 maps one chunk to one microbatch. */
  private def prep(work: String, scale: Int, chunks: Int): Unit = {
    val spark = session()
    val docs = GenScaledCorpus.documentsDf(spark, scale)
      .withColumn("rev", lit(0L))
    docs.write.mode(SaveMode.Overwrite).parquet(s"$work/base")
    val n = spark.read.parquet(s"$work/base").count()
    val chunkRows = n / chunks
    val step = math.max(1L, (chunkRows * 4) / 5)
    val fs = new Path(work).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$work/input"), true)
    fs.mkdirs(new Path(s"$work/input"))
    val base = spark.read.parquet(s"$work/base")
    (0 until chunks).foreach { i =>
      val lo = i * step
      val chunk = base.filter(col(Key) >= lo && col(Key) < lo + chunkRows)
        .withColumn("rev", lit(i + 1L))
        .coalesce(1)
      val stage = s"$work/stage_chunk"
      chunk.write.mode(SaveMode.Overwrite).parquet(stage)
      val part = fs.listStatus(new Path(stage))
        .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
      require(fs.rename(part, new Path(f"$work/input/chunk_$i%05d.parquet")),
        s"staging rename failed for chunk $i")
      fs.delete(new Path(stage), true)
    }
    println(s"""{"metric":"store_stream_prep","base_rows":$n,"chunks":$chunks,"chunk_rows":$chunkRows,"step":$step}""")
    spark.stop()
  }

  private def victim(work: String, killAfter: Long): Unit = {
    val spark = session()
    CorpusStore.init(spark.read.parquet(s"$work/base"), s"$work/store")
    val q = inputStream(spark, work).writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId == killAfter) {
          // a writer dying mid-delta: half the rows land, the offset
          // commit for this batch never happens
          val half = batch.filter(pmod(col(Key), lit(2L)) === 0)
          val halfRows = half.count()
          val fullRows = batch.count()
          CorpusStore.append(batch.sparkSession, s"$work/store", batchId,
            Key, half)
          val out = new java.io.PrintWriter(s"$work/victim.json")
          try out.println(s"""{"killed_batch":$batchId,"partial_rows":$halfRows,"full_rows":$fullRows}""")
          finally out.close()
          Console.out.flush(); Console.err.flush()
          Runtime.getRuntime.halt(137)
        } else CorpusStore.append(batch.sparkSession, s"$work/store", batchId,
          Key, batch)
      }
      .start()
    q.awaitTermination() // never returns normally: halt() kills the JVM
  }

  private def recover(work: String): Unit = {
    val (l1, l5) = Loadavg.read()
    val spark = session()
    val victimJson = {
      val src = scala.io.Source.fromFile(s"$work/victim.json")
      try src.mkString finally src.close()
    }
    def field(name: String): Long =
      s""""$name":(\\d+)""".r.findFirstMatchIn(victimJson)
        .map(_.group(1).toLong)
        .getOrElse(sys.error(s"victim.json missing $name"))
    val killedBatch = field("killed_batch")
    val partialRows = field("partial_rows")
    val fullRows = field("full_rows")
    val deltaDir = f"$work/store/delta_$killedBatch%019d"
    // the partial delta the victim left behind — evidence the crash
    // window is the one under test
    val beforeRows = spark.read.parquet(deltaDir).count()

    // incarnation 2: the REAL appendStream against the victim's checkpoint
    val t0 = System.nanoTime()
    val q = CorpusStore.appendStream(inputStream(spark, work),
      s"$work/store", Key, s"$work/ckpt").start()
    try q.processAllAvailable() finally {}
    val replayed = q.recentProgress.toIndexedSeq
      .filter(_.numInputRows > 0).map(_.batchId)
    q.stop()
    val recoverSec = (System.nanoTime() - t0) / 1e9
    val afterRows = spark.read.parquet(deltaDir).count()

    // uninterrupted control: fresh store + checkpoint, same input
    val t1 = System.nanoTime()
    CorpusStore.init(spark.read.parquet(s"$work/base"), s"$work/store_control")
    val qc = CorpusStore.appendStream(inputStream(spark, work),
      s"$work/store_control", Key, s"$work/ckpt_control").start()
    try qc.processAllAvailable() finally {}
    val controlBatches = qc.recentProgress.toIndexedSeq
      .count(_.numInputRows > 0)
    qc.stop()
    val controlSec = (System.nanoTime() - t1) / 1e9

    // parity: the recovered store must read exactly as the control
    val got = CorpusStore.read(spark, s"$work/store", Key)
    val want = CorpusStore.read(spark, s"$work/store_control", Key)
    val gotRows = got.count()
    val wantRows = want.count()
    val onlyGot = got.exceptAll(want).count()
    val onlyWant = want.exceptAll(got).count()
    val parity = gotRows == wantRows && onlyGot == 0L && onlyWant == 0L
    val overwrote = beforeRows == partialRows && afterRows == fullRows
    val replayedKilled = replayed.contains(killedBatch)

    println(s"""{"metric":"store_stream_recovery","killed_batch":$killedBatch,"partial_delta_rows_before":$beforeRows,"delta_rows_after_replay":$afterRows,"full_chunk_rows":$fullRows,"partial_overwritten":$overwrote,"replayed_batch_ids":${replayed.mkString("[", ",", "]")},"replayed_killed_batch":$replayedKilled,"recover_sec":${fmt(recoverSec)},"control_sec":${fmt(controlSec)},"control_batches":$controlBatches,"store_rows":$gotRows,"control_rows":$wantRows,"rows_only_in_recovered":$onlyGot,"rows_only_in_control":$onlyWant,"parity":$parity,"loadavg_1m":${fmt(l1)},"loadavg_5m":${fmt(l5)}}""")
    spark.stop()
    if (!(parity && overwrote && replayedKilled)) sys.exit(1)
  }
}
