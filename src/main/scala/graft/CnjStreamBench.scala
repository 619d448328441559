package graft

import graft.cnj.{MetasJob, Reader}

/** Corpus-scale benchmark of the streaming CNJ ingest (SURVEY §2.9):
  * [[Reader.readDirStream]] -> the SAME Resumo aggregation as the batch
  * pipeline, run incrementally over the court files with
  * `maxFilesPerTrigger` bounding each microbatch, complete-mode output.
  * Asserts stream-vs-batch parity on the full corpus (the contract
  * `CnjStreamSpec` locks at fixture scale; here byte-identical up to
  * rare 0.01 rounding-boundary flips from float-sum merge order — see
  * the inline note) and records wall time, the
  * per-microbatch input rows, and the streaming-aggregation state rows
  * per batch (`StateOperatorProgress.numRowsTotal`) — the evidence that
  * state is bounded by the GROUP cardinality (courts), not the corpus:
  * a 10x bigger corpus grows batches, never state.
  *
  * Usage: runMain graft.CnjStreamBench <inDir> [filesPerTrigger] [restartAfter]
  *
  * With `restartAfter = k > 0` the run becomes the FAULT-TOLERANCE
  * measurement instead: the stream runs against a checkpoint, is
  * STOPPED after k completed microbatches (mid-corpus), and a second
  * incarnation recovers from the checkpoint — offsets and aggregation
  * state restore, only the unconsumed files replay — timed to
  * completion and parity-checked against the batch truth. Emits
  * `cnj_stream_recovery` with both incarnations' walls and batch
  * counts: the evidence that recovery cost is proportional to the
  * REMAINING corpus, not a from-scratch rerun.
  */
object CnjStreamBench {
  def main(args: Array[String]): Unit = {
    val inDir = args(0)
    val filesPerTrigger = if (args.length > 1) args(1).toInt else 10
    val restartAfter = if (args.length > 2) args(2).toInt else 0
    val (l1, l5) = Loadavg.read()
    // measurement tool -> the shared harness session (same config as the
    // shipped CnjMain session plus the A/B env overrides and UI off)
    val spark = GraftSession.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same split sizing as CnjBench: the largest court file (~119 MB)
    // must not be one task
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    // Symmetric fixture-scale warm-up of BOTH code paths before timing
    // either: the first Spark action in a JVM absorbs JIT + codegen
    // compilation, so without this the batch truth (which runs first)
    // would pay the cold-start and the published stream/batch comparison
    // would flatter streaming. Streaming additionally warms its own
    // machinery (microbatch planner, state store).
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_CNJ_WARMUP_DIR",
      "src/test/resources/cnj/dados")
    try {
      MetasJob.stringlyOutput(
        MetasJob.resumoTyped(spark, Reader.readDir(spark, warmDir))).collect()
      val wq = MetasJob.stringlyOutput(
          MetasJob.resumoTyped(spark, Reader.readDirStream(spark, warmDir)))
        .writeStream.format("memory").queryName("cnj_stream_warmup")
        .outputMode("complete").start()
      try wq.processAllAvailable() finally wq.stop()
    } catch { case e: Throwable =>
      System.err.println(s"WARNING: warm-up on $warmDir failed " +
        s"(${e.getMessage}); the first timed pass will include JIT/codegen")
    }

    // batch truth, timed like CnjBench's resumo phase
    val tb0 = System.nanoTime()
    val batch = MetasJob.stringlyOutput(
      MetasJob.resumoTyped(spark, Reader.readDir(spark, inDir))).collect()
    val batchSec = (System.nanoTime() - tb0) / 1e9

    if (restartAfter > 0) {
      recoveryBench(spark, inDir, filesPerTrigger, restartAfter,
        batch.toIndexedSeq, batchSec, l1, l5)
      spark.stop()
      return
    }

    val ts0 = System.nanoTime()
    val stream = Reader.readDirStream(spark, inDir,
      Map("maxFilesPerTrigger" -> filesPerTrigger.toString))
    val q = MetasJob.stringlyOutput(MetasJob.resumoTyped(spark, stream))
      .writeStream.format("memory").queryName("cnj_stream_bench")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamSec = (System.nanoTime() - ts0) / 1e9

    val got = spark.table("cnj_stream_bench").collect()

    // Cell-level parity with the float-determinism contract documented
    // (and unit-tested) on graft.cnj.ResultParity: byte-identical except
    // counted-and-bounded 0.01 rounding-boundary flips.
    val report = graft.cnj.ResultParity.compare(
      got.toIndexedSeq, batch.toIndexedSeq)
    report.details.foreach(d => System.err.println(s"DIFF $d"))
    val (hardDiffs, boundaryCells, totalCells) =
      (report.hardDiffs, report.boundaryCells, report.totalCells)
    val parity = report.parity()

    // per-microbatch evidence: input rows + streaming-agg state rows
    val perBatch = q.recentProgress.toIndexedSeq
      .filter(_.numInputRows > 0)
      .map { p =>
        val state = p.stateOperators.map(_.numRowsTotal).sum
        (p.batchId, p.numInputRows, state)
      }
    val batchesJson = perBatch
      .map { case (id, in, st) => s"""{"batch":$id,"input_rows":$in,"state_rows":$st}""" }
      .mkString("[", ",", "]")
    val maxState = if (perBatch.isEmpty) -1L else perBatch.map(_._3).max

    println(s"""{"metric":"cnj_stream_bench","stream_sec":${fmt(streamSec)},"batch_sec":${fmt(batchSec)},"parity":$parity,"hard_diff_cells":$hardDiffs,"rounding_boundary_cells":$boundaryCells,"total_cells":$totalCells,"files_per_trigger":$filesPerTrigger,"n_batches":${perBatch.size},"max_state_rows":$maxState,"result_rows":${got.length},"batches":$batchesJson,"loadavg_1m":${fmt(l1)},"loadavg_5m":${fmt(l5)}}""")
    spark.stop()
    if (!parity) sys.exit(1)
  }

  /** The kill-and-recover measurement (see object doc). */
  private def recoveryBench(spark: org.apache.spark.sql.SparkSession,
      inDir: String, filesPerTrigger: Int, restartAfter: Int,
      batch: IndexedSeq[org.apache.spark.sql.Row], batchSec: Double,
      l1: Double, l5: Double): Unit = {
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val ckpt = java.nio.file.Files
      .createTempDirectory("cnj_recovery_ckpt").toString
    def start(name: String) = MetasJob.stringlyOutput(
        MetasJob.resumoTyped(spark, Reader.readDirStream(spark, inDir,
          Map("maxFilesPerTrigger" -> filesPerTrigger.toString))))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .start()

    // incarnation 1: run to the kill point (k completed input batches)
    val t10 = System.nanoTime()
    val q1 = start("cnj_recovery_1")
    val deadline = System.nanoTime() + 600L * 1000 * 1000 * 1000
    while (q1.recentProgress.count(_.numInputRows > 0) < restartAfter &&
        System.nanoTime() < deadline) Thread.sleep(100)
    q1.stop()
    val preKillSec = (System.nanoTime() - t10) / 1e9
    val preBatches = q1.recentProgress.filter(_.numInputRows > 0)
    require(preBatches.length >= restartAfter,
      s"kill point never reached: ${preBatches.length} < $restartAfter batches")

    // incarnation 2: recover from the checkpoint, drain to completion
    val t20 = System.nanoTime()
    val q2 = start("cnj_recovery_2")
    try q2.processAllAvailable() finally q2.stop()
    val recoverSec = (System.nanoTime() - t20) / 1e9
    val postBatches = q2.recentProgress.filter(_.numInputRows > 0)
    val postState = q2.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsTotal).lastOption.getOrElse(-1L)

    val got = spark.table("cnj_recovery_2").collect()
    val report = graft.cnj.ResultParity.compare(got.toIndexedSeq, batch)
    report.details.foreach(d => System.err.println(s"DIFF $d"))

    println(s"""{"metric":"cnj_stream_recovery","batch_sec":${fmt(batchSec)},"pre_kill_sec":${fmt(preKillSec)},"recover_sec":${fmt(recoverSec)},"killed_after_batches":${preBatches.length},"recovery_batches":${postBatches.length},"recovery_input_rows":${postBatches.map(_.numInputRows).sum},"pre_kill_input_rows":${preBatches.map(_.numInputRows).sum},"state_rows_after_recovery":$postState,"files_per_trigger":$filesPerTrigger,"parity":${report.parity()},"hard_diff_cells":${report.hardDiffs},"rounding_boundary_cells":${report.boundaryCells},"total_cells":${report.totalCells},"result_rows":${got.length},"loadavg_1m":${fmt(l1)},"loadavg_5m":${fmt(l5)}}""")
    if (!report.parity()) sys.exit(1)
  }
}
