package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, TextFunctions}
import graft.operators.{Compute, Dedup}

/** Dev utility: stage-by-stage wall decomposition of the winnowing and
  * minhash pipelines at a given corpus — finds WHERE a scale decade's
  * wall goes before any optimization is attempted.
  *
  * Every stage also reports task-metric deltas (memory/disk bytes
  * SPILLED and shuffle bytes written). Unlike wall time, spill bytes
  * are a property of the JVM's own memory manager — ambient box load
  * cannot fake or hide them — so they adjudicate WHICH regime a decade
  * runs in: a family whose wall goes super-linear while spill stays 0
  * has an algorithmic problem; one whose spill ignites in the same
  * decade is out of single-box memory, not out of plan.
  * Usage: runMain graft.ProfileWinnow <dir> [winnow|minhash]
  */
object ProfileWinnow {
  /** Aggregates spill/shuffle task metrics across all tasks. Listener
    * delivery is async; snapshot() gives the bus a short drain window
    * after the stage's job has returned (a dev profiler can afford the
    * 300 ms; production code would use a QueryExecutionListener). */
  private final class SpillProbe extends SparkListener {
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val shufWrite = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def snapshot(): (Long, Long, Long) = {
      Thread.sleep(300)
      (memSpill.get, diskSpill.get, shufWrite.get)
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val which = if (args.length > 1) args(1) else "winnow"
    // measurement tool -> the shared harness session, so a profile and
    // the bench it explains run under one configuration
    val spark = GraftSession.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe = new SpillProbe
    spark.sparkContext.addSparkListener(probe)
    def gb(b: Long): String = f"${b / 1e9}%.2f GB"
    // cached-block residency: MEMORY_AND_DISK_SER checkpoints EVICT to
    // disk when the storage pool overflows — a memory-regime change the
    // spill counters never see (eviction is storage, spill is execution)
    def cached(): (Long, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
    }
    def t[A](name: String)(f: => A): A = {
      val (m0, d0, w0) = probe.snapshot()
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val (m1, d1, w1) = probe.snapshot()
      val (cm, cd) = cached()
      println(f"[prof] $name: $wall%.1f s  spillMem=${gb(m1 - m0)} " +
        s"spillDisk=${gb(d1 - d0)} shufWrite=${gb(w1 - w0)} " +
        s"cachedMem=${gb(cm)} cachedDiskEvict=${gb(cd)}")
      r
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, dir)

    // PROFILE_E2E_AB=1: paired end-to-end alternation of the candidate
    // materialization strategies through the REGISTERED query, in one
    // JVM — JIT warm-up, page cache, and ambient drift hit both arms
    // equally, so the adjacent-pair deltas are the decision evidence for
    // verifyJaccard's default (single-JVM-per-arm runs on this box swing
    // 2x on ambient noise alone). Checkpoint blocks are dropped and the
    // ContextCleaner given a GC between reps, as in ScaleFamilies.
    if (sys.env.get("PROFILE_E2E_AB").contains("1")) {
      val query = if (which == "winnow") "dedup_winnowing" else "dedup_minhash_lsh"
      def drop(): Unit = {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        System.gc()
      }
      (1 to 3).foreach { round =>
        Seq("localCheckpoint", "sink").foreach { strat =>
          spark.conf.set("spark.graft.candidateMaterialize", strat)
          t(s"${query}_e2e_${strat}_$round")(sink(
            SparkEntry.queries(query)(spark, dir)))
          drop()
        }
      }
      spark.stop()
      return
    }

    if (which == "winnow") {
      val n = 3; val w = 4; val maxDf = 1000; val minShared = 2
      // stage 1: tokenize + shingle + winnow + serialize into storage
      val base = docs
        .withColumn("toks", TextFunctions.tokens(col("text")))
        .select(col("doc_id"),
          TextFunctions.shingles(col("toks"), n).as("sh"),
          HashFunctions.winnowing(col("toks"), n, w, portable = true).as("fp"))
        .filter(size(col("sh")) > 0)
      val baseCp = t("base_checkpointSer")(Compute.checkpointSer(base))
      val inv0 = baseCp.filter(size(col("fp")) > 0)
        .select(col("doc_id"), explode(col("fp")).as("f"))
      t("inv_count")(println("  inv rows = " + inv0.count()))
      // stage 2: df table (minDf = 2 cut, as in Dedup.dfCut since r10)
      val dfs = inv0.groupBy(col("f")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf && col("__df") >= 2).drop("__df")
      t("df_table_count")(println("  kept fps = " + dfs.count()))
      // stage 3: cut join + self-join + pair agg -> candidates
      val inv = inv0.join(dfs, "f")
      t("cut_inv_count")(println("  cut inv rows = " + inv.count()))
      val a = inv.as("a"); val b = inv.as("b")
      val candidates = a.join(b,
          col("a.f") === col("b.f") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= minShared)
        .select(col("doc_a"), col("doc_b"))
      // materialization A/B (PROFILE_CAND_AB=1): execute the IDENTICAL
      // candidate plan through localCheckpoint (frozen physical plan, no
      // AQE) and through a parquet sink (full adaptive path), alternating
      // twice — the decisive input for verifyJaccard's materialization
      // choice (see its scaladoc). Outside the A/B the stage runs once,
      // via localCheckpoint, as the production winnowingPairs does.
      if (sys.env.get("PROFILE_CAND_AB").contains("1")) {
        (1 to 2).foreach { round =>
          t(s"cand_via_localCheckpoint_$round") {
            val c = candidates.localCheckpoint()
            println("  candidates = " + c.count())
            c.unpersist(true)
          }
          t(s"cand_via_parquet_sink_$round") {
            val p = s"/tmp/prof_cand_sink_$round"
            candidates.write.mode("overwrite").parquet(p)
            println("  candidates = " + spark.read.parquet(p).count())
          }
        }
      }
      val candCp = t("candidates_localCheckpoint")(candidates.localCheckpoint())
      t("cand_count")(println("  candidates = " + candCp.count()))
      // stage 4: verify join
      t("verify")(sink(Dedup.verifyJaccard(candCp,
        baseCp.select(col("doc_id"), col("sh")), 0.2,
        maxCandidates = 16000000L)))
    } else {
      val numHashes = 64; val bands = 16
      val sh = t("shingled")(Dedup.shingled(docs))
      val withSig = sh.withColumn("sig",
        HashFunctions.minhashSignature(col("sh"), numHashes))
      t("sig_only")(sink(withSig.select(sum(element_at(col("sig"), 1).cast("double")))))
      val bandRows = withSig
        .select(col("doc_id"),
          explode(Dedup.bandKeys(col("sig"), bands, numHashes / bands)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      val a = bandRows.as("a"); val b = bandRows.as("b")
      val candidates = a.join(b,
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val candCp = t("candidates_localCheckpoint")(candidates.localCheckpoint())
      t("cand_count")(println("  candidates = " + candCp.count()))
      t("verify")(sink(Dedup.verifyJaccard(candCp, sh, 0.9,
        maxCandidates = 16000000L)))
    }
    spark.stop()
  }
}
