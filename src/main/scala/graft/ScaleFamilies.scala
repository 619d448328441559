package graft

/** Family-scaling measurement over the [[GenScaledCorpus]] fixtures:
  * times the dedup + similarity families on a generated corpus and
  * reports per-family wall seconds plus qualifying-pair counts — run at
  * scale 1 and scale 10 the ratio table in SCALE.md §9 falls out.
  *
  * One deliberate extra beyond the harness registry:
  *  - `embed_neardup_blocked` is included only with INCLUDE_QUADRATIC=1:
  *    it is EXACT all-pairs enumeration (Θ(n²) by problem statement,
  *    not by plan deficiency) — the scale path for near-dup discovery is
  *    dedup_semantic / LSH.
  *
  * Usage: runMain graft.ScaleFamilies <dir>
  * (the scale knob is inferred from the corpus itself — embeddings
  * rows / 2000 — so a dir/scale mismatch cannot silently produce a
  * wrong contrast row or a mislabeled artifact)
  */
object ScaleFamilies {

  private val Families = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_winnowing",
    "dedup_ngram_jaccard", "dedup_editdist", "dedup_clusters",
    "dedup_keep_best", "dedup_semantic",
    "sim_topk_brute", "sim_topk_ivf", "sim_topk_ivf_pretrained",
    "sim_topk_batch", "sim_knn_graph", "sim_range_search")

  // pair-producing families: row counts are the duplicate-mass evidence
  private val CountRows = Set("dedup_ngram_jaccard", "dedup_semantic",
    "dedup_clusters", "dedup_minhash_lsh",
    "dedup_winnowing", "embed_neardup_blocked")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val includeQuadratic = sys.env.get("INCLUDE_QUADRATIC").contains("1")
    // measurement tool -> the shared harness session (library config +
    // SPARK_GRAFT_* env overrides, UI off), like Bench/Verify/TimeQuery.
    // At default env this is config-identical to the library session
    // except spark.ui.enabled=false.
    val spark = GraftSession.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // scale from the corpus, not an env knob that could disagree with it
    val scale = math.max(1,
      math.round(Tables.embeddings(spark, dir).count() / 2000.0).toInt)

    // Since r10 the registered dedup_semantic IS the full 100 TB
    // operating point — corpus-derived cells (Similarity.scaledCellCount)
    // AND the 5-sigma DefaultSemanticThreshold — so the former
    // `dedup_semantic_scaledcells` contrast row is redundant and gone.
    val extra: Seq[(String, String => org.apache.spark.sql.DataFrame)] =
      if (includeQuadratic)
        Seq("embed_neardup_blocked" ->
          ((d: String) => SparkEntry.queries("embed_neardup_blocked")(spark, d)))
      else Nil

    // SCALE_FAMILIES_ONLY=<name[,name…]>: run a subset, one family per
    // fresh JVM. The suite-in-one-JVM statistic measures a MARATHON —
    // at the third decade the families interfere (page-cache churn and
    // the previous family's asynchronous shuffle-file reaping overlap
    // the next timed window) and a row can read 6x its standalone wall
    // (dedup_winnowing at gen1000x: 208.6 s as family 4 of the suite vs
    // 31.8 s standalone warm-min, same 24g heap — SCALE.md §9). A
    // caller loops this knob and merges rows to get the per-family
    // engine number; the no-knob suite stays the cross-round series.
    val only = sys.env.get("SCALE_FAMILIES_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val all: Seq[(String, String => org.apache.spark.sql.DataFrame)] =
      (Families.map(n => n -> ((d: String) => SparkEntry.queries(n)(spark, d))) ++ extra)
        .filter { case (n, _) => only.forall(_.contains(n)) }
    require(all.nonEmpty, s"SCALE_FAMILIES_ONLY matched no family: $only")

    // JIT/codegen warm-up at the small committed fixture — failures are
    // LOGGED, not swallowed: a family that never warmed up carries
    // JIT/codegen compilation inside its timed row
    // operator-internal localCheckpoint blocks are dead once the noop
    // write returns but are freed only on driver-side GC; across 15+
    // back-to-back families at a big corpus the backlog drives GC
    // pressure that inflates the LATER families' timed walls 3-4x
    // (measured at gen1000x: dedup_winnowing 251.7 s inside the loop vs
    // 58.4 s warm standalone). Blocking-unpersist between families keeps
    // peak storage = one family's working set — same discipline as
    // Verify, and it runs OUTSIDE the timed window.
    def dropCheckpoints(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      // Shuffle files and broadcasts are reaped by the ContextCleaner only
      // when the driver GC collects their references; with a multi-GB heap
      // a full GC may not run for many families and tens of GB of DEAD
      // shuffle data pile up on local disk, throttling later families'
      // shuffles (measured at gen1000x: sim_knn_graph 253.7 s as family 14
      // of the loop vs 52.3 s warm standalone). An explicit GC between
      // families (outside every timed window) lets the cleaner reap after
      // each family, bounding on-disk state to one family's working set.
      System.gc()
      // SCALE_FAMILIES_SETTLE_S: optional pause after the GC (outside the
      // timed window) to let the ContextCleaner's ASYNCHRONOUS deletion of
      // the previous family's shuffle files drain before the next timed
      // window opens (the GC only queues the cleanup; the IO proceeds
      // concurrently). Measured at gen1000x (r11, 4-family alternating
      // A/B): a 20 s settle was a TIE — the marathon-context inflation is
      // not drained by pausing, it migrates between families run-to-run
      // (SCALE.md §9). Default 0; the knob stays for boxes where delete
      // IO genuinely contends with the next family's shuffle writes.
      sys.env.get("SCALE_FAMILIES_SETTLE_S").map(_.toInt).filter(_ > 0)
        .foreach(s => Thread.sleep(s * 1000L))
    }

    all.foreach { case (name, fn) =>
      try fn("/root/testdata/sf0.01").write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"WARNING: warm-up for $name failed at sf0.01 " +
          s"(${e.getMessage}); its timed row may include JIT/codegen warm-up")
      }
      dropCheckpoints()
    }
    // landing prep, as in Bench: the pretrained probe's first-ever
    // invocation on a corpus trains + persists the model — a once-per-
    // corpus-lifetime cost that must not be billed to the timed probe
    // (skipped when SCALE_FAMILIES_ONLY excludes the probe: training at
    // corpus scale would bill ~a minute to every unrelated family's JVM)
    if (all.exists(_._1 == "sim_topk_ivf_pretrained")) {
      try SparkEntry.queries("sim_topk_ivf_pretrained")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(
          s"WARNING: landing prep failed (${e.getMessage}); " +
            "sim_topk_ivf_pretrained's timed number will include training")
      }
      dropCheckpoints()
    }

    val (l1, l5) = Loadavg.read()
    val results = all.map { case (name, fn) =>
      // qualifying-pair counts come from the SAME execution the timer
      // measures (an Observation/CollectMetrics row count piggybacked on
      // the noop write) — a separate post-hoc count() would re-run the
      // whole query (doubling wall for k-means families) and would rely
      // on training determinism for the count to describe the timed run
      val wantRows = CountRows(name)
      val obs = org.apache.spark.sql.Observation(s"rows_$name")
      val t0 = System.nanoTime()
      val ok =
        try {
          val df = fn(dir)
          val timed = if (wantRows)
            df.observe(obs, org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("rows"))
          else df
          timed.write.format("noop").mode("overwrite").save()
          true
        } catch { case e: Throwable =>
          System.err.println(s"$name failed: ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = if (ok && wantRows)
        obs.get.apply("rows").asInstanceOf[Long] else -1L
      dropCheckpoints() // outside the timed window (see warm-up note)
      (name, sec, rows, ok)
    }
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (n, s, r, ok) =>
      val body = if (!ok) "null"
        else if (r >= 0) s"""{"sec":${f(s)},"rows":$r}"""
        else s"""{"sec":${f(s)}}"""
      s""""$n":$body"""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, s, _, true) => s }.sum
    println(s"""{"metric":"scale_families","dir":"$dir","scale":$scale,"value":${f(total)},"unit":"sec","queries":$qs,"loadavg_1m":${f(l1)},"loadavg_5m":${f(l5)}}""")
    spark.stop()
  }
}
