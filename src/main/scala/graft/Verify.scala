package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // Optional restriction for partial-table fixtures (the GenScaledCorpus
    // dirs carry only documents+embeddings): QueryFilter semantics,
    // shared with Bench. Unset → full registry (the driver's contract is
    // unchanged).
    val only: Option[String => Boolean] = QueryFilter.fromEnv
    // the SHIPPED session config plus the harness env overrides (shared
    // with Bench/TimeQuery via GraftSession.harnessBuilder) — verifying
    // under a hand-copied config subset would let an A/B knob isolate
    // the bench but never the correctness harness
    val spark = GraftSession.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = only.fold(SparkEntry.queries)(p =>
      SparkEntry.queries.filter(kv => p(kv._1)))
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Queries are independent and fully materialized to parquet above,
      // so operator-internal localCheckpoint blocks are dead the moment
      // the write returns — but they are freed only when the driver-side
      // RDD object is GC'd, and across a 97-query session the backlog
      // OOMed an 8 GB heap (the blocking-unpersist here keeps peak
      // storage = one query's working set, not the session's union)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      // let the ContextCleaner reap dead shuffle files/broadcasts per
      // query — across ~97 queries at corpus scale the dead-shuffle
      // backlog otherwise throttles later queries (see ScaleFamilies)
      System.gc()
    }
    // oracle SQL dumped AFTER the queries ran — the IVF oracles are
    // built from the centroid model each query pins at run time
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      SparkEntry.oracleJson(names = only.map(_ => selected.keySet),
        dir = Some(sfDir)))
    spark.stop()
  }
}
