package graft

/** Dev utility: time one named query N times in a warm JVM.
  * Usage: runMain graft.TimeQuery <name> <sfDir> [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    // shared harness session (see GraftSession.harnessBuilder): the
    // scale experiments' "same cores, more shuffle partitions" knob is
    // SPARK_GRAFT_SHUFFLE_PARTITIONS (the cluster-sizing rule —
    // partitions scale with DATA, cores with the machine)
    val spark = GraftSession.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[time] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // same between-unit discipline as Verify/ScaleFamilies: dead
      // operator-internal checkpoint blocks and shuffle files otherwise
      // accumulate across reps at corpus scale and inflate later reps
      // (runs OUTSIDE the timed window)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    spark.stop()
  }
}
