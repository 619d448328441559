package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev probe: per-Spark-job census of ONE registry query — job count,
  * wall per job, and the first line of each job's call site — to tell
  * scheduling overhead (many tiny metadata jobs) from real compute when
  * a bench number looks setup-dominated.
  * Usage: runMain graft.JobProbe <name> [sfDir] [reps]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (j.time,
          Option(j.properties.getProperty("callSite.short")).getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(j.jobId)).foreach { case (t0, site) =>
          done.add((j.jobId, j.time - t0, site))
        }
      }
    })
    (1 to reps).foreach { i =>
      done.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      // listener bus is async: give the tail events a moment to land
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val d = done.asScala.toSeq.sortBy(_._1)
      println(f"[jobprobe] $name rep $i: wall $wall%.2f s, ${d.size} jobs, " +
        f"job-ms sum ${d.map(_._2).sum}")
      d.foreach { case (id, ms, site) => println(f"  job $id%4d ${ms}%6d ms  $site") }
      System.gc()
    }
    spark.stop()
  }
}
