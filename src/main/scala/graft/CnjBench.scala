package graft

import graft.cnj.{MetasJob, Reader}

/** Dev utility: phase timings for the full CNJ pipeline.
  * Usage: runMain graft.CnjBench <inDir> */
object CnjBench {
  def main(args: Array[String]): Unit = {
    val inDir = args(0)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cnj-bench] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val data = t("plan (read headers)")(Reader.readDir(spark, inDir))
    t("resumo (scan + agg + join)") {
      MetasJob.stringlyOutput(MetasJob.resumoTyped(spark, data)).collect().length
    }
    t("consolidado sharded write") {
      MetasJob.writeCsv(data, "/tmp/cnj_bench_sharded", singleFile = false)
    }
    t("consolidado coalesce(1) write") {
      MetasJob.writeCsv(data, "/tmp/cnj_bench_single", singleFile = true)
    }
    spark.stop()
  }
}
