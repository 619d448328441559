package graft

import graft.cnj.{MetasJob, Reader}

/** Dev probe: does PARSING ONCE beat the shipped parse-twice CNJ plan?
  *
  * The shipped `MetasJob.runAll` parses the CSV corpus twice (aggregate
  * pass, Consolidado pass) because caching the ~1 GB parsed frame as an
  * InMemoryRelation measured ~10x the one re-scan it saves. Two
  * single-parse alternatives worth re-measuring against the concurrent
  * two-parse baseline:
  *
  *  - SPARK_GRAFT_STAGE_MODE=stage: land the parsed frame once as a parquet staging dir,
  *    then run both sinks (concurrently) from the columnar stage — the
  *    "land once, consume columnar" pattern the Reader scaladoc calls
  *    the 100 TB path, paid inside this one job.
  *  - SPARK_GRAFT_STAGE_MODE=persist: `persist(MEMORY_AND_DISK)` on the parsed frame —
  *    Spark's columnar cache, re-measured on the current parser.
  *
  * Usage: SPARK_GRAFT_STAGE_MODE=stage|persist runMain graft.CnjStageProbe <inDir> <outDir>
  *
  * MEASURED OUTCOME (r13 continuation, 0.93 GB corpus, 32-partition arm,
  * alternating with the shipped bench): both single-parse forms LOSE —
  * stage 60.6/67.5 s and persist 61.8/37.7 s vs the shipped parse-twice
  * concurrent plan's 32.0/38.4 s. The stage write alone costs 19-20 s
  * and the persist materialize 18-28 s, i.e. materializing ~10M wide
  * rows (columnar encode or parquet write) costs more than the ~12 s
  * second CSV parse it saves, re-confirming the original 10x cache
  * measurement on the current parser. The shipped plan stands.
  */
object CnjStageProbe {
  def main(args: Array[String]): Unit = {
    val inDir = args(0)
    val outDir = if (args.length > 1) args(1) else "/tmp/cnj_stage_out"
    val mode = sys.env.getOrElse("SPARK_GRAFT_STAGE_MODE", "stage")
    val spark = GraftSession.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
    new java.io.File(outDir).mkdirs()
    val t0 = System.nanoTime()
    def t[A](n: String)(f: => A): A = {
      val s = System.nanoTime()
      val r = f
      println(f"[stage] $n: ${(System.nanoTime() - s) / 1e9}%.1f s")
      r
    }
    val raw = t("headers")(Reader.readDir(spark, inDir))
    val data = mode match {
      case "stage" =>
        val stage = s"$outDir/_stage.parquet"
        t("stage_write")(raw.write.mode("overwrite").parquet(stage))
        spark.read.parquet(stage)
      case "persist" =>
        val d = raw.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        t("persist_materialize")(d.count())
        d
      case other => sys.error(s"unknown SPARK_GRAFT_STAGE_MODE $other")
    }
    val typed = MetasJob.resumoTyped(spark, data).cache()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val cons = Future(t("consolidado") {
      MetasJob.writeCsv(data, s"$outDir/Consolidado.csv", singleFile = false)
    })
    t("resumo_chain") {
      val res = MetasJob.stringlyOutput(typed)
      MetasJob.writeCsv(res, s"$outDir/ResumoMetas.csv")
      val chart = MetasJob.chartData(res).collect()
        .map(r => (r.getString(0), r.getDouble(1)))
      MetasJob.writeChartPng(chart, s"$outDir/grafico_meta1.png")
    }
    Await.result(cons, Duration.Inf)
    typed.unpersist()
    val total = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"cnj_stage_total_sec","mode":"$mode","value":$total%.2f}""")
    spark.stop()
  }
}
