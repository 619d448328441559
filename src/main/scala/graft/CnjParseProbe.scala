package graft

/** Dev probe: isolate the CNJ PARSE cost from the pipeline phases — time
  * (a) the raw text scan alone, (b) scan + parse to the canonical frame
  * (noop sink), (c) parse + the Resumo aggregate without sinks. Tells
  * how much of resumo/consolidado phase time is the parse stage itself,
  * i.e. the ceiling of any parser optimization.
  * Usage: runMain graft.CnjParseProbe <inDir> [reps]
  */
object CnjParseProbe {
  def main(args: Array[String]): Unit = {
    val inDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[parse-probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to reps).foreach { i =>
      println(s"--- rep $i ---")
      t("scan_only")(
        spark.read.textFile(s"$inDir/*.csv").toDF("value")
          .write.format("noop").mode("overwrite").save())
      t("scan_parse")(
        graft.cnj.Reader.readDir(spark, inDir)
          .write.format("noop").mode("overwrite").save())
      t("parse_agg") {
        val df = graft.cnj.Reader.readDir(spark, inDir)
        graft.cnj.MetasJob.resumoTyped(spark, df)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
