package graft

/** CLI for the full CNJ pipeline: ResumoMetas.csv + Consolidado.csv +
  * grafico_meta1.png. Usage: runMain graft.RunCnj <inDir> <outDir> */
object RunCnj {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.cnj.MetasJob.runAll(spark, args(0), args(1))
    spark.stop()
  }
}
