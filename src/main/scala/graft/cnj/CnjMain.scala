package graft.cnj

import graft.GraftSession

/** The reference's CLI surface (`python Versao_Np.py` / `Versao_P.py`,
  * /root/reference/README.md:56-62) as a Spark application: read the
  * court CSV directory, write ResumoMetas.csv + Consolidado.csv +
  * grafico_meta1.png. The Np/P distinction does not exist here — the
  * degree of parallelism is the Spark master/cluster configuration, not
  * a separate program.
  *
  * Usage: runMain graft.cnj.CnjMain <inDir> [outDir]
  * (spark-submit --class graft.cnj.CnjMain on a cluster.)
  */
object CnjMain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CnjMain <inDir> [outDir]")
    val inDir = args(0)
    val outDir = if (args.length > 1) args(1) else "saida"
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // CSV without multiLine is splittable; 16 MB splits keep the largest
    // court file from serializing the parse (see CnjBench)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
    try MetasJob.runAll(spark, inDir, outDir)
    finally spark.stop()
  }
}
