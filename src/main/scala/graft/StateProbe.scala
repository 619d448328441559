package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: why does the streaming resumo report 2 state rows per
  * group? Prints the per-operator StateOperatorProgress breakdown. */
object StateProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "src/test/resources/cnj/dados"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stream = graft.cnj.Reader.readDirStream(spark, dir,
      Map("maxFilesPerTrigger" -> "3"))
    val q = graft.cnj.MetasJob.stringlyOutput(
        graft.cnj.MetasJob.resumoTyped(spark, stream))
      .writeStream.format("memory").queryName("probe")
      .outputMode("complete").start()
    q.processAllAvailable()
    val last = q.recentProgress.last
    println("N_STATE_OPS=" + last.stateOperators.length)
    last.stateOperators.foreach(so =>
      println(s"OP name=${so.operatorName} rowsTotal=${so.numRowsTotal}"))
    println("RESULT_ROWS=" + spark.table("probe").count())
    println("=== PHYSICAL PLAN (last microbatch) ===")
    q.explain()
    q.stop(); spark.stop()
  }
}
