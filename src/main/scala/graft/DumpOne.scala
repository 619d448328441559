package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: dump one or more named queries' outputs as parquet for a
  * targeted oracle compare (a full Verify re-run is minutes at larger
  * scale factors). Usage: runMain graft.DumpOne <sfDir> <outDir> <name...>
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).foreach { name =>
      SparkEntry.queries(name)(spark, args(0))
        .write.mode("overwrite").parquet(args(1) + "/" + name)
      println(s"[dump] $name done")
    }
    // oracle SQL for the dumped names, AFTER running them — the IVF
    // oracles are built from the centroid model each query pins at run
    // time, so the dump order here mirrors Verify's
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(args(1) + "/oracle_sql.json"),
      SparkEntry.oracleJson(Some(args.drop(2).toSet), Some(args(0))))
    spark.stop()
  }
}
