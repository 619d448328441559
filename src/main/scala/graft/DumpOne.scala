package graft
import org.apache.spark.sql.SparkSession
object DumpOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(args(0))(spark, args(1))
      .write.mode("overwrite").parquet(args(2) + "/" + args(0))
    spark.stop()
  }
}
