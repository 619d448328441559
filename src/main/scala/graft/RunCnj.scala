package graft
import org.apache.spark.sql.SparkSession
object RunCnj {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.cnj.MetasJob.runAll(spark, args(0), args(1))
    spark.stop()
  }
}
