package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Generic tolerant file ingestion (the reference's
  * pd.read_csv(on_bad_lines='skip') posture, generalized beyond the CNJ
  * schema — graft.cnj.Reader layers the CNJ-specific normalization on
  * top of the same options).
  *
  * All readers take a glob/directory: Spark enumerates and splits files
  * natively, so ingestion parallelism is partition-, not file-, granular.
  */
object Sources {

  /** CSV scan that silently drops malformed lines (DROPMALFORMED). With
    * an explicit schema the scan is single-pass; without one Spark infers
    * (extra pass — fine for exploration, not for the 100 TB path). */
  def csvTolerant(spark: SparkSession, path: String,
      schema: Option[StructType] = None, sep: String = ",",
      header: Boolean = true): DataFrame = {
    val r = spark.read
      .option("header", header.toString)
      .option("sep", sep)
      .option("encoding", "UTF-8")
      .option("mode", "DROPMALFORMED")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** CSV scan that keeps malformed lines in a `_corrupt_record` column
    * (PERMISSIVE) — the auditable variant: bad rows are data, not
    * silence. */
  def csvAuditable(spark: SparkSession, path: String, schema: StructType,
      sep: String = ",", header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("sep", sep)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .csv(path)

  /** JSON-lines scan; malformed documents dropped. */
  def jsonlTolerant(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("mode", "DROPMALFORMED")
    schema.fold(r)(r.schema).json(path)
  }

  /** Outer-align heterogenous frames by column name, nulls for gaps —
    * the pd.concat posture (one lazy plan; no data movement until an
    * action). */
  def unionAligned(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** ORC scan — the other mainstream columnar landing format (bundled
    * with Spark; same pushdown/pruning surface as parquet: the scan node
    * reports PushedFilters and a pruned ReadSchema). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink with the same overwrite-directory contract as the other
    * writers. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
