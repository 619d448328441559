package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** Driver-side parquet writer for TINY driver-resident row sets (a
  * manifest part: O(files-of-one-landing) rows), using Spark's OWN row
  * write support — so the bytes are indistinguishable from a 1-partition
  * `df.write.parquet` part file and read back through the same
  * vectorized reader — without the Spark job a DataFrame write schedules
  * (parallelize + plan + task launch + commit protocol for one tiny
  * task). Measured on the store's manifest maintenance: each part write
  * as a job costs ~100 ms of pure scheduling for ~1 ms of IO.
  *
  * Only for driver-bounded metadata (the same contract as the collects
  * that produce these rows); data paths keep writing through Spark.
  */
object DriverParquet {

  /** Write `rows` (external Rows matching `schema`) as ONE parquet file
    * at `path` (replaced if present). Encoding knobs (timezone, legacy
    * format, timestamp type, rebase modes) are taken from the session —
    * the same values Spark's own prepareWrite would pin. */
  def write(spark: SparkSession, schema: StructType, rows: Seq[Row],
      path: Path): Unit = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val sqlConf = spark.sessionState.conf
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, sqlConf.sessionLocalTimeZone)
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlConf.writeLegacyParquetFormat.toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlConf.parquetOutputTimestampType.toString)
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    // the schema converter reads these two with a raw .toBoolean — unset
    // they parse "null" and throw (prepareWrite always pins them)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlConf.getConf(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED).toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlConf.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    val fs = path.getFileSystem(conf)
    if (fs.exists(path)) fs.delete(path, false)
    val builder = new Builder(path, new ParquetWriteSupport)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
    val toInternal = CatalystTypeConverters.createToCatalystConverter(schema)
    val w = builder.build()
    try rows.foreach(r => w.write(toInternal(r).asInstanceOf[InternalRow]))
    finally w.close()
  }

  private final class Builder(path: Path, ws: WriteSupport[InternalRow])
      extends ParquetWriter.Builder[InternalRow, Builder](path) {
    override def self(): Builder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] = ws
  }
}
