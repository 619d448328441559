package graft.cnj

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Tolerant CSV ingestion (S1-S3, U1 of SURVEY.md §2.1/2.7).
  *
  * Mirrors pd.read_csv(sep=',', on_bad_lines='skip') + per-file schema
  * inference + pd.concat outer alignment (/root/reference/Versao_Np.py:
  * 143,155-161,226): each file is read with its own inferred schema,
  * normalized onto the canonical CNJ column set (missing columns -> null),
  * and union-all'd.
  *
  * Scale note: the per-file loop exists because the fixture corpus carries
  * a different header per file. It builds ONE lazy union plan — Spark still
  * schedules all file scans in parallel, and everything downstream
  * (aggregation, join, sinks) is a single distributed job. The 100 TB path
  * is the same plan over files landed once as parquet with this canonical
  * schema, where the union disappears into a single multi-file scan.
  */
object Reader {

  /** Literal NaNs behave like nulls in pandas (`notna()`/`sum` skip them);
    * Spark propagates them through sum. Normalize at the edge. */
  private def nanToNull(c: org.apache.spark.sql.Column) =
    when(isnan(c), lit(null).cast(DoubleType)).otherwise(c)

  /** Read one CNJ CSV and project it onto the canonical schema; returns
    * None for files the reference skips (empty / missing identity columns;
    * Versao_Np.py:157-159). */
  def readFile(spark: SparkSession, path: String): Option[DataFrame] = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("encoding", "UTF-8")
      .option("mode", "DROPMALFORMED")
      .csv(path)
    val cols = raw.columns.toSet
    if (!CnjSchema.keyCols.forall(cols.contains) || raw.isEmpty) None
    else {
      val projected = CnjSchema.keyCols.map(k => col(k).cast(StringType).as(k)) ++
        CnjSchema.numericCols.map { c =>
          if (cols.contains(c)) nanToNull(expr(s"try_cast(`$c` AS DOUBLE)")).as(c)
          else lit(null).cast(DoubleType).as(c)
        }
      Some(raw.select(projected: _*))
    }
  }

  /** All court files in a directory as one canonical-schema DataFrame. */
  def readDir(spark: SparkSession, dir: String): DataFrame = {
    val files = new File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".csv"))
      .map(_.getPath).sorted
    val parts = files.flatMap(readFile(spark, _))
    require(parts.nonEmpty, s"no readable CNJ csv files under $dir")
    parts.reduce(_.unionByName(_))
  }
}
