package graft.cnj

import java.io.File
import java.nio.charset.StandardCharsets

import scala.util.Using

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** Tolerant CSV ingestion (S1-S3, U1 of SURVEY.md §2.1/2.7).
  *
  * Mirrors pd.read_csv(sep=',', on_bad_lines='skip') + per-file schema
  * drift + pd.concat outer alignment (/root/reference/Versao_Np.py:
  * 143,155-161,226): each file's header is read driver-side (one line of
  * I/O), the file is scanned ONCE with an explicit all-string schema
  * (schema inference would parse every byte twice), numeric columns are
  * null-coerced with try_cast (pandas to_numeric(errors='coerce')
  * semantics), and everything lands on the canonical CNJ column set with
  * nulls for the gaps.
  *
  * Files the reference skips contribute nothing: a file missing the
  * identity columns is excluded by its header; a header-only file scans
  * to zero rows and vanishes in the union (no eager per-file emptiness
  * jobs).
  *
  * Scale note: the per-file loop exists because the fixture corpus
  * carries a different header per file. It builds ONE lazy union plan —
  * Spark still schedules all file scans in parallel, and everything
  * downstream (aggregation, join, sinks) is a single distributed job.
  * The 100 TB path is the same plan over files landed once as parquet
  * with this canonical schema, where the union disappears into a single
  * multi-file scan.
  */
object Reader {

  /** Literal NaNs behave like nulls in pandas (`notna()`/`sum` skip them);
    * Spark propagates them through sum. Normalize at the edge — nanvl
    * evaluates its (try_cast) input once, where a when(isnan(c),...)
    * guard would compute the cast twice. */
  private def nanToNull(c: org.apache.spark.sql.Column) =
    nanvl(c, lit(null).cast(DoubleType))

  /** First line of the file, as CSV column names (driver-side, one line
    * of I/O — the reference headers are unquoted identifiers). */
  private def header(path: String): Seq[String] =
    Using.resource(scala.io.Source.fromFile(path, StandardCharsets.UTF_8.name())) { src =>
      src.getLines().nextOption().map(_.split(",", -1).map(_.trim).toSeq)
        .getOrElse(Seq.empty)
    }

  /** Read one CNJ CSV and project it onto the canonical schema; returns
    * None for files the reference skips (missing identity columns;
    * Versao_Np.py:157-159). */
  def readFile(spark: SparkSession, path: String): Option[DataFrame] = {
    val cols = header(path)
    if (!CnjSchema.keyCols.forall(cols.contains)) None
    else {
      val schema = StructType(cols.map(StructField(_, StringType)))
      val raw = spark.read
        .option("header", "true")
        .option("encoding", "UTF-8")
        .option("mode", "DROPMALFORMED")
        .schema(schema)
        .csv(path)
      val colSet = cols.toSet
      val projected = CnjSchema.keyCols.map(k => col(k).as(k)) ++
        CnjSchema.numericCols.map { c =>
          if (colSet.contains(c)) nanToNull(expr(s"try_cast(`$c` AS DOUBLE)")).as(c)
          else lit(null).cast(DoubleType).as(c)
        }
      Some(raw.select(projected: _*))
    }
  }

  /** All court files in a directory as one canonical-schema DataFrame. */
  def readDir(spark: SparkSession, dir: String): DataFrame = {
    // listFiles() returns null (not empty) for a missing/unreadable dir
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isFile && f.getName.endsWith(".csv"))
      .map(_.getPath).sorted
    val parts = files.flatMap(readFile(spark, _))
    require(parts.nonEmpty, s"no readable CNJ csv files under $dir")
    // identical schemas after projection -> positional union
    parts.reduce(_.union(_))
  }
}
