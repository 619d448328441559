package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Driver-side parquet FOOTER reads — the metadata behind every
  * cadence / broadcast-preflight decision in the store family.
  *
  * A `spark.read.parquet(dir).count()` on an unfiltered directory is
  * already metadata-only per file (parquet count-star reads footers,
  * never data pages), but it still costs a full Spark JOB: plan, task
  * launch per file split, a shuffle-free aggregate, result collection.
  * The store's read/maintenance verbs make MANY such decisions per
  * operation (broadcast-vs-shuffle preflight, fold-cadence row ratios,
  * DML return counts, describe's census) — at bench scale each job is
  * ~100 ms of pure scheduling for a number the driver could read in
  * ~1 ms, and on a cluster it occupies a scheduling slot and a stage in
  * the UI for the same footer bytes. Reading the footers directly on
  * the driver removes the job entirely; the bytes read are identical.
  *
  * Scale contract: O(files) metadata on the driver, parallelized over a
  * small shared pool (object-store footer reads are latency-bound). The
  * call sites are all bounded by construction: delta dirs are bounded
  * by the maintenance policy ([[graft.operators.CorpusStore.maintain]]),
  * and a base generation is one compact's output (file count set by the
  * fold's own partitioning). This is exactly where the table formats
  * read their manifest row counts — from metadata adjacent to the
  * files, never via a cluster job.
  */
object ParquetMeta {

  /** Shared daemon pool for footer reads: bounded so a huge directory
    * cannot fork-bomb the driver, shared so per-call pools don't churn
    * OS threads on a streaming writer's cadence. */
  private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(
    16,
    (r: Runnable) => {
      val t = new Thread(r, "graft-parquet-meta")
      t.setDaemon(true)
      t
    })

  /** Data files of a directory: everything not underscore/dot-prefixed
    * (commit markers, fold markers, CRCs are metadata by the parquet
    * directory convention). */
  private def dataFiles(conf: Configuration, dir: String): Seq[Path] = {
    val p = new Path(dir)
    val d = p.getFileSystem(conf)
    d.listStatus(p).toSeq
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(_.getPath)
  }

  private def footerRows(conf: Configuration, f: Path): Long = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
    try r.getRecordCount
    finally r.close()
  }

  /** Total row count across `dirs`' parquet files plus the file count —
    * bit-identical to `spark.read.parquet(dirs: _*).count()` (both sum
    * the same footer record counts), without the Spark job. */
  def rowsAndFiles(spark: SparkSession, dirs: Seq[String]): (Long, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = dirs.flatMap(dataFiles(conf, _))
    if (files.isEmpty) return (0L, 0)
    import scala.jdk.CollectionConverters._
    val tasks: java.util.List[java.util.concurrent.Callable[Long]] =
      files.map { f =>
        new java.util.concurrent.Callable[Long] {
          def call(): Long = footerRows(conf, f)
        }: java.util.concurrent.Callable[Long]
      }.asJava
    val rows = pool.invokeAll(tasks).asScala.map(_.get()).sum
    (rows, files.size)
  }

  /** [[rowsAndFiles]]' row count alone. */
  def rows(spark: SparkSession, dirs: Seq[String]): Long =
    rowsAndFiles(spark, dirs)._1

  /** One data file's footer census for a stats manifest: plain path,
    * row count, and per requested column the (min, max) merged across
    * its row groups' column-chunk statistics. */
  final case class FileStats(path: String, rows: Long,
      minMax: Seq[(Option[Any], Option[Any])])

  /** Per-file footer statistics over `dir` for integral columns —
    * `None` whenever footers cannot be trusted to reproduce the
    * one-pass aggregate EXACTLY, so callers fall back to the scan:
    *   - a requested column is not physically INT64/INT32 with a plain
    *     or int logical annotation (dates, decimals, strings all have
    *     subtler stats semantics — truncation, ordering — and floats
    *     have NaN ordering; exactness is only free for fixed-width
    *     integers);
    *   - any column chunk lacks statistics, or carries ambiguous ones
    *     (no recorded non-null value while the chunk has non-null rows
    *     — treating that as "all null" would fabricate a null min/max
    *     and silently DROP the file from every box intersection).
    * Min/max values come back as java.lang.Long / Integer matching the
    * physical type; an all-null column yields (None, None), exactly the
    * aggregate's null min/max. */
  def fileColumnStats(spark: SparkSession, dir: String,
      cols: Seq[String]): Option[Seq[FileStats]] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{INT32, INT64}
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val files = dataFiles(conf, dir)
    if (files.isEmpty) return None // scan path's schema read throws the same contract error

    // null result = this file's footers cannot reproduce the aggregate
    def statsOf(f: Path): FileStats = {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val schema = r.getFooter.getFileMetaData.getSchema
        val blocks = r.getRowGroups.asScala.toSeq
        var ok = true
        val perCol = cols.map { c =>
          var mn: Option[Any] = None
          var mx: Option[Any] = None
          if (ok) {
            val okType = schema.containsField(c) && {
              val fld = schema.getType(Seq(c): _*)
              fld.isPrimitive && {
                val pt = fld.asPrimitiveType()
                (pt.getPrimitiveTypeName == INT64 ||
                  pt.getPrimitiveTypeName == INT32) &&
                (pt.getLogicalTypeAnnotation == null ||
                  pt.getLogicalTypeAnnotation.isInstanceOf[
                    org.apache.parquet.schema.LogicalTypeAnnotation.IntLogicalTypeAnnotation])
              }
            }
            if (!okType) ok = false
            else blocks.foreach { b =>
              if (ok) b.getColumns.asScala.find(_.getPath.toDotString == c) match {
                case None => ok = false
                case Some(cc) =>
                  val st = cc.getStatistics
                  if (st == null) ok = false
                  else if (st.hasNonNullValue) (st.genericGetMin, st.genericGetMax) match {
                    case (p: java.lang.Long, q: java.lang.Long) =>
                      mn = Some(mn.fold(p: Any)(m =>
                        if (p < m.asInstanceOf[java.lang.Long]) p else m))
                      mx = Some(mx.fold(q: Any)(m =>
                        if (q > m.asInstanceOf[java.lang.Long]) q else m))
                    case (p: java.lang.Integer, q: java.lang.Integer) =>
                      mn = Some(mn.fold(p: Any)(m =>
                        if (p < m.asInstanceOf[java.lang.Integer]) p else m))
                      mx = Some(mx.fold(q: Any)(m =>
                        if (q > m.asInstanceOf[java.lang.Integer]) q else m))
                    case _ => ok = false
                  }
                  else if (!(st.isNumNullsSet && st.getNumNulls == b.getRowCount))
                    ok = false // not provably all-null: a fabricated null
                               // min/max would DROP the file from box scans
              }
            }
          }
          (mn, mx)
        }
        if (!ok) null
        else FileStats(f.toUri.getPath, blocks.map(_.getRowCount).sum, perCol)
      } finally r.close()
    }

    val tasks: java.util.List[java.util.concurrent.Callable[FileStats]] =
      files.map { f =>
        new java.util.concurrent.Callable[FileStats] {
          def call(): FileStats = statsOf(f)
        }: java.util.concurrent.Callable[FileStats]
      }.asJava
    val out = pool.invokeAll(tasks).asScala.map(_.get()).toSeq
    if (out.contains(null)) None else Some(out)
  }
}
