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
}
