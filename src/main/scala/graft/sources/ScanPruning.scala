package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping over plain parquet directories — the
  * manifest half of the z-order story.
  *
  * Parquet predicate pushdown skips ROW GROUPS inside every file it
  * opens, but Spark still lists, opens, and footer-reads every file of a
  * plain parquet directory (file-level min/max skipping is a table-format
  * feature it does not do for raw directories). At 100 TB that is
  * millions of opens for a query that touches 1% of the data. The fix is
  * the standard lakehouse one, kept engine-native here: persist a tiny
  * per-file statistics manifest at landing, intersect it with the query
  * box at plan time, and hand Spark only the surviving file list.
  *
  * - [[buildManifest]]: ONE column-pruned scan of the data (only the
  *   clustered/stat columns are read) → `file, n_rows, <c>_min, <c>_max`
  *   per file. O(files) rows — metadata scale.
  * - [[prunedScan]]: filter the manifest with any predicate over those
  *   stat columns, collect the surviving file names (driver-bounded by
  *   the manifest's cardinality, same contract as the model/boundary
  *   tables elsewhere), and read exactly those files. Pruning is
  *   TRANSPARENT: callers re-apply their row-level filter on the result;
  *   a file kept by the box may still hold non-matching rows.
  *
  * Composes with [[Layout.zorderWrite]]: z-ordering makes each file's
  * min/max box tight in every clustered dimension, so the manifest
  * intersection drops most files for a multi-dimensional box — measured
  * structurally in ScanPruningSpec (files read, counted, not timed).
  */
object ScanPruning {

  /** Per-file stats manifest: `file, n_rows, <c>_min, <c>_max` for each
    * stat column, from one column-pruned scan of `dataDir`. Write it next
    * to the data at landing ([[writeManifest]]) and it costs nothing at
    * query time. */
  def buildManifest(spark: SparkSession, dataDir: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one stat column")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(dataDir)
      .select(input_file_name().as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  def writeManifest(spark: SparkSession, dataDir: String,
      manifestPath: String, cols: Seq[String]): Unit =
    buildManifest(spark, dataDir, cols)
      .coalesce(1) // metadata scale: O(files) rows
      .write.mode(SaveMode.Overwrite).parquet(manifestPath)

  /** Box-intersection predicate over a manifest: keep files whose
    * [min, max] overlaps [lo, hi] in EVERY listed column. */
  def boxPredicate(bounds: Seq[(String, Any, Any)]): Column =
    bounds.map { case (c, lo, hi) =>
      col(s"${c}_max") >= lit(lo) && col(s"${c}_min") <= lit(hi)
    }.reduce(_ && _)

  /** Read only the files of `dataDir` whose manifest row satisfies
    * `keep`. The result is a plain DataFrame over the surviving files —
    * callers apply their row-level filter on top (the manifest prunes,
    * it never answers). An empty survivor set returns an empty frame
    * with the directory's schema. */
  def prunedScan(spark: SparkSession, dataDir: String,
      manifest: DataFrame, keep: Column): DataFrame = {
    val files = manifest.filter(keep)
      .select(col("file")).collect().map(_.getString(0))
    if (files.isEmpty) spark.read.parquet(dataDir).filter(lit(false))
    else spark.read.parquet(files.toIndexedSeq: _*)
  }
}
