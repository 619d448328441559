package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.functions.LayoutFunctions

/** Physical-layout sinks: the storage-side half of shuffle avoidance.
  *
  * - Bucketed tables: co-partition fact tables on their join key at write
  *   time; every later equi-join/aggregation on that key skips its
  *   exchange entirely (at 100 TB, the shuffle IS the cost — pay it once
  *   at landing, not per query).
  * - Partitioned directories: coarse-grained pruning — a predicate on the
  *   partition column skips whole directories at planning time.
  * - Z-order clustering: fine-grained MULTI-dimensional pruning — sorting
  *   by an interleaved-bit key makes every row group's per-column min/max
  *   stats a tight box in all clustered dimensions, so parquet row-group
  *   skipping serves predicates on ANY of them (a lexicographic sort only
  *   ever serves its leading column).
  */
object Layout {

  /** Write `df` as a bucketed+sorted parquet table in the session catalog.
    * `buckets` should match downstream `spark.sql.shuffle.partitions`
    * scale; both sides of a co-located join must use the same count. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Hive-style partitioned parquet directory tree. Choose low-cardinality
    * columns: each distinct value is a directory, and predicates on them
    * prune at plan time. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Z-order-clustered parquet write: bucket each clustering column to
    * [0, 2^bits) by min/max scale, interleave the buckets into one Morton
    * key (native [[org.apache.spark.sql.graft.InterleaveBits]]), range-
    * partition + sort by it, drop it, write. Content is exactly `df`'s —
    * only the physical row order changes; the payoff is at read time,
    * where a predicate on any clustered column skips most row groups on
    * footer stats (measured in ZOrderSpec).
    *
    * Cost model at 100 TB: ONE extra shuffle at landing (the range
    * partitioner samples the key; bounds ride the job as planning
    * metadata), amortized over every subsequent scan. The per-column
    * min/max pass is a single 1-row aggregate — the same planning-
    * metadata pattern as IvfModelStore. `files` controls output
    * granularity: pruning precision rises with file count (one row group
    * per small file) but so does listing cost — at scale, size files to
    * the usual 128 MB-1 GB row-group target instead.
    */
  def zorderWrite(df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 12, files: Int = 0): Unit = {
    require(cols.size >= 2,
      "z-order needs >= 2 columns (use a plain sort for one)")
    // a non-numeric column would cast to all-null doubles and silently
    // collapse its dimension to bucket 0 (zero clustering, and half the
    // key bits wasted) — fail loudly instead; bucket other types into a
    // numeric column first and cluster on that
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"z-order column '$c' must be numeric, got $dt")
    }
    val boundExprs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val bounds = df.agg(boundExprs.head, boundExprs.tail: _*).head()
    val buckets: Seq[Column] = cols.zipWithIndex.map { case (c, i) =>
      val (lo, hi) =
        if (bounds.isNullAt(2 * i)) (0.0, 0.0) // all-null column -> bucket 0
        else (bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
      LayoutFunctions.scaledBucket(col(c), lo, hi, bits)
    }
    val n = if (files > 0) files else df.sparkSession.sessionState.conf.numShufflePartitions
    df.withColumn("__z", LayoutFunctions.interleaveBits(bits, buckets: _*))
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
