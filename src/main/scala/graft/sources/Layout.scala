package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Physical-layout sinks: the storage-side half of shuffle avoidance.
  *
  * - Bucketed tables: co-partition fact tables on their join key at write
  *   time; every later equi-join/aggregation on that key skips its
  *   exchange entirely (at 100 TB, the shuffle IS the cost — pay it once
  *   at landing, not per query).
  * - Partitioned directories: coarse-grained pruning — a predicate on the
  *   partition column skips whole directories at planning time.
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
}
