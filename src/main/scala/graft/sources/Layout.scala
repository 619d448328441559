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
    * [0, 2^bits) — numeric dims by min/max scale, string dims by
    * dictionary rank (see inline) — interleave the buckets into one Morton
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
      bits: Int = 12, files: Int = 0, maxDictSize: Long = 1L << 20): Unit = {
    require(cols.size >= 2,
      "z-order needs >= 2 columns (use a plain sort for one)")
    // numeric dims bucket by min/max scale; STRING dims — the most common
    // corpus clustering keys (source, lang) — bucket by dictionary rank:
    // lexicographic position among the distinct values. Rank preserves
    // the column's order, so each written file's min/max box on the
    // string column itself stays tight and the manifest / parquet footer
    // serves range AND equality predicates on it (a hash bucketizer
    // co-locates equal values but scatters the order, leaving every
    // file's min/max box spanning the whole alphabet — zero pruning).
    // Any other type would cast to all-null doubles and silently collapse
    // its dimension to bucket 0 — fail loudly instead; bucket such types
    // into a numeric column first and cluster on that.
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
          dt == org.apache.spark.sql.types.StringType,
        s"z-order column '$c' must be numeric or string, got $dt; " +
          "bucket other types into a numeric column first")
    }
    val isStr = cols.map(c =>
      c -> (df.schema(c).dataType == org.apache.spark.sql.types.StringType)).toMap
    // Dictionary scale contract: the rank pass is one distinct + one
    // single-partition window over the DISTINCT SET — O(cardinality)
    // rows through one task, never O(corpus) — and the ranked dict joins
    // back via broadcast, so `maxDictSize` bounds both. A dimension past
    // the bound is a poor z-order key anyway (its per-file value spread
    // stays wide at any rank precision): pre-bucket it upstream.
    var work = df
    val strRank: Map[String, (String, Long)] =
      cols.filter(isStr).zipWithIndex.map { case (c, i) =>
        val dict = df.select(col(c)).where(col(c).isNotNull).distinct()
        val card = dict.count()
        require(card <= maxDictSize,
          s"z-order string column '$c' has $card distinct values " +
            s"(> maxDictSize=$maxDictSize): the dictionary rank would no " +
            "longer be driver/broadcast-bounded, and a dimension this wide " +
            "cannot cluster usefully — pre-bucket it into a numeric column " +
            "(e.g. a coarser category) or raise maxDictSize consciously")
        val rc = s"__zr_$i"
        val ranked = dict.withColumn(rc,
          (row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col(c))) - 1).cast("long"))
        // left join: a null string has no dict entry -> null rank ->
        // scaledBucket coalesces to bucket 0, same as the numeric path
        work = work.join(broadcast(ranked), Seq(c), "left")
        c -> (rc, card)
      }.toMap
    val numCols = cols.filterNot(isStr)
    val bounds =
      if (numCols.isEmpty) None
      else {
        val exprs = numCols.flatMap(c =>
          Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
        Some(df.agg(exprs.head, exprs.tail: _*).head())
      }
    val numIdx = numCols.zipWithIndex.toMap
    val buckets: Seq[Column] = cols.map { c =>
      strRank.get(c) match {
        case Some((rc, card)) =>
          LayoutFunctions.scaledBucket(col(rc), 0.0,
            math.max(card - 1L, 0L).toDouble, bits)
        case None =>
          val i = numIdx(c)
          val row = bounds.get
          val (lo, hi) =
            if (row.isNullAt(2 * i)) (0.0, 0.0) // all-null column -> bucket 0
            else (row.getDouble(2 * i), row.getDouble(2 * i + 1))
          LayoutFunctions.scaledBucket(col(c), lo, hi, bits)
      }
    }
    val n = if (files > 0) files else df.sparkSession.sessionState.conf.numShufflePartitions
    work.withColumn("__z", LayoutFunctions.interleaveBits(bits, buckets: _*))
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions(col("__z"))
      .select(df.columns.map(col).toIndexedSeq: _*) // drop __z + rank cols, restore column order
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
