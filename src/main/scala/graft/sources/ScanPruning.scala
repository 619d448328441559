package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
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
  * - [[writeManifest]] / [[appendManifest]]: the persisted form. Stored
  *   manifests carry DECODED plain file paths (`input_file_name()`
  *   yields URL-encoded URIs — the same pitfall graft.cnj.Reader
  *   documents; feeding "%20" back to `spark.read.parquet` fails for any
  *   path with an encodable character). The decode runs on the driver
  *   over the O(files)-row result — the same bounded driver list every
  *   lakehouse manifest needs. appendManifest extends a stored manifest
  *   with ONE aggregate over just the new directory's files (O(batch),
  *   not an O(corpus) rescan), dropping any stale entries for that
  *   directory first so a replayed write is idempotent.
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
  * Composes with [[graft.operators.CorpusStore]]: the store maintains
  * its manifest incrementally across appends and rebuilds it on compact.
  *
  * Min/max boxes only prune CLUSTERED dimensions — on a hash-laid-out
  * corpus every file's box spans the whole key domain and nothing is
  * skipped. For key-equality lookups on such layouts the manifest can
  * instead carry a small per-file BLOOM FILTER per key column
  * (`bloomCols`): [[keyLookupPredicate]] probes each file's filter and a
  * point lookup opens ~(1 + fpp·files) files instead of all of them,
  * regardless of layout. No false negatives (a bloom never drops a file
  * that holds the key), and the same answer-transparency contract: the
  * caller re-applies the key filter on the surviving rows.
  */
object ScanPruning {

  /** Default per-file bloom size: 2^16 bits = 8 KB per file per column —
    * O(files) metadata (8 GB of blooms per MILLION files), sized for
    * ~10k distinct keys per file at ~1% fpp with 5 hashes. */
  val DefaultBloomBits: Int = 1 << 16
  val DefaultBloomHashes: Int = 5

  /** Per-file stats manifest: `file, n_rows, <c>_min, <c>_max` for each
    * stat column — plus, for each bloom column, `<c>_bloom` (the
    * serialized filter over xxhash64 of the column) and a constant
    * `bloom_k` column recording the hash count probes must reuse — from
    * one column-pruned scan of `dataDir`. The `file` column here is
    * `input_file_name()`'s raw (URL-encoded URI) form; the persisted
    * writers below decode it and [[prunedScan]] decodes defensively, so
    * both forms read back correctly. */
  def buildManifest(spark: SparkSession, dataDir: String,
      cols: Seq[String], bloomCols: Seq[String] = Nil,
      bloomBits: Int = DefaultBloomBits,
      bloomHashes: Int = DefaultBloomHashes): DataFrame = {
    require(cols.nonEmpty || bloomCols.nonEmpty,
      "need at least one stat or bloom column")
    val aggs = (count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))) ++
      bloomCols.map(c => graft.functions.HashFunctions
        .bloomAgg(xxhash64(col(c)), bloomBits, bloomHashes).as(s"${c}_bloom"))
    val m = spark.read.parquet(dataDir)
      .select(input_file_name().as("file") +: (cols ++ bloomCols).distinct.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
    if (bloomCols.isEmpty) m else m.withColumn("bloom_k", lit(bloomHashes))
  }

  /** Decode a manifest `file` entry to a plain filesystem path. Only
    * URI-shaped strings (a scheme prefix) are decoded — an
    * already-plain path containing a literal '%' must not be mangled. */
  private def decodePath(f: String): String =
    if (f.startsWith("file:") || f.contains("://"))
      graft.cnj.Reader.decodeFileUri(f)
    else f

  /** [[buildManifest]] with decoded driver-side rows — the persisted
    * form. O(files) rows pass the driver, nothing else. */
  private def decodedRows(spark: SparkSession, dataDir: String,
      cols: Seq[String], bloomCols: Seq[String] = Nil,
      bloomBits: Int = DefaultBloomBits,
      bloomHashes: Int = DefaultBloomHashes)
      : (Seq[Row], org.apache.spark.sql.types.StructType) = {
    val m = buildManifest(spark, dataDir, cols, bloomCols, bloomBits, bloomHashes)
    val rows = m.collect().toIndexedSeq
      .map(r => Row.fromSeq(decodePath(r.getString(0)) +: r.toSeq.tail))
    (rows, m.schema)
  }

  private def writeRows(spark: SparkSession, manifestPath: String,
      rows: Seq[Row], schema: org.apache.spark.sql.types.StructType): Unit = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.sortBy(_.getString(0)).asJava, schema)
      .coalesce(1) // metadata scale: O(files) rows
      .write.mode(SaveMode.Overwrite).parquet(manifestPath)
  }

  def writeManifest(spark: SparkSession, dataDir: String,
      manifestPath: String, cols: Seq[String], bloomCols: Seq[String] = Nil,
      bloomBits: Int = DefaultBloomBits,
      bloomHashes: Int = DefaultBloomHashes): Unit = {
    val (rows, schema) =
      decodedRows(spark, dataDir, cols, bloomCols, bloomBits, bloomHashes)
    writeRows(spark, manifestPath, rows, schema)
  }

  /** The stat columns a persisted manifest was built with, recovered
    * from its schema (`<c>_min` field order). */
  def manifestStatCols(spark: SparkSession, manifestPath: String): Seq[String] =
    spark.read.parquet(manifestPath).schema.fieldNames.toIndexedSeq
      .filter(_.endsWith("_min")).map(_.dropRight(4))

  /** The bloom columns a persisted manifest was built with (`<c>_bloom`
    * field order). */
  def manifestBloomCols(spark: SparkSession, manifestPath: String): Seq[String] =
    spark.read.parquet(manifestPath).schema.fieldNames.toIndexedSeq
      .filter(_.endsWith("_bloom")).map(_.dropRight(6))

  /** The (bloomBits, bloomHashes) a persisted manifest's filters were
    * built with — bits recovered from the serialized filter length, k
    * from the recorded `bloom_k` column — so incremental extensions and
    * rebuilds stay probe-compatible with the original entries. */
  private def manifestBloomConfig(spark: SparkSession, manifestPath: String,
      bloomCols: Seq[String]): (Int, Int) =
    if (bloomCols.isEmpty) (DefaultBloomBits, DefaultBloomHashes)
    else {
      val r = spark.read.parquet(manifestPath)
        .select(col(s"${bloomCols.head}_bloom"), col("bloom_k")).head()
      (r.getAs[Array[Byte]](0).length * 8, r.getInt(1))
    }

  /** Extend a stored manifest with the files of `newDir`: one aggregate
    * over JUST those files (O(batch)), merged with the existing entries
    * on the driver (O(files) rows). Entries already under `newDir` are
    * dropped first — a same-directory rewrite (e.g. a replayed
    * CorpusStore delta) replaces its stale file list instead of
    * accumulating pointers to deleted part files. Stat AND bloom columns
    * (with the original filters' size and hash count) are recovered from
    * the stored manifest, so the new entries stay probe-compatible. */
  def appendManifest(spark: SparkSession, manifestPath: String,
      newDir: String): Unit = {
    val existing = spark.read.parquet(manifestPath)
    val cols = manifestStatCols(spark, manifestPath)
    val bloomCols = manifestBloomCols(spark, manifestPath)
    require(cols.nonEmpty || bloomCols.nonEmpty,
      s"manifest at $manifestPath has no stat or bloom columns")
    val (bits, k) = manifestBloomConfig(spark, manifestPath, bloomCols)
    val prefix = new org.apache.hadoop.fs.Path(newDir).toUri.getPath
    val kept = existing.filter(!col("file").startsWith(prefix))
      .collect().toIndexedSeq
    val (added, schema) = decodedRows(spark, newDir, cols, bloomCols, bits, k)
    writeRows(spark, manifestPath, kept ++ added, schema)
  }

  /** Rebuild a stored manifest over `dataDir` with the SAME stat/bloom
    * configuration it was built with (recovered before the overwrite) —
    * the compaction-time refresh. */
  def rebuildManifest(spark: SparkSession, dataDir: String,
      manifestPath: String): Unit = {
    val cols = manifestStatCols(spark, manifestPath)
    val bloomCols = manifestBloomCols(spark, manifestPath)
    val (bits, k) = manifestBloomConfig(spark, manifestPath, bloomCols)
    // recovery above is eager (schema + one head()); safe to overwrite
    writeManifest(spark, dataDir, manifestPath, cols, bloomCols, bits, k)
  }

  /** Box-intersection predicate over a manifest: keep files whose
    * [min, max] overlaps [lo, hi] in EVERY listed column. */
  def boxPredicate(bounds: Seq[(String, Any, Any)]): Column =
    bounds.map { case (c, lo, hi) =>
      col(s"${c}_max") >= lit(lo) && col(s"${c}_min") <= lit(hi)
    }.reduce(_ && _)

  /** Key-equality predicate over a manifest with a `<c>_bloom` column:
    * keep files whose filter MAY contain any of `keys` (bounded,
    * driver-side literals — a point/small-IN lookup, not a join). No
    * false negatives, so pruning stays answer-transparent; expected
    * survivors ≈ (files holding a key) + fpp·files. The probe hash count
    * is read back from the manifest's `bloom_k`, so callers cannot drift
    * from the build-time configuration. */
  def keyLookupPredicate(spark: SparkSession, manifestPath: String,
      c: String, keys: Seq[Any]): Column = {
    require(keys.nonEmpty, "key lookup needs at least one key")
    val m = spark.read.parquet(manifestPath)
    require(m.schema.fieldNames.contains(s"${c}_bloom"),
      s"manifest at $manifestPath has no bloom for '$c' " +
        s"(build it with bloomCols = Seq(\"$c\"))")
    m.select(col("bloom_k")).limit(1).collect().headOption match {
      case None => lit(false) // empty manifest: nothing to keep
      case Some(r) =>
        val k = r.getInt(0)
        keys.map(v => graft.functions.HashFunctions
            .bloomMightContain(col(s"${c}_bloom"), xxhash64(lit(v)), k))
          .reduce(_ || _)
    }
  }

  /** Read only the files of `dataDir` whose manifest row satisfies
    * `keep`. The result is a plain DataFrame over the surviving files —
    * callers apply their row-level filter on top (the manifest prunes,
    * it never answers). An empty survivor set returns an empty frame
    * with the directory's schema. */
  def prunedScan(spark: SparkSession, dataDir: String,
      manifest: DataFrame, keep: Column): DataFrame = {
    val files = manifest.filter(keep)
      .select(col("file")).collect().map(r => decodePath(r.getString(0)))
    if (files.isEmpty) spark.read.parquet(dataDir).filter(lit(false))
    else spark.read.parquet(files.toIndexedSeq: _*)
  }
}
