package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** File-level data skipping: manifest stats are exact, the pruned scan
  * reads only intersecting files (counted via inputFiles — structural,
  * not timed), and pruning is transparent to the query result.
  */
class ScanPruningSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val tmp = System.getProperty("java.io.tmpdir")
  private val zDir = s"$tmp/graft-test-prune-z"

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")
    .select("l_orderkey", "l_partkey", "l_quantity")

  private lazy val written: Unit =
    Layout.zorderWrite(li, zDir, Seq("l_orderkey", "l_partkey"),
      bits = 10, files = 32)

  test("manifest carries exact per-file min/max and row counts") {
    written
    val m = ScanPruning.buildManifest(spark, zDir, Seq("l_orderkey", "l_partkey"))
      .collect()
    assert(m.length === 32)
    assert(m.map(_.getAs[Long]("n_rows")).sum === li.count())
    // spot-check one file's stats against a direct read of that file
    val row = m.head
    val one = spark.read.parquet(row.getString(0))
      .agg(min("l_orderkey"), max("l_orderkey")).head()
    assert(row.getAs[Long]("l_orderkey_min") === one.getLong(0))
    assert(row.getAs[Long]("l_orderkey_max") === one.getLong(1))
  }

  test("pruned scan reads a fraction of the files and the same answer") {
    written
    val manifest = ScanPruning.buildManifest(spark, zDir,
      Seq("l_orderkey", "l_partkey"))
    val b = li.agg(min("l_orderkey"), max("l_orderkey"),
      min("l_partkey"), max("l_partkey")).head()
    val (oLo, oHi) = (b.getLong(0), b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2)
    val (pLo, pHi) = (b.getLong(2), b.getLong(2) + (b.getLong(3) - b.getLong(2)) / 8)

    val rowFilter = col("l_orderkey").between(oLo, oHi) &&
      col("l_partkey").between(pLo, pHi)
    val pruned = ScanPruning.prunedScan(spark, zDir, manifest,
      ScanPruning.boxPredicate(Seq(
        ("l_orderkey", oLo, oHi), ("l_partkey", pLo, pHi))))

    val nFiles = pruned.inputFiles.length
    assert(nFiles < 32 && nFiles <= 12,
      s"z-order + manifest should skip most files, read $nFiles of 32")

    val got = pruned.filter(rowFilter)
      .agg(count(lit(1)), sum("l_quantity")).head()
    val want = spark.read.parquet(zDir).filter(rowFilter)
      .agg(count(lit(1)), sum("l_quantity")).head()
    assert(got === want)
    assert(got.getLong(0) > 0, "box must be non-empty for the test to mean anything")
  }

  test("pruning is answer-transparent for random boxes (boundary property)") {
    written
    val manifest = ScanPruning.buildManifest(spark, zDir,
      Seq("l_orderkey", "l_partkey")).cache()
    val b = li.agg(min("l_orderkey"), max("l_orderkey"),
      min("l_partkey"), max("l_partkey")).head()
    val rnd = new scala.util.Random(7)
    (1 to 10).foreach { trial =>
      // random boxes, including degenerate (lo == hi) and full-range ones;
      // bounds land ON file min/max values often enough to catch an
      // exclusive-comparison bug at the box edge
      def range(lo: Long, hi: Long): (Long, Long) = {
        val a = lo + math.abs(rnd.nextLong()) % (hi - lo + 1)
        val c = lo + math.abs(rnd.nextLong()) % (hi - lo + 1)
        (math.min(a, c), math.max(a, c))
      }
      val (oLo, oHi) = range(b.getLong(0), b.getLong(1))
      val (pLo, pHi) = range(b.getLong(2), b.getLong(3))
      val rowFilter = col("l_orderkey").between(oLo, oHi) &&
        col("l_partkey").between(pLo, pHi)
      val pruned = ScanPruning.prunedScan(spark, zDir, manifest,
        ScanPruning.boxPredicate(Seq(
          ("l_orderkey", oLo, oHi), ("l_partkey", pLo, pHi))))
        .filter(rowFilter).agg(count(lit(1)), sum("l_quantity")).head()
      val full = spark.read.parquet(zDir).filter(rowFilter)
        .agg(count(lit(1)), sum("l_quantity")).head()
      assert(pruned === full,
        s"trial $trial box=($oLo,$oHi)x($pLo,$pHi): pruning changed the answer")
    }
    manifest.unpersist()
  }

  test("key blooms prune a hash layout that min/max boxes cannot; no false negatives") {
    val hDir = s"$tmp/graft-test-prune-hash"
    li.repartition(16, col("l_orderkey"))
      .write.mode("overwrite").parquet(hDir)
    val mPath = s"$tmp/graft-test-prune-hash-manifest"
    ScanPruning.writeManifest(spark, hDir, mPath,
      cols = Seq("l_orderkey"), bloomCols = Seq("l_orderkey"))
    val manifest = spark.read.parquet(mPath)
    // pick 3 real keys + 1 absent one
    val present = li.select("l_orderkey").distinct().orderBy("l_orderkey")
      .limit(3).collect().map(_.getLong(0)).toSeq
    val keys: Seq[Any] = present :+ -1L
    val pred = ScanPruning.keyLookupPredicate(spark, mPath, "l_orderkey", keys)
    val survivors = manifest.filter(pred).count()
    assert(survivors < 16, s"bloom should skip files on a hash layout, kept $survivors/16")
    // answer transparency: pruned scan + row filter == full scan + row filter
    val rowFilter = col("l_orderkey").isin(keys: _*)
    val got = ScanPruning.prunedScan(spark, hDir, manifest, pred)
      .filter(rowFilter).agg(count(lit(1)), sum("l_quantity")).head()
    val want = spark.read.parquet(hDir).filter(rowFilter)
      .agg(count(lit(1)), sum("l_quantity")).head()
    assert(got === want)
    assert(got.getLong(0) > 0, "present keys must be found (no false negatives)")
    // probe hash count is read back from the manifest, not guessed: a
    // manifest built with non-default k still probes correctly
    val m5Path = s"$tmp/graft-test-prune-hash-k3"
    ScanPruning.writeManifest(spark, hDir, m5Path,
      cols = Seq("l_orderkey"), bloomCols = Seq("l_orderkey"), bloomHashes = 3)
    val pred3 = ScanPruning.keyLookupPredicate(spark, m5Path, "l_orderkey", keys)
    val got3 = ScanPruning.prunedScan(spark, hDir, spark.read.parquet(m5Path), pred3)
      .filter(rowFilter).agg(count(lit(1)), sum("l_quantity")).head()
    assert(got3 === want)
  }

  test("empty intersection returns an empty frame with the data schema") {
    written
    val manifest = ScanPruning.buildManifest(spark, zDir, Seq("l_orderkey"))
    val out = ScanPruning.prunedScan(spark, zDir, manifest,
      ScanPruning.boxPredicate(Seq(("l_orderkey", -100L, -1L))))
    assert(out.count() === 0)
    assert(out.columns.toSeq === spark.read.parquet(zDir).columns.toSeq)
  }
}
