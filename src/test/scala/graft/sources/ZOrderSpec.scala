package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctionRegistry

import graft.SparkTestBase
import graft.functions.LayoutFunctions

/** Z-order layout: the native interleave_bits expression against a plain-
  * Scala model, and the layout claim itself measured the load-immune way —
  * parquet footer min/max statistics, counted, not timed: under z-order a
  * 2-D box predicate must intersect far fewer row groups than under a
  * lexicographic sort of either single column.
  */
class ZOrderSpec extends SparkTestBase {

  GraftFunctionRegistry.register(spark)

  private val sf = "/root/testdata/sf0.001"
  private val tmp = System.getProperty("java.io.tmpdir")

  private def model(vals: Seq[Long], bits: Int): Long = {
    val mask = (1L << bits) - 1L
    var z = 0L
    for (c <- vals.indices; i <- 0 until bits)
      z |= (((vals(c) & mask) >>> i) & 1L) << (i * vals.size + c)
    z
  }

  test("interleave_bits matches the plain-Scala model (codegen path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(500)((rnd.nextLong(), rnd.nextLong(), rnd.nextLong()))
    for (bits <- Seq(1, 4, 8, 16)) {
      val got = rows.toDF("x", "y", "z")
        .select(col("x"), col("y"), col("z"),
          LayoutFunctions.interleaveBits(bits, col("x"), col("y")).as("z2"),
          LayoutFunctions.interleaveBits(bits, col("x"), col("y"), col("z")).as("z3"))
        .collect()
      got.foreach { r =>
        assert(r.getLong(3) === model(Seq(r.getLong(0), r.getLong(1)), bits))
        assert(r.getLong(4) === model(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), bits))
      }
    }
  }

  test("interleave_bits: null propagates, ints cast, SQL name matches Column API") {
    import spark.implicits._
    val df = Seq((Some(3), 5), (None, 7)).toDF("x", "y")
    val got = df.select(LayoutFunctions.interleaveBits(4, col("x"), col("y"))).collect()
    assert(got(0).getLong(0) === model(Seq(3L, 5L), 4))
    assert(got(1).isNullAt(0))
    val viaSql = spark.sql("SELECT interleave_bits(3, 5, 4)").head().getLong(0)
    assert(viaSql === model(Seq(3L, 5L), 4))
  }

  test("interleave_bits under forced codegen and forced interpretation") {
    import spark.implicits._
    val df = Seq((12345L, 67890L)).toDF("x", "y")
    def run(): Long =
      df.select(LayoutFunctions.interleaveBits(12, col("x"), col("y")))
        .head().getLong(0)
    val expected = model(Seq(12345L, 67890L), 12)
    // no silent whole-stage fallback: a codegen compile error must throw
    val prevFb = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try assert(run() === expected)
    finally spark.conf.set("spark.sql.codegen.fallback", prevFb)
    // and the interpreted eval agrees
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val prevWs = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() === expected)
    finally {
      prevMode.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      spark.conf.set("spark.sql.codegen.wholeStage", prevWs)
    }
  }

  test("interleave_bits rejects over-wide keys") {
    intercept[IllegalArgumentException] {
      LayoutFunctions.interleaveBits(32, lit(1L), lit(2L))
    }
  }

  test("zorderWrite rejects non-numeric non-string clustering columns") {
    import spark.implicits._
    val df = Seq((1L, true)).toDF("k", "flag")
    val e = intercept[IllegalArgumentException] {
      Layout.zorderWrite(df, s"$tmp/graft-test-z-reject", Seq("k", "flag"), bits = 4)
    }
    assert(e.getMessage.contains("flag"))
    assert(e.getMessage.contains("numeric or string"))
  }

  test("zorderWrite refuses a string dimension past the dictionary bound") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"v_$i")).toDF("k", "s")
    val e = intercept[IllegalArgumentException] {
      Layout.zorderWrite(df, s"$tmp/graft-test-z-dict-reject", Seq("k", "s"),
        bits = 4, maxDictSize = 10L)
    }
    assert(e.getMessage.contains("distinct values"), e.getMessage)
    assert(e.getMessage.contains("pre-bucket"), e.getMessage)
  }

  test("scaledBucket maps bounds into [0, 2^bits) with nulls at 0") {
    import spark.implicits._
    val df = Seq[java.lang.Double](0.0, 50.0, 100.0, null).toDF("v")
    val got = df.select(LayoutFunctions.scaledBucket(col("v"), 0.0, 100.0, 4))
      .collect().map(r => r.getLong(0))
    assert(got(0) === 0L)
    assert(got(1) === 8L)
    assert(got(2) === 15L) // hi clamps into the top bucket
    assert(got(3) === 0L)
  }

  /** Per row group: (min, max) of the two int64 columns, from footers. */
  private def rowGroupBoxes(dir: String, colA: String, colB: String)
      : Seq[((Long, Long), (Long, Long))] = {
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0).toSeq
      .flatMap { f =>
        val in = HadoopInputFile.fromPath(new Path(f.getPath), conf)
        val reader = ParquetFileReader.open(in)
        try {
          reader.getFooter.getBlocks.asScala.toSeq.map { b =>
            val stats = b.getColumns.asScala
              .map(c => c.getPath.toDotString -> c.getStatistics).toMap
            def box(c: String): (Long, Long) = {
              val s = stats(c)
              (s.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                s.genericGetMax.asInstanceOf[java.lang.Long].longValue())
            }
            (box(colA), box(colB))
          }
        } finally reader.close()
      }
  }

  private def intersecting(boxes: Seq[((Long, Long), (Long, Long))],
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): Int =
    boxes.count { case ((amin, amax), (bmin, bmax)) =>
      amax >= aLo && amin <= aHi && bmax >= bLo && bmin <= bHi
    }

  /** Per row group: (min, max) of a string column + a long column. */
  private def strLongBoxes(dir: String, strCol: String, longCol: String)
      : Seq[((String, String), (Long, Long))] = {
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0).toSeq
      .flatMap { f =>
        val in = HadoopInputFile.fromPath(new Path(f.getPath), conf)
        val reader = ParquetFileReader.open(in)
        try {
          reader.getFooter.getBlocks.asScala.toSeq.map { b =>
            val stats = b.getColumns.asScala
              .map(c => c.getPath.toDotString -> c.getStatistics).toMap
            val s = stats(strCol)
            val l = stats(longCol)
            ((s.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
                .toStringUsingUTF8,
              s.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
                .toStringUsingUTF8),
              (l.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                l.genericGetMax.asInstanceOf[java.lang.Long].longValue()))
          }
        } finally reader.close()
      }
  }

  test("z-order with a STRING dimension: dictionary rank clusters it, " +
    "row-group boxes prune, content unchanged") {
    import spark.implicits._
    // 40 sources x uniform long key — the (source, key) shape a corpus
    // actually clusters by; zero-padded names make lexicographic order
    // the intended order
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(20000)(
      (f"src_${rnd.nextInt(40)}%02d", math.abs(rnd.nextLong()) % 100000L,
        rnd.nextInt(1000)))
    val df = rows.toDF("source", "k", "v")
    val zDir = s"$tmp/graft-test-z-string"
    val rrDir = s"$tmp/graft-test-z-string-rr"
    Layout.zorderWrite(df, zDir, Seq("source", "k"), bits = 8, files = 32)
    // baseline: same data, same file count, no clustering (round-robin)
    df.repartition(32).write.mode("overwrite").parquet(rrDir)

    // content identical up to order (the rank join must be 1:1)
    val back = spark.read.parquet(zDir)
    assert(back.columns.toSeq === df.columns.toSeq)
    assert(back.count() === df.count())
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)

    // box predicate: first 10 of 40 sources x first quarter of the key
    // range (~1/16 of the plane)
    def hits(boxes: Seq[((String, String), (Long, Long))]): Int =
      boxes.count { case ((smin, smax), (kmin, kmax)) =>
        smax >= "src_00" && smin <= "src_09" && kmax >= 0L && kmin <= 25000L
      }
    val zBoxes = strLongBoxes(zDir, "source", "k")
    val rrBoxes = strLongBoxes(rrDir, "source", "k")
    assert(zBoxes.size >= 16, s"want many row groups, got ${zBoxes.size}")
    val (zHit, rrHit) = (hits(zBoxes), hits(rrBoxes))
    // unclustered: every row group spans all sources and the whole key
    // range, so nothing prunes; dictionary-rank z-order must skip most
    assert(rrHit === rrBoxes.size,
      s"baseline sanity: round-robin boxes should all intersect ($rrHit/${rrBoxes.size})")
    assert(zHit * 2 <= zBoxes.size,
      s"string-dim z-order should prune at least half: $zHit of ${zBoxes.size}")
    info(s"string-dim pruning: $zHit of ${zBoxes.size} row groups survive " +
      s"(round-robin baseline ${rrHit}/${rrBoxes.size})")
  }

  test("z-order clusters both dimensions: 2-D box prunes row groups a 1-D sort cannot") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val zDir = s"$tmp/graft-test-zorder"
    val linDir = s"$tmp/graft-test-linear"
    Layout.zorderWrite(li, zDir, Seq("l_orderkey", "l_partkey"),
      bits = 10, files = 32)
    // baseline: the best single-column layout for this query — sorted by
    // one of the two predicated columns
    li.repartitionByRange(32, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(linDir)

    // content identical up to order
    val back = spark.read.parquet(zDir)
    assert(back.count() === li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)

    // box: ~half the orderkey range x ~1/8 of the partkey range
    val b = li.agg(min("l_orderkey"), max("l_orderkey"),
      min("l_partkey"), max("l_partkey")).head()
    val (oLo, oHi) = (b.getLong(0), b.getLong(1))
    val (pLo, pHi) = (b.getLong(2), b.getLong(3))
    val (qaLo, qaHi) = (oLo, oLo + (oHi - oLo) / 2)
    val (qbLo, qbHi) = (pLo, pLo + (pHi - pLo) / 8)

    val zBoxes = rowGroupBoxes(zDir, "l_orderkey", "l_partkey")
    val linBoxes = rowGroupBoxes(linDir, "l_orderkey", "l_partkey")
    assert(zBoxes.size >= 16 && linBoxes.size >= 16,
      s"want many row groups to make pruning measurable, " +
        s"got ${zBoxes.size} / ${linBoxes.size}")

    val zHit = intersecting(zBoxes, qaLo, qaHi, qbLo, qbHi)
    val linHit = intersecting(linBoxes, qaLo, qaHi, qbLo, qbHi)
    // the 1-D sort serves only its own column: every group in the orderkey
    // half survives (partkey min/max spans the whole range in each), so
    // ~half the groups. Z-order additionally prunes on partkey: the box
    // covers ~1/16 of the plane; allow generous curve overhead.
    assert(zHit * 2 <= linHit,
      s"z-order should at least halve the surviving row groups: " +
        s"z=$zHit lin=$linHit of ${zBoxes.size}/${linBoxes.size}")
    assert(zHit.toDouble / zBoxes.size <= 0.35,
      s"z-order should prune most groups for a 1/16-area box: " +
        s"$zHit of ${zBoxes.size}")

    // and the pruning is real at scan level too: the same predicate
    // reaches the parquet reader as a pushed filter
    val scan = spark.read.parquet(zDir)
      .filter(col("l_orderkey").between(qaLo, qaHi) &&
        col("l_partkey").between(qbLo, qbHi))
    val leaf = scan.queryExecution.executedPlan.collectLeaves().head.toString
    assert(leaf.contains("PushedFilters") && leaf.contains("l_partkey"),
      s"expected pushed filters in scan:\n$leaf")
  }
}
