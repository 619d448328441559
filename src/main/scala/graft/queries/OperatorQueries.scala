package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, DecimalType}

import graft.{QueryDef, Tables}
import graft.functions.LayoutFunctions
import graft.operators.Joins
import graft.sources.ScanPruning

/** Harness queries for the composed join operators (graft.operators.Joins)
  * — as-of, range (band), and salted joins — plus the z-order layout key.
  * Each oracle states the naive relational semantics (ASOF JOIN / range
  * predicate / plain equi-join / unrolled bit arithmetic); the Spark side
  * demonstrates the scale-shaped plan that computes the identical result.
  */
object OperatorQueries {

  private val Dec = DecimalType(18, 2)

  // ---- as-of join: each click matched to the user's latest view at or
  // before the click's timestamp. One shuffle (union + window), never a
  // per-row lookup or range cross-product.
  private def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    // right side deduped to one row per (user, ts) so tie-break semantics
    // are engine-independent
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"))
    Joins.asOf(clicks, views, key = "user_id", ts = "ts",
        leftId = "event_id", rightId = "view_id")
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        col("asof_view_id"))
      .orderBy(col("event_id"))
  }

  private val asofJoinSql =
    """WITH clicks AS (
      |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
      |), views AS (
      |  SELECT user_id, ts, MAX(event_id) AS view_id
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2
      |)
      |SELECT c.user_id, c.event_id,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
      |  v.view_id AS asof_view_id
      |FROM clicks c ASOF LEFT JOIN views v
      |  ON c.user_id = v.user_id AND v.ts <= c.ts
      |ORDER BY c.event_id""".stripMargin

  // ---- range (band) join: customers matched to overlapping balance bands.
  // Bucketed equi-join with bounded replication, not a nested-loop cross.
  private def rangeJoinBands(s: SparkSession, dir: String): DataFrame = {
    val bands = Tables.nation(s, dir).select(
      col("n_nationkey").as("band_id"),
      (col("n_nationkey") * 400).as("lo"),
      (col("n_nationkey") * 400 + 599).as("hi"))
    val pts = Tables.customer(s, dir).select(col("c_custkey"), col("c_acctbal"))
    Joins.rangeJoin(pts, bands, "c_acctbal", "lo", "hi", bucketWidth = 200)
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast(Dec)).cast(DoubleType).as("sum_bal"))
      .orderBy(col("band_id"))
  }

  private val rangeJoinBandsSql =
    """SELECT b.band_id, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer c
      |JOIN (SELECT n_nationkey AS band_id, n_nationkey * 400 AS lo,
      |             n_nationkey * 400 + 599 AS hi FROM nation) b
      |  ON c.c_acctbal >= b.lo AND c.c_acctbal <= b.hi
      |GROUP BY b.band_id ORDER BY b.band_id""".stripMargin

  // ---- salted join: lineitem x supplier with the supplier side replicated
  // 8-fold and the probe side split by a salt — identical result to the
  // plain equi-join (the oracle), hot keys spread over 8 reducers.
  private def saltedJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_quantity"))
    val supp = Tables.supplier(s, dir)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    Joins.saltedJoin(li, supp, key = "l_suppkey",
        salts = 8, saltSource = col("l_orderkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(Dec)).cast(DoubleType).as("sum_qty"))
      .orderBy(col("s_nationkey"))
  }

  private val saltedJoinAggSql =
    """SELECT s.s_nationkey, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |GROUP BY s.s_nationkey ORDER BY s.s_nationkey""".stripMargin

  // ---- z-order key: the native interleave_bits expression (the layout
  // primitive behind sources.Layout.zorderWrite — clustering quality is
  // measured structurally in ZOrderSpec; THIS query pins the key's bit
  // semantics against plain integer arithmetic). Output bit i*2+c = input
  // bit i of column c, replayed in the oracle as an unrolled shift/mask
  // sum — exact on any engine with two's-complement BIGINT ops.
  private def layoutZorder(s: SparkSession, dir: String): DataFrame = {
    val z = LayoutFunctions.interleaveBits(8,
      col("l_partkey") % 256, col("l_suppkey") % 256)
    Tables.lineitem(s, dir)
      .select(z.as("__z"), col("l_quantity"))
      .groupBy(shiftright(col("__z"), 8).as("z_bucket"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(Dec)).cast(DoubleType).as("sum_qty"))
      .orderBy(col("z_bucket"))
  }

  private val layoutZorderSql = {
    def bit(c: String, i: Int, pos: Int): String =
      s"((($c >> $i) & 1) << $pos)"
    val terms = (0 until 8).flatMap(i =>
      Seq(bit("x", i, 2 * i), bit("y", i, 2 * i + 1)))
    s"""WITH b AS (
       |  SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y, l_quantity
       |  FROM lineitem
       |), zd AS (
       |  SELECT ${terms.mkString(" + ")} AS z, l_quantity FROM b
       |)
       |SELECT (z >> 8) AS z_bucket, COUNT(*) AS n_items,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
       |FROM zd GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---- manifest-pruned scan (sources.ScanPruning): per-file min/max
  // manifest -> box intersection -> read only surviving files -> re-apply
  // the row filter. Pruning is transparent by contract, so the oracle is
  // the PLAIN filtered aggregate — a manifest bug that drops a needed
  // file (or double-reads one) changes counts and fails the hash. The
  // file-skipping effectiveness itself is structural, asserted in
  // ScanPruningSpec over a 32-file z-ordered layout.
  private def layoutPrunedScan(s: SparkSession, dir: String): DataFrame = {
    val data = s"$dir/lineitem.parquet"
    val manifest = ScanPruning.buildManifest(s, data,
      Seq("l_orderkey", "l_partkey"))
    val pruned = ScanPruning.prunedScan(s, data, manifest,
      ScanPruning.boxPredicate(Seq(
        ("l_orderkey", 100L, 5000L), ("l_partkey", 10L, 150L))))
    pruned
      .filter(col("l_orderkey").between(100, 5000) &&
        col("l_partkey").between(10, 150))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(Dec)).cast(DoubleType).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  private val layoutPrunedScanSql =
    """SELECT l_returnflag, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE l_orderkey BETWEEN 100 AND 5000 AND l_partkey BETWEEN 10 AND 150
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("asof_join", Some(asofJoinSql), asofJoin),
    QueryDef("range_join_bands", Some(rangeJoinBandsSql), rangeJoinBands),
    QueryDef("salted_join_agg", Some(saltedJoinAggSql), saltedJoinAgg),
    QueryDef("layout_zorder", Some(layoutZorderSql), layoutZorder),
    QueryDef("layout_pruned_scan", Some(layoutPrunedScanSql), layoutPrunedScan),
  )
}
