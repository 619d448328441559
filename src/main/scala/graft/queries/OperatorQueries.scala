package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, DecimalType}

import graft.{QueryDef, Tables}
import graft.operators.Joins

/** Harness queries for the composed join operators (graft.operators.Joins)
  * — as-of, range (band), and salted joins. Each oracle states the naive
  * relational semantics (ASOF JOIN / range predicate / plain equi-join);
  * the Spark side demonstrates the scale-shaped plan that computes the
  * identical result.
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

  val all: Seq[QueryDef] = Seq(
    QueryDef("asof_join", Some(asofJoinSql), asofJoin),
    QueryDef("range_join_bands", Some(rangeJoinBandsSql), rangeJoinBands),
    QueryDef("salted_join_agg", Some(saltedJoinAggSql), saltedJoinAgg),
  )
}
