package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

import graft.{QueryDef, Tables}

/** Data-quality operators — the validation layer a production pipeline
  * runs on every landed batch before anything downstream consumes it
  * (the shape popularized by declarative data-quality libraries:
  * per-column profiles and named constraint checks that gate the run).
  * Both queries are exact and fully SQL-expressible, so the oracles are
  * byte-for-byte.
  */
object QualityQueries {

  // ---- per-column profile --------------------------------------------
  //
  // One row per column of `orders`: null count, exact distinct count,
  // numeric min/max (null for non-numerics). Computed in ONE aggregate
  // pass — the multiple COUNT(DISTINCT) columns plan as a single Expand
  // + two-phase aggregate, so the table is scanned once however many
  // columns are profiled. Exact distincts are the oracle-checked form;
  // at 100 TB swap them for approx_count_distinct (the approx_distinct
  // query is that operator) and the plan loses the Expand entirely.
  private def profileColumns(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.orders(s, dir)
    val cols = t.schema.fields.toIndexedSeq
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nulls_${f.name}"),
        count_distinct(c).as(s"dist_${f.name}")) ++
        (f.dataType match {
          case _: NumericType => Seq(
            min(c).cast(DoubleType).as(s"min_${f.name}"),
            max(c).cast(DoubleType).as(s"max_${f.name}"))
          case _ => Seq.empty
        })
    }
    val wide = t.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { f =>
      val numeric = f.dataType.isInstanceOf[NumericType]
      struct(
        lit(f.name).as("col_name"),
        col(s"nulls_${f.name}").cast(LongType).as("n_nulls"),
        col(s"dist_${f.name}").cast(LongType).as("n_distinct"),
        (if (numeric) col(s"min_${f.name}") else lit(null).cast(DoubleType))
          .as("min_num"),
        (if (numeric) col(s"max_${f.name}") else lit(null).cast(DoubleType))
          .as("max_num"))
    }
    wide.select(explode(array(perCol: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }

  private val profileColumnsSql =
    """SELECT * FROM (
      |  SELECT 'o_orderkey' AS col_name,
      |    COUNT(*) - COUNT(o_orderkey) AS n_nulls,
      |    COUNT(DISTINCT o_orderkey) AS n_distinct,
      |    CAST(MIN(o_orderkey) AS DOUBLE) AS min_num,
      |    CAST(MAX(o_orderkey) AS DOUBLE) AS max_num FROM orders
      |  UNION ALL SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey),
      |    COUNT(DISTINCT o_custkey), CAST(MIN(o_custkey) AS DOUBLE),
      |    CAST(MAX(o_custkey) AS DOUBLE) FROM orders
      |  UNION ALL SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
      |    COUNT(DISTINCT o_orderstatus), NULL, NULL FROM orders
      |  UNION ALL SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
      |    COUNT(DISTINCT o_totalprice), CAST(MIN(o_totalprice) AS DOUBLE),
      |    CAST(MAX(o_totalprice) AS DOUBLE) FROM orders
      |  UNION ALL SELECT 'o_orderdate', COUNT(*) - COUNT(o_orderdate),
      |    COUNT(DISTINCT o_orderdate), NULL, NULL FROM orders
      |  UNION ALL SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
      |    COUNT(DISTINCT o_orderpriority), NULL, NULL FROM orders
      |) ORDER BY col_name""".stripMargin

  // ---- named constraint checks ---------------------------------------
  //
  // The batch gate: each row is one named invariant with its violation
  // count. EVERY check — including the referential one — rides a single
  // pass over the fact: a broadcast left join against the (pk-unique)
  // dimension tags each order with match/no-match, and one aggregate
  // computes all five violation counters. Adding a check adds a counter
  // to that aggregate, not a scan.
  private def qualityConstraints(s: SparkSession, dir: String): DataFrame =
    constraintReport(Tables.orders(s, dir), Tables.customer(s, dir))

  /** The check kernel on explicit frames — the harness feeds the real
    * tables (clean: the report proves all-zero), the spec feeds
    * corrupted copies (the report proves each counter fires). */
  private[queries] def constraintReport(o: DataFrame, c: DataFrame): DataFrame = {
    val wide = o
      .join(broadcast(c.select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(
        (count(lit(1)) - count_distinct(col("o_orderkey"))).cast(LongType)
          .as("pk_unique_orderkey"),
        sum(when(col("o_totalprice") < 0, 1L).otherwise(0L)).cast(LongType)
          .as("nonneg_totalprice"),
        sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
          .cast(LongType).as("domain_orderstatus"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).cast(LongType)
          .as("complete_custkey"),
        // no dimension match (a null o_custkey can never match — counted
        // here AND in completeness, mirroring the NOT EXISTS oracle)
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).cast(LongType)
          .as("fk_orders_customer"))
    val checks = wide.columns.toIndexedSeq.map(n =>
      struct(lit(n).as("check_name"), col(n).as("n_violations")))
    wide.select(explode(array(checks: _*)).as("c"))
      .select(col("c.check_name"), col("c.n_violations"),
        (col("c.n_violations") === 0L).as("pass"))
      .orderBy(col("check_name"))
  }

  private val qualityConstraintsSql =
    """WITH single AS (
      |  SELECT
      |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS pk_unique_orderkey,
      |    SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
      |      AS nonneg_totalprice,
      |    SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
      |      AS domain_orderstatus,
      |    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
      |      AS complete_custkey
      |  FROM orders
      |), fk AS (
      |  SELECT COUNT(*) AS fk_orders_customer FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                    WHERE c.c_custkey = o.o_custkey)
      |), checks AS (
      |  SELECT 'pk_unique_orderkey' AS check_name,
      |    CAST(pk_unique_orderkey AS BIGINT) AS n_violations FROM single
      |  UNION ALL SELECT 'nonneg_totalprice',
      |    CAST(nonneg_totalprice AS BIGINT) FROM single
      |  UNION ALL SELECT 'domain_orderstatus',
      |    CAST(domain_orderstatus AS BIGINT) FROM single
      |  UNION ALL SELECT 'complete_custkey',
      |    CAST(complete_custkey AS BIGINT) FROM single
      |  UNION ALL SELECT 'fk_orders_customer',
      |    CAST(fk_orders_customer AS BIGINT) FROM fk
      |)
      |SELECT check_name, n_violations, n_violations = 0 AS pass
      |FROM checks ORDER BY check_name""".stripMargin

  // ---- distribution drift between corpus snapshots (PSI) --------------
  //
  // The monitoring half of the refresh lifecycle (VersioningQueries is
  // the data half, over the same mod-7/mod-5 snapshot derivation): per
  // source, the Population Stability Index of the n_chars distribution —
  // PSI = sum_i (p_i - q_i) * ln(p_i / q_i) over B fixed-width buckets,
  // the standard shift alarm (rule of thumb: < 0.1 stable, > 0.25 act).
  //
  // Determinism contract: buckets are FIXED width (floor(n_chars/200),
  // capped at B-1) — never data-dependent quantiles — over the complete
  // source x [0, B) grid (a missing bucket still contributes through
  // smoothing); counts are Laplace-smoothed (+1 / +B) so ln never sees
  // zero and both engines divide the same exact rationals; each bucket
  // term is quantized to integer MICRO-nats before the per-source sum
  // (order-exact integer aggregation; same probabilistic 1-ulp libm
  // caveat as text_surprisal, here over only |sources| x B terms).
  //
  // Scale shape: two narrow (source, bucket) count aggregations over the
  // snapshots; everything after is |sources| x B rows joined against two
  // broadcast total maps.
  private val PsiBuckets = 16
  private val PsiWidth = 200

  private def psiBucketed(df: DataFrame): DataFrame =
    df.select(col("source"),
        least(floor(col("n_chars") / PsiWidth), lit(PsiBuckets - 1))
          .cast(LongType).as("bucket"))
      .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("cnt"))

  private def qualityDriftPsi(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    psiBySource(s, docs.filter(col("doc_id") % 7 =!= 0),
      docs.filter(col("doc_id") % 5 =!= 0),
      sources = docs.select(col("source")).distinct())
  }

  /** PSI of the n_chars distribution per source between two snapshots —
    * see the determinism/scale notes on the registry query above.
    * `sources` fixes the grid (a source absent from both snapshots
    * contributes 0). Exposed for direct testing. */
  def psiBySource(s: SparkSession, oldSnap: DataFrame, newSnap: DataFrame,
      sources: DataFrame): DataFrame = {
    val o = psiBucketed(oldSnap)
    val n = psiBucketed(newSnap)
    val grid = sources
      .crossJoin(s.range(PsiBuckets).select(col("id").as("bucket")))
    val counts = grid
      .join(o.withColumnRenamed("cnt", "cnt_o"), Seq("source", "bucket"), "left")
      .join(n.withColumnRenamed("cnt", "cnt_n"), Seq("source", "bucket"), "left")
      .na.fill(0L, Seq("cnt_o", "cnt_n"))
    val totals = counts.groupBy(col("source"))
      .agg(sum(col("cnt_o")).as("tot_o"), sum(col("cnt_n")).as("tot_n"))
    val B = lit(PsiBuckets)
    counts.join(broadcast(totals), "source")
      .withColumn("p", (col("cnt_o") + 1).cast(DoubleType) /
        (col("tot_o") + B).cast(DoubleType))
      .withColumn("q", (col("cnt_n") + 1).cast(DoubleType) /
        (col("tot_n") + B).cast(DoubleType))
      .withColumn("term_micro",
        round((col("p") - col("q")) * log(col("p") / col("q")) * lit(1000000))
          .cast(LongType))
      .groupBy(col("source"))
      .agg(sum(col("term_micro")).as("psi_micro"),
        max(col("tot_o")).as("n_old"), max(col("tot_n")).as("n_new"))
      .orderBy(col("source"))
  }

  private val qualityDriftPsiSql =
    """WITH o AS (
      |  SELECT source, LEAST(CAST(FLOOR(n_chars / 200) AS BIGINT), 15) AS bucket,
      |    COUNT(*) AS cnt_o
      |  FROM documents WHERE doc_id % 7 <> 0 GROUP BY 1, 2
      |), n AS (
      |  SELECT source, LEAST(CAST(FLOOR(n_chars / 200) AS BIGINT), 15) AS bucket,
      |    COUNT(*) AS cnt_n
      |  FROM documents WHERE doc_id % 5 <> 0 GROUP BY 1, 2
      |), grid AS (
      |  SELECT s.source, g.range AS bucket
      |  FROM (SELECT DISTINCT source FROM documents) s CROSS JOIN range(16) g
      |), counts AS (
      |  SELECT grid.source, grid.bucket,
      |    COALESCE(o.cnt_o, 0) AS cnt_o, COALESCE(n.cnt_n, 0) AS cnt_n
      |  FROM grid
      |  LEFT JOIN o ON grid.source = o.source AND grid.bucket = o.bucket
      |  LEFT JOIN n ON grid.source = n.source AND grid.bucket = n.bucket
      |), tot AS (
      |  SELECT source, SUM(cnt_o) AS tot_o, SUM(cnt_n) AS tot_n
      |  FROM counts GROUP BY 1
      |), terms AS (
      |  SELECT c.source,
      |    CAST(ROUND(
      |      (CAST(c.cnt_o + 1 AS DOUBLE) / CAST(t.tot_o + 16 AS DOUBLE)
      |        - CAST(c.cnt_n + 1 AS DOUBLE) / CAST(t.tot_n + 16 AS DOUBLE))
      |      * LN((CAST(c.cnt_o + 1 AS DOUBLE) / CAST(t.tot_o + 16 AS DOUBLE))
      |         / (CAST(c.cnt_n + 1 AS DOUBLE) / CAST(t.tot_n + 16 AS DOUBLE)))
      |      * 1000000) AS BIGINT) AS term_micro,
      |    t.tot_o, t.tot_n
      |  FROM counts c JOIN tot t ON c.source = t.source
      |)
      |SELECT source, CAST(SUM(term_micro) AS BIGINT) AS psi_micro,
      |  CAST(MAX(tot_o) AS BIGINT) AS n_old, CAST(MAX(tot_n) AS BIGINT) AS n_new
      |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin

  def all: Seq[QueryDef] = Seq(
    QueryDef("profile_columns", Some(profileColumnsSql), profileColumns),
    QueryDef("quality_constraints", Some(qualityConstraintsSql), qualityConstraints),
    QueryDef("quality_drift_psi", Some(qualityDriftPsiSql), qualityDriftPsi),
  )
}
