package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-domain modules; every operator family in
  * SURVEY.md §2 (plus the beyond-reference training-data operators) has a
  * named entry here, with DuckDB oracle SQL wherever the semantics are
  * ANSI-SQL-expressible.
  */
object SparkEntry {

  private def modules: Seq[QueryDef] =
    graft.queries.StarQueries.all ++
      graft.queries.TextQueries.all ++
      graft.queries.SimilarityQueries.all ++
      graft.queries.OperatorQueries.all ++
      graft.queries.EventQueries.all ++
      graft.queries.MediaQueries.all ++
      graft.queries.CurationQueries.all ++
      graft.queries.QualityQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_ratio_kernel")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
