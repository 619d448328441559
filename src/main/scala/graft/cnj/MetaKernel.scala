package graft.cnj

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The ratio-of-sums meta kernel (`calcular_meta`,
  * /root/reference/Versao_Np.py:65-81) as pure Column builders — no UDFs,
  * so the whole computation stays inside whole-stage codegen and one
  * HashAggregate pass computes all 15 metas (SURVEY.md §2.4).
  *
  * Semantics reproduced:
  *  - a column "counts" only if it has >=1 non-null value in the group
  *    (the `notna().any()` guard; absent columns are all-null after
  *    canonical normalization, so the existence guard collapses into it);
  *  - NaN numerator -> NA; zero denominator -> NA; null factor -> NA;
  *  - round half-even to 2 decimals (Python round ~ Spark bround; exact
  *    .xx5 boundaries can differ because Python rounds the binary value
  *    while bround rounds the shortest decimal rendering — SURVEY.md §4.1);
  *  - NA is represented as null until the stringly output sink.
  */
object MetaKernel {

  private def sumc(c: String): Column = sum(col(c)).as(s"sum_$c")
  private def cntc(c: String): Column = count(col(c)).as(s"cnt_$c")

  /** Aggregate columns (sums + non-null counts) needed by every meta —
    * feed these into one groupBy(...).agg(...) call. */
  def aggColumns: Seq[Column] = {
    val cols = CnjSchema.numericCols
    cols.map(sumc) ++ cols.map(cntc)
  }

  private def present(c: String): Column = col(s"cnt_$c") > 0
  private def s(c: String): Column = col(s"sum_$c")

  /** calcular_meta(j, d, s, factor) over the pre-aggregated sums/counts. */
  def metaValue(spec: CnjSchema.MetaSpec, factor: Column): Column = {
    val num = s(spec.j)
    val den = s(spec.d) - s(spec.s)
    val raw = bround(num / den * factor, 2)
    val value = when(
      present(spec.j) && present(spec.d) && present(spec.s) &&
        !isnan(num) && den =!= 0 && factor.isNotNull && !isnan(factor),
      raw)
    // pandas: a NaN ratio survives round() and is stringified to 'NA'.
    when(value.isNotNull && !isnan(value), value)
  }

  /** Meta 1 (Versao_Np.py:171-208): denominator adds optional
    * dessobrestados (0 when the column is absent/all-null); factor 100. */
  def meta1Value: Column = {
    val num = s("julgados_2025")
    val dess = coalesce(s("dessobrestados_2025"), lit(0.0))
    val den = s("casos_novos_2025") + dess - s("suspensos_2025")
    val raw = bround(num / den * lit(100.0), 2)
    val value = when(
      present("julgados_2025") && present("casos_novos_2025") && present("suspensos_2025") &&
        !isnan(num) && den =!= 0,
      raw)
    when(value.isNotNull && !isnan(value), value)
  }

  /** STJ-only metas + suppression: when meta{8,10}_stj computed non-NA,
    * the a/b variants are blanked (Versao_Np.py:125-135). */
  def stjValue(spec: CnjSchema.MetaSpec): Column =
    when(col(Factors.fcol(spec.factorKey)).isNotNull,
      metaValue(spec, col(Factors.fcol(spec.factorKey))))

  def suppressIf(stjMeta: Column, variant: Column): Column =
    when(stjMeta.isNotNull, lit(null).cast(DoubleType)).otherwise(variant)
}
