package graft.cnj

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Unit tests for the NA-guard ladder of the meta kernel
  * (SURVEY.md §4 semantic traps 1-5).
  */
class MetaKernelSpec extends SparkTestBase {
  import spark.implicits._

  private def resumoFor(rows: Seq[(String, String, Option[Double], Option[Double], Option[Double], Option[Double])]) = {
    val df = rows.toDF("sigla_tribunal", "ramo_justica",
      "julgados_2025", "casos_novos_2025", "suspensos_2025", "dessobrestados_2025")
    val full = CnjSchema.numericCols
      .filterNot(CnjSchema.meta1Cols.contains)
      .foldLeft(df)((d, c) => d.withColumn(c, lit(null).cast("double")))
    MetasJob.resumoTyped(spark, full)
  }

  private def meta1Of(rows: Seq[(String, String, Option[Double], Option[Double], Option[Double], Option[Double])]): Option[Double] = {
    val r = resumoFor(rows).select("meta1").collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("meta1 happy path: sum(j)/(cn+dess-susp)*100, half-even 2dp") {
    // 30 / (40+10-30) * 100 = 150.0
    assert(meta1Of(Seq(
      ("T", "Justiça Estadual", Some(10.0), Some(20.0), Some(15.0), Some(5.0)),
      ("T", "Justiça Estadual", Some(20.0), Some(20.0), Some(15.0), Some(5.0)))) === Some(150.0))
  }

  test("meta1 zero denominator -> NA") {
    assert(meta1Of(Seq(("T", "Justiça Estadual", Some(10.0), Some(20.0), Some(30.0), Some(10.0)))).isEmpty)
  }

  test("meta1 all-null input column -> NA") {
    assert(meta1Of(Seq(("T", "Justiça Estadual", None, Some(20.0), Some(5.0), None))).isEmpty)
  }

  test("meta1 missing dessobrestados defaults to 0") {
    // 10/(20-5)*100 = 66.67 (banker's on .666..)
    assert(meta1Of(Seq(("T", "Justiça Estadual", Some(10.0), Some(20.0), Some(5.0), None))) === Some(66.67))
  }

  test("banker's rounding: bround on an exact decimal half goes to even") {
    val r = spark.range(1).select(bround(lit(2.125), 2), bround(lit(2.135), 2)).collect()(0)
    assert(r.getDouble(0) == 2.12 && r.getDouble(1) == 2.14)
  }

  test("factor fallback: labor court borrows JE 2b factor") {
    val df = Seq(("TRT9", "Justiça do Trabalho", Some(90.0), Some(10.0), Some(1.0)))
      .toDF("sigla_tribunal", "ramo_justica", "julgm2_b", "distm2_b", "suspm2_b")
    val full = CnjSchema.numericCols
      .filterNot(Set("julgm2_b", "distm2_b", "suspm2_b").contains)
      .foldLeft(df)((d, c) => d.withColumn(c, lit(null).cast("double")))
    val got = MetasJob.resumoTyped(spark, full).select("meta2b").collect()(0).getDouble(0)
    // 90/9 * (1000/9) = 1111.11
    assert(got == 1111.11)
  }

  test("unknown branch falls back to full JE factor set") {
    val df = Seq(("X1", "Justiça Lunar", Some(50.0), Some(11.0), Some(1.0)))
      .toDF("sigla_tribunal", "ramo_justica", "julgm10_b", "distm10_b", "suspm10_b")
    val full = CnjSchema.numericCols
      .filterNot(Set("julgm10_b", "distm10_b", "suspm10_b").contains)
      .foldLeft(df)((d, c) => d.withColumn(c, lit(null).cast("double")))
    val got = MetasJob.resumoTyped(spark, full).select("meta10b").collect()(0).getDouble(0)
    // 50/10 * (1000/10) = 500.0
    assert(got == 500.0)
  }

  test("superior-court remap: TST gets its own 2a factor") {
    val df = Seq(("TST", "Tribunais Superiores", Some(85.0), Some(11.0), Some(1.0)))
      .toDF("sigla_tribunal", "ramo_justica", "julgm2_a", "distm2_a", "suspm2_a")
    val full = CnjSchema.numericCols
      .filterNot(Set("julgm2_a", "distm2_a", "suspm2_a").contains)
      .foldLeft(df)((d, c) => d.withColumn(c, lit(null).cast("double")))
    val got = MetasJob.resumoTyped(spark, full).select("meta2a").collect()(0).getDouble(0)
    // 85/10 * (1000/8.5) = 1000.0
    assert(got == 1000.0)
  }
}
