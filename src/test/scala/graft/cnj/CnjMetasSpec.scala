package graft.cnj

import graft.SparkTestBase

/** Differential e2e: MetasJob over the committed fixture corpus must
  * reproduce the golden ResumoMetas computed by an independent pandas
  * re-implementation of the reference semantics
  * (scripts/gen_cnj_fixtures.py; SURVEY.md §5.2).
  */
class CnjMetasSpec extends SparkTestBase {

  private def readGolden(): (Array[String], Array[Array[String]]) = {
    val src = scala.io.Source.fromFile(resourcePath("cnj/golden_resumo.csv"), "UTF-8")
    try {
      val lines = src.getLines().toArray
      (lines.head.split(";", -1), lines.tail.map(_.split(";", -1)))
    } finally src.close()
  }

  test("resumo matches the golden differential output cell-for-cell") {
    val got = MetasJob.resumo(spark, resourcePath("cnj/dados"))
    val (gCols, gRows) = readGolden()
    assert(got.columns.toSeq == gCols.toSeq,
      s"column order: ${got.columns.toSeq} vs ${gCols.toSeq}")
    val rows = got.collect().map(r => (0 until r.length).map(i => r.getString(i)).toArray)
    assert(rows.length == gRows.length, "row count")
    rows.zip(gRows).foreach { case (a, e) =>
      gCols.indices.foreach { i =>
        assert(a(i) == e(i), s"court=${e(0)} col=${gCols(i)}: got ${a(i)} want ${e(i)}")
      }
    }
  }

  test("skips header-only and keyless files") {
    val data = Reader.readDir(spark, resourcePath("cnj/dados"))
    val siglas = data.select("sigla_tribunal").distinct().collect().map(_.getString(0)).toSet
    assert(!siglas.contains(null))
    assert(siglas.size == 11) // 13 files, 2 skipped
  }

  test("consolidado aligns drifting schemas with nulls") {
    val data = MetasJob.consolidado(spark, resourcePath("cnj/dados"))
    assert(data.columns.toSeq == CnjSchema.allCols)
    // TRT3 never had meta6 columns -> all null for that court
    val trt = data.filter(data("sigla_tribunal") === "TRT3")
    assert(trt.filter(trt("julgm6_a").isNotNull).count() == 0)
    assert(trt.filter(trt("julgm2_a").isNotNull).count() > 0)
  }

  test("chart data is numeric-only, sorted desc") {
    val res = MetasJob.resumo(spark, resourcePath("cnj/dados"))
    val chart = MetasJob.chartData(res).collect()
    assert(chart.nonEmpty)
    val vals = chart.map(_.getDouble(1))
    assert(vals.sameElements(vals.sortBy(-_.toDouble)))
    // TJBB's meta1 is NA -> excluded
    assert(!chart.map(_.getString(0)).contains("TJBB"))
  }
}
