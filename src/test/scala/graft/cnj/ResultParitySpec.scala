package graft.cnj

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.SparkTestBase

/** Locks the [[ResultParity]] contract the corpus-scale stream-vs-batch
  * bench enforces: byte-identical cells, EXCEPT numeric pairs within one
  * 2-dp rounding quantum (the float64-sum merge-order flip), which are
  * counted and bounded — and everything else is a hard diff.
  */
class ResultParitySpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("sigla_tribunal", StringType),
    StructField("ramo_justica", StringType),
    StructField("meta1", StringType),
    StructField("meta2a", StringType)))

  private def row(vals: String*): Row =
    new GenericRowWithSchema(vals.toArray[Any], schema)

  private val base = Seq(
    row("TJSP", "Justica Estadual", "101205.26", "88.5"),
    row("TRT1", "Justica do Trabalho", "NA", "73.17"))

  test("identical results: parity, zero diffs") {
    val r = ResultParity.compare(base, base.map(identity))
    assert(r.hardDiffs == 0 && r.boundaryCells == 0)
    assert(r.parity())
    assert(r.totalCells == 8)
  }

  test("one 0.01 flip is a counted boundary cell, not a hard diff") {
    val got = Seq(row("TJSP", "Justica Estadual", "101205.25", "88.5"), base(1))
    val r = ResultParity.compare(got, base)
    assert(r.hardDiffs == 0 && r.boundaryCells == 1)
    assert(r.parity())
    assert(r.details.exists(_.startsWith("boundary")))
  }

  test("a gap over one quantum is a hard diff") {
    val got = Seq(row("TJSP", "Justica Estadual", "101205.24", "88.5"), base(1))
    val r = ResultParity.compare(got, base)
    assert(r.hardDiffs == 1 && r.boundaryCells == 0)
    assert(!r.parity())
  }

  test("equal-value formatting drift is a hard diff, not a boundary flip") {
    // "88.5" vs "88.50": numeric diff 0 — formatting divergence between
    // the two computations, which merge-order rounding can never produce
    val got = Seq(row("TJSP", "Justica Estadual", "101205.26", "88.50"), base(1))
    val r = ResultParity.compare(got, base)
    assert(r.hardDiffs == 1 && r.boundaryCells == 0)
    assert(!r.parity())
  }

  test("sub-quantum value drift is a hard diff (only exact one-quantum " +
      "gaps are boundary flips)") {
    // 88.5 vs 88.503: |diff| = 0.003 < quantum — a genuinely different
    // number, not a bround-boundary flip (those differ by exactly 0.01)
    val got = Seq(row("TJSP", "Justica Estadual", "101205.26", "88.503"), base(1))
    val r = ResultParity.compare(got, base)
    assert(r.hardDiffs == 1 && r.boundaryCells == 0)
    assert(!r.parity())
  }

  test("NA vs a number is always a hard diff, even at tiny magnitude") {
    val got = Seq(base(0), row("TRT1", "Justica do Trabalho", "0.01", "73.17"))
    val r = ResultParity.compare(got, base)
    assert(r.hardDiffs == 1 && r.boundaryCells == 0)
    assert(!r.parity())
  }

  test("missing and extra groups are hard diffs") {
    val missing = ResultParity.compare(base.take(1), base)
    assert(missing.hardDiffs == 1 && !missing.parity())
    assert(missing.details.exists(_.startsWith("expected-only")))
    val extra = ResultParity.compare(
      base :+ row("STM", "Justica Militar da Uniao", "1.0", "2.0"), base)
    assert(extra.hardDiffs == 1 && !extra.parity())
    assert(extra.details.exists(_.startsWith("got-only")))
  }

  test("arity mismatch (schema drift) is a hard diff, not a crash") {
    val wide = StructType(schema.fields :+ StructField("meta4a", StringType))
    val got = Seq(
      new GenericRowWithSchema(
        Array[Any]("TJSP", "Justica Estadual", "101205.26", "88.5", "7.0"),
        wide),
      base(1))
    val r = ResultParity.compare(got, base)
    assert(r.hardDiffs == 1 && !r.parity())
    assert(r.details.exists(_.contains("arity mismatch")))
    // and the shared prefix is still compared: a flip there still counts
    val gotFlip = Seq(
      new GenericRowWithSchema(
        Array[Any]("TJSP", "Justica Estadual", "101205.25", "88.5", "7.0"),
        wide),
      base(1))
    val r2 = ResultParity.compare(gotFlip, base)
    assert(r2.hardDiffs == 1 && r2.boundaryCells == 1)
  }

  test("boundary flips above the 0.1% cap (min 1) break parity") {
    // 4 columns x 500 groups = 2000 cells; cap = max(1, 2) = 2
    val expected = (1 to 500).map(i =>
      row(s"TB$i", "Justica Estadual", "10.55", "20.55"))
    def flipped(n: Int) = expected.zipWithIndex.map { case (r, i) =>
      if (i < n) row(s"TB${i + 1}", "Justica Estadual", "10.54", "20.55") else r
    }
    assert(ResultParity.compare(flipped(2), expected).parity())
    val over = ResultParity.compare(flipped(3), expected)
    assert(over.hardDiffs == 0 && over.boundaryCells == 3 && !over.parity())
  }
}
