package graft.cnj

import org.apache.spark.sql.Row

/** Cell-level parity compare for two stringly CNJ result sets keyed by
  * (sigla_tribunal, ramo_justica) — the contract `CnjStreamBench`
  * enforces between the streaming and batch Resumo at corpus scale.
  *
  * Byte-identical everywhere EXCEPT numeric cell pairs within one
  * rounding quantum (default 0.01): the meta kernel sums float64 (the
  * reference's pandas semantics — an exact-decimal sum would diverge
  * from the pinned goldens), double addition is not associative, so two
  * executions that merge partial aggregates in different orders can land
  * a sum one ulp apart; when that sum sits exactly on a 2-dp `bround`
  * boundary the printed cell flips by 0.01. This is partitioning
  * nondeterminism, not a streaming defect — two BATCH runs at different
  * partition counts can differ the same way. Boundary flips are counted
  * and bounded (default ≤0.1% of cells, min 1), never silently ignored;
  * any other difference — 'NA' vs a number, a gap over one quantum, a
  * missing or extra group — is a hard diff and fails parity.
  */
object ResultParity {

  final case class Report(hardDiffs: Int, boundaryCells: Int,
      totalCells: Long, details: Seq[String]) {
    def parity(maxBoundaryFrac: Double = 0.001): Boolean =
      hardDiffs == 0 &&
        boundaryCells <= math.max(1L, (totalCells * maxBoundaryFrac).toLong)
  }

  private def num(s: Any): Option[Double] = s match {
    case v: String => v.toDoubleOption
    case _ => None
  }

  /** Compare `got` against `expected`; both must be stringly rows whose
    * first two columns are the (sigla, ramo) identity. */
  def compare(got: Seq[Row], expected: Seq[Row],
      quantum: Double = 0.01): Report = {
    val key = (r: Row) => (r.getString(0), r.getString(1))
    val em = expected.map(r => key(r) -> r).toMap
    var hard = 0
    var boundary = 0
    val details = Seq.newBuilder[String]
    got.foreach { g =>
      em.get(key(g)) match {
        case None =>
          hard += 1
          details += s"got-only group ${key(g)}"
        case Some(e) =>
          // schema drift between the two sides (a column added/dropped
          // on one) is exactly what a parity checker must surface, not
          // crash on or silently truncate past
          if (g.length != e.length) {
            hard += 1
            details += s"HARD ${key(g)} arity mismatch: " +
              s"got ${g.length} columns, expected ${e.length}"
          }
          (0 until math.min(g.length, e.length)).foreach { i =>
            if (g.get(i) != e.get(i)) {
              val isBoundary = (num(g.get(i)), num(e.get(i))) match {
                // a rounding-boundary flip is EXACTLY one quantum apart —
                // bround landed the one-ulp-different sum on the other
                // side of the .xx5 line. Epsilon both ways: the quantum
                // is a decimal that doubles represent inexactly; one part
                // in 10^4 is far below the next representable cell gap.
                // Anything else is a hard diff, including |x-y| = 0 with
                // different strings ("88.5" vs "88.50" is formatting
                // divergence, not merge-order rounding) and sub-quantum
                // value drift (a genuinely different computation).
                case (Some(x), Some(y)) =>
                  val d = math.abs(x - y)
                  quantum * 0.9999 <= d && d <= quantum * 1.0001
                case _ => false
              }
              if (isBoundary) boundary += 1 else hard += 1
              details += s"${if (isBoundary) "boundary" else "HARD"} " +
                s"${key(g)} col=${g.schema.fieldNames(i)}: " +
                s"got=${g.get(i)} expected=${e.get(i)}"
            }
          }
      }
    }
    (em.keySet -- got.map(key)).foreach { k =>
      hard += 1; details += s"expected-only group $k"
    }
    val total = got.length.toLong * (if (got.isEmpty) 0 else got.head.length)
    // a row-count mismatch must never read as parity even if every
    // present group matched
    if (got.length != expected.length && hard == 0) hard += 1
    Report(hard, boundary, total, details.result())
  }
}
