package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge, InterleaveBits}

/** Data-layout keys: space-filling-curve ordering for multi-dimensional
  * parquet row-group pruning (see sources.Layout.zorderWrite).
  */
object LayoutFunctions {

  /** Morton / Z-order key: interleave the low `bits` bits of each column
    * (long buckets; output bit `i*N + c` = input bit `i` of column `c`).
    * Total over any long input — values are masked to `bits` bits, so
    * callers bucket however they like (modulo, min/max scale, ntile). */
  def interleaveBits(bits: Int, cols: Column*): Column =
    ColumnBridge.column(
      InterleaveBits(cols.map(ColumnBridge.expression), bits))

  /** Min/max-scaled bucket in [0, 2^bits): the standard continuous->z
    * bucketizer. `lo`/`hi` are the column's (pre-computed) bounds; values
    * at `hi` land in the top bucket, nulls in bucket 0 (they would sort
    * first anyway). Double math — layout only, never a correctness
    * surface. */
  def scaledBucket(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val buckets = (1L << bits).toDouble
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    least(
      greatest(floor((coalesce(c.cast("double"), lit(lo)) - lit(lo))
        / lit(span) * lit(buckets)), lit(0L)),
      lit((1L << bits) - 1L)).cast("long")
  }
}
