package graft.operators

import org.apache.spark.sql.DataFrame

/** Compute-budget partitioning (SCALE.md §9): when per-row compute
  * dominates, partition count comes from the compute budget, not the
  * file layout — but never DOWN. An unconditional
  * `repartition(defaultParallelism)` would collapse a wide scan (at
  * 100 TB, tens of thousands of splits) to core-count giant tasks —
  * the inverse of the small-file cliff it exists to fix. So the
  * round-robin shuffle is applied only when the input is narrower than
  * the budget; an already-wide frame passes through untouched, which
  * also skips the shuffle entirely.
  */
object Compute {
  def toComputeBudget(df: DataFrame): DataFrame = {
    val budget = df.sparkSession.sparkContext.defaultParallelism
    // .rdd plans the physical query to read its partitioning; no job runs
    if (df.rdd.getNumPartitions < budget) df.repartition(budget) else df
  }
}
