package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing: assign every row a shard id so that
  * consecutive rows (in a caller-chosen total order) land in shards of
  * ~`budget` total weight — the layout step of a training-data pipeline
  * that turns a deduped corpus into fixed-token-budget shard files.
  *
  * shard = floor(exclusive-prefix-sum(weight) / budget): fixed token
  * OFFSETS, so a row may straddle a budget boundary into the next shard
  * but shard boundaries are pure arithmetic — reproducible by any engine
  * with a window cumsum (the oracle), independent of partitioning.
  *
  * SCALE: a global cumsum via `Window.orderBy(key)` (no partitionBy) is a
  * SINGLE-PARTITION sort — one task sees the whole corpus, the classic
  * 100 TB cliff. This is the two-phase prefix sum instead:
  *   1. range-repartition on the order key (global order across
  *      partitions, parallel within);
  *   2. per-partition subtotals — numParts longs — collected and
  *      scan-summed on the driver into exclusive partition offsets;
  *   3. per-partition window cumsum (parallel; partitioned by the range
  *      partition id) plus the broadcast offset literal.
  * The repartitioned frame is localCheckpoint-ed so phases 2 and 3 see
  * the SAME partitioning (range boundaries come from sampling; a
  * recomputation could re-sample and mis-align the offsets).
  */
object Packing {

  /** Adds `shard` (long) to `df`. `orderCol` must be a unique total order
    * (ties would make the cumsum — and so the packing — partition-order
    * dependent). `weight` is coerced to long, null -> 0; NEGATIVE weights
    * are rejected at evaluation time (raise_error in the same pass, no
    * extra scan): a negative running sum would also break the `div`
    * (truncate-toward-zero) vs SQL `//` (floor) equivalence the oracle
    * relies on — the two only agree on non-negative numerators. */
  def packShards(df: DataFrame, orderCol: Column, weight: Column,
      budget: Long, numParts: Int = 32): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = coalesce(weight.cast("long"), lit(0L))
    val base = df
      .withColumn("_w", when(w >= 0, w).otherwise(raise_error(
        concat(lit("packShards: negative weight "), w.cast("string")))))
      .repartitionByRange(numParts, orderCol)
      .withColumn("_pid", spark_partition_id())
      .transform(Compute.checkpointSer) // whole input rows: serialized storage
    val totals = base.groupBy(col("_pid")).agg(sum(col("_w")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids
      .zip(pids.scanLeft(0L)((acc, p) => acc + totals(p)).dropRight(1)).toMap
    val offCol =
      if (offsets.isEmpty) lit(0L) else element_at(typedLit(offsets), col("_pid"))
    val win = Window.partitionBy(col("_pid")).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("_cum", offCol + coalesce(sum(col("_w")).over(win), lit(0L)))
      .withColumn("shard", expr(s"_cum div ${budget}L"))
      .drop("_pid", "_w", "_cum")
  }
}
