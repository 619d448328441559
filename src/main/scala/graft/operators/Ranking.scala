package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-stratum global rank — the building block for exact
  * quantile bucketing over a full corpus (e.g. CCNet-style head/middle/
  * tail perplexity splits per language) without the classic cliff.
  *
  * `row_number() OVER (PARTITION BY stratum ORDER BY ...)` puts an entire
  * stratum into ONE task: at 100 TB a single language is most of the
  * corpus, so the window sort is a single-partition global sort. This is
  * the two-phase formulation instead (same shape as [[Packing.packShards]]):
  *
  *   1. range-repartition on (stratum, order...) — a global order across
  *      partitions, parallel sorting within each;
  *   2. per-(partition, stratum) row counts — numParts × |strata| longs —
  *      collected and prefix-summed on the driver into exclusive offsets
  *      (metadata-sized, like packShards' partition subtotals: the one
  *      legitimate driver collect);
  *   3. per-partition `row_number` (parallel; the window partition is the
  *      range-partition id × stratum, bounded by task size) plus the
  *      broadcast offset.
  *
  * The repartitioned frame is localCheckpoint-ed so phases 2 and 3 see the
  * SAME partitioning (range boundaries come from sampling; recomputation
  * could re-sample and mis-align the offsets).
  *
  * CARDINALITY CONTRACT: the offsets map is numParts × |strata| entries,
  * collected to the driver AND inlined into the plan as a typedLit — both
  * are fine for language-like strata (dozens to hundreds of values) but
  * become a driver-memory/plan-size cliff for a high-cardinality stratum
  * column (user id, url host). Rule of thumb: keep numParts × |strata|
  * under ~1e6 entries; above that, swap the literal map for a
  * broadcast-joined offsets DataFrame keyed (pid, stratum).
  */
object Ranking {

  // reserved internal column names — improbable enough that a caller
  // collision is a bug worth failing on (see require below)
  private val stCol = "_graft_stratum"
  private val pidCol = "_graft_pid"

  /** Adds `out` (long, 1-based rank within each value of `stratum`, in
    * `order`). `stratum` must be a non-null string column — ENFORCED at
    * the phase-2 collect (a null stratum would silently produce null
    * ranks: the driver-side offset key and the executor-side concat_ws
    * lookup key disagree on null rendering); `order` must be a total
    * order within each stratum (include a unique tie-break — ties would
    * make the rank partition-order dependent). The internal columns get
    * collision-proof names so caller columns survive untouched. */
  def stratifiedRank(df: DataFrame, stratum: Column, order: Seq[Column],
      numParts: Int = 32, out: String = "rnk"): DataFrame = {
    require(order.nonEmpty, "stratifiedRank needs at least one order column")
    require(!df.columns.contains(stCol) && !df.columns.contains(pidCol),
      s"stratifiedRank reserves columns $stCol/$pidCol")
    val base = df
      .withColumn(stCol, stratum.cast("string"))
      .repartitionByRange(numParts, (col(stCol) +: order): _*)
      .withColumn(pidCol, spark_partition_id())
      .transform(Compute.checkpointSer) // whole input rows (document text): serialized storage
    val counted = base.groupBy(col(pidCol), col(stCol))
      .agg(count(lit(1)).as("c"))
      .collect()
    counted.foreach(r => require(!r.isNullAt(1),
      "stratifiedRank: null stratum value — filter or fill nulls first"))
    val counts = counted.map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    // exclusive prefix per stratum over partition ids, keyed "pid|stratum"
    val offsets: Map[String, Long] = counts.keys.groupBy(_._2).flatMap {
      case (st, ks) =>
        val pids = ks.map(_._1).toSeq.sorted
        pids.zip(pids.scanLeft(0L)((acc, p) => acc + counts((p, st))).dropRight(1))
          .map { case (p, off) => s"$p|$st" -> off }
    }
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else element_at(typedLit(offsets), concat_ws("|", col(pidCol), col(stCol)))
    val win = Window.partitionBy(col(pidCol), col(stCol)).orderBy(order: _*)
    base
      .withColumn(out, offCol + row_number().over(win).cast("long"))
      .drop(pidCol, stCol)
  }
}
