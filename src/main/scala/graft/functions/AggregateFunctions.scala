package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge, MisraGries, TopKByScore}

/** Custom aggregate functions backed by native TypedImperativeAggregates. */
object AggregateFunctions {

  /** Top-k payload ids per group by descending score (ties -> smaller
    * payload), as an array<long>. O(k) state per group, partial-aggregated
    * map-side — the grouped/streaming top-k that a window rank would
    * otherwise compute with a full per-group sort. */
  def topKBy(score: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score),
        ColumnBridge.expression(payload), k).toAggregateExpression())

  /** Misra-Gries heavy-hitters summary: array<struct<item, cnt>> ordered
    * (cnt desc, item), at most `capacity` entries of state anywhere in
    * the plan. Estimates are within n/capacity of the true counts, and
    * exact while distinct items <= capacity. */
  def heavyHitters(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(item), capacity).toAggregateExpression())
}
