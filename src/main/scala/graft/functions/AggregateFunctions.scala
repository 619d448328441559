package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge, TopKByScore}

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
}
