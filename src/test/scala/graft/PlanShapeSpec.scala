package graft

/** Plan-shape regression guards: the physical plans that make these
  * queries scale are asserted, not assumed — a change that silently turns
  * a broadcast join into a sort-merge shuffle or drops a pushed filter
  * fails here before it costs anything on a cluster.
  */
class PlanShapeSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("dimension joins broadcast (never shuffle the fact side)") {
    Seq("join_inner_agg", "join_broadcast_dim", "q3_shipping_priority",
      "q5_local_supplier").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q must not sort-merge join:\n$p")
    }
  }

  test("top-k uses TakeOrderedAndProject, not a global sort") {
    Seq("sort_topk", "sim_topk_brute", "q3_shipping_priority").foreach { q =>
      assert(plan(q).contains("TakeOrderedAndProject"), s"$q plan")
    }
  }

  test("filters push into the parquet scans") {
    val p = plan("q3_shipping_priority")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate")
      || p.contains("GreaterThan(l_shipdate"), p)
    val c = plan("join_semi")
    assert(c.contains("PushedFilters"), c)
  }

  test("the meta-kernel aggregation is a single partial/final hash aggregate") {
    val p = plan("agg_ratio_kernel")
    val hashAggs = "HashAggregate".r.findAllIn(p).size
    // partial + final (+ possibly a sort for the orderBy) — but exactly
    // one exchange between them plus the final sort exchange
    assert(hashAggs >= 2, p)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected at most agg+sort exchanges:\n$p")
  }

  test("bucketed range join is an equi-join, not a nested-loop cross product") {
    val p = plan("range_join_bands")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$p")
  }

  test("blocked embedding near-dup never plans a nested-loop or cartesian join") {
    val p = plan("embed_neardup_blocked")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"tiled near-dup must stay an equi-join on tile ids:\n$p")
  }

  test("native expressions stay inside whole-stage codegen") {
    val df = SparkEntry.queries("dedup_simhash")(spark, sf)
    df.collect() // let AQE finalize the stages
    // codegen'd operators carry the "*(stageId)" marker in the simple plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p)
    assert(p.contains("simhash64"), p)
  }
}
