package graft.queries

import java.sql.Timestamp

import graft.SparkTestBase

/** The harness tables are clean, so quality_constraints' oracle check
  * proves the all-zero report; this spec proves each counter actually
  * FIRES by feeding corrupted frames through the same kernel.
  */
class QualitySpec extends SparkTestBase {

  private def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")

  test("every constraint counter fires on a corrupted batch") {
    import spark.implicits._
    val orders = Seq(
      // (orderkey, custkey, status, totalprice, orderdate, priority)
      (1L, Some(10L), "O", 100.0, ts("2025-01-01"), "1-URGENT"),
      (1L, Some(10L), "F", 200.0, ts("2025-01-02"), "2-HIGH"), // dup pk
      (2L, Some(99L), "O", 300.0, ts("2025-01-03"), "3-MEDIUM"), // orphan fk
      (3L, None, "F", 400.0, ts("2025-01-04"), "4-LOW"), // null custkey
      (4L, Some(11L), "X", -5.0, ts("2025-01-05"), "5-LOW")) // bad status + neg
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val customer = Seq(10L, 11L).toDF("c_custkey")

    val report = QualityQueries.constraintReport(orders, customer)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap

    assert(report("pk_unique_orderkey") == (1L, false)) // one extra copy of pk 1
    assert(report("nonneg_totalprice") == (1L, false))  // order 4
    assert(report("domain_orderstatus") == (1L, false)) // status X
    assert(report("complete_custkey") == (1L, false))   // order 3
    // orphan 99 + null custkey both fail the fk match (NOT EXISTS semantics)
    assert(report("fk_orders_customer") == (2L, false))
  }

  test("a clean batch reports all-pass") {
    import spark.implicits._
    val orders = Seq(
      (1L, Some(10L), "O", 100.0, ts("2025-01-01"), "1-URGENT"),
      (2L, Some(11L), "F", 200.0, ts("2025-01-02"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val customer = Seq(10L, 11L).toDF("c_custkey")
    val report = QualityQueries.constraintReport(orders, customer).collect()
    assert(report.length == 5)
    assert(report.forall(_.getBoolean(2)), report.mkString(";"))
    assert(report.forall(_.getLong(1) == 0L))
  }
}
