package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

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

  test("drift PSI: identical snapshots score ~0; a planted shift raises one source only") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1 to 4000).map { i =>
      val src = s"s${i % 4}"
      (i.toLong, src, 100L + rnd.nextInt(3000).toLong)
    }.toDF("doc_id", "source", "n_chars")
    val sources = docs.select(col("source")).distinct()

    // identical snapshots: every term is (p-p)*ln(1) = 0 exactly
    val same = QualityQueries.psiBySource(spark, docs, docs, sources)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(same.values.forall(_ == 0L), same)

    // shift: s0 loses all long docs in the new snapshot; others untouched
    val shifted = docs.filter(!(col("source") === "s0" && col("n_chars") > 1000))
    val psi = QualityQueries.psiBySource(spark, docs, shifted, sources)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // PSI in micro-nats: > 0.25 (the act threshold) for the shifted
    // source, well under 0.1 for the untouched ones
    assert(psi("s0") > 250000L, s"shifted source must alarm: $psi")
    Seq("s1", "s2", "s3").foreach(k =>
      assert(math.abs(psi(k)) < 100000L, s"$k should be stable: $psi"))
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
