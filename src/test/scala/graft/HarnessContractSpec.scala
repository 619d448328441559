package graft

/** Locks the driver contract: entry smoke, registry/oracle key agreement,
  * and every registered query runnable end-to-end at the smallest sf.
  */
class HarnessContractSpec extends SparkTestBase {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle SQL without queries: $orphans")
    assert(qs.forall(_.matches("[a-z0-9_]+")))
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // the IVF oracles exist only after their queries run and pin the
  // centroid model; if pinning breaks, Verify would silently emit no
  // oracle for them and the driver would downgrade the check to
  // rows-only — this turns that silent downgrade into a test failure.
  // Each query is executed HERE (cheap at sf0.001) so the test is
  // order-independent, not parasitic on the smoke loop above.
  test("IVF queries pin their centroid model so their oracles materialize") {
    val dir = "/root/testdata/sf0.001"
    Seq("sim_topk_ivf", "sim_topk_ivf_pretrained", "sim_topk_batch",
        "dedup_semantic", "dedup_semantic_lowtau").foreach { n =>
      SparkEntry.queries(n)(spark, dir).count()
      // dir-hinted lookup, exactly as Verify/DumpOne resolve it: checks
      // the pin for the dir this test just ran, immune to other suites
      // in the same JVM having pinned the same query against another dir
      assert(SparkEntry.oracleSqlFor(Some(dir)).contains(n),
        s"$n has no oracle SQL after its query ran — centroid pinning broken")
    }
  }
}
