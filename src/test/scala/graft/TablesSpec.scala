package graft

import java.nio.file.Files

/** The Tables relation cache's rewrite contract: repeat reads are served
  * from the cache (same analyzed DataFrame, same file index), and a
  * caller that overwrites a parquet dir mid-session must invalidate(path)
  * to see the rewrite — afterwards a fresh read reflects the new files.
  */
class TablesSpec extends SparkTestBase {

  test("invalidate(path) drops the cached relation so a rewrite is visible") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tablesspec").toString
    val p = s"$dir/t.parquet"
    Seq(1).toDF("x").write.parquet(p)

    val d1 = Tables.table(spark, dir, "t")
    assert(Tables.table(spark, dir, "t") eq d1, "repeat read must hit the cache")
    assert(d1.count() == 1)

    Seq(1, 2).toDF("x").write.mode("overwrite").parquet(p)
    Tables.invalidate(p)
    val d3 = Tables.table(spark, dir, "t")
    assert(!(d3 eq d1), "invalidate must evict the cached relation")
    assert(d3.count() == 2, "post-invalidate read must see the rewrite")

    // a whole-dir prefix invalidates every table under it
    Tables.invalidate(dir)
    assert(!(Tables.table(spark, dir, "t") eq d3))
  }
}
