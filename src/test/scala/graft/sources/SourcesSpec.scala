package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

class SourcesSpec extends SparkTestBase {

  private def tmpFile(name: String, content: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft-src-spec", name)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    p.toString
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType),
    StructField("s", StringType)))

  test("csvTolerant drops malformed lines, keeps parseable ones") {
    val path = tmpFile("a.csv",
      "id,v,s\n1,1.5,x\nnot,a,number,extra,cols\n2,2.5,y\n")
    val df = Sources.csvTolerant(spark, path, Some(schema))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("csvAuditable surfaces malformed lines in _corrupt_record") {
    val path = tmpFile("b.csv", "id,v,s\n1,1.5,x\njunk,junk,junk,junk\n")
    val df = Sources.csvAuditable(spark, path, schema).cache()
    try {
      assert(df.filter(col("_corrupt_record").isNotNull).count() === 1)
      assert(df.filter(col("_corrupt_record").isNull).count() === 1)
    } finally df.unpersist()
  }

  test("jsonlTolerant reads json lines and drops broken documents") {
    val path = tmpFile("c.jsonl",
      """{"id": 1, "v": 1.5}
        |this is not json
        |{"id": 2, "v": 2.5}
        |""".stripMargin)
    val df = Sources.jsonlTolerant(spark, path,
      Some(StructType(Seq(StructField("id", LongType), StructField("v", DoubleType)))))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("unionAligned outer-aligns drifting schemas with nulls") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("id", "s")
    val b = Seq((2L, 9.9)).toDF("id", "v")
    val u = Sources.unionAligned(Seq(a, b))
    assert(u.columns.sorted.toSeq === Seq("id", "s", "v"))
    assert(u.count() === 2)
    assert(u.filter(col("v").isNull).count() === 1)
    assert(u.filter(col("s").isNull).count() === 1)
  }

  test("orc round-trip: pushdown and pruning reach the scan") {
    import spark.implicits._
    val df = Seq((1L, 1.5, "a"), (2L, 2.5, "b"), (3L, 3.5, "c")).toDF("id", "v", "s")
    val dir = Files.createTempDirectory("graft-orc").toString
    Sources.writeOrc(df, dir)
    val back = Sources.orc(spark, dir)
    assert(back.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val plan = back.filter(col("id") > 1L).select("id", "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,1)"), plan)
    assert(!plan.contains("v:double"), s"column v must be pruned from the read:\n$plan")
  }
}
