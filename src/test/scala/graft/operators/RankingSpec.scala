package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RankingSpec extends SparkTestBase {

  import spark.implicits._

  test("stratifiedRank matches the single-window row_number formulation") {
    val rnd = new scala.util.Random(11)
    val df = Seq.tabulate(500) { i =>
      (i.toLong, Seq("en", "fr", "pt")(rnd.nextInt(3)), rnd.nextInt(40).toDouble)
    }.toDF("id", "lang", "score").repartition(7)

    val got = Ranking.stratifiedRank(df, col("lang"), Seq(col("score"), col("id")))
      .select("id", "rnk").as[(Long, Long)].collect().toMap

    val win = Window.partitionBy(col("lang")).orderBy(col("score"), col("id"))
    val want = df.withColumn("rnk", row_number().over(win).cast("long"))
      .select("id", "rnk").as[(Long, Long)].collect().toMap

    assert(got === want)
  }

  test("rank is dense 1..n within every stratum, independent of partitioning") {
    val df = Seq.tabulate(100)(i => (i.toLong, if (i % 4 == 0) "a" else "b", (i * 7 % 13).toDouble))
      .toDF("id", "lang", "score")
    for (parts <- Seq(1, 3, 16)) {
      val r = Ranking.stratifiedRank(df.repartition(parts), col("lang"),
        Seq(col("score"), col("id")))
      val byLang = r.groupBy("lang")
        .agg(count(lit(1)).as("n"), min("rnk").as("lo"), max("rnk").as("hi"),
          countDistinct("rnk").as("d"))
        .collect()
      byLang.foreach { row =>
        assert(row.getLong(2) == 1L && row.getLong(3) == row.getLong(1) &&
          row.getLong(4) == row.getLong(1), s"parts=$parts row=$row")
      }
    }
  }

  test("empty input yields an empty ranked frame") {
    val df = Seq.empty[(Long, String, Double)].toDF("id", "lang", "score")
    assert(Ranking.stratifiedRank(df, col("lang"), Seq(col("score"))).count() === 0)
  }
}
