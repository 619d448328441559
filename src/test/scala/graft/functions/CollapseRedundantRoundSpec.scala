package graft.functions

import org.apache.spark.sql.catalyst.expressions.BRound
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CollapseRedundantRound

import graft.SparkTestBase

class CollapseRedundantRoundSpec extends SparkTestBase {

  import spark.implicits._

  private def broundCount(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
    var n = 0
    plan.transformAllExpressions { case b: BRound => n += 1; b }
    n
  }

  test("bround(bround(e,2),4) collapses to one rounding") {
    val df = Seq(1.23456, 2.5).toDF("x")
      .select(bround(bround(col("x"), 2), 4).as("y"))
    val before = df.queryExecution.analyzed
    assert(broundCount(before) === 2)
    val after = CollapseRedundantRound(before)
    assert(broundCount(after) === 1)
  }

  test("tighter outer scale is NOT collapsed") {
    val df = Seq(1.23456).toDF("x")
      .select(bround(bround(col("x"), 4), 2).as("y"))
    val after = CollapseRedundantRound(df.queryExecution.analyzed)
    assert(broundCount(after) === 2)
  }

  test("collapse preserves results") {
    val df = Seq(1.005, 2.675, -3.335, 0.125).toDF("x")
    val chained = df.select(bround(bround(col("x"), 2), 3).as("y")).collect()
    val single = df.select(bround(col("x"), 2).as("y")).collect()
    assert(chained.map(_.getDouble(0)).toSeq === single.map(_.getDouble(0)).toSeq)
  }
}
