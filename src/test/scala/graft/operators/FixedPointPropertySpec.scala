package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.SparkTestBase

/** Property-style differential tests for the two round-5 exactness
  * claims:
  *
  *  1. fixed-point cents == decimal buffers: for 2-decimal monetary
  *     values stored as doubles, SUM(round(x*100) as long)/100.0 equals
  *     CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) bit-for-bit (the
  *     substitution StarQueries.cents relies on);
  *  2. packShards == the sequential prefix-sum model for arbitrary
  *     non-negative weights and budgets.
  */
class FixedPointPropertySpec extends SparkTestBase {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // 2-decimal values as their nearest doubles, both signs, magnitudes up
  // to 10^7 (the realistic monetary range; well inside the 2^53 window
  // where round(x*100) recovers the exact integer)
  private val centsValue: Gen[Double] =
    Gen.chooseNum(-1000000000L, 1000000000L).map(_ / 100.0)

  test("fixed-point long sums equal decimal sums cast to double, bit for bit") {
    import spark.implicits._
    (1 to 20).foreach { trial =>
      val n = 1 + trial * 37 % 400
      val xs = sample(Gen.listOfN(n, centsValue), trial.toLong)
      val df = xs.toDF("x").repartition(1 + trial % 7)
      val row = df.agg(
        (sum(round(col("x") * lit(100)).cast(LongType)) / lit(100.0)).as("fp"),
        sum(col("x").cast(DecimalType(18, 2))).cast(DoubleType).as("dec")).head()
      // bit equality, not approximate: the substitution must be invisible
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(1)),
        s"trial $trial: fp=${row.getDouble(0)} dec=${row.getDouble(1)}")
    }
  }

  test("packShards equals the sequential model for random weights and budgets") {
    import spark.implicits._
    (1 to 10).foreach { trial =>
      val n = 5 + trial * 53 % 300
      val ws = sample(Gen.listOfN(n, Gen.chooseNum(0L, 500L)), 1000L + trial)
      val budget = 1L + sample(Gen.chooseNum(1L, 2000L), 2000L + trial)
      val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "w").repartition(1 + trial % 5)
      val got = Packing.packShards(df, col("id"), col("w"), budget, numParts = 4)
        .select(col("id"), col("shard"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      var cum = 0L
      ws.zipWithIndex.foreach { case (w, i) =>
        assert(got(i.toLong) === cum / budget, s"trial $trial id $i budget $budget")
        cum += w
      }
    }
  }
}
