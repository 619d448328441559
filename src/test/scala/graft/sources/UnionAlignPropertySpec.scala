package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property: outer-aligning unions of frames with random column subsets
  * never drop a column, never drop a row, and null-fill exactly the
  * missing cells (the pd.concat contract, SURVEY §2.7 U1 / §5.2).
  */
class UnionAlignPropertySpec extends SparkTestBase {

  private val universe = Seq(
    StructField("id", LongType), StructField("a", DoubleType),
    StructField("b", DoubleType), StructField("c", StringType),
    StructField("d", DoubleType), StructField("e", StringType))

  private def frameGen(tag: Int): Gen[(Seq[String], Int)] =
    for {
      keep <- Gen.sequence[Seq[Boolean], Boolean](
        universe.tail.map(_ => Gen.frequency(2 -> true, 1 -> false)))
      n <- Gen.choose(1, 5)
    } yield ("id" +: universe.tail.zip(keep).collect { case (f, true) => f.name }, n)

  test("unionAligned keeps every column and row, null-filling the gaps") {
    (0 until 8).foreach { round =>
      val specs = (0 until 4).map { i =>
        frameGen(i)(Gen.Parameters.default, Seed(round * 100L + i))
          .getOrElse(fail("gen failed"))
      }
      var nextId = 0L
      val frames = specs.map { case (cols, n) =>
        val fields = universe.filter(f => cols.contains(f.name))
        val rows = (0 until n).map { _ =>
          nextId += 1
          Row.fromSeq(fields.map {
            case StructField("id", _, _, _) => nextId
            case StructField(_, DoubleType, _, _) => 1.5
            case StructField(_, StringType, _, _) => "x"
            case other => fail(s"unexpected $other")
          })
        }
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 2), StructType(fields))
      }
      val u = Sources.unionAligned(frames)
      val expectedCols = specs.flatMap(_._1).distinct.toSet
      assert(u.columns.toSet === expectedCols, s"round $round dropped columns")
      assert(u.count() === specs.map(_._2).sum, s"round $round dropped rows")
      // each frame's rows carry nulls exactly in its missing columns
      val collected = u.collect().map(r =>
        r.getLong(r.fieldIndex("id")) ->
          u.columns.filter(c => r.isNullAt(r.fieldIndex(c))).toSet).toMap
      var id = 0L
      specs.foreach { case (cols, n) =>
        val missing = expectedCols -- cols
        (0 until n).foreach { _ =>
          id += 1
          assert(collected(id) === missing, s"round $round id $id")
        }
      }
    }
  }
}
