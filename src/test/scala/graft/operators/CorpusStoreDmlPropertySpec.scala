package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Differential property test for the store's mutation surface: random
  * sequences of append / deleteWhere / updateWhere / compact are folded
  * through a CorpusStore AND a plain in-memory map model, and the store's
  * resolved read must equal the model after EVERY op — plus the DML
  * verbs' return counts must equal the model's match counts. Predicates
  * are drawn from a pool carried in both forms (Column, model function),
  * over a deliberately small key/value space so overwrites, re-deletes,
  * empty matches, and update-then-delete interactions all occur.
  */
class CorpusStoreDmlPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft-test-dmlprop-$tag"
    val p = new org.apache.hadoop.fs.Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    d
  }

  private val snapshotGen: Gen[Map[Long, String]] =
    Gen.mapOf(for {
      k <- Gen.chooseNum(1L, 25L)
      v <- Gen.oneOf("a", "b", "c")
    } yield (k, v))

  private def toDf(m: Map[Long, String]): DataFrame =
    if (m.isEmpty) Seq((0L, "x")).toDF("id", "fp").limit(0)
    else m.toSeq.toDF("id", "fp")

  // each predicate in BOTH forms; fp predicates still match updated
  // values ("a" -> "au" -> "auu") so update-then-match paths are exercised
  private val preds: IndexedSeq[(Column, ((Long, String)) => Boolean)] =
    IndexedSeq(
      (col("id") % 2 === 0, kv => kv._1 % 2 == 0),
      (col("id") > 12, kv => kv._1 > 12),
      (col("fp").startsWith("a"), kv => kv._2.startsWith("a")),
      (col("id") % 3 === 1, kv => kv._1 % 3 == 1))

  private sealed trait Op
  private case class Append(up: Map[Long, String], del: Set[Long]) extends Op
  private case class Delete(p: Int) extends Op
  private case class Update(p: Int) extends Op
  private case object Fold extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> (for {
      up <- snapshotGen
      del <- Gen.someOf(1L to 25L)
    } yield Append(up, del.toSet)),
    3 -> Gen.choose(0, preds.size - 1).map(Delete),
    3 -> Gen.choose(0, preds.size - 1).map(Update),
    1 -> Gen.const(Fold))

  test("random append/DML/compact sequences match the sequential map model") {
    (1 to 4).foreach { trial =>
      val dir = freshDir(s"t$trial")
      val init = sample(snapshotGen, trial * 31L + 5)
      CorpusStore.init(toDf(init), dir)
      var model = init
      var seq = 0L
      val ops = sample(Gen.listOfN(6, opGen), trial * 97L + 13)
      ops.foreach { op =>
        seq += 1
        op match {
          case Append(up, del) =>
            CorpusStore.append(spark, dir, seq, "id", toDf(up),
              deleteKeys =
                if (del.isEmpty) None else Some(del.toSeq.toDF("id")))
            // within one append the tombstone wins for a key in both sides
            model = (model ++ up) -- del
          case Delete(p) =>
            val n = CorpusStore.deleteWhere(spark, dir, "id", seq, preds(p)._1)
            val matches = model.filter(preds(p)._2)
            assert(n === matches.size.toLong,
              s"trial $trial op $op: deleteWhere count")
            model = model -- matches.keys
          case Update(p) =>
            val n = CorpusStore.updateWhere(spark, dir, "id", seq,
              preds(p)._1, Map("fp" -> concat(col("fp"), lit("u"))))
            val matches = model.filter(preds(p)._2)
            assert(n === matches.size.toLong,
              s"trial $trial op $op: updateWhere count")
            model = model ++ matches.map { case (k, v) => (k, v + "u") }
          case Fold =>
            CorpusStore.compact(spark, dir, "id")
        }
        val got = CorpusStore.read(spark, dir, "id").collect()
          .map(r => (r.getLong(0), r.getString(1))).toMap
        assert(got === model, s"trial $trial after op $op (seq $seq)")
      }
    }
  }
}
