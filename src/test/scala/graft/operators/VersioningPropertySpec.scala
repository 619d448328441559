package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Property-style differential tests for the versioning operators against
  * a sequential in-memory model: random snapshot SEQUENCES are folded
  * through scd2Apply / upsert and the evolved state must match what a
  * plain map-based replay predicts — plus the structural SCD-2 invariants
  * (one open row per key, non-overlapping ordered intervals, open rows ==
  * the latest snapshot exactly).
  */
class VersioningPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // snapshots over a small key space with few fp values: collisions,
  // reappearing keys, and unchanged rows all occur with high probability
  private val snapshotGen: Gen[Map[Long, String]] =
    Gen.mapOf(for {
      k <- Gen.chooseNum(1L, 30L)
      v <- Gen.oneOf("a", "b", "c", "d")
    } yield (k, v))

  private def toDf(m: Map[Long, String]): DataFrame =
    if (m.isEmpty) Seq((0L, "x")).toDF("id", "fp").limit(0)
    else m.toSeq.toDF("id", "fp")

  private def ts(i: Int) = f"2026-01-${i + 1}%02d 00:00:00"

  test("scd2 over random snapshot sequences matches the sequential model") {
    (1 to 8).foreach { trial =>
      val snaps = sample(Gen.listOfN(4, snapshotGen), trial.toLong * 7 + 1)
      var hist = toDf(snaps.head)
        .withColumn("valid_from", lit(ts(0)).cast("timestamp"))
        .withColumn("valid_to", lit(null).cast("timestamp"))
      snaps.tail.zipWithIndex.foreach { case (s, i) =>
        hist = Versioning.scd2Apply(hist, toDf(s), "id", "fp", ts(i + 1))
      }
      val rows = hist.collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3))))

      // open rows are EXACTLY the last snapshot
      val open = rows.filter(_._4.isEmpty).map(r => r._1 -> r._2).toMap
      assert(open === snaps.last, s"trial $trial open-set mismatch")

      // per key: intervals ordered, non-overlapping, at most one open
      rows.groupBy(_._1).foreach { case (k, vs) =>
        assert(vs.count(_._4.isEmpty) <= 1, s"trial $trial key $k: two open rows")
        val sorted = vs.sortBy(_._3.getTime)
        sorted.sliding(2).foreach {
          case Array(x, y) =>
            assert(x._4.nonEmpty && x._4.get.getTime <= y._3.getTime,
              s"trial $trial key $k: overlapping intervals")
          case _ =>
        }
        // an open row, if any, is the latest interval
        sorted.dropRight(1).foreach(v => assert(v._4.nonEmpty))
      }

      // version count per key == number of times the key's fp changed
      // (counting appearance after absence as a change), per the model
      val expected = scala.collection.mutable.Map.empty[Long, Int]
      val cur = scala.collection.mutable.Map.empty[Long, String]
      snaps.foreach { s =>
        s.foreach { case (k, v) =>
          if (!cur.get(k).contains(v)) {
            expected(k) = expected.getOrElse(k, 0) + 1; cur(k) = v
          }
        }
        cur.keys.toSeq.diff(s.keys.toSeq).foreach(cur.remove)
      }
      val got = rows.groupBy(_._1).view.mapValues(_.length).toMap
      assert(got === expected.toMap, s"trial $trial version counts")
    }
  }

  test("folded upserts equal last-writer-wins over the batch sequence") {
    (1 to 8).foreach { trial =>
      val batches = sample(Gen.listOfN(4, snapshotGen), trial.toLong * 13 + 5)
      val merged = batches.tail.foldLeft(toDf(batches.head)) {
        (acc, b) => Versioning.upsert(acc, toDf(b), "id")
      }
      val model = batches.reduceLeft(_ ++ _) // Map ++ = right wins, like upsert
      val got = merged.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === model, s"trial $trial")
      assert(merged.count() === model.size, s"trial $trial duplicate keys")
    }
  }

  test("diff composes: applying the diff's classes to old reconstructs new") {
    (1 to 8).foreach { trial =>
      val o = sample(snapshotGen, trial.toLong * 31 + 2)
      val n = sample(snapshotGen, trial.toLong * 31 + 3)
      val d = Versioning.diffSnapshots(toDf(o), toDf(n), "id", "fp")
        .collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.getString(2)), Option(r.getString(3))))
      val rebuilt = o --
        d.filter(_._2 == "removed").map(_._1) ++
        d.filter(x => x._2 == "added" || x._2 == "changed")
          .map(x => x._1 -> x._4.get)
      assert(rebuilt === n, s"trial $trial: diff does not reconstruct")
    }
  }
}
