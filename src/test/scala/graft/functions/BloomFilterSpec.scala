package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Dedup

/** BloomFilterAgg / BloomMightContain: the no-false-negative guarantee
  * (the property incrementalDups' exactness rests on), a false-positive
  * sanity bound, and end-to-end equality of the bloom-accelerated
  * incremental dedup with a plain semi-join.
  */
class BloomFilterSpec extends SparkTestBase {

  import org.apache.spark.sql.DataFrame

  private val numBits = 1 << 16
  private val numHashes = 5

  private def bloomOf(df: DataFrame): Array[Byte] =
    df.agg(HashFunctions.bloomAgg(col("h"), numBits, numHashes).as("b"))
      .head().getAs[Array[Byte]](0)

  test("no false negatives across partitioned partial merges") {
    import spark.implicits._
    val members = (1L to 1000L).map(_ * 2654435761L)
    val bloom = bloomOf(members.toDF("h").repartition(7))
    val probed = members.toDF("h")
      .select(HashFunctions.bloomMightContain(lit(bloom), col("h"), numHashes).as("m"))
      .collect()
    assert(probed.forall(_.getBoolean(0)), "a member probed false")
  }

  test("false-positive rate stays near the textbook bound") {
    import spark.implicits._
    val members = (1L to 1000L).map(_ * 2654435761L)
    val bloom = bloomOf(members.toDF("h"))
    val nonMembers = (1L to 10000L).map(_ * 7046029254386353131L + 13L)
      .filterNot(members.toSet)
    val fp = nonMembers.toDF("h")
      .select(HashFunctions.bloomMightContain(lit(bloom), col("h"), numHashes).as("m"))
      .collect().count(_.getBoolean(0))
    // m=65536, n=1000, k=5 -> (1 - e^(-kn/m))^k ~ 1.6e-6; allow lots of slack
    assert(fp < 50, s"false-positive count $fp out of ${nonMembers.size}")
  }

  test("empty build side probes nothing in") {
    import spark.implicits._
    val bloom = bloomOf(Seq.empty[Long].toDF("h"))
    val probed = Seq(1L, 2L, 3L).toDF("h")
      .select(HashFunctions.bloomMightContain(lit(bloom), col("h"), numHashes).as("m"))
      .collect()
    assert(probed.forall(!_.getBoolean(0)))
  }

  test("bloomMightContainAny equals the OR of per-key probes; empty set probes false") {
    import spark.implicits._
    val members = (1L to 1000L).map(_ * 2654435761L)
    val bloom = bloomOf(members.toDF("h"))
    // mixed probe sets: members, non-members, and blends
    val sets: Seq[Seq[Long]] = Seq(
      members.take(3),
      Seq(5L, 17L, 23L), // almost surely absent
      members.slice(500, 505) ++ Seq(999999999L),
      Seq(members.head))
    sets.foreach { ks =>
      val any = spark.range(1)
        .select(HashFunctions.bloomMightContainAny(
          lit(bloom), lit(ks.toArray), numHashes).as("m"))
        .head().getBoolean(0)
      val orChain = ks.map(k => spark.range(1)
        .select(HashFunctions.bloomMightContain(lit(bloom), lit(k), numHashes))
        .head().getBoolean(0)).reduce(_ || _)
      assert(any === orChain, s"set $ks: any-probe diverged from OR-chain")
    }
    val empty = spark.range(1)
      .select(HashFunctions.bloomMightContainAny(
        lit(bloom), lit(Array.empty[Long]), numHashes).as("m"))
      .head().getBoolean(0)
    assert(!empty, "an empty key set is contained nowhere")
  }

  test("incrementalDups equals the plain semi-join answer") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("fp",
        md5(concat_ws(" ", array_sort(array_distinct(TextFunctions.tokens(col("text")))))))
      .withColumn("src_n", expr("CAST(substring(source, 4, 8) AS INT)"))
    val oldFps = docs.filter(col("src_n") < 10).select(col("fp"))
    val newc = docs.filter(col("src_n") >= 10).select(col("doc_id"), col("fp"))

    val got = Dedup.incrementalDups(oldFps, newc)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val expected = newc.join(oldFps.distinct(), Seq("fp"), "left_semi")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got === expected)
    assert(expected.nonEmpty, "fixture has no cross-split dups; test is vacuous")
  }
}
