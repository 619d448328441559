package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctionRegistry

import graft.SparkTestBase

/** SQL surface: the native expressions registered through
  * GraftExtensions/GraftFunctionRegistry behave identically to the
  * Column API.
  */
class GraftSqlSpec extends SparkTestBase {

  GraftFunctionRegistry.register(spark)

  test("simhash64 is callable from SQL and matches the Column API") {
    val viaSql = spark.sql(
      "SELECT simhash64(array('the', 'quick', 'fox', 'the')) AS s").head().getLong(0)
    import spark.implicits._
    val viaCol = Seq(Seq("the", "quick", "fox", "the")).toDF("t")
      .select(HashFunctions.simhash(col("t"))).head().getLong(0)
    assert(viaSql === viaCol)
  }

  test("word_shingles and minhash_signature compose in SQL") {
    val row = spark.sql(
      """SELECT word_shingles(array('a','b','c','d'), 3) AS sh,
        |       minhash_signature(word_shingles(array('a','b','c','d'), 3), 8) AS sig
        |""".stripMargin).head()
    assert(row.getSeq[String](0) === Seq("a b c", "b c d"))
    assert(row.getSeq[Long](1).length === 8)
  }

  test("float_vector_dot implicit-casts numeric arrays") {
    val got = spark.sql(
      "SELECT float_vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(got === 11.0)
  }

  test("minhash_signature rejects a non-literal k") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array('x'), CAST(rand() * 4 AS INT))")
        .collect()
    }
    assert(e.getMessage.contains("literal integer"))
  }
}
