package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** text_bm25 sanity against a driver-side model: the registered query is
  * oracle-checked end-to-end (DuckDB); this spec pins the formula itself
  * (k1 = 1.2, b = 0.75, Lucene idf) on a corpus tiny enough to hand-check.
  */
class Bm25Spec extends SparkTestBase {

  test("bm25 ranks by tf saturation and length normalization") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark join"), // tf-heavy, short
      (2L, "spark join " + (1 to 40).map(_ => "filler").mkString(" ")), // long
      (3L, "spark"), // single term
      (4L, "filler only words here")) // no query terms
      .toDF("doc_id", "text")
    // reuse the registered query by writing the docs as a parquet "table"
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("text_bm25")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // driver-side model
    val texts = Map(
      1L -> "spark spark spark join",
      2L -> ("spark join " + (1 to 40).map(_ => "filler").mkString(" ")),
      3L -> "spark",
      4L -> "filler only words here")
    val toks = texts.view.mapValues(_.split(" ").toSeq).toMap
    val n = toks.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val terms = Seq("spark", "hash", "join")
    def score(id: Long): Double = {
      val tl = toks(id)
      terms.map { t =>
        val tf = tl.count(_ == t)
        if (tf == 0) 0.0
        else {
          val df = toks.values.count(_.contains(t))
          val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
          idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * tl.size / avgdl))
        }
      }.sum
    }
    Seq(1L, 2L, 3L).foreach { id =>
      assert(math.abs(got(id) - score(id)) < 1e-3, s"doc $id: ${got(id)} vs ${score(id)}")
    }
    assert(!got.contains(4L)) // no query terms -> no row
    // tf-heavy short doc wins; the very short single-term doc's length
    // boost (dl = 1) beats the 42-token doc's two terms under b = 0.75
    assert(got(1L) > got(3L) && got(3L) > got(2L))
  }
}
