package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Property-style laws for the sub-document operators over random
  * corpora (small vocab to force real chunk collisions):
  *
  *  1. chunking is lossless: with no removal decision, the chunk arrays
  *     restitch to the exact tokenized text (identity);
  *  2. dedupChunks is idempotent: its output is a fixed point (running
  *     it again changes nothing — every surviving chunk occurrence is
  *     already the corpus-wide winner of its content);
  *  3. token conservation for dropBoilerplate: surviving tokens plus
  *     the tokens of every removed boilerplate occurrence equal the
  *     input tokens, exactly. (dropBoilerplate is deliberately NOT
  *     idempotent: removal shifts chunk boundaries on rebuild, so a
  *     re-run re-chunks a different window stream and may find new
  *     frequent chunks — one pass at landing is the operator's
  *     contract, matching the published recipes;)
  *  4. token conservation for dedupChunks: surviving tokens + dropped
  *     occurrence tokens == input tokens, exactly.
  */
class SubdocPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // tiny vocabulary + short docs: adjacent docs share many exact chunks,
  // so the dedup/boilerplate decisions fire on ORGANIC collisions
  private val word: Gen[String] = Gen.oneOf("a", "b", "c", "d", "e")
  private def doc(maxLen: Int): Gen[String] =
    Gen.chooseNum(0, maxLen).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private def corpus(trial: Int, docsN: Int, maxLen: Int) = {
    val texts = sample(Gen.listOfN(docsN, doc(maxLen)), trial.toLong)
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, s"src${i % 3}", t) }.toDF("id", "grp", "text")
  }

  private def docMap(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.select(col("id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("chunk arrays restitch losslessly to the tokenized text") {
    (1 to 8).foreach { trial =>
      val docs = corpus(trial, 40, 23)
      val restitched = Subdoc.chunkExplode(docs, "text", 1 + trial % 5, Seq("id"))
        .groupBy(col("id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("chunk")))),
          s => s.getField("chunk")), " ").as("re"))
      val bad = docs
        .withColumn("norm", array_join(
          filter(split(col("text"), " "), t => t =!= ""), " "))
        .filter(col("norm") =!= "")
        .join(restitched, Seq("id"), "left")
        .filter(col("re").isNull || col("re") =!= col("norm"))
      assert(bad.count() === 0, s"trial $trial: restitch diverged")
    }
  }

  test("dedupChunks output is a fixed point") {
    (1 to 6).foreach { trial =>
      val docs = corpus(trial, 50, 17)
      val w = 1 + trial % 4
      val once = Subdoc.dedupChunks(docs, "id", "text", w)
      val twice = Subdoc.dedupChunks(
        once.withColumnRenamed("text", "text"), "id", "text", w)
      assert(docMap(once) === docMap(twice), s"trial $trial (w=$w): not a fixed point")
      assert(once.count() > 0, s"trial $trial: vacuous corpus")
    }
  }

  test("dropBoilerplate conserves tokens: survivors + removed occurrences == input") {
    (1 to 6).foreach { trial =>
      val docs = corpus(trial + 100, 50, 17)
      val w = 1 + trial % 3
      val inputToks = docs.agg(
        coalesce(sum(Subdoc.tokenCount(col("text"))), lit(0)).cast("long")).head().getLong(0)
      val survivorToks = Subdoc.dropBoilerplate(docs, "id", "grp", "text", w,
          maxDocFrac = 0.4, minDocs = 2L).agg(
        coalesce(sum(Subdoc.tokenCount(col("text"))), lit(0)).cast("long")).head().getLong(0)
      // removed mass recomputed independently from the decision rule
      val chunks = Subdoc.chunkExplode(docs, "text", w, Seq("id", "grp"))
      val gdocs = docs.groupBy(col("grp")).agg(countDistinct(col("id")).as("g"))
      val boiler = chunks.groupBy(col("grp"), col("chunk"))
        .agg(countDistinct(col("id")).as("df"))
        .join(gdocs, Seq("grp"))
        .filter(col("df") >= 2 && col("df") > lit(0.4) * col("g"))
        .select(col("grp"), col("chunk"))
      val removedToks = chunks.join(boiler, Seq("grp", "chunk"), "left_semi")
        .agg(coalesce(sum(Subdoc.tokenCount(col("chunk"))), lit(0)).cast("long"))
        .head().getLong(0)
      assert(survivorToks + removedToks === inputToks,
        s"trial $trial (w=$w): $survivorToks + $removedToks != $inputToks")
    }
  }

  test("dedupChunks conserves tokens: survivors + dropped occurrences == input") {
    (1 to 6).foreach { trial =>
      val docs = corpus(trial + 200, 40, 19)
      val w = 1 + trial % 4
      val inputToks = docs.agg(
        coalesce(sum(Subdoc.tokenCount(col("text"))), lit(0)).cast("long")).head().getLong(0)
      val survivorToks = Subdoc.dedupChunks(docs, "id", "text", w).agg(
        coalesce(sum(Subdoc.tokenCount(col("text"))), lit(0)).cast("long")).head().getLong(0)
      // dropped mass recomputed independently: every non-winner occurrence
      val chunks = Subdoc.chunkExplode(docs, "text", w, Seq("id"))
      val winners = chunks.groupBy(col("chunk"))
        .agg(min(struct(col("id"), col("pos"))).as("w"))
      val droppedToks = chunks.join(winners, Seq("chunk"))
        .filter(struct(col("id"), col("pos")) =!= col("w"))
        .agg(coalesce(sum(Subdoc.tokenCount(col("chunk"))), lit(0)).cast("long"))
        .head().getLong(0)
      assert(survivorToks + droppedToks === inputToks,
        s"trial $trial (w=$w): $survivorToks + $droppedToks != $inputToks")
    }
  }
}
