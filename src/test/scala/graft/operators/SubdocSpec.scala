package graft.operators

import graft.SparkTestBase

/** Sub-document chunk operators: chunk alignment, CCNet-style frequent-
  * chunk (boilerplate) removal, and corpus-wide first-occurrence chunk
  * dedup — all against hand-computed fixtures.
  */
class SubdocSpec extends SparkTestBase {

  import spark.implicits._

  test("chunkExplode: aligned fixed-width windows, short tail, empty docs dropped") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, ""),
      (3L, "  "),
      (4L, "x y")).toDF("id", "text")
    val got = Subdoc.chunkExplode(docs, "text", 2, Seq("id"))
      .orderBy("id", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq === Seq(
      (1L, 0, "a b"), (1L, 1, "c d"), (1L, 2, "e"),
      (4L, 0, "x y")))
  }

  test("dropBoilerplate strips frequent chunks per group, keeps rare ones, drops emptied docs") {
    // group g: 4 docs, header "ad ad" in 3 of 4 (0.75 > 0.5); doc 40 is
    // ONLY the header -> disappears. group h: 2 docs sharing a chunk but
    // minDocs=3 suppresses the removal there.
    val docs = Seq(
      (10L, "g", "ad ad body one"),
      (20L, "g", "ad ad body two"),
      (30L, "g", "fresh text here ok"),
      (40L, "g", "ad ad"),
      (50L, "h", "same same tail a"),
      (60L, "h", "same same tail b")).toDF("id", "grp", "text")
    val got = Subdoc.dropBoilerplate(docs, "id", "grp", "text",
        chunkWords = 2, maxDocFrac = 0.5, minDocs = 2L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(got.toSeq === Seq(
      (10L, "body one"), (20L, "body two"), (30L, "fresh text here ok"),
      // "same same" and "tail a"/"tail b": df(same same)=2 = 1.0 of h's
      // docs -> boilerplate at minDocs=2; tails differ, kept
      (50L, "tail a"), (60L, "tail b")))
    val strict = Subdoc.dropBoilerplate(docs, "id", "grp", "text",
        chunkWords = 2, maxDocFrac = 0.5, minDocs = 3L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(strict.count(_._1 >= 50L) === 2 &&
      strict.filter(_._1 >= 50L).forall(_._2.startsWith("same same")),
      "minDocs must suppress boilerplate calls in tiny groups")
  }

  test("map-side removal and the shuffle-join fallback are output-identical") {
    // fixtures with NON-empty decision sets so forcing the fallback
    // (bound 0 < set size) actually exercises the other plan
    val bDocs = Seq(
      (10L, "g", "ad ad body one"),
      (20L, "g", "ad ad body two"),
      (30L, "g", "fresh text here ok"),
      (40L, "g", "ad ad")).toDF("id", "grp", "text")
    def collectB(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    val bFast = collectB(Subdoc.dropBoilerplate(bDocs, "id", "grp", "text",
      chunkWords = 2, maxDocFrac = 0.5, minDocs = 2L))
    val bFall = collectB(Subdoc.dropBoilerplate(bDocs, "id", "grp", "text",
      chunkWords = 2, maxDocFrac = 0.5, minDocs = 2L, maxBroadcastRows = 0L))
    assert(bFast === bFall && bFast.nonEmpty)

    val dDocs = Seq(
      (1L, "p q r s own one"),
      (2L, "p q r s own two"),
      (3L, "p q p q"),
      (4L, "zz ww p q")).toDF("id", "text")
    def collectD(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val dFast = collectD(Subdoc.dedupChunks(dDocs, "id", "text", chunkWords = 2))
    val dFall = collectD(Subdoc.dedupChunks(dDocs, "id", "text", chunkWords = 2,
      maxBroadcastRows = 0L))
    assert(dFast === dFall && dFast.nonEmpty)
  }

  test("dedupChunks keeps the first (key, pos) occurrence corpus-wide, drops repeats everywhere") {
    val docs = Seq(
      (1L, "p q r s own one"),
      (2L, "p q r s own two"), // shares chunks 0,1 with doc 1
      (3L, "p q p q"), // within-corpus repeat + within-doc repeat: all seen
      (4L, "zz ww p q")).toDF("id", "text")
    val got = Subdoc.dedupChunks(docs, "id", "text", chunkWords = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq(
      (1L, "p q r s own one"),
      (2L, "own two"),
      (4L, "zz ww")), "doc 3 is entirely already-seen chunks and disappears")
  }

  test("one tokenizer: chunking shares TextFunctions.tokens — tab/newline text tokenizes identically on both") {
    // the library's single token definition is a LITERAL-SPACE split:
    // "a\tb" is ONE token, "c\nd" is ONE token, runs of spaces collapse.
    // Subdoc must agree with TextFunctions.tokens exactly on such text
    // (before r14 it had its own filter(split(...)) copy — semantically
    // equal, but two definitions invite drift; now it IS the same expr).
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "a\tb  c\nd e"), // 3 tokens: "a\tb", "c\nd", "e"
      (2L, "\t\n"), //         1 token (no space anywhere): "\t\n"
      (3L, " x  y ")) //       2 tokens
      .toDF("id", "text")
    val viaCanon = docs.select(col("id"),
        graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    assert(viaCanon.map(t => (t._1, t._2.toList)).toSeq === Seq(
      (1L, List("a\tb", "c\nd", "e")), (2L, List("\t\n")),
      (3L, List("x", "y"))))
    // chunkExplode windows over exactly those tokens
    val chunks = Subdoc.chunkExplode(docs, "text", 2, Seq("id"))
      .orderBy("id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(chunks.toSeq === Seq(
      (1L, 0, "a\tb c\nd"), (1L, 1, "e"),
      (2L, 0, "\t\n"),
      (3L, 0, "x y")))
    // and tokenCount agrees with the canon on the same text
    val counts = docs.select(col("id"), Subdoc.tokenCount(col("text")).as("n"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(counts.toSeq === Seq((1L, 3), (2L, 1), (3L, 2)))
  }
}
