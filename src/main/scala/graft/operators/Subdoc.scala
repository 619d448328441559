package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sub-document (chunk-granularity) curation: operators that act on
  * fixed-width token windows INSIDE documents rather than on whole
  * documents — the within-doc half of the dedup story. Whole-document
  * dedup ([[Dedup]]) cannot remove a boilerplate header shared by half a
  * crawl or a paragraph pasted into thousands of otherwise-distinct
  * pages; the published recipe (CCNet's per-shard frequent-paragraph
  * removal, and the exact-substring dedup of "Deduplicating Training
  * Data Makes Language Models Better", Lee et al. 2021, approximated at
  * chunk granularity) is: explode documents into small aligned chunks,
  * decide per CHUNK, and rebuild each document from its survivors.
  *
  * Scale shape, at 100 TB:
  *   - Chunks are bounded (`chunkWords` tokens, ~tens of bytes), so the
  *     chunk CONTENT is the shuffle key — the same order of bytes as the
  *     md5 fingerprints the whole-doc dedups shuffle, with exact
  *     (collision-free) equality semantics for free.
  *   - The DECISION is one partial-aggregable groupBy over the exploded
  *     chunks — the one unavoidable content shuffle (global duplicate /
  *     frequency discovery is a global question).
  *   - The REMOVAL is map-side whenever the decision set is small, which
  *     both operators make the common case: the boilerplate set is
  *     bounded BY CONSTRUCTION (df > maxDocFrac caps it at
  *     chunks-per-doc / maxDocFrac distinct chunks per group), and
  *     repeated chunks are a small fraction of a deduplicated crawl at
  *     any realistic duplicate rate. The small side broadcasts back onto
  *     the ORIGINAL docs frame and each document's text is rebuilt with
  *     a higher-order array filter in place — no join-back shuffle of
  *     the exploded corpus, no per-doc collect_list reassembly shuffle.
  *     Both reductions are COUNT-GUARDED (the repo-wide preflight
  *     pattern): past the bound the operator degrades to the explode →
  *     shuffle-join → reassemble plan with the identical answer,
  *     spec-locked output-equal both ways.
  */
object Subdoc {

  /** Bound on the rows the map-side removal paths will broadcast
    * (repeated-chunk winners / per-doc drop lists) — same order as the
    * other operators' broadcast-candidate bounds: ~2M short rows is tens
    * of MB on the wire, under the 64 MB session threshold. */
  val DefaultMaxBroadcastRows = 2000000L

  /** Non-empty tokens of `textCol` — the library's ONE tokenizer
    * ([[graft.functions.TextFunctions.tokens]], the native codegen'd
    * single-space split), so chunk boundaries here and the quality/DSIR
    * token counts elsewhere share a single definition. Semantically
    * equal to `filter(split(text, " "), _ =!= "")` (both split on a
    * literal space and drop empties — SubdocSpec pins the equivalence
    * on tab/newline text), without the interpreted lambda per token. */
  private def toks(textCol: String): Column =
    graft.functions.TextFunctions.tokens(col(textCol))

  /** The chunk array of a token array column: aligned `chunkWords`-token
    * windows, space-rejoined (the last chunk may be shorter). */
  private def chunkArr(tokCol: Column, chunkWords: Int): Column = {
    val lastIdx = floor((size(tokCol) - 1) / chunkWords).cast("int")
    transform(sequence(lit(0), lastIdx), i =>
      array_join(slice(tokCol, i * chunkWords + 1, lit(chunkWords)), " "))
  }

  /** Explode `textCol` into fixed-width token chunks: one row per
    * (document, chunk position), `pos` 0-based, `chunk` the
    * space-rejoined window of `chunkWords` whitespace tokens (the last
    * chunk may be shorter). Empty/whitespace-only documents contribute
    * no rows. `carryCols` ride along unchanged (id, grouping columns). */
  def chunkExplode(docs: DataFrame, textCol: String, chunkWords: Int,
      carryCols: Seq[String]): DataFrame = {
    require(chunkWords >= 1, s"chunkWords must be >= 1, got $chunkWords")
    docs.select(carryCols.map(col) :+ toks(textCol).as("__toks"): _*)
      .filter(size(col("__toks")) > 0)
      .select(carryCols.map(col) :+
        posexplode(chunkArr(col("__toks"), chunkWords))
          .as(Seq("pos", "chunk")): _*)
  }

  /** The docs frame reduced to (carryCols..., `__chunks` array) — the
    * map-side rebuild input shared by both fast paths. */
  private def withChunkArr(docs: DataFrame, textCol: String, chunkWords: Int,
      carryCols: Seq[String]): DataFrame =
    docs.select(carryCols.map(col) :+ toks(textCol).as("__toks"): _*)
      .filter(size(col("__toks")) > 0)
      .withColumn("__chunks", chunkArr(col("__toks"), chunkWords))
      .drop("__toks")

  /** Fallback reassembly: per-document collect of surviving exploded
    * chunks, restitched in order. */
  private def reassemble(kept: DataFrame, keyCols: Seq[String],
      textCol: String): DataFrame =
    kept.groupBy(keyCols.map(col): _*)
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("chunk")))),
          s => s.getField("chunk")), " ").as(textCol))

  /** CCNet-style boilerplate removal: drop every chunk whose exact
    * content appears in MORE than `maxDocFrac` of `groupCol`'s documents
    * (and in at least `minDocs` of them — tiny groups shouldn't declare
    * everything boilerplate). Returns one row per surviving document:
    * `keyCol, groupCol, textCol` with the document's text rebuilt from
    * its surviving chunks in order; a document whose every chunk was
    * boilerplate disappears. Deciding on the chunk's CONTENT within a
    * group (not its position) is what catches the shared header pasted
    * at different offsets.
    *
    * ONE pass at landing is the contract (matching the published
    * recipes), and the operator is deliberately NOT idempotent: removal
    * shifts chunk boundaries on rebuild, so a re-run re-chunks a
    * different window stream and may cross the frequency cut on windows
    * the first pass never saw (property-locked the other way round in
    * SubdocPropertySpec: token conservation holds exactly; a fixed-point
    * law does not).
    *
    * Plan: ONE content shuffle (the per-(group, chunk) document-frequency
    * aggregate). The boilerplate set is bounded by construction
    * (< chunks-per-doc / maxDocFrac chunks per group), so it folds to one
    * array per group and broadcasts back onto the original docs, where a
    * higher-order filter rebuilds each text in place — map-side removal,
    * no join-back or reassembly shuffle. Only when the folded set
    * exceeds `maxBroadcastRows` groups×chunks (pathological group
    * cardinality) does the operator fall back to the exploded
    * anti-join + reassemble plan, output-identical. */
  def dropBoilerplate(docs: DataFrame, keyCol: String, groupCol: String,
      textCol: String, chunkWords: Int = 8, maxDocFrac: Double = 0.5,
      minDocs: Long = 2L,
      maxBroadcastRows: Long = DefaultMaxBroadcastRows): DataFrame = {
    require(maxDocFrac > 0 && maxDocFrac <= 1,
      s"maxDocFrac must be in (0, 1], got $maxDocFrac")
    val chunks = chunkExplode(docs, textCol, chunkWords, Seq(keyCol, groupCol))
    val groupDocs = docs.groupBy(col(groupCol))
      .agg(countDistinct(col(keyCol)).as("__gdocs"))
    val boiler = chunks.groupBy(col(groupCol), col("chunk"))
      .agg(countDistinct(col(keyCol)).as("__df"))
      .join(groupDocs, Seq(groupCol))
      .filter(col("__df") >= minDocs &&
        col("__df") > lit(maxDocFrac) * col("__gdocs"))
      .select(col(groupCol), col("chunk"))
    // pin the (small by construction) boilerplate set once: the guard
    // count and the removal must see the SAME set, and the fold is the
    // expensive chunk aggregate we won't run twice
    val boilerSets = boiler.groupBy(col(groupCol))
      .agg(collect_list(col("chunk")).as("__boiler"))
      .localCheckpoint(true)
    // guard on the TOTAL chunk mass (groups x chunks-per-group), not the
    // group-row count — one row can carry an arbitrarily long array and
    // the bound exists to cap broadcast BYTES
    val boilerChunks = boilerSets
      .agg(coalesce(sum(size(col("__boiler"))), lit(0)).cast("long"))
      .head().getLong(0)
    if (boilerChunks <= maxBroadcastRows) {
      withChunkArr(docs, textCol, chunkWords, Seq(keyCol, groupCol))
        .join(broadcast(boilerSets), Seq(groupCol), "left")
        .withColumn("__kept", filter(col("__chunks"), c =>
          !coalesce(array_contains(col("__boiler"), c), lit(false))))
        .filter(size(col("__kept")) > 0)
        .select(col(keyCol), col(groupCol),
          array_join(col("__kept"), " ").as(textCol))
    } else {
      val kept = chunks.join(
        boilerSets.select(col(groupCol), explode(col("__boiler")).as("chunk")),
        Seq(groupCol, "chunk"), "left_anti")
      reassemble(kept, Seq(keyCol, groupCol), textCol)
    }
  }

  /** Corpus-wide exact chunk dedup, first occurrence wins (the
    * chunk-granularity approximation of Lee et al.'s exact-substring
    * dedup): every occurrence of an identical chunk except the one at
    * the smallest (`keyCol`, pos) — across ALL documents, including
    * repeats within one document — is dropped, and each document's text
    * is rebuilt from its surviving chunks in order. Returns one row per
    * surviving document (`keyCol`, rebuilt `textCol`); a document made
    * entirely of already-seen chunks disappears. Deterministic: the
    * winner is a total order over (key, pos), not arrival order.
    *
    * Plan: ONE content shuffle (the per-chunk occurrence aggregate).
    * Chunks occurring once — the overwhelming mass of any realistic
    * corpus — never travel again: only REPEATED chunks' winners
    * broadcast back onto the exploded frame (a map-side join) to derive
    * each document's drop-position list, which is itself small (loser
    * occurrences only) and broadcasts onto the original docs for an
    * in-place indexed array filter. Both broadcasts are count-guarded
    * (`maxBroadcastRows`); past either bound the operator falls back to
    * the full shuffle-join + reassemble plan, output-identical. The
    * groupBy+join shape (rather than a per-chunk window) is what keeps a
    * million-fold repeated chunk from landing in one task. */
  def dedupChunks(docs: DataFrame, keyCol: String, textCol: String,
      chunkWords: Int = 8,
      maxBroadcastRows: Long = DefaultMaxBroadcastRows): DataFrame = {
    val chunks = chunkExplode(docs, textCol, chunkWords, Seq(keyCol))
    val stats = chunks.groupBy(col("chunk"))
      .agg(count(lit(1)).as("__n"),
        min(struct(col(keyCol), col("pos"))).as("__w"))
    // repeated chunks only — small at any realistic duplicate rate;
    // pinned so the guard count and the probe see the same set without
    // re-running the corpus aggregate
    val rep = stats.filter(col("__n") > 1).select(col("chunk"), col("__w"))
      .localCheckpoint(true)
    lazy val fallbackKept = chunks.join(rep, Seq("chunk"), "left")
      .filter(col("__w").isNull ||
        struct(col(keyCol), col("pos")) === col("__w"))
      .drop("__w")
    if (rep.count() <= maxBroadcastRows) {
      // loser occurrences: map-side broadcast probe of the repeated set
      val losers = chunks.join(broadcast(rep), Seq("chunk"))
        .filter(struct(col(keyCol), col("pos")) =!= col("__w"))
        .select(col(keyCol), col("pos"))
      val dropPos = losers.groupBy(col(keyCol))
        .agg(collect_list(col("pos")).as("__drop"))
        .localCheckpoint(true)
      // guard on the TOTAL dropped-position mass, not the doc-row count:
      // one heavy-template doc can carry thousands of positions per row
      val dropMass = dropPos
        .agg(coalesce(sum(size(col("__drop"))), lit(0)).cast("long"))
        .head().getLong(0)
      if (dropMass <= maxBroadcastRows) {
        withChunkArr(docs, textCol, chunkWords, Seq(keyCol))
          .join(broadcast(dropPos), Seq(keyCol), "left")
          .withColumn("__kept", filter(col("__chunks"), (c, i) =>
            !coalesce(array_contains(col("__drop"), i), lit(false))))
          .filter(size(col("__kept")) > 0)
          .select(col(keyCol), array_join(col("__kept"), " ").as(textCol))
      } else reassemble(fallbackKept, Seq(keyCol), textCol)
    } else reassemble(fallbackKept, Seq(keyCol), textCol)
  }

  /** Surviving token count of a rebuilt text column (the shared
    * [[graft.functions.TextFunctions.tokens]] definition) — the mass
    * statistic both sub-document operators are judged by. */
  def tokenCount(text: Column): Column =
    size(graft.functions.TextFunctions.tokens(text))
}
