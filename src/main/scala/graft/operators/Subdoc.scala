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
  * decide per CHUNK, and reassemble the survivors in order.
  *
  * Scale shape, at 100 TB:
  *   - Chunks are bounded (`chunkWords` tokens, ~tens of bytes), so the
  *     chunk CONTENT is the shuffle key — the same order of bytes as the
  *     md5 fingerprints the whole-doc dedups shuffle, with exact
  *     (collision-free) equality semantics for free.
  *   - Both decisions are one partial-aggregable groupBy over the
  *     exploded chunks (document frequency / first occurrence) plus one
  *     shuffle join back — no window over the corpus, no driver state.
  *   - Reassembly is a groupBy per document collecting its own surviving
  *     chunks: the collect_list is bounded by the document's own size,
  *     the same per-key bound every tokenize step already has.
  */
object Subdoc {

  /** Explode `textCol` into fixed-width token chunks: one row per
    * (document, chunk position), `pos` 0-based, `chunk` the
    * space-rejoined window of `chunkWords` whitespace tokens (the last
    * chunk may be shorter). Empty/whitespace-only documents contribute
    * no rows. `carryCols` ride along unchanged (id, grouping columns). */
  def chunkExplode(docs: DataFrame, textCol: String, chunkWords: Int,
      carryCols: Seq[String]): DataFrame = {
    require(chunkWords >= 1, s"chunkWords must be >= 1, got $chunkWords")
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    // last chunk index: (n_toks - 1) div chunkWords — n_toks >= 1 here
    val lastIdx = floor((size(col("__toks")) - 1) / chunkWords).cast("int")
    docs.select(carryCols.map(col) :+ toks.as("__toks"): _*)
      .filter(size(col("__toks")) > 0)
      .select(carryCols.map(col) :+ posexplode(
        transform(sequence(lit(0), lastIdx), i =>
          array_join(slice(col("__toks"), i * chunkWords + 1, lit(chunkWords)), " ")))
        .as(Seq("pos", "chunk")): _*)
  }

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
    * at different offsets. The boilerplate set is small by construction
    * (frequency > maxDocFrac bounds it to < chunks/doc / maxDocFrac
    * distinct values), but the removal is expressed as a plain anti-join
    * keyed by (group, chunk) — the planner broadcasts it when small
    * without a collected driver set. */
  def dropBoilerplate(docs: DataFrame, keyCol: String, groupCol: String,
      textCol: String, chunkWords: Int = 8, maxDocFrac: Double = 0.5,
      minDocs: Long = 2L): DataFrame = {
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
    val kept = chunks.join(boiler, Seq(groupCol, "chunk"), "left_anti")
    reassemble(kept, Seq(keyCol, groupCol), textCol)
  }

  /** Corpus-wide exact chunk dedup, first occurrence wins (the
    * chunk-granularity approximation of Lee et al.'s exact-substring
    * dedup): every occurrence of an identical chunk except the one at
    * the smallest (`keyCol`, pos) — across ALL documents, including
    * repeats within one document — is dropped, and each document's text
    * is rebuilt from its surviving chunks in order. Returns one row per
    * surviving document (`keyCol`, rebuilt `textCol`); a document made
    * entirely of already-seen chunks disappears. Deterministic: the
    * winner is a total order over (key, pos), not arrival order. */
  def dedupChunks(docs: DataFrame, keyCol: String, textCol: String,
      chunkWords: Int = 8): DataFrame = {
    val chunks = chunkExplode(docs, textCol, chunkWords, Seq(keyCol))
    val winners = chunks.groupBy(col("chunk"))
      .agg(min(struct(col(keyCol), col("pos"))).as("__w"))
    val kept = chunks.join(winners, Seq("chunk"))
      .filter(struct(col(keyCol), col("pos")) === col("__w"))
      .drop("__w")
    reassemble(kept, Seq(keyCol), textCol)
  }

  /** Surviving whitespace-token count of a rebuilt text column — the
    * mass statistic both sub-document operators are judged by. */
  def tokenCount(text: Column): Column =
    size(filter(split(text, " "), t => t =!= ""))
}
