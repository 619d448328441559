package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._

/** Text-analysis operators over the documents table (beyond-reference
  * training-data pipeline capabilities): language id, quality scoring,
  * token counting, content fingerprinting. Every query has an exact
  * DuckDB oracle — the heuristics are expressed with the same string and
  * list primitives on both engines.
  */
object TextQueries {

  private def withScores(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).withColumn("toks", tokens(col("text")))
    langScores(col("toks")).foldLeft(base) {
      case (df, (lang, c)) => df.withColumn(s"s_$lang", c.cast(LongType))
    }
  }

  private val scoreColsSql = langStopwords.map { case (lang, words) =>
    val set = words.map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter(toks, t -> t IN ($set))) AS BIGINT) AS s_$lang"
  }.mkString(",\n      |  ")

  // ---- language id: argmax stopword hits, lexicographic tie-break.
  private def textLangid(s: SparkSession, dir: String): DataFrame = {
    val scored = withScores(s, dir)
    val scores = langStopwords.map { case (lang, _) => lang -> col(s"s_$lang") }
    scored
      .withColumn("predicted", predictedLang(scores))
      .select(Seq(col("doc_id"), col("lang").as("labeled")) ++
        scores.map { case (l, c) => c.as(s"s_$l") } :+ col("predicted"): _*)
      .orderBy(col("doc_id"))
  }

  private val textLangidSql = {
    val m = "GREATEST(s_de, s_en, s_es, s_fr, s_pt)"
    s"""WITH toked AS (
      |  SELECT doc_id, lang, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents
      |), scored AS (
      |  SELECT doc_id, lang AS labeled,
      |  $scoreColsSql
      |  FROM toked
      |)
      |SELECT doc_id, labeled, s_de, s_en, s_es, s_fr, s_pt,
      |  CASE WHEN $m = 0 THEN 'und'
      |       WHEN s_de = $m THEN 'de'
      |       WHEN s_en = $m THEN 'en'
      |       WHEN s_es = $m THEN 'es'
      |       WHEN s_fr = $m THEN 'fr'
      |       WHEN s_pt = $m THEN 'pt' END AS predicted
      |FROM scored ORDER BY doc_id""".stripMargin
  }

  // ---- quality scoring: token stats + stopword ratio + length gates.
  private def textQuality(s: SparkSession, dir: String): DataFrame =
    withScores(s, dir)
      .withColumn("n_toks", size(col("toks")).cast(LongType))
      .select(
        col("doc_id"),
        length(col("text")).cast(LongType).as("n_chars"),
        col("n_toks"),
        round(length(regexp_replace(col("text"), " ", "")).cast(DoubleType) /
          nullif(col("n_toks"), lit(0)), 4).as("avg_tok_len"),
        round(col("s_en").cast(DoubleType) / nullif(col("n_toks"), lit(0)), 4)
          .as("stopword_ratio"),
        (col("n_toks") >= 10 && col("n_toks") <= 500 &&
          (col("s_en") + col("s_de") + col("s_es") + col("s_fr") + col("s_pt")) > 0)
          .as("passes_quality"))
      .orderBy(col("doc_id"))

  private val textQualitySql =
    """WITH toked AS (
      |  SELECT doc_id, text, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents
      |), scored AS (
      |  SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_toks,
      |    CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','is','to'))) AS BIGINT) AS s_en,
      |    CAST(len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht'))) AS BIGINT) AS s_de,
      |    CAST(len(list_filter(toks, t -> t IN ('el','la','de','los','que','es'))) AS BIGINT) AS s_es,
      |    CAST(len(list_filter(toks, t -> t IN ('le','la','les','des','et','est'))) AS BIGINT) AS s_fr,
      |    CAST(len(list_filter(toks, t -> t IN ('o','a','de','que','do','os'))) AS BIGINT) AS s_pt
      |  FROM toked
      |)
      |SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_chars,
      |  n_toks,
      |  ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE) / NULLIF(n_toks, 0), 4) AS avg_tok_len,
      |  ROUND(CAST(s_en AS DOUBLE) / NULLIF(n_toks, 0), 4) AS stopword_ratio,
      |  (n_toks >= 10 AND n_toks <= 500 AND (s_en + s_de + s_es + s_fr + s_pt) > 0) AS passes_quality
      |FROM scored ORDER BY doc_id""".stripMargin

  // ---- token counting per source: whitespace + BPE-ish regex tokens.
  private def textTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"),
        size(tokens(col("text"))).cast(LongType).as("ws_toks"),
        bpeishTokenCount(col("text")).cast(LongType).as("lex_toks"))
      .groupBy(col("source"))
      .agg(sum(col("ws_toks")).as("sum_ws_toks"),
        sum(col("lex_toks")).as("sum_lex_toks"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("source"))

  private val textTokensSql =
    s"""SELECT source,
      |  CAST(SUM(CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)) AS BIGINT) AS sum_ws_toks,
      |  CAST(SUM(CAST(len(regexp_extract_all(text, '$bpeishPattern')) AS BIGINT)) AS BIGINT) AS sum_lex_toks,
      |  COUNT(*) AS n_docs
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---- content fingerprinting: md5 of the exact bytes, per-source dup stats.
  private def textFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), fingerprint(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(countDistinct(col("fp")).as("n_distinct"),
        count(lit(1)).as("n_docs"),
        min(col("fp")).as("min_fp"))
      .orderBy(col("source"))

  private val textFingerprintSql =
    """SELECT source,
      |  COUNT(DISTINCT md5(text)) AS n_distinct,
      |  COUNT(*) AS n_docs,
      |  MIN(md5(text)) AS min_fp
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // deterministic hash-based stratified sampling. The split hash is the
  // portable md5 bucket documented on graft.operators.Sampling, so the
  // oracle recomputes membership bit-for-bit in DuckDB — the
  // cross-engine reproducibility contract, checked end-to-end here.
  private def sampleStratified(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratifiedSample(
        Tables.documents(s, dir), col("lang"), Seq(col("doc_id")),
        Map("en" -> 20), defaultPct = 100)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"))

  private val sampleStratifiedSql =
    """WITH b AS (
      |  SELECT lang,
      |    CAST('0x' || substring(md5('0|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
      |      % 100 AS bkt
      |  FROM documents
      |)
      |SELECT lang, COUNT(*) AS n_docs
      |FROM b
      |WHERE bkt < CASE WHEN lang = 'en' THEN 20 ELSE 100 END
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ---- BM25 relevance scoring (k1 = 1.2, b = 0.75, Lucene idf) for a
  // fixed 3-term query: the inverted-scoring shape — tokens explode,
  // FILTER TO QUERY TERMS BEFORE THE SHUFFLE (the posting lists move,
  // not the corpus), tf/df aggregation, broadcast of the tiny df/stats
  // side. Per-term weights land in separate conditional sums added in a
  // FIXED order (w1 + w2 + w3), so the double result is independent of
  // aggregation order and bit-reproducible in the oracle — a plain
  // sum(w) would depend on which partial arrives first.
  private def textBm25(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("spark", "hash", "join")
    val k1 = 1.2
    val b = 0.75
    val toked = Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
    val dl = toked.select(col("doc_id"), size(col("toks")).cast(LongType).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = toked.select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val w = tf.join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("w",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    val perTerm = w.groupBy(col("doc_id")).agg(
      sum(when(col("term") === terms(0), col("w"))).as("w1"),
      sum(when(col("term") === terms(1), col("w"))).as("w2"),
      sum(when(col("term") === terms(2), col("w"))).as("w3"))
    perTerm
      .select(col("doc_id"),
        round(coalesce(col("w1"), lit(0.0)) + coalesce(col("w2"), lit(0.0)) +
          coalesce(col("w3"), lit(0.0)), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(15)
  }

  private val textBm25Sql =
    """WITH toked AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents
      |), sized AS (
      |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM toked WHERE len(toks) > 0
      |), stats AS (
      |  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM sized
      |), t AS (
      |  SELECT doc_id, unnest(toks) AS term FROM sized
      |), tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM t
      |  WHERE term IN ('spark', 'hash', 'join') GROUP BY 1, 2
      |), dfreq AS (
      |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1
      |), w AS (
      |  SELECT f.doc_id, f.term,
      |    ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) *
      |      (f.tf * 2.2) / (f.tf + 1.2 * (1.0 - 0.75 + 0.75 * z.dl / s.avgdl)) AS w
      |  FROM tf f JOIN dfreq d USING (term) JOIN sized z USING (doc_id) CROSS JOIN stats s
      |), agg AS (
      |  SELECT doc_id,
      |    SUM(CASE WHEN term = 'spark' THEN w END) AS w1,
      |    SUM(CASE WHEN term = 'hash' THEN w END) AS w2,
      |    SUM(CASE WHEN term = 'join' THEN w END) AS w3
      |  FROM w GROUP BY 1
      |)
      |SELECT doc_id,
      |  ROUND(COALESCE(w1, 0.0) + COALESCE(w2, 0.0) + COALESCE(w3, 0.0), 4) AS bm25
      |FROM agg ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin

  // ---- cleaning pipeline: whitespace-normalize -> strip URLs -> mask
  // digits; per-source before/after size accounting.
  private def textClean(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("cleaned",
        maskDigits(removeUrls(normalizeWhitespace(col("text")))))
      .groupBy(col("source"))
      .agg(
        sum(length(col("text"))).as("bytes_in"),
        sum(length(col("cleaned"))).as("bytes_out"),
        count(when(col("cleaned") =!= col("text"), 1)).as("n_changed"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("source"))

  private val textCleanSql =
    """WITH c AS (
      |  SELECT source, text,
      |    regexp_replace(regexp_replace(trim(regexp_replace(text, '\s+', ' ', 'g')),
      |      'https?://[^ ]+', '', 'g'), '[0-9]', '#', 'g') AS cleaned
      |  FROM documents
      |)
      |SELECT source,
      |  CAST(SUM(length(text)) AS BIGINT) AS bytes_in,
      |  CAST(SUM(length(cleaned)) AS BIGINT) AS bytes_out,
      |  COUNT(CASE WHEN cleaned <> text THEN 1 END) AS n_changed,
      |  COUNT(*) AS n_docs
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  // ---- Gopher-style repetition filtering (Rae et al. 2021 §A1.1): flag
  // documents whose word-2-gram distribution is dominated by repeats.
  // Per-doc stats come from the one-pass gram_stats expression — three
  // longs per document cross the shuffle, never a gram (the explode +
  // groupBy(doc, gram) formulation moves every occurrence). Per-source
  // rollup uses ratio-of-integer-sums + one final division, so the
  // doubles are bit-stable under any partial-aggregation order. The
  // flagged predicate is pure integer math ((n-d)*10 >= n  <=>  dup
  // fraction >= 0.1) — no float comparison can split the engines.
  private def textRepetition(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), gramStats(tokens(col("text")), 2).as("g"))
      .select(col("source"), col("g.n_grams").as("n_grams"),
        col("g.n_distinct").as("n_distinct"), col("g.top_count").as("top_count"))
      .filter(col("n_grams") > 0)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("top_count")).cast(DoubleType) / sum(col("n_grams")), 4)
          .as("top_gram_mass"),
        round(sum(col("n_grams") - col("n_distinct")).cast(DoubleType) /
          sum(col("n_grams")), 4).as("dup_gram_mass"),
        count(when((col("n_grams") - col("n_distinct")) * 10 >= col("n_grams"), 1))
          .as("n_flagged"))
      .orderBy(col("source"))

  private val textRepetitionSql =
    """WITH toked AS (
      |  SELECT doc_id, source, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, source,
      |    unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS gram
      |  FROM toked WHERE len(toks) >= 2
      |), cnt AS (
      |  SELECT doc_id, source, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2, 3
      |), per_doc AS (
      |  SELECT doc_id, source, SUM(c) AS n_grams, COUNT(*) AS n_distinct,
      |    MAX(c) AS top_count
      |  FROM cnt GROUP BY 1, 2
      |)
      |SELECT source,
      |  COUNT(*) AS n_docs,
      |  ROUND(CAST(SUM(top_count) AS DOUBLE) / SUM(n_grams), 4) AS top_gram_mass,
      |  ROUND(CAST(SUM(n_grams - n_distinct) AS DOUBLE) / SUM(n_grams), 4) AS dup_gram_mass,
      |  COUNT(CASE WHEN (n_grams - n_distinct) * 10 >= n_grams THEN 1 END) AS n_flagged
      |FROM per_doc GROUP BY source ORDER BY source""".stripMargin

  // ---- cross-document duplicate-8-gram contamination: for each doc, the
  // fraction of its distinct 8-grams that appear in at least one OTHER
  // document — the train-set-overlap / boilerplate diagnostic that
  // motivates substring-level dedup. Grams are md5-low-60 hashed BEFORE
  // the shuffle (8-byte keys instead of ~50-byte strings; same portable
  // formula as Sampling, so the oracle reproduces any collisions
  // bit-for-bit), df is a gram-keyed count, and the per-doc rollup is a
  // map-side-combinable integer aggregation. Top-20 by (frac desc,
  // doc_id) is a total order — deterministic under ties.
  private def gramContamination(s: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: the posting list feeds BOTH the df count and the
    // join-back; without it the tokenize+shingle+md5 pipeline (the
    // expensive part) runs twice. 16 bytes/gram of checkpoint, linear.
    val dg = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(shingles(tokens(col("text")), 8)).as("gram"))
      .select(col("doc_id"),
        conv(substring(md5(col("gram")), 1, 15), 16, 10).cast(LongType).as("gh"))
      .transform(graft.operators.Compute.checkpointSer) // grams-x-docs row count: serialized storage
    val gdf = dg.groupBy(col("gh")).agg(count(lit(1)).as("df"))
    dg.join(gdf, "gh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("df") > 1, 1)).as("n_shared"))
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        round(col("n_shared").cast(DoubleType) / col("n_grams"), 4).as("shared_frac"))
      .orderBy(col("shared_frac").desc, col("doc_id"))
      .limit(20)
  }

  private val gramContaminationSql =
    """WITH toked AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents
      |), dg AS (
      |  SELECT doc_id,
      |    CAST('0x' || substring(md5(unnest(list_distinct(list_transform(range(1, len(toks) - 6),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
      |           toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7])))), 1, 15)
      |      AS BIGINT) AS gh
      |  FROM toked WHERE len(toks) >= 8
      |), gdf AS (
      |  SELECT gh, COUNT(*) AS df FROM dg GROUP BY 1
      |), per_doc AS (
      |  SELECT d.doc_id, COUNT(*) AS n_grams,
      |    COUNT(CASE WHEN g.df > 1 THEN 1 END) AS n_shared
      |  FROM dg d JOIN gdf g USING (gh) GROUP BY 1
      |)
      |SELECT doc_id, n_grams, n_shared,
      |  ROUND(CAST(n_shared AS DOUBLE) / n_grams, 4) AS shared_frac
      |FROM per_doc ORDER BY shared_frac DESC, doc_id LIMIT 20""".stripMargin

  // ---- token-budget shard packing (graft.operators.Packing): fixed
  // 5000-token offsets over the doc_id order. The shard id is a pure
  // function of the exclusive prefix sum, so the single-threaded oracle
  // cumsum and the two-phase distributed cumsum must agree exactly.
  private def docsPackShards(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), size(tokens(col("text"))).cast(LongType).as("w"))
    graft.operators.Packing.packShards(docs, col("doc_id"), col("w"), 5000L)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("sum_toks"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard"))
  }

  private val docsPackShardsSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS w
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, w,
      |    COALESCE(SUM(w) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM t
      |)
      |SELECT CAST(cum // 5000 AS BIGINT) AS shard, COUNT(*) AS n_docs,
      |  CAST(SUM(w) AS BIGINT) AS sum_toks,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM c GROUP BY 1 ORDER BY shard""".stripMargin

  // ---- incremental dedup: which docs of an incoming batch (sources
  // src10+) already exist in the historical corpus (src0-src9), by
  // sorted-distinct-token-set fingerprint (bag-of-words normalization —
  // catches reorderings exact md5 misses). The old side folds into a
  // broadcast bloom filter; only bloom survivors enter the exact
  // semi-join (Dedup.incrementalDups), so the result is exactly the
  // semi-join answer while the batch itself never shuffles.
  private def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val fp = md5(concat_ws(" ", array_sort(array_distinct(tokens(col("text"))))))
    val docs = Tables.documents(s, dir)
      .withColumn("src_n", expr("CAST(substring(source, 4, 8) AS INT)"))
    val oldFps = docs.filter(col("src_n") < 10).select(fp.as("fp"))
    val newc = docs.filter(col("src_n") >= 10)
      .select(col("doc_id"), col("source"), fp.as("fp"))
    val dups = graft.operators.Dedup.incrementalDups(oldFps, newc)
    val nNew = newc.groupBy(col("source")).agg(count(lit(1)).as("n_new"))
    val nDup = dups.groupBy(col("source")).agg(count(lit(1)).as("n_dup"))
    nNew.join(nDup, Seq("source"), "left")
      .select(col("source"), col("n_new"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_vs_old"),
        (col("n_new") - coalesce(col("n_dup"), lit(0L))).as("n_kept"))
      .orderBy(col("source"))
  }

  private val dedupIncrementalSql =
    """WITH f AS (
      |  SELECT doc_id, source, CAST(substring(source, 4) AS INT) AS src_n,
      |    md5(list_aggregate(list_sort(list_distinct(
      |      list_filter(string_split(text, ' '), t -> t <> ''))), 'string_agg', ' ')) AS fp
      |  FROM documents
      |), oldc AS (
      |  SELECT DISTINCT fp FROM f WHERE src_n < 10
      |), newc AS (
      |  SELECT doc_id, source, fp FROM f WHERE src_n >= 10
      |), base AS (
      |  SELECT source, COUNT(*) AS n_new FROM newc GROUP BY 1
      |), d AS (
      |  SELECT source, COUNT(*) AS n_dup FROM newc
      |  WHERE fp IN (SELECT fp FROM oldc) GROUP BY 1
      |)
      |SELECT b.source, b.n_new, COALESCE(d.n_dup, 0) AS n_dup_vs_old,
      |  b.n_new - COALESCE(d.n_dup, 0) AS n_kept
      |FROM base b LEFT JOIN d USING (source) ORDER BY source""".stripMargin

  // ---- balanced corpus mixing: exactly 50 docs per language, selected
  // by portable-hash order statistics (Sampling.balancedSample, seed 7).
  // id_sum proves the engines picked the SAME 50 docs, not just the same
  // count.
  private def sampleBalanced(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.balancedSample(
        Tables.documents(s, dir), col("lang"), Seq(col("doc_id")),
        cap = 50, seed = 7L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("lang"))

  private val sampleBalancedSql =
    """WITH h AS (
      |  SELECT doc_id, lang,
      |    CAST('0x' || substring(md5('7|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS hh
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rn
      |  FROM h
      |)
      |SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(doc_id) AS BIGINT) AS id_sum
      |FROM r WHERE rn <= 50 GROUP BY lang ORDER BY lang""".stripMargin

  // ---- vocabulary building: top-30 corpus tokens by occurrence count
  // with document frequency — the vocab/tokenizer-training precursor.
  // Pure integer aggregation; (n_occ desc, token) is a total order.
  private def textVocab(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occ").desc, col("token"))
      .limit(30)

  private val textVocabSql =
    """WITH t AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      |  FROM documents
      |)
      |SELECT token, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
      |FROM t GROUP BY 1 ORDER BY n_occ DESC, token LIMIT 30""".stripMargin

  // ---- heavy hitters via the Misra-Gries sketch (capacity 512): top-10
  // tokens WITHOUT a token-keyed shuffle — each partition carries a
  // <=512-entry summary, merged once. Registered where distinct tokens
  // (~100 here) stay under capacity, so the sketch is provably exact and
  // the plain GROUP BY oracle must match it bit-for-bit; above capacity
  // it degrades to the n/capacity error bound (MisraGriesSpec).
  private def textHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.AggregateFunctions.heavyHitters
    Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .agg(heavyHitters(col("token"), 512).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.item").as("token"), col("e.cnt").as("n_occ"))
      .orderBy(col("n_occ").desc, col("token"))
      .limit(10)
  }

  private val textHeavyHittersSql =
    """WITH t AS (
      |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      |  FROM documents
      |)
      |SELECT token, COUNT(*) AS n_occ
      |FROM t GROUP BY 1 ORDER BY n_occ DESC, token LIMIT 10""".stripMargin

  // ---- corpus length profile: fixed-width (10-token) histogram of
  // document lengths — the sequence-length planning input for packing
  // and truncation budgets. Pure integer bucketing.
  private def textLengthHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(size(tokens(col("text"))).cast(LongType).as("n_toks"))
      .select(expr("n_toks div 10 * 10").as("bucket"), col("n_toks"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("sum_toks"))
      .orderBy(col("bucket"))

  private val textLengthHistogramSql =
    """WITH t AS (
      |  SELECT CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_toks
      |  FROM documents
      |)
      |SELECT n_toks // 10 * 10 AS bucket, COUNT(*) AS n_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS sum_toks
      |FROM t GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---- unigram-surprisal quality scoring (the perplexity-filter shape:
  // score docs by how unlikely their tokens are under the corpus unigram
  // LM; outliers are candidates for dropping). Per-token surprisal
  // ln(N/n_t) is QUANTIZED to integer milli-nats before summing, so the
  // per-doc sum is exact integer math under any aggregation order. Both
  // engines compute ln on the same rational, but libm log is not
  // correctly rounded: a 1-ulp JVM-vs-DuckDB difference landing exactly
  // on a .5 milli-nat boundary (~1e-9/token odds) could flip the rounded
  // integer — the cross-engine guarantee is probabilistic, not exact, so
  // an oracle mismatch here is investigated as quantization-boundary
  // noise before logic. (Same caveat: text_bm25's 4-decimal rounding.)
  // The token->count model is a broadcast join (the vocab is tiny
  // relative to the corpus).
  private def textSurprisal(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val model = tok.groupBy(col("token")).agg(count(lit(1)).as("n_t"))
    val total = tok.agg(count(lit(1)).as("n_total"))
    tok.join(broadcast(model), "token")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        round(log(col("n_total").cast(DoubleType) / col("n_t")) * lit(1000))
          .cast(LongType).as("millinats"))
      .groupBy(col("doc_id"))
      .agg(sum(col("millinats")).as("sum_mn"), count(lit(1)).as("n_toks"))
      .select(col("doc_id"), col("n_toks"),
        round(col("sum_mn") / lit(1000.0) / col("n_toks"), 4).as("surprisal"))
      .orderBy(col("surprisal").desc, col("doc_id"))
      .limit(15)
  }

  private val textSurprisalSql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      |  FROM documents
      |), model AS (
      |  SELECT token, COUNT(*) AS n_t FROM tok GROUP BY 1
      |), total AS (
      |  SELECT COUNT(*) AS n_total FROM tok
      |), scored AS (
      |  SELECT t.doc_id,
      |    CAST(round(ln(CAST(n_total AS DOUBLE) / n_t) * 1000) AS BIGINT) AS millinats
      |  FROM tok t JOIN model USING (token) CROSS JOIN total
      |)
      |SELECT doc_id, COUNT(*) AS n_toks,
      |  ROUND(SUM(millinats) / 1000.0 / COUNT(*), 4) AS surprisal
      |FROM scored GROUP BY 1 ORDER BY surprisal DESC, doc_id LIMIT 15""".stripMargin

  // ---- shard manifest: the artifact a training job consumes — for each
  // packed shard, its doc count, token budget usage, id range, and a
  // CONTENT hash (md5 over the per-doc md5s concatenated in doc_id
  // order) that pins the exact byte content of the shard, so a rerun on
  // any engine can prove shard-for-shard equality before training.
  private def docsManifest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), size(tokens(col("text"))).cast(LongType).as("w"),
        md5(col("text")).as("fp"))
    graft.operators.Packing.packShards(docs, col("doc_id"), col("w"), 5000L)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("sum_toks"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        md5(concat_ws("", array_sort(collect_list(struct(col("doc_id"), col("fp"))))
          .getField("fp"))).as("content_hash"))
      .orderBy(col("shard"))
  }

  private val docsManifestSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS w,
      |    md5(text) AS fp
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, w, fp,
      |    COALESCE(SUM(w) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM t
      |)
      |SELECT CAST(cum // 5000 AS BIGINT) AS shard, COUNT(*) AS n_docs,
      |  CAST(SUM(w) AS BIGINT) AS sum_toks,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
      |  md5(string_agg(fp, '' ORDER BY doc_id)) AS content_hash
      |FROM c GROUP BY 1 ORDER BY shard""".stripMargin

  // ---- bigram collocation mining via PMI (the phrase/tokenizer-merge
  // discovery statistic): top-20 bigrams by pointwise mutual information
  // among those occurring >= 5 times. Bigram extraction is a codegen'd
  // per-row pass (shinglesAll — multiset, no shuffle beyond the two
  // count aggregations); unigram and total counts come back as broadcast
  // joins, so the corpus-sized side never reshuffles. PMI is quantized
  // to integer milli-nats with the same probabilistic cross-engine
  // caveat as text_surprisal (both engines ln the same rational; a
  // 1-ulp libm difference at a .5 milli-nat boundary is ~1e-9/gram).
  private def textCollocations(s: SparkSession, dir: String): DataFrame = {
    val toked = Tables.documents(s, dir).select(tokens(col("text")).as("toks"))
    val uni = toked.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val nUni = uni.agg(sum(col("c_w")).as("n_uni"))
    val bi = toked.select(explode(shinglesAll(col("toks"), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c_ab"))
    val nBi = bi.agg(sum(col("c_ab")).as("n_bi"))
    bi.filter(col("c_ab") >= 5)
      .withColumn("w1", split_part(col("bg"), lit(" "), lit(1)))
      .withColumn("w2", split_part(col("bg"), lit(" "), lit(2)))
      .join(broadcast(uni.select(col("w").as("w1"), col("c_w").as("c_a"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("c_w").as("c_b"))), "w2")
      .crossJoin(broadcast(nUni))
      .crossJoin(broadcast(nBi))
      .withColumn("millinats", round(
        log((col("c_ab").cast(DoubleType) * col("n_uni") * col("n_uni")) /
            (col("n_bi").cast(DoubleType) * col("c_a") * col("c_b"))) * lit(1000))
        .cast(LongType))
      .select(col("bg").as("bigram"), col("c_ab").as("n_pair"),
        (col("millinats") / lit(1000.0)).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(20)
  }

  private val textCollocationsSql =
    """WITH t AS (
      |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents
      |), uni AS (
      |  SELECT unnest(toks) AS w FROM t
      |), uc AS (
      |  SELECT w, COUNT(*) AS c_w FROM uni GROUP BY 1
      |), nu AS (
      |  SELECT COUNT(*) AS n_uni FROM uni
      |), bgs AS (
      |  SELECT unnest(list_transform(range(1, len(toks)),
      |    i -> toks[i] || ' ' || toks[i + 1])) AS bg
      |  FROM t WHERE len(toks) >= 2
      |), bc AS (
      |  SELECT bg, COUNT(*) AS c_ab FROM bgs GROUP BY 1
      |), nb AS (
      |  SELECT COUNT(*) AS n_bi FROM bgs
      |)
      |SELECT b.bg AS bigram, b.c_ab AS n_pair,
      |  CAST(round(ln((CAST(b.c_ab AS DOUBLE) * n_uni * n_uni) /
      |    (CAST(n_bi AS DOUBLE) * a.c_w * c.c_w)) * 1000) AS BIGINT)
      |    / 1000.0 AS pmi
      |FROM bc b
      |JOIN uc a ON a.w = string_split(b.bg, ' ')[1]
      |JOIN uc c ON c.w = string_split(b.bg, ' ')[2]
      |CROSS JOIN nu CROSS JOIN nb
      |WHERE b.c_ab >= 5
      |ORDER BY pmi DESC, bigram LIMIT 20""".stripMargin

  // ---- quality-gate funnel (the filter report every corpus pipeline
  // publishes: how many docs each gate drops, per source). ONE codegen'd
  // pass computes every per-doc metric (tokens + gram_stats — no gram
  // ever shuffles), and all three gates are INTEGER comparisons
  // (cross-multiplied rationals), so the counts are engine-exact:
  // length >= 30 tokens; top-bigram mass <= 1/16 of grams; mean token
  // SPAN <= 5.8 chars (n_chars*10 <= n_toks*58 — n_chars counts the
  // separator spaces too, so the span is mean word length + ~1; the
  // equivalent cut on bare word length is ~4.8). The only shuffle is
  // the |sources|-row rollup.
  private def docsQualityGate(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .select(col("source"), col("n_chars"),
        size(col("toks")).cast(LongType).as("n_toks"),
        gramStats(col("toks"), 2).as("g"))
      .withColumn("len_ok", col("n_toks") >= 30)
      .withColumn("rep_ok",
        col("g.n_grams") === 0 || col("g.top_count") * 16 <= col("g.n_grams"))
      .withColumn("wordlen_ok", col("n_chars") * 10 <= col("n_toks") * 58)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        count(when(!col("len_ok"), 1)).as("n_len_fail"),
        count(when(!col("rep_ok"), 1)).as("n_rep_fail"),
        count(when(!col("wordlen_ok"), 1)).as("n_wordlen_fail"),
        count(when(col("len_ok") && col("rep_ok") && col("wordlen_ok"), 1))
          .as("n_kept"))
      .withColumn("keep_rate",
        round(col("n_kept").cast(DoubleType) / col("n_total"), 4))
      .orderBy(col("source"))

  private val docsQualityGateSql =
    """WITH toked AS (
      |  SELECT doc_id, source, n_chars,
      |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS gram
      |  FROM toked WHERE len(toks) >= 2
      |), cnt AS (
      |  SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2
      |), gs AS (
      |  SELECT doc_id, SUM(c) AS n_grams, MAX(c) AS top_count FROM cnt GROUP BY 1
      |), flags AS (
      |  SELECT t.source,
      |    (CAST(len(t.toks) AS BIGINT) >= 30) AS len_ok,
      |    (COALESCE(g.n_grams, 0) = 0 OR COALESCE(g.top_count, 0) * 16 <= g.n_grams) AS rep_ok,
      |    (t.n_chars * 10 <= CAST(len(t.toks) AS BIGINT) * 58) AS wordlen_ok
      |  FROM toked t LEFT JOIN gs g ON t.doc_id = g.doc_id
      |)
      |SELECT source, COUNT(*) AS n_total,
      |  COUNT(CASE WHEN NOT len_ok THEN 1 END) AS n_len_fail,
      |  COUNT(CASE WHEN NOT rep_ok THEN 1 END) AS n_rep_fail,
      |  COUNT(CASE WHEN NOT wordlen_ok THEN 1 END) AS n_wordlen_fail,
      |  COUNT(CASE WHEN len_ok AND rep_ok AND wordlen_ok THEN 1 END) AS n_kept,
      |  ROUND(CAST(COUNT(CASE WHEN len_ok AND rep_ok AND wordlen_ok THEN 1 END) AS DOUBLE)
      |    / COUNT(*), 4) AS keep_rate
      |FROM flags GROUP BY source ORDER BY source""".stripMargin

  // ---- mixture rebalancing weights (the dataset-mixing planning step:
  // what per-document sampling weight makes every language contribute
  // equally?). weight = total / (n_langs * n_docs_lang) — all-integer
  // until one final division, so both engines land on the identical
  // double. The output is a |langs|-row model meant to broadcast back
  // onto the corpus to drive weighted sampling (sample_balanced is the
  // exact-count take of the same idea).
  private def docsMixWeights(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val totals = counts.agg(sum(col("n_docs")).as("n_total"),
      count(lit(1)).as("n_langs"))
    counts.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_docs"),
        round(col("n_total").cast(DoubleType) /
          (col("n_langs") * col("n_docs")), 6).as("sample_weight"))
      .orderBy(col("lang"))
  }

  private val docsMixWeightsSql =
    """WITH c AS (
      |  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1
      |), t AS (
      |  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total, COUNT(*) AS n_langs FROM c
      |)
      |SELECT lang, n_docs,
      |  ROUND(CAST(n_total AS DOUBLE) / (n_langs * n_docs), 6) AS sample_weight
      |FROM c CROSS JOIN t ORDER BY lang""".stripMargin

  // ---- token-window chunking (the context-length shaping step before
  // training or embedding: overlapping 40-token windows at stride 30).
  // Pure map-side work — a bounded explode (~n_toks/stride rows per doc)
  // with NO shuffle; the final sort is presentation-only. Each chunk
  // carries an md5 content hash so any engine can verify chunk-for-chunk
  // equality of a re-run, same contract as docs_manifest.
  private def docsChunk(s: SparkSession, dir: String): DataFrame = {
    val chunkLen = 40
    val stride = 30
    Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      // a window starting past size-chunkLen adds no new token (its
      // content is a subset of the previous window), so the chunk count
      // is 1 + ceil((n - chunkLen)/stride) clamped at 1 — emitting the
      // naive ceil(n/stride) would duplicate suffixes whenever
      // n mod stride is in 1..(chunkLen-stride), over-weighting them in
      // a training corpus
      .withColumn("n_chunks",
        expr(s"1 + greatest(0L, (size(toks) - $chunkLen + $stride - 1) div $stride)"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("piece",
        slice(col("toks"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkLen)))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("piece")).cast(LongType).as("n_toks"),
        md5(concat_ws(" ", col("piece"))).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  private val docsChunkSql =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents
      |), n AS (
      |  SELECT doc_id, toks,
      |    1 + greatest(0, (len(toks) - 40 + 30 - 1) // 30) AS n_chunks
      |  FROM t WHERE len(toks) > 0
      |), c AS (
      |  SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx FROM n
      |)
      |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
      |  CAST(len(list_slice(toks, chunk_idx * 30 + 1, chunk_idx * 30 + 40)) AS BIGINT) AS n_toks,
      |  md5(array_to_string(list_slice(toks, chunk_idx * 30 + 1, chunk_idx * 30 + 40), ' ')) AS chunk_hash
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ---- bigram conditional-probability LM table — the count-based
  // n-gram language-model estimate P(w2|w1) = c(w1 w2)/c(w1), the
  // statistic KenLM-style models are built from. Same two count
  // aggregations as collocations (bigram extraction is a codegen'd
  // per-row pass; unigram counts come back as a broadcast join), but
  // the score is a pure rational of two exact integer counts — both
  // engines round-trip the identical double, so unlike the PMI query
  // there is NO libm caveat: the oracle is exact. Top 20 by support.
  private def textBigramLm(s: SparkSession, dir: String): DataFrame = {
    val toked = Tables.documents(s, dir).select(tokens(col("text")).as("toks"))
    val uni = toked.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val bi = toked.select(explode(shinglesAll(col("toks"), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("n_pair"))
    bi
      .withColumn("w1", split_part(col("bg"), lit(" "), lit(1)))
      .withColumn("w2", split_part(col("bg"), lit(" "), lit(2)))
      .join(broadcast(uni.select(col("w").as("w1"), col("c_w").as("n_w1"))), "w1")
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"),
        round(col("n_pair").cast(DoubleType) / col("n_w1"), 4).as("cond_p"))
      .orderBy(col("n_pair").desc, col("w1"), col("w2"))
      .limit(20)
  }

  private val textBigramLmSql =
    """WITH t AS (
      |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents
      |), uni AS (
      |  SELECT unnest(toks) AS w FROM t
      |), uc AS (
      |  SELECT w, COUNT(*) AS c_w FROM uni GROUP BY 1
      |), bi AS (
      |  SELECT unnest(list_transform(range(1, len(toks)),
      |    i -> toks[i] || ' ' || toks[i+1])) AS bg
      |  FROM t WHERE len(toks) >= 2
      |), bc AS (
      |  SELECT bg, COUNT(*) AS n_pair FROM bi GROUP BY 1
      |)
      |SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
      |  n_pair, uc.c_w AS n_w1,
      |  round(CAST(n_pair AS DOUBLE) / uc.c_w, 4) AS cond_p
      |FROM bc JOIN uc ON uc.w = split_part(bg, ' ', 1)
      |ORDER BY n_pair DESC, w1, w2 LIMIT 20""".stripMargin

  // ---- sub-document curation (operators.Subdoc): CCNet-style frequent-
  // chunk removal and Lee-et-al-style first-occurrence chunk dedup. The
  // synthetic corpus has no natural boilerplate, so both queries PLANT a
  // deterministic, chunk-aligned prefix (exactly 8/16 whitespace tokens,
  // so chunk 0 [and 1] of a planted doc is the plant and the original
  // content stays window-aligned) — replayed identically in the DuckDB
  // oracle, the dedup_semantic non-vacuity discipline. Both results pin
  // the REBUILT text per doc via an md5 checksum: a removal that strips
  // the wrong chunk, reorders chunks, or leaks a boilerplate copy fails
  // the hash, not just a count.
  private def txtChk(t: org.apache.spark.sql.Column) =
    pmod(conv(substring(md5(t), 1, 15), 16, 10).cast(LongType), lit(1000000007L))
  private val txtChkSql =
    "(CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) % 1000000007)"

  // one chunk (8 tokens): boilerplate header planted in ~2/3 of each
  // source's docs — past the 0.5 doc-frac cut
  private val BoilerPlant = "terms of service all rights reserved by"

  private def textBoilerplate(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Subdoc
    val planted = Tables.documents(s, dir).select(col("doc_id"), col("source"),
      when(col("doc_id") % 3 =!= 1,
          concat(lit(BoilerPlant + " "), col("source"), lit(" "), col("text")))
        .otherwise(col("text")).as("text"))
    // NOTE: the plant is 7 fixed tokens + the source name = 8 = one chunk
    Subdoc.dropBoilerplate(planted, "doc_id", "source", "text",
        chunkWords = 8, maxDocFrac = 0.5, minDocs = 2L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(Subdoc.tokenCount(col("text")).cast(LongType)).as("sum_toks"),
        sum(txtChk(col("text"))).as("txt_chk"))
      .orderBy(col("source"))
  }

  private val subdocChunksSql =
    """toked AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split(text, ' '), t -> t <> '') AS tk
      |  FROM planted
      |), chunks AS (
      |  SELECT doc_id, source,
      |    unnest(range((len(tk) + 7) // 8)) AS pos,
      |    unnest(list_transform(range((len(tk) + 7) // 8),
      |      i -> array_to_string(list_slice(tk, i*8 + 1, i*8 + 8), ' '))) AS chunk
      |  FROM toked WHERE len(tk) > 0
      |)""".stripMargin

  private val textBoilerplateSql =
    s"""WITH planted AS (
       |  SELECT doc_id, source,
       |    CASE WHEN doc_id % 3 <> 1
       |      THEN '$BoilerPlant ' || source || ' ' || text
       |      ELSE text END AS text
       |  FROM documents
       |), $subdocChunksSql, gd AS (
       |  SELECT source, COUNT(DISTINCT doc_id) AS gdocs FROM planted GROUP BY 1
       |), boiler AS (
       |  SELECT source, chunk FROM (
       |    SELECT source, chunk, COUNT(DISTINCT doc_id) AS df
       |    FROM chunks GROUP BY 1, 2) d
       |  JOIN gd USING (source)
       |  WHERE df >= 2 AND df > 0.5 * gdocs
       |), kept AS (
       |  SELECT c.* FROM chunks c
       |  WHERE NOT EXISTS (SELECT 1 FROM boiler b
       |    WHERE b.source = c.source AND b.chunk = c.chunk)
       |), rebuilt AS (
       |  SELECT doc_id, source, string_agg(chunk, ' ' ORDER BY pos) AS text
       |  FROM kept GROUP BY 1, 2
       |)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS sum_toks,
       |  CAST(SUM($txtChkSql) AS BIGINT) AS txt_chk
       |FROM rebuilt GROUP BY 1 ORDER BY 1""".stripMargin

  // two chunks (16 tokens): shared prefix planted in ~1/6 of docs — the
  // smallest planted doc_id keeps it, every other occurrence is dropped
  private val ParaPlant = "the quick brown fox jumps over the lazy " +
    "dog while the sly red hen naps quietly"

  private def dedupParagraphs(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Subdoc
    val planted = Tables.documents(s, dir).select(col("doc_id"),
      when(col("doc_id") % 6 === 2, concat(lit(ParaPlant + " "), col("text")))
        .otherwise(col("text")).as("text"))
    Subdoc.dedupChunks(planted, "doc_id", "text", chunkWords = 8)
      .join(Tables.documents(s, dir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(Subdoc.tokenCount(col("text")).cast(LongType)).as("sum_toks"),
        sum(txtChk(col("text"))).as("txt_chk"))
      .orderBy(col("source"))
  }

  private val dedupParagraphsSql =
    s"""WITH planted AS (
       |  SELECT doc_id, source,
       |    CASE WHEN doc_id % 6 = 2 THEN '$ParaPlant ' || text
       |      ELSE text END AS text
       |  FROM documents
       |), $subdocChunksSql, kept AS (
       |  SELECT doc_id, pos, chunk FROM (
       |    SELECT doc_id, pos, chunk,
       |      ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
       |    FROM chunks) w
       |  WHERE rn = 1
       |), rebuilt AS (
       |  SELECT k.doc_id, d.source,
       |    string_agg(k.chunk, ' ' ORDER BY k.pos) AS text
       |  FROM kept k JOIN documents d ON d.doc_id = k.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS sum_toks,
       |  CAST(SUM($txtChkSql) AS BIGINT) AS txt_chk
       |FROM rebuilt GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- curation pipeline e2e: the real pre-training shape — strip
  // boilerplate FIRST (so a shared header can't chain-link unrelated
  // docs in the dedup), then corpus-wide exact chunk dedup over the
  // REBUILT texts (chunk boundaries re-derived from the post-strip
  // token stream — both engines re-chunk identically), then a minimum-
  // token quality floor (25: between the corpus p5 and p25, so the gate
  // drops a real slice at every sf). Three operator stages composed as
  // one lazy plan; the oracle replays the identical three-stage chain
  // relationally, so a stage-interaction bug (dedup seeing pre-strip
  // chunks, the gate measuring pre-dedup mass, a doc resurrected
  // between stages) fails rows+schema+hash — the per-doc md5 checksum
  // pins the exact post-pipeline text.
  private def pipelineCurateCorpus(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Subdoc
    val planted = Tables.documents(s, dir).select(col("doc_id"), col("source"),
      when(col("doc_id") % 3 =!= 1,
          concat(lit(BoilerPlant + " "), col("source"), lit(" "), col("text")))
        .otherwise(col("text")).as("text"))
    // pin the rebuilt post-strip corpus ONCE: it has three consumers
    // (dedupChunks reads it twice internally — chunk explode + map-side
    // rebuild — plus the source join-back below), and unpinned each one
    // replays the whole tokenize + chunk + broadcast-filter rebuild.
    // The pinned plan is shuffle-free (the boilerplate decision set is
    // already pinned inside dropBoilerplate), so the checkpoint loses no
    // AQE; serialized storage per the repo's wide-text discipline.
    val clean = graft.operators.Compute.checkpointSer(
      Subdoc.dropBoilerplate(planted, "doc_id", "source", "text",
        chunkWords = 8, maxDocFrac = 0.5, minDocs = 2L))
    val deduped = Subdoc.dedupChunks(clean, "doc_id", "text", chunkWords = 8)
    deduped
      .join(clean.select(col("doc_id"), col("source")), Seq("doc_id"))
      .filter(Subdoc.tokenCount(col("text")) >= 25)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(Subdoc.tokenCount(col("text")).cast(LongType)).as("sum_toks"),
        sum(txtChk(col("text"))).as("txt_chk"))
      .orderBy(col("source"))
  }

  private val pipelineCurateCorpusSql =
    s"""WITH planted AS (
       |  SELECT doc_id, source,
       |    CASE WHEN doc_id % 3 <> 1
       |      THEN '$BoilerPlant ' || source || ' ' || text
       |      ELSE text END AS text
       |  FROM documents
       |), $subdocChunksSql, gd AS (
       |  SELECT source, COUNT(DISTINCT doc_id) AS gdocs FROM planted GROUP BY 1
       |), boiler AS (
       |  SELECT source, chunk FROM (
       |    SELECT source, chunk, COUNT(DISTINCT doc_id) AS df
       |    FROM chunks GROUP BY 1, 2) d
       |  JOIN gd USING (source)
       |  WHERE df >= 2 AND df > 0.5 * gdocs
       |), kept AS (
       |  SELECT c.* FROM chunks c
       |  WHERE NOT EXISTS (SELECT 1 FROM boiler b
       |    WHERE b.source = c.source AND b.chunk = c.chunk)
       |), rebuilt AS (
       |  SELECT doc_id, source, string_agg(chunk, ' ' ORDER BY pos) AS text
       |  FROM kept GROUP BY 1, 2
       |), toked2 AS (
       |  SELECT doc_id, source,
       |    list_filter(string_split(text, ' '), t -> t <> '') AS tk
       |  FROM rebuilt
       |), chunks2 AS (
       |  SELECT doc_id, source,
       |    unnest(range((len(tk) + 7) // 8)) AS pos,
       |    unnest(list_transform(range((len(tk) + 7) // 8),
       |      i -> array_to_string(list_slice(tk, i*8 + 1, i*8 + 8), ' '))) AS chunk
       |  FROM toked2 WHERE len(tk) > 0
       |), kept2 AS (
       |  SELECT doc_id, source, pos, chunk FROM (
       |    SELECT doc_id, source, pos, chunk,
       |      ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
       |    FROM chunks2) w
       |  WHERE rn = 1
       |), rebuilt2 AS (
       |  SELECT doc_id, source, string_agg(chunk, ' ' ORDER BY pos) AS text
       |  FROM kept2 GROUP BY 1, 2
       |)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS sum_toks,
       |  CAST(SUM($txtChkSql) AS BIGINT) AS txt_chk
       |FROM rebuilt2
       |WHERE len(list_filter(string_split(text, ' '), t -> t <> '')) >= 25
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("text_boilerplate", Some(textBoilerplateSql), textBoilerplate),
    QueryDef("dedup_paragraphs", Some(dedupParagraphsSql), dedupParagraphs),
    QueryDef("pipeline_curate_corpus", Some(pipelineCurateCorpusSql),
      pipelineCurateCorpus),
    QueryDef("text_clean", Some(textCleanSql), textClean),
    QueryDef("text_bigram_lm", Some(textBigramLmSql), textBigramLm),
    QueryDef("text_collocations", Some(textCollocationsSql), textCollocations),
    QueryDef("docs_chunk", Some(docsChunkSql), docsChunk),
    QueryDef("docs_mix_weights", Some(docsMixWeightsSql), docsMixWeights),
    QueryDef("docs_quality_gate", Some(docsQualityGateSql), docsQualityGate),
    QueryDef("sample_stratified", Some(sampleStratifiedSql), sampleStratified),
    QueryDef("text_langid", Some(textLangidSql), textLangid),
    QueryDef("text_quality", Some(textQualitySql), textQuality),
    QueryDef("text_tokens", Some(textTokensSql), textTokens),
    QueryDef("text_bm25", Some(textBm25Sql), textBm25),
    QueryDef("text_fingerprint", Some(textFingerprintSql), textFingerprint),
    QueryDef("text_repetition", Some(textRepetitionSql), textRepetition),
    QueryDef("dedup_contamination", Some(gramContaminationSql), gramContamination),
    QueryDef("docs_pack_shards", Some(docsPackShardsSql), docsPackShards),
    QueryDef("dedup_incremental", Some(dedupIncrementalSql), dedupIncremental),
    QueryDef("sample_balanced", Some(sampleBalancedSql), sampleBalanced),
    QueryDef("text_vocab", Some(textVocabSql), textVocab),
    QueryDef("text_heavy_hitters", Some(textHeavyHittersSql), textHeavyHitters),
    QueryDef("text_length_histogram", Some(textLengthHistogramSql), textLengthHistogram),
    QueryDef("text_surprisal", Some(textSurprisalSql), textSurprisal),
    QueryDef("docs_manifest", Some(docsManifestSql), docsManifest),
  )
}
