package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._

/** Corpus-curation operators a production training-data pipeline runs
  * before anything touches a tokenizer: PII redaction, learned-classifier
  * quality scoring, and perplexity-tercile bucketing (the CCNet
  * head/middle/tail split). Every query has an exact DuckDB oracle; the
  * regex subset is restricted to syntax Java regex and RE2 interpret
  * identically (no backreferences, no lookaround).
  */
object CurationQueries {

  // ---- PII detection + redaction ------------------------------------
  //
  // The harness documents table is synthetic word salad with no natural
  // PII, so the query PLANTS deterministic PII from doc_id arithmetic —
  // identically in both engines — and then detects and redacts it; the
  // oracle therefore exercises the actual regex/redaction logic, not a
  // vacuous all-zero scan. (CurationSpec covers realistic strings.)
  // Redaction order matters: emails first (they contain digits), then
  // IPv4, then long digit runs.
  private[queries] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[queries] val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[queries] val LongNumRe = "\\d{9,}"

  /** Counts of each PII class and the redacted form; pure map-side
    * per-row work (codegen'd regexps in the scan projection) — the only
    * shuffle is the tiny per-source aggregate. */
  private[queries] def piiColumns(text: Column): Seq[(String, Column)] = {
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      LongNumRe, "<NUM>")
    Seq(
      "n_emails" -> regexp_count(text, lit(EmailRe)).cast(LongType),
      "n_ips" -> regexp_count(text, lit(Ipv4Re)).cast(LongType),
      "n_longnums" -> regexp_count(text, lit(LongNumRe)).cast(LongType),
      "redacted" -> redacted)
  }

  private def textPii(s: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(s, dir).withColumn("aug",
      concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" host 10.0.0."),
            (col("doc_id") % 256).cast("string"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" acct "),
            (col("doc_id") + 100000000L).cast("string"))).otherwise(lit(""))))
    val cols = piiColumns(col("aug"))
    val scored = cols.foldLeft(planted) { case (df, (n, c)) => df.withColumn(n, c) }
    scored
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("n_emails") + col("n_ips") + col("n_longnums") > 0, 1))
          .as("n_pii_docs"),
        sum(col("n_emails")).as("n_emails"),
        sum(col("n_ips")).as("n_ips"),
        sum(col("n_longnums")).as("n_longnums"),
        sum(length(col("aug")).cast(LongType) - length(col("redacted")))
          .as("chars_delta"))
      .orderBy(col("source"))
  }

  private val textPiiSql =
    s"""WITH planted AS (
      |  SELECT source, text ||
      |    CASE WHEN doc_id % 5 = 0
      |         THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
      |    CASE WHEN doc_id % 7 = 0
      |         THEN ' host 10.0.0.' || (doc_id % 256) ELSE '' END ||
      |    CASE WHEN doc_id % 11 = 0
      |         THEN ' acct ' || (doc_id + 100000000) ELSE '' END AS aug
      |  FROM documents
      |), scored AS (
      |  SELECT source, aug,
      |    CAST(len(regexp_extract_all(aug, '$EmailRe')) AS BIGINT) AS n_emails,
      |    CAST(len(regexp_extract_all(aug, '$Ipv4Re')) AS BIGINT) AS n_ips,
      |    CAST(len(regexp_extract_all(aug, '$LongNumRe')) AS BIGINT) AS n_longnums,
      |    regexp_replace(regexp_replace(regexp_replace(aug,
      |      '$EmailRe', '<EMAIL>', 'g'),
      |      '$Ipv4Re', '<IP>', 'g'),
      |      '$LongNumRe', '<NUM>', 'g') AS redacted
      |  FROM planted
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |  COUNT(*) FILTER (WHERE n_emails + n_ips + n_longnums > 0) AS n_pii_docs,
      |  CAST(SUM(n_emails) AS BIGINT) AS n_emails,
      |  CAST(SUM(n_ips) AS BIGINT) AS n_ips,
      |  CAST(SUM(n_longnums) AS BIGINT) AS n_longnums,
      |  CAST(SUM(CAST(length(aug) AS BIGINT) - length(redacted)) AS BIGINT)
      |    AS chars_delta
      |FROM scored GROUP BY source ORDER BY source""".stripMargin

  // ---- hashed-linear classifier scoring ------------------------------
  //
  // The fastText-style quality-classifier shape: hash each token into one
  // of 64 buckets, look up a per-bucket weight, sum, normalize by token
  // count. The "model" here is a deterministic integer formula over the
  // portable md5 bucket (so the oracle recomputes it bit-for-bit); a real
  // model is a 64-float broadcast array — the PLAN is identical. Scoring
  // is entirely map-side via higher-order functions: no token explode, no
  // doc-keyed shuffle — a document never leaves its partition, only the
  // per-source roll-up moves. Integer weight sums make the aggregate
  // order-independent, hence exact on any engine.
  private def docsClassifierScore(s: SparkSession, dir: String): DataFrame = {
    val bucket = (t: Column) =>
      pmod(conv(substring(md5(concat(lit("w|"), t)), 1, 15), 16, 10)
        .cast(LongType), lit(64L))
    val weight = (t: Column) => (bucket(t) * 37L) % 21L - 10L
    Tables.documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .select(col("source"),
        size(col("toks")).cast(LongType).as("n_toks"),
        aggregate(transform(col("toks"), weight), lit(0L), _ + _).as("raw"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("raw") > 0, 1)).as("n_kept"),
        sum(col("raw")).as("sum_raw"),
        sum(col("n_toks")).as("sum_toks"))
      .withColumn("score_mean",
        round(col("sum_raw").cast(DoubleType) / col("sum_toks"), 4))
      .orderBy(col("source"))
  }

  private val docsClassifierScoreSql =
    """WITH toked AS (
      |  SELECT source, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents
      |), s AS (
      |  SELECT source, CAST(len(toks) AS BIGINT) AS n_toks,
      |    CAST(coalesce(list_sum(list_transform(toks, t ->
      |      ((CAST('0x' || substring(md5('w|' || t), 1, 15) AS BIGINT) % 64)
      |        * 37) % 21 - 10)), 0) AS BIGINT) AS raw
      |  FROM toked
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |  COUNT(*) FILTER (WHERE raw > 0) AS n_kept,
      |  CAST(SUM(raw) AS BIGINT) AS sum_raw,
      |  CAST(SUM(n_toks) AS BIGINT) AS sum_toks,
      |  ROUND(SUM(raw) * 1.0 / SUM(n_toks), 4) AS score_mean
      |FROM s GROUP BY source ORDER BY source""".stripMargin

  // ---- perplexity-tercile bucketing (CCNet head/middle/tail) ----------
  //
  // Per-doc unigram surprisal in integer milli-nats (the text_surprisal
  // quantization, so per-doc sums are aggregation-order exact), then each
  // language's docs split into exact terciles by rank:
  // bucket = 1 + ((rank-1) * 3) div n_lang. The rank comes from
  // Ranking.stratifiedRank — the two-phase range-partition formulation —
  // NOT a PARTITION BY lang window, which would sort an entire language
  // in one task at 100 TB. The oracle uses the plain row_number() window
  // (DuckDB runs at oracle scale); both produce the identical rank
  // because (score, doc_id) is a total order computed from the same
  // integers on both engines.
  private def docsPplBuckets(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("token"))
    // pinned once: the model has TWO consumers (the broadcast probe join
    // and the corpus-total fold below) and unpinned each replays the
    // full corpus explode + aggregate; vocabulary-sized, cheap to pin
    val model = tok.groupBy(col("token")).agg(count(lit(1)).as("n_t"))
      .localCheckpoint(true)
    // corpus token total from the (tiny) model, not a third scan of tok
    val total = model.agg(sum(col("n_t")).as("n_total"))
    val perDoc = tok.join(broadcast(model), "token")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("lang"),
        round(log(col("n_total").cast(DoubleType) / col("n_t")) * lit(1000))
          .cast(LongType).as("mn"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("mn")).as("sum_mn"), count(lit(1)).as("n_toks"))
      .withColumn("score", col("sum_mn").cast(DoubleType) / col("n_toks"))
    val ranked = graft.operators.Ranking.stratifiedRank(
      perDoc, col("lang"), Seq(col("score"), col("doc_id")))
    // per-lang totals from the ranked frame (localCheckpoint-ed inside
    // stratifiedRank) — NOT from perDoc, which would replay the whole
    // token pipeline a second time
    val counts = ranked.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    ranked.join(broadcast(counts), "lang")
      .withColumn("bucket", expr("((rnk - 1) * 3) div n_lang") + 1)
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("sum_mn")) / lit(1000.0) / sum(col("n_toks")), 4)
          .as("mean_surprisal"))
      .orderBy(col("lang"), col("bucket"))
  }

  private val docsPplBucketsSql =
    """WITH tok AS (
      |  SELECT doc_id, lang,
      |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      |  FROM documents
      |), model AS (
      |  SELECT token, COUNT(*) AS n_t FROM tok GROUP BY 1
      |), total AS (
      |  SELECT COUNT(*) AS n_total FROM tok
      |), per_doc AS (
      |  SELECT doc_id, lang,
      |    SUM(CAST(round(ln(CAST(n_total AS DOUBLE) / n_t) * 1000) AS BIGINT))
      |      AS sum_mn,
      |    COUNT(*) AS n_toks
      |  FROM tok JOIN model USING (token) CROSS JOIN total
      |  GROUP BY doc_id, lang
      |), ranked AS (
      |  SELECT lang, sum_mn, n_toks,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY sum_mn * 1.0 / n_toks, doc_id) AS rnk,
      |    COUNT(*) OVER (PARTITION BY lang) AS n_lang
      |  FROM per_doc
      |)
      |SELECT lang, CAST(1 + ((rnk - 1) * 3) // n_lang AS BIGINT) AS bucket,
      |  COUNT(*) AS n_docs,
      |  ROUND(SUM(sum_mn) / 1000.0 / SUM(n_toks), 4) AS mean_surprisal
      |FROM ranked GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin

  // ---- deterministic hash split (train/val/test) ---------------------
  //
  // The reproducible-split primitive every training pipeline needs: a
  // document's split is a pure function of its id (first two hex chars
  // of md5, compared lexicographically: < 'cc' ≈ 79.7% train, < 'e6' ≈
  // 10.2% val, rest test), so re-runs, engines, and backfills agree
  // without coordination. Pure map-side projection + tiny aggregate —
  // no shuffle carries document text; the same expression scales to any
  // corpus size and is the idiom for holdout carve-outs at 100 TB.
  private def docsSplitHash(s: SparkSession, dir: String): DataFrame = {
    val h = substring(md5(col("doc_id").cast("string")), 1, 2)
    Tables.documents(s, dir)
      .withColumn("split",
        when(h < "cc", "train").when(h < "e6", "val").otherwise("test"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast(LongType).as("sum_chars"))
      .orderBy(col("source"), col("split"))
  }

  private val docsSplitHashSql =
    """SELECT source,
      |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
      |         THEN 'train'
      |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
      |         THEN 'val'
      |       ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY source, split
      |ORDER BY source, split""".stripMargin

  // ---- deterministic per-group hash sample ---------------------------
  //
  // Uniform k-per-group sampling that is reproducible by construction:
  // rank by md5(doc_id) within each source and keep the first 20. Unlike
  // fraction-based sampling the result is engine- and run-independent
  // (the oracle is exact), and the rank<=k predicate is pushed below the
  // shuffle as a per-partition group-limit (WindowGroupLimit), so each
  // mapper forwards at most k rows per group — the shuffle carries
  // O(groups x k), not the corpus.
  private def sampleHashTopk(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 20)
      .select(col("source"), col("doc_id"), col("rnk"))
      .orderBy(col("source"), col("rnk"))
  }

  private val sampleHashTopkSql =
    """WITH ranked AS (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      |  FROM documents)
      |SELECT source, doc_id, CAST(rnk AS BIGINT) AS rnk
      |FROM ranked WHERE rnk <= 20
      |ORDER BY source, rnk""".stripMargin

  // ---- deterministic source interleave (curriculum mixing execution) --
  //
  // docs_mix_weights plans per-source sampling weights; this is the
  // EXECUTION side: emit a training order that round-robins the sources
  // (position = (rank-1)*n_sources + source_index), so a sequential
  // reader sees an even source mix in every prefix of the stream. Fully
  // deterministic, so the oracle is exact. Per-source ranks are pruned
  // to the first 200 below the shuffle (WindowGroupLimit — only the
  // head of each source moves); the source index is metadata-sized
  // (|sources| distinct values), so it is resolved on the driver as a
  // literal map — like the packShards offsets — instead of a
  // no-partition global window, which would move the (tiny) distinct
  // frame to one task and trip WindowExec's single-partition warning.
  private def docsInterleave(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    // sort by UTF-8 bytes (unsigned), NOT String.compareTo: Spark's
    // UTF8String ordering and DuckDB's binary collation both compare
    // UTF-8 bytes, and the two diverge from UTF-16 code-unit order for
    // supplementary-plane characters. Null sources are a contract
    // violation, not a silent NPE.
    val rawSources = docs.select(col("source")).distinct().collect()
      .map(r => Option(r.getString(0)))
    require(rawSources.forall(_.isDefined),
      "docsInterleave: null source value — filter or fill nulls first")
    val sources = rawSources.flatten.sortWith { (a, b) =>
      java.util.Arrays.compareUnsigned(
        a.getBytes("UTF-8"), b.getBytes("UTF-8")) < 0
    }
    val idx = typedlit(sources.zipWithIndex
      .map { case (src, i) => src -> (i + 1L) }.toMap)
    val r = docs.select(col("source"), col("doc_id"))
      .withColumn("rnk",
        row_number().over(Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .filter(col("rnk") <= 200)
    r.select(
        ((col("rnk") - 1) * lit(sources.length.toLong) +
          element_at(idx, col("source")) - 1)
          .cast(LongType).as("position"),
        col("source"), col("doc_id"))
      .orderBy(col("position"))
      .limit(200)
  }

  private val docsInterleaveSql =
    """WITH s AS (
      |  SELECT source, row_number() OVER (ORDER BY source) AS src_idx
      |  FROM (SELECT DISTINCT source FROM documents)
      |), n AS (SELECT COUNT(*) AS n_src FROM s),
      |r AS (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rnk
      |  FROM documents
      |)
      |SELECT CAST((r.rnk - 1) * n.n_src + s.src_idx - 1 AS BIGINT) AS position,
      |  r.source, r.doc_id
      |FROM r JOIN s USING (source) CROSS JOIN n
      |WHERE r.rnk <= 200
      |ORDER BY position LIMIT 200""".stripMargin

  // ---- DSIR importance selection (Sampling.importanceWeights) --------
  //
  // Target = lang 'en'. The synthetic texts share one vocabulary across
  // langs, so a real separation signal is PLANTED (the dedup_semantic
  // lesson: an oracle over a population with no signal is vacuous):
  // en docs get a deterministic ' wikitok wikitok factbox' suffix,
  // replayed identically in the oracle — the learned hashed-unigram
  // log-ratio model must then give (nearly) every en doc a positive
  // weight and the rest (noise-level) negative ones, and n_kept pins
  // that separation per lang. sum_mn is the exact integer milli-nat
  // mass (quantized per bucket BEFORE any cross-row sum — the
  // text_surprisal portability discipline; the 1-ulp libm-ln caveat
  // documented there applies to the 512 per-bucket constants here too).
  // The oracle left-joins docs back so a zero-token doc still counts in
  // n_docs with weight 0, matching the operator's HOF sum over an empty
  // token array.
  private val DsirPlant = " wikitok wikitok wikitok factbox factbox infobox"

  private def plantText(df: DataFrame): DataFrame =
    df.withColumn("text2", when(col("lang") === "en",
      concat(col("text"), lit(DsirPlant))).otherwise(col("text")))

  private def dsirAgg(scored: DataFrame): DataFrame =
    scored.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("dsir_millinats") > 0, lit(1))).as("n_kept"),
        sum(col("dsir_millinats")).as("sum_mn"),
        sum(col("dsir_n_toks")).as("sum_toks"))
      .orderBy(col("lang"))

  private def docsDsirSelect(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val planted = plantText(Tables.documents(s, dir))
    dsirAgg(Sampling.importanceWeights(planted, "text2",
      col("lang") === "en", buckets = 512))
  }

  // ---- DSIR streaming scorer (train batch / score STREAM) ------------
  //
  // The deployment shape the train/score split exists for: the model is
  // trained ONCE over the landed (planted) corpus — one aggregate, an
  // O(buckets) collect — then PINNED and applied to a readStream of the
  // same documents as a pure map-side projection into a parquet sink
  // (Trigger.AvailableNow drains the backlog and stops; a stream cannot
  // run the two-pass training aggregate itself). The SINK's files — not
  // an in-memory frame — are what the oracle judges: the aggregate over
  // them must equal docs_dsir_select's answer bit-for-bit (the oracle
  // SQL is shared verbatim), proving the streamed scorer emits the same
  // exact integer milli-nats as the batch one. Stateless: no watermark,
  // no state store, per-row cost independent of stream history; at
  // 100 TB the same pipeline just keeps running (each microbatch scores
  // its files and appends to the sink).
  private def docsDsirStream(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{IvfModelStore, Sampling}
    val model = Sampling.trainImportanceModel(
      plantText(Tables.documents(s, dir)), "text2", col("lang") === "en",
      buckets = 512)
    val work = s"${System.getProperty("java.io.tmpdir")}/graft_dsirstream_${IvfModelStore.dirKey(dir)}"
    val wp = new org.apache.hadoop.fs.Path(work)
    wp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(wp, true)
    // the table may be a SINGLE parquet file (the generated fixtures);
    // FileStreamSource force-sets basePath to a NON-glob path itself,
    // which then fails its own must-be-a-directory check — the {} glob
    // (matching the same literal name) suppresses that override so the
    // explicit directory basePath survives
    val docsPath = s"$dir/{documents.parquet}"
    val stream = plantText(s.readStream
      .schema(Tables.documents(s, dir).schema)
      .option("basePath", dir).parquet(docsPath))
    val q = Sampling.scoreImportance(stream, "text2", model)
      .select(col("doc_id"), col("lang"), col("dsir_millinats"),
        col("dsir_n_toks"))
      .writeStream.option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", s"$work/out").start()
    q.awaitTermination()
    dsirAgg(s.read.parquet(s"$work/out"))
  }

  private val docsDsirSelectSql =
    s"""WITH planted AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN lang = 'en' THEN text || '$DsirPlant' ELSE text END AS text2
       |  FROM documents
       |), tok AS (
       |  SELECT doc_id, lang,
       |    CAST('0x' || substring(md5('dsir|' ||
       |      unnest(list_filter(string_split(text2, ' '), x -> x <> ''))), 1, 15)
       |      AS BIGINT) % 512 AS b
       |  FROM planted
       |), model AS (
       |  SELECT b, COUNT(*) AS raw_n,
       |    COUNT(*) FILTER (WHERE lang = 'en') AS tgt_n
       |  FROM tok GROUP BY 1
       |), tot AS (
       |  SELECT SUM(raw_n) AS r_tot, SUM(tgt_n) AS t_tot FROM model
       |), lr AS (
       |  -- floor(x + 0.5), matching the Scala model builder exactly:
       |  -- round() is half-away-from-zero on negatives, Java half-up
       |  SELECT b, CAST(floor(1000 * (ln(tgt_n + 1.0) - ln(t_tot + 512.0)
       |    - ln(raw_n + 1.0) + ln(r_tot + 512.0)) + 0.5) AS BIGINT) AS mn
       |  FROM model CROSS JOIN tot
       |), scored AS (
       |  SELECT t.doc_id, SUM(lr.mn) AS s_mn, COUNT(*) AS n_toks
       |  FROM tok t JOIN lr USING (b) GROUP BY 1
       |), final AS (
       |  SELECT p.lang, COALESCE(s.s_mn, 0) AS s_mn,
       |    COALESCE(s.n_toks, 0) AS n_toks
       |  FROM planted p LEFT JOIN scored s ON p.doc_id = s.doc_id
       |)
       |SELECT lang, COUNT(*) AS n_docs,
       |  COUNT(*) FILTER (WHERE s_mn > 0) AS n_kept,
       |  CAST(SUM(s_mn) AS BIGINT) AS sum_mn,
       |  CAST(SUM(n_toks) AS BIGINT) AS sum_toks
       |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  def all: Seq[QueryDef] = Seq(
    QueryDef("text_pii", Some(textPiiSql), textPii),
    QueryDef("docs_dsir_select", Some(docsDsirSelectSql), docsDsirSelect),
    // shared oracle: the streamed scorer must land the batch answer
    QueryDef("docs_dsir_stream", Some(docsDsirSelectSql), docsDsirStream),
    QueryDef("docs_split_hash", Some(docsSplitHashSql), docsSplitHash),
    QueryDef("docs_interleave", Some(docsInterleaveSql), docsInterleave),
    QueryDef("sample_hash_topk", Some(sampleHashTopkSql), sampleHashTopk),
    QueryDef("docs_classifier_score", Some(docsClassifierScoreSql), docsClassifierScore),
    QueryDef("docs_ppl_buckets", Some(docsPplBucketsSql), docsPplBuckets),
  )
}
