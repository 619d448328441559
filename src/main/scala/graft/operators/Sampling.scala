package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Hash-based, not RNG-based: membership depends only on the row's key
  * and the seed, so samples are reproducible across runs, partitionings,
  * and cluster sizes, and disjoint splits stay disjoint when data is
  * appended (the property train/test splits actually need; df.sample's
  * per-partition RNG gives none of it).
  *
  * CROSS-ENGINE REPRODUCIBILITY CONTRACT: the bucket hash is defined in
  * portable terms — `md5("<seed>|<key1>|<key2>...")`, first 15 hex chars
  * parsed base-16, mod `buckets` — not an engine-internal hash, so any
  * system with md5 recomputes membership bit-for-bit. E.g. DuckDB:
  * `CAST('0x' || substring(md5(seed || '|' || key), 1, 15) AS BIGINT)
  * % 100 < pct`. That is the actual selling point of hash-sampling: the
  * training pipeline, the eval pipeline, and an auditor on a different
  * engine all agree on which rows are in the split. (md5 here is a
  * codegen'd expression over short key strings — not a bottleneck; the
  * bucket distribution on the low 60 bits is uniform.)
  */
object Sampling {

  private def bucket(keys: Seq[Column], seed: Long, buckets: Int): Column =
    pmod(
      conv(substring(md5(concat_ws("|", (lit(seed) +: keys).map(_.cast("string")): _*)),
        1, 15), 16, 10).cast("long"),
      lit(buckets))

  /** Keep ~pct% of rows, keyed on `keys`. */
  def hashSample(df: DataFrame, keys: Seq[Column], pct: Int,
      seed: Long = 0L): DataFrame = {
    require(pct >= 0 && pct <= 100)
    df.filter(bucket(keys, seed, 100) < pct)
  }

  /** Disjoint deterministic split: (train, held-out) with ~heldOutPct%
    * held out. Appended rows land on the same side forever. */
  def holdoutSplit(df: DataFrame, keys: Seq[Column], heldOutPct: Int,
      seed: Long = 0L): (DataFrame, DataFrame) = {
    val b = bucket(keys, seed, 100)
    (df.filter(b >= heldOutPct), df.filter(b < heldOutPct))
  }

  /** Per-stratum hash sampling: fraction per value of `stratum`
    * (e.g. cap the dominant language, keep all of the rare ones). */
  def stratifiedSample(df: DataFrame, stratum: Column, keys: Seq[Column],
      pctByStratum: Map[String, Int], defaultPct: Int,
      seed: Long = 0L): DataFrame = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) {
      case (acc, (value, p)) => when(stratum === value, lit(p)).otherwise(acc)
    }
    df.filter(bucket(keys, seed, 100) < pct)
  }

  /** EXACTLY `cap` rows per stratum (fewer if the stratum is smaller):
    * rows are ranked inside each stratum by the portable hash (ties ->
    * key order) and the first `cap` kept — the corpus-mixing /
    * class-rebalancing step of a training pipeline. Unlike pct-based
    * hash sampling (~pct%, binomial jitter), the count is exact; like
    * it, membership is a pure function of (seed, keys) order statistics,
    * so it's reproducible across runs, partitionings, and engines.
    *
    * SCALE: the rank is a per-stratum window — parallel across strata;
    * within one stratum it is a sort of that stratum's rows in their
    * hash-partitioned group, never a global single-task sort. A
    * heavily-skewed giant stratum can pre-thin with hashSample down to
    * O(cap) expected rows before the exact rank.
    */
  def balancedSample(df: DataFrame, stratum: Column, keys: Seq[Column],
      cap: Int, seed: Long = 0L): DataFrame = {
    require(cap >= 1, "cap >= 1")
    val h = conv(substring(md5(concat_ws("|",
      (lit(seed) +: keys).map(_.cast("string")): _*)), 1, 15), 16, 10)
      .cast("long")
    val w = Window.partitionBy(stratum).orderBy(h.asc, keys.head.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** DSIR-style importance weighting (the shape of Xie et al., "Data
    * Selection for Language Models via Importance Resampling", 2023 —
    * hashed-n-gram importance weights between a target and a raw
    * distribution): score each document by how much likelier its tokens
    * are under the TARGET token distribution than under the RAW corpus
    * distribution, both estimated over `buckets` hashed unigram buckets.
    * The returned frame is `docs` plus two columns —
    * `dsir_millinats`: Σ_tokens round(1000·ln(p̂_target(b)/p̂_raw(b)))
    * over the document's token buckets (Laplace-smoothed, integer
    * milli-nats), and `dsir_n_toks`: its token count — so callers
    * threshold on the sum or on the per-token mean, or resample with
    * weight exp(millinats/1000) (a null `textCol` yields a null weight).
    *
    * EXECUTION SHAPE, sized for a 100 TB corpus:
    *   - Pass 1 estimates BOTH distributions in ONE aggregate: tokens
    *     explode map-side into ≤ `buckets` keys (count + conditional
    *     count), so the shuffle carries at most buckets×partitions
    *     combiner rows — model estimation never moves the corpus.
    *   - The model collected to the driver is `buckets` longs (bounded
    *     by the argument, the IVF-centroid pattern: a MODEL is the one
    *     thing an operator may collect), folded into an integer
    *     log-ratio array literal.
    *   - Pass 2 scores map-side only: a codegen'd HOF sums each
    *     document's bucket ratios against the broadcast literal in
    *     array order — integer adds, deterministic on any engine, and a
    *     document never leaves its partition.
    *
    * PORTABILITY: buckets come from the [[Sampling]] md5 contract
    * (`md5("dsir|" + token)`, first 15 hex digits, mod `buckets`), so
    * any engine recomputes membership exactly; the per-bucket ratio is
    * quantized to milli-nat INTEGERS before any cross-row sum (the
    * text_surprisal discipline — all downstream arithmetic is exact,
    * with the documented 1-ulp libm-`ln` rounding caveat confined to
    * the `buckets` per-bucket constants). */
  def importanceWeights(docs: DataFrame, textCol: String, isTarget: Column,
      buckets: Int = 1024): DataFrame =
    scoreImportance(docs, textCol,
      trainImportanceModel(docs, textCol, isTarget, buckets))

  private def tokBucket(t: Column, buckets: Int): Column = pmod(
    conv(substring(md5(concat(lit("dsir|"), t)), 1, 15), 16, 10).cast("long"),
    lit(buckets.toLong))

  /** [[importanceWeights]]' TRAINING half alone: the per-bucket integer
    * milli-nat log-ratio array (index = `md5("dsir|" + token)` mod its
    * length). One map-side-combinable aggregate estimates both
    * distributions; the collect is O(buckets) — a MODEL, the one thing an
    * operator may collect. Train once at landing, then [[scoreImportance]]
    * any frame with it — including a STREAM, which cannot run the training
    * aggregate itself (two-pass over unbounded input): the train-batch /
    * score-anywhere split every deployed quality scorer has. */
  def trainImportanceModel(docs: DataFrame, textCol: String,
      isTarget: Column, buckets: Int = 1024): Array[Long] = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be in [2, 2^20] (the model is collected), got $buckets")
    import graft.functions.TextFunctions.tokens
    val model = docs
      .select(isTarget.as("__tgt"), explode(tokens(col(textCol))).as("__t"))
      .groupBy(tokBucket(col("__t"), buckets).as("__b"))
      .agg(count(lit(1)).as("__raw"),
        count(when(col("__tgt"), lit(1))).as("__tgtn"))
      .collect()
    val raw = new Array[Long](buckets)
    val tgt = new Array[Long](buckets)
    model.foreach { r =>
      val b = r.getLong(0).toInt
      raw(b) = r.getLong(1)
      tgt(b) = r.getLong(2)
    }
    val totalRaw = raw.sum.toDouble
    val totalTgt = tgt.sum.toDouble
    (0 until buckets).map { b =>
      // quantize as floor(x + 0.5), spelled the SAME way in the DuckDB
      // oracle: log-ratios can be NEGATIVE, where JVM Math.round
      // (half-up: -2.5 -> -2) and SQL round() (half-away-from-zero:
      // -2.5 -> -3) disagree at exact .5 boundaries — one explicit
      // formula on both sides closes that cross-engine divergence mode
      // (the Dequantize8 discipline; the 1-ulp libm-ln caveat remains)
      math.floor(1000.0 *
        (math.log(tgt(b) + 1.0) - math.log(totalTgt + buckets)
          - math.log(raw(b) + 1.0) + math.log(totalRaw + buckets)) + 0.5).toLong
    }.toArray
  }

  /** Score ANY frame — batch or streaming — with a pinned importance
    * model: adds `dsir_millinats` (Σ per-token bucket ratios, exact
    * integer) and `dsir_n_toks`. Pure map-side projection (codegen'd HOF
    * against the broadcast model literal; plan-asserted exchange-free in
    * PlanShapeSpec), so it drops into a `readStream` pipeline unchanged —
    * no state, no watermark, per-row cost independent of stream history. */
  def scoreImportance(df: DataFrame, textCol: String,
      model: Array[Long]): DataFrame = {
    require(model.length >= 2, s"model must have >= 2 buckets, got ${model.length}")
    import graft.functions.TextFunctions.tokens
    val mnLit = typedlit(model.toSeq)
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("dsir_millinats",
        aggregate(transform(col("__toks"),
          t => get(mnLit, tokBucket(t, model.length).cast("int"))),
          lit(0L), _ + _))
      .withColumn("dsir_n_toks", size(col("__toks")).cast("long"))
      .drop("__toks")
  }
}
