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
}
