package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Hash-based, not RNG-based: membership depends only on the row's key
  * and the seed, so samples are reproducible across runs, partitionings,
  * and cluster sizes, and disjoint splits stay disjoint when data is
  * appended (the property train/test splits actually need; df.sample's
  * per-partition RNG gives none of it).
  */
object Sampling {

  private def bucket(keys: Seq[Column], seed: Long, buckets: Int): Column =
    pmod(xxhash64(lit(seed) +: keys: _*), lit(buckets))

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
}
