package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory: the configuration this library is
  * designed against. On a cluster, master/partitions come from
  * spark-submit; locally the defaults match the local[32] harness.
  */
object GraftSession {

  /** Builder with the library's recommended configuration:
    *  - AQE on (runtime coalescing, skew-join splitting — the safety net
    *    behind the explicit salting/bucketing strategies in SCALE.md);
    *  - shuffle partitions sized to the core count, not the 200 default
    *    (at cluster scale: 2-3x total executor cores);
    *  - graft SQL functions registered via the session extension;
    *  - UTC timestamps for engine-portable semantics.
    */
  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")

  def getOrCreate(): SparkSession = builder().getOrCreate()
}
