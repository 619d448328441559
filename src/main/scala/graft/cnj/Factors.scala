package graft.cnj

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The static per-branch factor dimension of the reference
  * (/root/reference/Versao_Np.py:41-61) re-expressed as a broadcastable
  * wide DataFrame: one row per mapped branch, one column per factor key.
  *
  * Lookup semantics (Versao_Np.py:10-30,122):
  *  1. branch remap: 'Tribunais Superiores' -> TST/STJ-specific branch by
  *     sigla; 'Justiça Eleitoral' -> 'Tribunal Superior Eleitoral';
  *  2. unmapped branch -> fall back to the whole 'Justiça Estadual' row;
  *  3. per-key fallback: a branch missing a factor key borrows the
  *     'Justiça Estadual' value for that key ('NA' if JE lacks it too).
  * Steps 2-3 are one coalesce(branch_factor, je_factor) after a broadcast
  * left join — two dict lookups become a single broadcast hash join.
  */
object Factors {

  /** Factor keys of the 13 standard metas, in config order. */
  val standardKeys: Seq[String] =
    Seq("2a", "2b", "2c", "2ant", "4a", "4b", "6", "7a", "7b", "8a", "8b", "10a", "10b")

  /** STJ-only whole-meta keys (Versao_Np.py:59). */
  val stjKeys: Seq[String] = Seq("8", "10")

  val allKeys: Seq[String] = standardKeys ++ stjKeys

  private val je: Map[String, Double] = Map(
    "2a" -> 1000.0 / 8, "2b" -> 1000.0 / 9, "2c" -> 1000.0 / 9.5, "2ant" -> 100.0,
    "4a" -> 1000.0 / 6.5, "4b" -> 100.0, "6" -> 100.0,
    "7a" -> 1000.0 / 5, "7b" -> 1000.0 / 5, "8a" -> 1000.0 / 7.5, "8b" -> 1000.0 / 9,
    "10a" -> 1000.0 / 9, "10b" -> 1000.0 / 10)

  /** Versao_Np.py:41-61 verbatim values (1000/x kept as expressions so the
    * doubles match the reference bit-for-bit). */
  val byBranch: Map[String, Map[String, Double]] = Map(
    "Justiça Estadual" -> je,
    "Justiça do Trabalho" -> Map(
      "2a" -> 1000.0 / 9.4, "2ant" -> 100.0, "4a" -> 1000.0 / 7, "4b" -> 100.0),
    "Justiça Federal" -> Map(
      "2a" -> 1000.0 / 8.5, "2b" -> 100.0, "2ant" -> 100.0, "4a" -> 1000.0 / 7, "4b" -> 100.0,
      "6" -> 1000.0 / 3.5, "7a" -> 1000.0 / 3.5, "7b" -> 1000.0 / 3.5,
      "8a" -> 1000.0 / 7.5, "8b" -> 1000.0 / 9, "10a" -> 100.0),
    "Justiça Militar da União" -> Map(
      "2a" -> 1000.0 / 9.5, "2b" -> 1000.0 / 9.9, "2ant" -> 100.0,
      "4a" -> 1000.0 / 9.5, "4b" -> 1000.0 / 9.9),
    "Justiça Militar Estadual" -> Map(
      "2a" -> 1000.0 / 9, "2b" -> 1000.0 / 9.5, "2ant" -> 100.0,
      "4a" -> 1000.0 / 9.5, "4b" -> 1000.0 / 9.9),
    "Tribunal Superior Eleitoral" -> Map(
      "2a" -> 1000.0 / 7.0, "2b" -> 1000.0 / 9.9, "2ant" -> 100.0,
      "4a" -> 1000.0 / 9, "4b" -> 1000.0 / 5),
    "Tribunal Superior do Trabalho" -> Map(
      "2a" -> 1000.0 / 8.5, "2b" -> 1000.0 / 9.9, "2ant" -> 100.0,
      "4a" -> 1000.0 / 7, "4b" -> 100.0),
    "Superior Tribunal de Justiça" -> Map(
      "2ant" -> 100.0, "4a" -> 1000.0 / 9, "4b" -> 100.0, "6" -> 1000.0 / 7.5,
      "7a" -> 1000.0 / 7.5, "7b" -> 1000.0 / 7.5, "8" -> 1000.0 / 10, "10" -> 1000.0 / 10))

  /** Column name for a factor key in the wide dimension DF. */
  def fcol(key: String): String = s"f_$key"

  /** Branch remap of Versao_Np.py:11-24 as a when-chain on the join key. */
  def ramoUsado(ramo: Column, sigla: Column): Column =
    when(ramo === "Tribunais Superiores",
      when(sigla === "TST", lit("Tribunal Superior do Trabalho"))
        .when(sigla === "STJ", lit("Superior Tribunal de Justiça"))
        .otherwise(ramo))
      .when(ramo === "Justiça Eleitoral", lit("Tribunal Superior Eleitoral"))
      .otherwise(ramo)

  /** Wide one-row-per-branch dimension DataFrame (8 x 16 — trivially
    * broadcastable at any fact scale). */
  def dimension(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(
      StructField("ramo_fatores", StringType, nullable = false) +:
        allKeys.map(k => StructField(fcol(k), DoubleType, nullable = true)))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]
    byBranch.toSeq.sortBy(_._1).foreach { case (ramo, fs) =>
      rows.add(Row.fromSeq(ramo +: allKeys.map(k =>
        fs.get(k).map(d => java.lang.Double.valueOf(d)).orNull)))
    }
    spark.createDataFrame(rows, schema)
  }

  /** Per-key effective factor after the two-level fallback: the joined
    * branch value if present, else the Justiça-Estadual constant, else null.
    * `joined` must already carry the dimension's f_* columns (possibly all
    * null when the branch missed the join entirely). */
  def effectiveFactor(key: String): Column =
    je.get(key) match {
      case Some(v) => coalesce(col(fcol(key)), lit(v))
      case None => col(fcol(key)) // '8'/'10' have no JE fallback
    }
}
