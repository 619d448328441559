package graft.cnj

/** Canonical CNJ column universe — every column either version of the
  * reference ever reads (FIXTURES.md §1; /root/reference/Versao_Np.py:
  * 106-120,126,132,172,184). Input files carry arbitrary subsets; the
  * reader normalizes each file onto this set with nulls for the gaps,
  * which turns the reference's per-file `col in df.columns` existence
  * guards into plain count(col)>0 aggregate guards.
  */
object CnjSchema {

  val keyCols: Seq[String] = Seq("sigla_tribunal", "ramo_justica")

  val meta1Cols: Seq[String] =
    Seq("julgados_2025", "casos_novos_2025", "suspensos_2025", "dessobrestados_2025")

  /** (meta name, julgados col, distribuidos col, suspensos col, factor key)
    * — the 13-row config table of Versao_Np.py:106-120. */
  final case class MetaSpec(name: String, j: String, d: String, s: String, factorKey: String)

  val metaSpecs: Seq[MetaSpec] = Seq(
    MetaSpec("meta2a", "julgm2_a", "distm2_a", "suspm2_a", "2a"),
    MetaSpec("meta2b", "julgm2_b", "distm2_b", "suspm2_b", "2b"),
    MetaSpec("meta2c", "julgm2_c", "distm2_c", "suspm2_c", "2c"),
    MetaSpec("meta2ant", "julgm2_ant", "distm2_ant", "suspm2_ant", "2ant"),
    MetaSpec("meta4a", "julgm4_a", "distm4_a", "suspm4_a", "4a"),
    MetaSpec("meta4b", "julgm4_b", "distm4_b", "suspm4_b", "4b"),
    MetaSpec("meta6", "julgm6_a", "distm6_a", "suspm6_a", "6"),
    MetaSpec("meta7a", "julgm7_a", "distm7_a", "suspm7_a", "7a"),
    MetaSpec("meta7b", "julgm7_b", "distm7_b", "suspm7_b", "7b"),
    MetaSpec("meta8a", "julgm8_a", "distm8_a", "suspm8_a", "8a"),
    MetaSpec("meta8b", "julgm8_b", "distm8_b", "suspm8_b", "8b"),
    MetaSpec("meta10a", "julgm10_a", "distm10_a", "suspm10_a", "10a"),
    MetaSpec("meta10b", "julgm10_b", "distm10_b", "suspm10_b", "10b"))

  /** STJ-only whole-meta inputs — note `dism`, not `distm`
    * (Versao_Np.py:126,132). */
  val stjSpecs: Seq[MetaSpec] = Seq(
    MetaSpec("meta8_stj", "julgm8", "dism8", "suspm8", "8"),
    MetaSpec("meta10_stj", "julgm10", "dism10", "suspm10", "10"))

  /** All numeric (nullable double) columns. */
  val numericCols: Seq[String] =
    meta1Cols ++
      (metaSpecs ++ stjSpecs).flatMap(m => Seq(m.j, m.d, m.s))

  val allCols: Seq[String] = keyCols ++ numericCols
}
