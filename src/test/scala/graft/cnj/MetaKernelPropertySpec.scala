package graft.cnj

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property-style differential test: random per-court datasets through the
  * Spark meta kernel vs an independent plain-Scala re-implementation of the
  * reference semantics (sum guards, den==0, optional dessobrestados,
  * half-even rounding). Values are drawn from a tiny set so zero
  * denominators and all-null columns occur constantly.
  */
class MetaKernelPropertySpec extends SparkTestBase {

  private val ramo = "Justiça Estadual"

  // factor VALUES are cross-checked against the reference elsewhere
  // (MetaKernelSpec, golden e2e); this property test exercises the kernel
  private lazy val jeFactors: Map[String, Double] = Factors.byBranch(ramo)

  // one court's data: per numeric column either absent (all-null) or a
  // short list of values drawn from {-1, 0, 1, 2, 2.5} with nulls mixed in
  private val cellGen: Gen[Option[Double]] =
    Gen.frequency(3 -> Gen.oneOf(-1.0, 0.0, 1.0, 2.0, 2.5).map(Some(_)),
      1 -> Gen.const(None))
  private def courtGen(sigla: String): Gen[Seq[Map[String, Option[Double]]]] =
    for {
      nRows <- Gen.choose(1, 4)
      colPresent <- Gen.sequence[Seq[Boolean], Boolean](
        CnjSchema.numericCols.map(_ => Gen.frequency(3 -> true, 1 -> false)))
      rows <- Gen.listOfN(nRows, Gen.sequence[Seq[Option[Double]], Option[Double]](
        CnjSchema.numericCols.map(_ => cellGen)))
    } yield rows.map { cells =>
      CnjSchema.numericCols.lazyZip(cells).lazyZip(colPresent).map {
        (c, v, present) => c -> (if (present) v else None)
      }.toMap
    }

  private def bround2(x: Double): Double =
    BigDecimal(x).setScale(2, RoundingMode.HALF_EVEN).toDouble

  /** calcular_meta of the reference, directly in Scala. */
  private def modelMeta(rows: Seq[Map[String, Option[Double]]],
      j: String, d: String, s: String, factor: Option[Double]): Option[Double] = {
    def vals(c: String) = rows.flatMap(_(c))
    if (vals(j).isEmpty || vals(d).isEmpty || vals(s).isEmpty) None
    else {
      val den = vals(d).sum - vals(s).sum
      factor match {
        case Some(f) if den != 0.0 =>
          val r = vals(j).sum / den * f
          if (r.isNaN || r.isInfinite) None else Some(bround2(r))
        case _ => None
      }
    }
  }

  private def modelMeta1(rows: Seq[Map[String, Option[Double]]]): Option[Double] = {
    def vals(c: String) = rows.flatMap(_(c))
    if (vals("julgados_2025").isEmpty || vals("casos_novos_2025").isEmpty ||
      vals("suspensos_2025").isEmpty) None
    else {
      val dess = vals("dessobrestados_2025").sum // empty -> 0
      val den = vals("casos_novos_2025").sum + dess - vals("suspensos_2025").sum
      if (den == 0.0) None
      else {
        val r = vals("julgados_2025").sum / den * 100.0
        if (r.isNaN || r.isInfinite) None else Some(bround2(r))
      }
    }
  }

  private val schema = StructType(
    CnjSchema.keyCols.map(StructField(_, StringType)) ++
      CnjSchema.numericCols.map(StructField(_, DoubleType)))

  test("resumoTyped matches the plain-Scala reference model on 5x25 random courts") {
    (0 until 5).foreach { round =>
      val courts = (0 until 25).map(i => f"T$round%d_$i%02d")
      val data: Map[String, Seq[Map[String, Option[Double]]]] = courts.map { sigla =>
        sigla -> courtGen(sigla)(Gen.Parameters.default, Seed(round * 1000L + sigla.hashCode))
          .getOrElse(fail(s"gen failed for $sigla"))
      }.toMap
      val sparkRows = data.toSeq.flatMap { case (sigla, rows) =>
        rows.map(m => Row.fromSeq(
          Seq(sigla, ramo) ++ CnjSchema.numericCols.map(c => m(c).orNull)))
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(sparkRows, 4), schema)

      val got = MetasJob.resumoTyped(spark, df).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(got.keySet === courts.toSet)

      courts.foreach { sigla =>
        val rows = data(sigla)
        val row = got(sigla)
        def gotVal(name: String): Option[Double] = {
          val i = row.fieldIndex(name)
          if (row.isNullAt(i)) None else Some(row.getDouble(i))
        }
        assert(gotVal("meta1") === modelMeta1(rows), s"$sigla meta1")
        CnjSchema.metaSpecs.foreach { spec =>
          val expected = modelMeta(rows, spec.j, spec.d, spec.s,
            jeFactors.get(spec.factorKey))
          // JE courts never get STJ metas, so no suppression applies
          assert(gotVal(spec.name) === expected, s"$sigla ${spec.name}")
        }
        CnjSchema.stjSpecs.foreach { spec =>
          assert(gotVal(spec.name) === None, s"$sigla ${spec.name} must be NA for JE")
        }
      }
    }
  }
}
