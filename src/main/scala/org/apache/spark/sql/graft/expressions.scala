package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Column <-> catalyst Expression bridge. Lives under org.apache.spark.sql
  * because the Spark 4 conversion utilities are private[sql]; this is the
  * conventional shim for session-extension libraries and touches no Spark
  * internals beyond the two public-bytecode helpers.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Codegen'd dot product over two array<float> columns, accumulated in
  * double with per-element float->double promotion (bit-compatible with
  * DuckDB list_dot_product over DOUBLE[]-cast lists, which keeps the
  * similarity oracles exact).
  *
  * Reads UnsafeArrayData directly inside whole-stage codegen — no boxing,
  * no UDF serialization — so brute-force cosine scans stay CPU-bound at
  * scale. See graft.functions.VectorFunctions for the user-facing API.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Codegen'd random-hyperplane signature: packs the signs of `planes` dot
  * products into the low bits of a long. `planes` is a flattened
  * (nPlanes x dim) double array baked into the plan as a literal — the
  * LSH bucketing primitive for cosine ANN (one pass, no explode).
  */
case class HyperplaneSignBits(child: Expression, planes: Array[Double], dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {

  private val nPlanes = planes.length / dim
  require(nPlanes >= 1 && nPlanes <= 64, "1..64 hyperplanes fit a long")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sign_bits"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    var bits = 0L
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var i = 0
      val off = p * dim
      while (i < n) { acc += x.getFloat(i).toDouble * planes(off + i); i += 1 }
      if (acc > 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val bits = ctx.freshName("bits")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $dim);
         |long $bits = 0L;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $acc = 0.0;
         |  final int off = $p * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $x.getFloat($i) * $planesRef[off + $i];
         |  }
         |  if ($acc > 0) $bits |= (1L << $p);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
