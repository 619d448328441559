package graft.cnj

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** The CNJ tolerant-CSV parse as a CATALYST EXPRESSION: one line + its
  * file name → a 0-or-1-element array of the canonical struct, exploded
  * by the caller — the exact semantics of the previous `mapPartitions`
  * closure ([[Reader.splitCsv]] / [[Reader.parseDouble]] are REUSED, so
  * the two parse layers cannot drift), without its cost. The closure
  * form forced a Serialize/DeserializeToObject fence around the parse:
  * every one of the corpus's ~10M rows crossed from Tungsten rows to
  * external objects and back through the Row encoder, and the fence
  * split the scan → parse → aggregate chain out of whole-stage codegen.
  * As an expression inside a Generate, the parse runs where it reads —
  * UTF8String in, struct values out — and the surrounding stage stays
  * fused (measured on the 0.93 GB corpus: the parse stage alone dropped
  * ~11 s → ~4 s, paid twice per pipeline run).
  *
  * Skip semantics (identical to the closure): unknown file → skip (a
  * stream may list files that arrived after the spec snapshot), header
  * echo → skip, wrong token count → skip (pandas on_bad_lines='skip');
  * empty key cell → null; numeric cells via [[Reader.parseDouble]]
  * (empty/malformed/NaN → null).
  *
  * The per-file spec is resolved through a per-THREAD memo (partitions
  * are file splits, so consecutive rows share a file; expression
  * instances are shared across a stage's tasks, hence ThreadLocal, and
  * the memo key is cloned — the scan reuses its UTF8String buffer). */
private[cnj] final case class CnjParseLine(file: Expression, line: Expression,
    specs: Map[String, Reader.FileSpec])
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(file, line)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(Reader.canonicalSchema, containsNull = false)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(file = newChildren(0), line = newChildren(1))

  private val nKeys = CnjSchema.keyCols.length
  private val nOut = nKeys + CnjSchema.numericCols.length
  @transient private lazy val memo =
    new ThreadLocal[(UTF8String, Reader.FileSpec)]
  @transient private lazy val empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any = {
    val fRaw = file.eval(input)
    if (fRaw == null) return empty
    val f = fRaw.asInstanceOf[UTF8String]
    var m = memo.get()
    if (m == null || !m._1.equals(f)) {
      m = (f.clone(),
        specs.getOrElse(Reader.decodeFileUri(f.toString), null))
      memo.set(m)
    }
    val spec = m._2
    if (spec == null) return empty
    val lRaw = line.eval(input)
    if (lRaw == null) return empty
    val line0 = lRaw.toString
    val ln =
      if (line0.nonEmpty && line0.charAt(line0.length - 1) == '\r')
        line0.substring(0, line0.length - 1)
      else line0
    if (ln == spec.headerLine) return empty
    val parts = Reader.splitCsv(ln)
    if (parts.length != spec.width) return empty
    val arr = new Array[Any](nOut)
    val pos = spec.positions
    var i = 0
    while (i < nKeys) {
      val p = pos(i)
      arr(i) =
        if (p < 0 || parts(p).isEmpty) null else UTF8String.fromString(parts(p))
      i += 1
    }
    while (i < nOut) {
      val p = pos(i)
      arr(i) = if (p < 0) null else Reader.parseDouble(parts(p))
      i += 1
    }
    new GenericArrayData(Array[Any](new GenericInternalRow(arr)))
  }
}
