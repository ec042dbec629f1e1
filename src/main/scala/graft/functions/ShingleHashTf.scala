package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document shingle-hash occurrence counts as one native
  * expression: `array<struct<h bigint, cnt bigint>>` with one entry
  * per DISTINCT n-token-shingle poly-hash of the text and `cnt` its
  * occurrence count — the [[TokenTf]] idea applied to the
  * [[ShingleHashImpl]] stream (round 16: the curation span layer).
  *
  * Why: the span-hash state is per-window-occurrence data, but every
  * reader only consumes per-(doc, hash) totals — pre-reducing inside
  * the row shrinks the at-rest layer to the distinct hashes (with
  * exact occurrence counts carried), removes the exploded occurrence
  * stream from the fold's write path, and spares the drop-set reader
  * its per-occurrence aggregation. Entries in first-occurrence order
  * for deterministic retries.
  */
object ShingleHashTfImpl {
  def tf(input: UTF8String, n: Int, mult: Long): ArrayData = {
    if (input == null) return null
    val hs = ShingleHashImpl.hashes(input, n, mult)
    val m = hs.numElements()
    val counts = new java.util.LinkedHashMap[java.lang.Long, java.lang.Long](m * 2)
    var i = 0
    while (i < m) {
      val h = java.lang.Long.valueOf(hs.getLong(i))
      val c = counts.get(h)
      counts.put(h, if (c == null) 1L else c + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(e.getKey.longValue(), e.getValue.longValue())
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class ShingleHashTf(child: Expression, n: Int, mult: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "shingle_hash_tf"

  protected override def nullSafeEval(input: Any): Any =
    ShingleHashTfImpl.tf(input.asInstanceOf[UTF8String], n, mult)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = ShingleHashTfImpl.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$impl.tf($c, $n, ${mult}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashTf =
    copy(child = newChild)
}

object ShingleHashTf {
  /** Column API: distinct (shingle-hash, occurrence-count) pairs. */
  def shingleHashTf(text: Column, n: Int, mult: Long = 31L): Column =
    ColumnBridge.column(ShingleHashTf(ColumnBridge.expression(text), n, mult))
}
