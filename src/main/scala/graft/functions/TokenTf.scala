package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term frequencies as one native expression:
  * `array<struct<token string, tf bigint>>` with one entry per
  * DISTINCT token of `tokens(text)` (the ASCII-space trim + Java
  * regex `\s+` split with limit -1, empty-edge tokens included) and
  * `tf` its occurrence count — the per-row kernel of the inverted-
  * index build ([[graft.operators.Lexical.buildPostings]]).
  *
  * Why: term frequency is a WITHIN-document count, so grouping the
  * exploded corpus-wide (token, doc) stream by (token, doc_id) pays
  * an Exchange of the whole postings table (plus per-token hash-agg
  * probes carrying doc_id) for per-row-pure work. This counts inside
  * the row and explodes the already-reduced pairs: the postings
  * build becomes a shuffle-free scan, and the multiset of emitted
  * (token, tf) rows is identical to the groupBy's output by
  * construction (entries in first-occurrence order for deterministic
  * retries; consumers aggregate or join, never rely on order).
  */
object TokenTfImpl {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** Static kernel — called from generated code. */
  def tf(input: UTF8String): ArrayData = {
    if (input == null) return null
    val raw = input.toString
    var st = 0
    var en = raw.length
    while (st < en && raw.charAt(st) == ' ') st += 1
    while (en > st && raw.charAt(en - 1) == ' ') en -= 1
    val toks = WS.split(raw.substring(st, en), -1)
    val counts =
      new java.util.LinkedHashMap[String, java.lang.Long](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val c = counts.get(t)
      counts.put(t, if (c == null) 1L else c + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(UTF8String.fromString(e.getKey),
        e.getValue.longValue())
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class TokenTf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "token_tf"

  protected override def nullSafeEval(input: Any): Any =
    TokenTfImpl.tf(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TokenTfImpl.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$impl.tf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenTf =
    copy(child = newChild)
}

object TokenTf {
  /** Column API: distinct (token, tf) pairs of text, per row. */
  def tokenTf(text: Column): Column =
    ColumnBridge.column(TokenTf(ColumnBridge.expression(text)))
}
