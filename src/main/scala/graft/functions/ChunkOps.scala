package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Sliding-window chunking as ONE native expression (round 17): the
  * per-row kernel of [[graft.operators.TextAnalysis.chunkWindows]] —
  * the front of every RAG encode pass (q164/q165/q170/q171/q172/q195/
  * q204 fold AND query encodes). The relational form ran a five-HOF
  * pyramid per row (`filter(tokens(...))` → `sequence` → `transform`
  * → `slice` → `array_join`) — all CodegenFallback, so the encode
  * projection never entered whole-stage codegen. Semantics replicated
  * exactly:
  *
  *   - tokens: Spark `trim` (ASCII 0x20 only) then Java-regex `\s+`
  *     split with limit -1, empty tokens dropped (the `length > 0`
  *     filter);
  *   - tokenless/null text → null (the old shape's `__n > 0` filter +
  *     non-outer posexplode drop the row either way);
  *   - nchunks = 1 + max(n − W + S − 1, 0) div S; chunk k covers
  *     tokens [k·S, min(k·S + W, n)), joined by one space.
  *
  * One entry per chunk: (chunk_idx, start_tok, n_toks, chunk_text) in
  * window order — identical values, column-for-column, to the old
  * posexplode output.
  */
object ChunkWindowsImpl {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def chunks(input: UTF8String, w: Int, s: Int): ArrayData = {
    if (input == null) return null
    val raw = input.toString
    var st = 0
    var en = raw.length
    while (st < en && raw.charAt(st) == ' ') st += 1
    while (en > st && raw.charAt(en - 1) == ' ') en -= 1
    val split = WS.split(raw.substring(st, en), -1)
    var nTok = 0
    var i = 0
    while (i < split.length) {
      if (split(i).length > 0) nTok += 1
      i += 1
    }
    if (nTok == 0) return null
    val toks = new Array[String](nTok)
    i = 0
    var j = 0
    while (i < split.length) {
      if (split(i).length > 0) { toks(j) = split(i); j += 1 }
      i += 1
    }
    val nChunks = (1L + math.max(nTok.toLong - w + s - 1L, 0L) / s).toInt
    val out = new Array[Any](nChunks)
    var k = 0
    while (k < nChunks) {
      val from = k * s
      val until = math.min(from + w, nTok)
      val sb = new java.lang.StringBuilder
      var t = from
      while (t < until) {
        if (t > from) sb.append(' ')
        sb.append(toks(t))
        t += 1
      }
      out(k) = InternalRow(k.toLong, from.toLong, (until - from).toLong,
        UTF8String.fromString(sb.toString))
      k += 1
    }
    new GenericArrayData(out)
  }
}

case class ChunkWindows(child: Expression, windowTokens: Int,
                        strideTokens: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("start_tok", LongType, nullable = false),
    StructField("n_toks", LongType, nullable = false),
    StructField("chunk_text", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "chunk_windows"

  protected override def nullSafeEval(input: Any): Any =
    ChunkWindowsImpl.chunks(input.asInstanceOf[UTF8String],
      windowTokens, strideTokens)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = ChunkWindowsImpl.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $impl.chunks($c, $windowTokens, $strideTokens);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkWindows =
    copy(child = newChild)
}

object ChunkOps {
  /** Column API: sliding-window chunks of text, one struct per chunk. */
  def chunkWindows(text: Column, windowTokens: Int,
                   strideTokens: Int): Column =
    ColumnBridge.column(ChunkWindows(ColumnBridge.expression(text),
      windowTokens, strideTokens))
}
