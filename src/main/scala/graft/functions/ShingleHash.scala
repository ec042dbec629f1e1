package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → n-token shingle → poly-hash, as one native
  * expression returning `array<long>` of per-shingle hashes.
  *
  * Semantically identical to
  * `transform(shingles(tokens(text), n), s => charPolyHash(s))`:
  * tokens split on the Java-regex `\s+` class after trim, shingles are
  * n consecutive tokens joined by a single space, and the hash folds
  * code points with `h = (h*mult + cp) mod (2^31-1)` — so the DuckDB
  * oracle replay (string shingles + list_reduce) is unchanged.
  *
  * It exists because profiling showed the HOF pipeline spends its time
  * MATERIALIZING the intermediate strings: per doc it allocates the
  * token array, one sliced array + one concatenated string per shingle,
  * then a per-char split array per hash. This expression is one pass
  * over the decoded text (each character touched n times), zero
  * intermediate strings. Measured ~8× on the sf0.1 shingle stage.
  */
object ShingleHashImpl {
  final val P = 2147483647L

  private def isSpace(c: Char): Boolean = // Java regex \s exactly
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def hashes(input: UTF8String, n: Int, mult: Long): ArrayData = {
    val s = input.toString
    // token [start, end) ranges over the raw string (trim = skip edges)
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isSpace(s.charAt(i))) i += 1
      if (i < len) {
        val st = i
        while (i < len && !isSpace(s.charAt(i))) i += 1
        starts.add(st); ends.add(i)
      }
    }
    val nTok = starts.size()
    // mirror shingles(tokens("")) == none, tokens("") == [""]:
    // an all-space string has the single empty token, so < n tokens
    val nSh = math.max(0, (if (nTok == 0 && n == 1) 1 else nTok) - n + 1)
    val out = new Array[Long](nSh)
    var w = 0
    while (w < nSh) {
      var h = 0L
      var j = w
      while (j < w + n) {
        if (j > w) h = (h * mult + ' '.toInt) % P
        if (nTok > 0) {
          var k = starts.get(j).intValue()
          val e = ends.get(j).intValue()
          while (k < e) {
            val cp = s.codePointAt(k)
            h = (h * mult + cp) % P
            k += Character.charCount(cp)
          }
        }
        j += 1
      }
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }
}

case class ShingleHash(child: Expression, n: Int, mult: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  protected override def nullSafeEval(input: Any): Any =
    ShingleHashImpl.hashes(input.asInstanceOf[UTF8String], n, mult)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = ShingleHashImpl.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$impl.hashes($c, $n, ${mult}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

object ShingleHash {
  /** Column API: array of poly-hashes of the n-token shingles of text. */
  def shingleHashes(text: Column, n: Int, mult: Long = 31L): Column =
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(text), n, mult))
}
