package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → bucket-hash → signed count vector, as one native
  * expression returning the `array<double>` feature-hash embedding
  * ([[graft.operators.Embed.hashEmbed]]'s per-row kernel).
  *
  * Semantically identical to the original relational formulation
  * (explode(tokens(text)) → per-token bucket `pmod(polyHash(tok), dim)`
  * and sign `pmod(polyHash(tok || "|sign"), 2)` → per-(doc, bucket)
  * signed sum → dense assembly): tokenization IS
  * `split(trim(text), "\s+")` — the ASCII-space trim plus the Java
  * regex split with limit -1, including the empty-token edge cases a
  * hand-rolled scanner would miss (empty text → one "" token; leading
  * or trailing non-space whitespace → an empty edge token) — and both
  * hashes fold code points with `h = (h*31 + cp) mod (2^31-1)`, the
  * sign hash continuing the token's fold over the literal "|sign"
  * instead of materializing the concatenated string. NULL text folds
  * zero tokens: the zero vector, never NULL (the hashEmbed contract —
  * a silent row drop would shrink every downstream join), so the
  * expression is non-nullable and evaluates the child's null directly.
  *
  * It exists for the same reason as [[ShingleHash]]: the per-row fold
  * is the hot kernel of every embed pass (q121/q122/q164/q170/q195/
  * q204 and the ANN build loops that re-scan embeds), and the
  * relational shape paid 3 Exchanges + a map build + a join-back for
  * per-row-pure work, while the HOF reformulation falls out of
  * whole-stage codegen (higher-order functions are CodegenFallback).
  * This is one generated static call per row: zero Exchange, zero
  * intermediate rows, integer sums bit-equal to the grouped
  * formulation (addition commutes).
  */
object HashEmbedImpl {
  final val P = 2147483647L // 2^31 - 1
  private val WS = java.util.regex.Pattern.compile("\\s+")
  // "|sign" as code points, pre-decoded once
  private val SIGN_SUFFIX: Array[Int] = "|sign".codePoints().toArray

  /** Continue the poly-hash fold over s[from, to). */
  private def fold(h0: Long, s: String): Long = {
    var h = h0
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Static kernel — called from generated code. Null text → zeros. */
  def embed(input: UTF8String, dim: Int): ArrayData = {
    val acc = new Array[Double](dim)
    if (input != null) {
      val raw = input.toString
      // Spark trim(): ASCII spaces (0x20) only — NOT String.trim,
      // which also strips control chars and would change the token set
      var st = 0
      var en = raw.length
      while (st < en && raw.charAt(st) == ' ') st += 1
      while (en > st && raw.charAt(en - 1) == ' ') en -= 1
      val s = raw.substring(st, en)
      // the exact split the relational form ran (Java regex, limit -1)
      val toks = WS.split(s, -1)
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        val ht = fold(0L, t)
        // sign = polyHash(t || "|sign"): continue t's fold over "|sign"
        var hs = ht
        var j = 0
        while (j < SIGN_SUFFIX.length) {
          hs = (hs * 31L + SIGN_SUFFIX(j)) % P
          j += 1
        }
        // ht, hs >= 0 so % is pmod
        acc((ht % dim).toInt) += (if (hs % 2L == 0L) 1.0 else -1.0)
        i += 1
      }
    }
    new GenericArrayData(acc)
  }
}

case class HashEmbed(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 2, "dim >= 2")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hash_embed"

  // null handled INSIDE the kernel (zero vector), so bypass the
  // default null-propagating eval/codegen paths
  override def eval(input: InternalRow): Any =
    HashEmbedImpl.embed(child.eval(input).asInstanceOf[UTF8String], dim)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = HashEmbedImpl.getClass.getName.stripSuffix("$")
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $impl.embed(${c.isNull} ? null : ${c.value}, $dim);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}

object HashEmbed {
  /** Column API: dim-length signed token-count embedding of text. */
  def hashEmbedVec(text: Column, dim: Int): Column =
    ColumnBridge.column(HashEmbed(ColumnBridge.expression(text), dim))
}
