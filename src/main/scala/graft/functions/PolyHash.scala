package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Oracle-portable polynomial string hash as a native Catalyst
  * expression: fold over code points, `h = (h*mult + cp) mod (2^31-1)`.
  *
  * This is the hash that makes the MinHash/SimHash queries replayable
  * bit-for-bit by an ANSI SQL oracle (DuckDB: list_reduce over
  * string_split) — xxhash64 is Spark-only. The native form exists for
  * throughput: the `functions._` formulation (`aggregate` over
  * `split(s, "")`) materializes a per-character UTF8String array and
  * evaluates a lambda per element; here the whole fold is one tight
  * generated loop over the decoded string, no intermediate array.
  * Semantics are identical (per code point, matching both the HOF
  * formulation's split/ascii behavior and DuckDB's ascii()).
  */
object PolyHashImpl {
  final val P = 2147483647L // 2^31 - 1

  /** Static fold helper — called from generated code. */
  def hash(input: UTF8String, mult: Long): Long = {
    val s = input.toString
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * mult + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}

case class PolyHash(child: Expression, mult: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  protected override def nullSafeEval(input: Any): Any =
    PolyHashImpl.hash(input.asInstanceOf[UTF8String], mult)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = PolyHashImpl.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$impl.hash($c, ${mult}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Column API: polynomial code-point hash of a string. */
  def polyHash(c: Column, mult: Long = 31L): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c), mult))
}
