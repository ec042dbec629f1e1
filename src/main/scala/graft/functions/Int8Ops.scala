package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Int8 scalar-quantized vector support: pack a quantized `array<long>`
  * into a BINARY column (ONE byte per dimension — 4× smaller at rest
  * and over the wire than float32, 8× than the double arrays the exact
  * path folds over) and take dot products directly over the packed
  * bytes. This is the storage format a 100 TB embedding corpus
  * actually ships for brute-force rerank scans: the scan is IO-bound,
  * so byte-per-dim is a 4-8× scan-rate win before any CPU argument.
  *
  * Both expressions are native with `doGenCode` (one generated loop
  * over the byte payload, no boxing, whole-stage-codegen friendly);
  * dot products are exact 64-bit integer arithmetic — any ANSI engine
  * replays them bit-identically, which is what lets the quantized
  * search carry a DuckDB oracle (q155).
  */
object Int8PackImpl {
  def pack(a: ArrayData): Any = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = a.getLong(i)
      if (v < -128L || v > 127L)
        throw new IllegalArgumentException(
          s"int8_pack: value $v at index $i outside [-128, 127] — " +
            "quantize before packing")
      out(i) = v.toByte
      i += 1
    }
    out
  }
}

/** array<long> (each element in [-128, 127]) → binary, one byte per
  * element. Null element → null result; out-of-range → loud error
  * (a silent wrap would corrupt every downstream distance).
  */
case class Int8Pack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "int8_pack"
  // analysis-time type check: ArrayData.getLong over e.g. array<int>
  // would REINTERPRET element bytes and produce garbage at runtime
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"int8_pack requires array<bigint>, got ${other.sql}")
    }

  protected override def nullSafeEval(a: Any): Any =
    Int8PackImpl.pack(a.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $v = $a.getLong($i);
         |  if ($v < -128L || $v > 127L)
         |    throw new IllegalArgumentException(
         |      "int8_pack: value " + $v + " at index " + $i +
         |      " outside [-128, 127] — quantize before packing");
         |  $out[$i] = (byte) $v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Pack =
    copy(child = newChild)
}

object Int8DotImpl {
  def dot(a: Array[Byte], b: Array[Byte]): Any = {
    if (a.length != b.length) return null
    var acc = 0L
    var i = 0
    while (i < a.length) {
      acc += a(i).toLong * b(i).toLong
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

/** Exact integer dot product over two int8-packed binaries.
  * Mismatched lengths → null (the [[DotProduct]] convention). The
  * accumulator cannot overflow below 2^46 dimensions (|terms| ≤ 2^14).
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int8_dot"
  // analysis-time type check: a non-binary operand would ClassCastException
  // (or worse, reinterpret) at runtime inside the generated loop
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int8_dot requires (binary, binary), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  protected override def nullSafeEval(a: Any, b: Any): Any =
    Int8DotImpl.dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.length != $b.length) { ${ev.isNull} = true; }
         |else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $acc += ((long) $a[$i]) * ((long) $b[$i]);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}

object Int8Ops {
  /** Column API: pack a quantized array<long> into one-byte-per-dim binary. */
  def int8Pack(a: Column): Column =
    ColumnBridge.column(Int8Pack(ColumnBridge.expression(a)))

  /** Column API: exact integer dot product of two int8-packed binaries. */
  def int8Dot(a: Column, b: Column): Column =
    ColumnBridge.column(Int8Dot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
