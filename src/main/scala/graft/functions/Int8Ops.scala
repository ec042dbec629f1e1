package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType, StructField, StructType}

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

/** Fused SQ8 quantization kernel (round 17): amax → floor-quantize →
  * pack → norm in ONE pass over the row's own vector. The relational
  * form ([[graft.operators.Ann.quantizeInt8]]) ran two `transform`
  * HOFs + `array_max` + [[Int8Pack]] + [[Int8Dot]] per row — the
  * HOFs are CodegenFallback, so the whole projection fell out of
  * whole-stage codegen on every index fold and query encode. Every
  * arithmetic step replicates the relational form bit-exactly:
  * amax via the SQL double ordering (NaN greatest, null elements
  * skipped), the `amax > 0` keep-test via the same ordering
  * (null/empty/all-zero → null, caller filters), per-element
  * `floor(x * 127.0 / amax).toLong` in IEEE order, the [[Int8Pack]]
  * loud range guard, and qnorm = sqrt of the exact integer
  * self-dot. A null ELEMENT with a positive amax yields
  * (null, null) fields — exactly [[Int8Pack]]'s null-element result.
  */
object Int8QuantizeImpl {
  def quantize(a: ArrayData): InternalRow = {
    if (a == null) return null
    val n = a.numElements()
    var amax = 0.0
    var hasMax = false
    var anyNull = false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) anyNull = true
      else {
        val v = java.lang.Math.abs(a.getDouble(i))
        if (!hasMax || java.lang.Double.compare(v, amax) > 0) {
          amax = v; hasMax = true
        }
      }
      i += 1
    }
    if (!hasMax || java.lang.Double.compare(amax, 0.0) <= 0) return null
    val out = new GenericInternalRow(2)
    if (anyNull) return out // fields stay null — the Int8Pack contract
    val bytes = new Array[Byte](n)
    var ss = 0L
    i = 0
    while (i < n) {
      val q = java.lang.Math.floor(a.getDouble(i) * 127.0 / amax).toLong
      if (q < -128L || q > 127L)
        throw new IllegalArgumentException(
          s"int8_quantize: value $q at index $i outside [-128, 127]")
      bytes(i) = q.toByte
      ss += q * q
      i += 1
    }
    out.update(0, bytes)
    out.update(1, java.lang.Double.valueOf(java.lang.Math.sqrt(ss.toDouble)))
    out
  }
}

/** array<double> → struct<qvec binary, qnorm double>; null when the
  * vector has no positive max-|x| (null / empty / all-zero — no
  * direction to quantize, the [[graft.operators.Ann.quantizeInt8]]
  * drop rule).
  */
case class Int8Quantize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("qvec", BinaryType, nullable = true),
    StructField("qnorm", DoubleType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "int8_quantize"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"int8_quantize requires array<double>, got ${other.sql}")
    }

  protected override def nullSafeEval(a: Any): Any =
    Int8QuantizeImpl.quantize(a.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = Int8QuantizeImpl.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  $impl.quantize($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

object Int8Ops {
  /** Column API: pack a quantized array<long> into one-byte-per-dim binary. */
  def int8Pack(a: Column): Column =
    ColumnBridge.column(Int8Pack(ColumnBridge.expression(a)))

  /** Column API: exact integer dot product of two int8-packed binaries. */
  def int8Dot(a: Column, b: Column): Column =
    ColumnBridge.column(Int8Dot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API: fused SQ8 quantize — struct(qvec, qnorm), null when
    * the vector has no positive max-|x|.
    */
  def int8Quantize(v: Column): Column =
    ColumnBridge.column(Int8Quantize(ColumnBridge.expression(v)))
}
