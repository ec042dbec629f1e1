package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** X2: HL7 v2 DTM timestamp parse (SURVEY.md §2.8; semantics from the
  * reference's waveform-reader/.../Hl7ParseAndQueue.java:85-92, format
  * `yyyyMMddHHmmss[.S..][±ZZZZ]`).
  *
  * A native Catalyst `Expression` with `doGenCode` — the parse is a
  * single static-method call inside whole-stage codegen, no UDF
  * serialization, no interpreter boundary. Returns epoch MICROSECONDS
  * (the engine's canonical temporal form); null for malformed input.
  */
object Hl7TimestampParser {
  /** Static parse helper — called from generated code. @return epoch µs,
    * or Long.MinValue for malformed input (mapped to null by the
    * expression).
    */
  def parseUs(input: UTF8String): Long = {
    if (input == null) return Long.MinValue
    val s = input.toString
    val n = s.length
    if (n < 8) return Long.MinValue
    var i = 0
    def digits(from: Int, len: Int): Int = {
      var v = 0; var j = from
      while (j < from + len) {
        val c = s.charAt(j)
        if (c < '0' || c > '9') return Int.MinValue
        v = v * 10 + (c - '0'); j += 1
      }
      v
    }
    val year = digits(0, 4); val month = digits(4, 2); val day = digits(6, 2)
    val maxDay =
      if (month == 2) {
        if ((year % 4 == 0 && year % 100 != 0) || year % 400 == 0) 29 else 28
      } else if (month == 4 || month == 6 || month == 9 || month == 11) 30
      else 31
    if (year == Int.MinValue || month < 1 || month > 12 || day < 1 ||
        day > maxDay)
      return Long.MinValue
    i = 8
    var hour = 0; var min = 0; var sec = 0
    if (n >= i + 2 && Character.isDigit(s.charAt(i))) { hour = digits(i, 2); i += 2 }
    if (n >= i + 2 && Character.isDigit(s.charAt(i))) { min = digits(i, 2); i += 2 }
    if (n >= i + 2 && Character.isDigit(s.charAt(i))) { sec = digits(i, 2); i += 2 }
    if (hour == Int.MinValue || min == Int.MinValue || sec == Int.MinValue ||
        hour > 23 || min > 59 || sec > 59) return Long.MinValue
    // fractional seconds → microseconds
    var micros = 0L
    if (i < n && s.charAt(i) == '.') {
      i += 1
      var scale = 100000L
      while (i < n && Character.isDigit(s.charAt(i)) && scale > 0) {
        micros += (s.charAt(i) - '0') * scale; scale /= 10; i += 1
      }
      while (i < n && Character.isDigit(s.charAt(i))) i += 1 // sub-µs: drop
    }
    // zone offset ±HHMM (absent → UTC)
    var offsetSec = 0
    if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) {
      if (i + 5 > n) return Long.MinValue
      val sign = if (s.charAt(i) == '-') -1 else 1
      val oh = digits(i + 1, 2); val om = digits(i + 3, 2)
      if (oh == Int.MinValue || om == Int.MinValue) return Long.MinValue
      offsetSec = sign * (oh * 3600 + om * 60); i += 5
    } else if (i != n) return Long.MinValue
    // days since epoch (proleptic Gregorian, same algorithm class as
    // java.time; valid for the HL7 year range)
    val y = if (month <= 2) year - 1 else year
    val era = (if (y >= 0) y else y - 399) / 400
    val yoe = y - era * 400
    val mp = (month + 9) % 12
    val doy = (153 * mp + 2) / 5 + day - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    val days = era * 146097L + doe - 719468L
    (days * 86400L + hour * 3600L + min * 60L + sec - offsetSec) * 1000000L +
      micros
  }
}

case class Hl7Timestamp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hl7_ts_us"

  protected override def nullSafeEval(input: Any): Any = {
    val r = Hl7TimestampParser.parseUs(input.asInstanceOf[UTF8String])
    if (r == Long.MinValue) null else java.lang.Long.valueOf(r)
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val parser = Hl7TimestampParser.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $parser.parseUs($c);
         |if (${ev.value} == Long.MIN_VALUE) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Hl7Timestamp =
    copy(child = newChild)
}

object Hl7Timestamp {
  /** Column API: parse an HL7 DTM string to epoch µs. */
  def hl7TsUs(c: Column): Column =
    ColumnBridge.column(Hl7Timestamp(ColumnBridge.expression(c)))

  /** Register `hl7_ts_us` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hl7_ts_us", exprs => Hl7Timestamp(exprs.head), "built-in")
}
