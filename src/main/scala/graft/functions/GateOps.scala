package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row gate kernels against broadcast frozen state — the round-16
  * fold-path optimization (guide §2.4): a curation fold's
  * decontamination and DSIR gates both compare a document's OWN
  * features against state that is broadcast-sized by contract (the
  * benchmark hash set is eval-sized; the DSIR bucket table is
  * ≤ nBuckets rows). The relational shapes paid explode → broadcast
  * join → per-doc aggregate Exchange → join-back for per-row-pure
  * decisions; these expressions make each gate one generated call per
  * row, zero Exchange. The driver-side footprint is UNCHANGED: a
  * broadcast hash join already collects its build side to the driver —
  * these collect the same rows and ship them once via
  * `sparkContext.broadcast`.
  */
object GateOpsImpl {

  /** Distinct-shingle overlap counts vs a SORTED benchmark hash array:
    * (n_shingles, n_overlap) — the per-row core of the q84/q91
    * decontamination report. Null/tokenless text → (0, 0), exactly the
    * old explode_outer + count(h) result.
    */
  def overlap(input: UTF8String, n: Int, mult: Long,
              bench: Array[Long]): InternalRow = {
    val out = new GenericInternalRow(2)
    out.setLong(0, 0L); out.setLong(1, 0L)
    if (input == null) return out
    val hs = ShingleHashImpl.hashes(input, n, mult)
    val m = hs.numElements()
    if (m == 0) return out
    val arr = hs.toLongArray()
    java.util.Arrays.sort(arr)
    var i = 0
    var nsh = 0L
    var nov = 0L
    while (i < arr.length) {
      if (i == 0 || arr(i) != arr(i - 1)) {
        nsh += 1
        if (java.util.Arrays.binarySearch(bench, arr(i)) >= 0) nov += 1
      }
      i += 1
    }
    out.setLong(0, nsh); out.setLong(1, nov)
    out
  }

  /** The overlap FRACTION directly (0.0 for tokenless/null text) —
    * the same IEEE arithmetic the relational form ran
    * (`cast(n_overlap as double) / cast(n_shingles as double)`), as
    * one value so a keep-predicate references the kernel exactly once.
    */
  def overlapFrac(input: UTF8String, n: Int, mult: Long,
                  bench: Array[Long]): Double = {
    val o = overlap(input, n, mult, bench)
    val nsh = o.getLong(0)
    if (nsh == 0L) 0.0 else o.getLong(1).toDouble / nsh.toDouble
  }

  /** Per-row DSIR feature-bucket occurrence counts:
    * array<struct<b, cnt>> over the doc's 1-gram + 2-gram shingle-hash
    * stream bucketed mod nBuckets — the pre-reduced form of the
    * exploded feature stream (Σ cnt per bucket ≡ the occurrence rows).
    * Null text → null (the explode emitted no rows).
    */
  def dsirFeatTf(input: UTF8String, mult: Long,
                 nBuckets: Int): ArrayData = {
    if (input == null) return null
    val counts = new java.util.LinkedHashMap[java.lang.Long, java.lang.Long](64)
    var g = 1
    while (g <= 2) {
      val hs = ShingleHashImpl.hashes(input, g, mult)
      val m = hs.numElements()
      var i = 0
      while (i < m) {
        val b = java.lang.Long.valueOf(hs.getLong(i) % nBuckets)
        val c = counts.get(b)
        counts.put(b, if (c == null) 1L else c + 1L)
        i += 1
      }
      g += 1
    }
    if (counts.isEmpty) return null
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

  /** DSIR feature score vs the frozen bucket-contribution array
    * (index -1 = bucket absent from the index): (n_feats, contrib_sum)
    * over the doc's 1-gram + 2-gram shingle-hash occurrences whose
    * bucket IS in the index — null when none is (the old inner join
    * dropped such docs). Null text → null (explode emitted no rows).
    */
  def dsir(input: UTF8String, mult: Long, nBuckets: Int,
           contrib: Array[Long]): InternalRow = {
    if (input == null) return null
    var n = 0L
    var sum = 0L
    var g = 1
    while (g <= 2) {
      val hs = ShingleHashImpl.hashes(input, g, mult)
      val m = hs.numElements()
      var i = 0
      while (i < m) {
        val c = contrib((hs.getLong(i) % nBuckets).toInt)
        if (c >= 0L) { n += 1L; sum += c }
        i += 1
      }
      g += 1
    }
    if (n == 0L) return null
    val out = new GenericInternalRow(2)
    out.setLong(0, n); out.setLong(1, sum)
    out
  }
}

/** struct<n_shingles, n_overlap> per row — never null. */
case class ShingleOverlap(child: Expression, n: Int, mult: Long,
                          bc: Broadcast[Array[Long]])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_shingles", LongType, nullable = false),
    StructField("n_overlap", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "shingle_overlap"

  override def eval(input: InternalRow): Any =
    GateOpsImpl.overlap(child.eval(input).asInstanceOf[UTF8String],
      n, mult, bc.value)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = GateOpsImpl.getClass.getName.stripSuffix("$")
    val bcRef = ctx.addReferenceObj("benchBc", bc,
      classOf[Broadcast[Array[Long]]].getName)
    val benchArr = ctx.addMutableState("long[]", "benchArr",
      v => s"$v = (long[]) $bcRef.value();")
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          $impl.overlap(${c.isNull} ? null : ${c.value}, $n, ${mult}L,
            $benchArr);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleOverlap =
    copy(child = newChild)
}

/** double overlap fraction per row — never null. */
case class ShingleOverlapFrac(child: Expression, n: Int, mult: Long,
                              bc: Broadcast[Array[Long]])
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "shingle_overlap_frac"

  override def eval(input: InternalRow): Any =
    GateOpsImpl.overlapFrac(child.eval(input).asInstanceOf[UTF8String],
      n, mult, bc.value)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = GateOpsImpl.getClass.getName.stripSuffix("$")
    val bcRef = ctx.addReferenceObj("benchBc", bc,
      classOf[Broadcast[Array[Long]]].getName)
    val benchArr = ctx.addMutableState("long[]", "benchArr",
      v => s"$v = (long[]) $bcRef.value();")
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        double ${ev.value} = $impl.overlapFrac(
          ${c.isNull} ? null : ${c.value}, $n, ${mult}L, $benchArr);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleOverlapFrac =
    copy(child = newChild)
}

/** array<struct<b, cnt>> of bucketed feature counts; null for null/
  * featureless text.
  */
case class DsirFeatTf(child: Expression, mult: Long, nBuckets: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("b", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "dsir_feat_tf"

  protected override def nullSafeEval(input: Any): Any =
    GateOpsImpl.dsirFeatTf(input.asInstanceOf[UTF8String], mult, nBuckets)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = GateOpsImpl.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $impl.dsirFeatTf($c, ${mult}L, $nBuckets);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DsirFeatTf =
    copy(child = newChild)
}

/** struct<n_feats, contrib_sum> per row; null when no feature matched. */
case class DsirGate(child: Expression, mult: Long, nBuckets: Int,
                    bc: Broadcast[Array[Long]])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("contrib_sum", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "dsir_gate"

  protected override def nullSafeEval(input: Any): Any =
    GateOpsImpl.dsir(input.asInstanceOf[UTF8String], mult, nBuckets,
      bc.value)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = GateOpsImpl.getClass.getName.stripSuffix("$")
    val bcRef = ctx.addReferenceObj("dsirBc", bc,
      classOf[Broadcast[Array[Long]]].getName)
    val contribArr = ctx.addMutableState("long[]", "dsirContribArr",
      v => s"$v = (long[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $impl.dsir($c, ${mult}L, $nBuckets, $contribArr);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DsirGate =
    copy(child = newChild)
}

object GateOps {
  /** Column API: (n_shingles, n_overlap) of text vs a sorted bench set. */
  def shingleOverlap(text: Column, n: Int, bc: Broadcast[Array[Long]],
                     mult: Long = 31L): Column =
    ColumnBridge.column(ShingleOverlap(ColumnBridge.expression(text), n,
      mult, bc))

  /** Column API: the overlap fraction of text vs a sorted bench set. */
  def shingleOverlapFrac(text: Column, n: Int, bc: Broadcast[Array[Long]],
                         mult: Long = 31L): Column =
    ColumnBridge.column(ShingleOverlapFrac(ColumnBridge.expression(text),
      n, mult, bc))

  /** Column API: pre-reduced (bucket, count) DSIR feature pairs. */
  def dsirFeatTf(text: Column, nBuckets: Int, mult: Long = 31L): Column =
    ColumnBridge.column(DsirFeatTf(ColumnBridge.expression(text), mult,
      nBuckets))

  /** Column API: (n_feats, contrib_sum) of text vs the frozen DSIR
    * bucket array; null when no feature hits an indexed bucket.
    */
  def dsirGate(text: Column, nBuckets: Int, bc: Broadcast[Array[Long]],
               mult: Long = 31L): Column =
    ColumnBridge.column(DsirGate(ColumnBridge.expression(text), mult,
      nBuckets, bc))
}
