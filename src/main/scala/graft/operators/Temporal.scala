package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators: SCD-2 history derivation, time-travel, gap
  * detection, sessionization, interval join, as-of join.
  * (SURVEY.md §2: O6/O12, F10, A4, J5, W4-batch.)
  */
object Temporal {

  /** O12/O2 batch analog: derive SCD-2 closed intervals — per key ordered
    * by (tsUs, tie), validUntil = next version's validFrom (null = open).
    * Handles out-of-order arrival by construction: the window re-derives
    * the whole interval chain (ref repair logic
    * core/.../LocationController.java:257-327 becomes a single lead()).
    */
  def scd2History(df: DataFrame, keyCols: Seq[String], tsUsCol: String,
                  tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsUsCol), col(tieCol))
    df.withColumn("valid_until_us", lead(col(tsUsCol), 1).over(w))
  }

  /** A5/F10: state as of time t — latest version per key with ts <= t. */
  def asOfState(df: DataFrame, keyCols: Seq[String], tsUsCol: String,
                tieCol: String, tUs: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsUsCol).desc, col(tieCol).desc)
    df.filter(col(tsUsCol) <= tUs)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** A4: gap detection — per key ordered stream, gap to previous event.
    * (ref: monitoring/streamlit/validation.py:57-78.)
    */
  def gaps(df: DataFrame, keyCols: Seq[String], tsUsCol: String,
           tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsUsCol), col(tieCol))
    df.withColumn("prev_ts_us", lag(col(tsUsCol), 1).over(w))
      .withColumn("gap_us", col(tsUsCol) - col("prev_ts_us"))
  }

  /** W4 batch analog: gap-based sessionization. A new session starts when
    * the gap to the previous event exceeds gapUs. session_id is a running
    * count of session starts (1-based) — one shuffle, two window passes on
    * the same partitioning.
    */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsUsCol: String,
                 tieCol: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsUsCol), col(tieCol))
    val flagged = df
      .withColumn("__prev", lag(col(tsUsCol), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          col(tsUsCol) - col("__prev") > gapUs, 1L).otherwise(0L))
    flagged
      .withColumn("session_id",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev", "__new_session")
  }

  /** J5: point-in-time interval join — probe rows matched to build rows of
    * the same key whose ts falls in [probeTs - windowUs, probeTs). Planned
    * by Catalyst as an equi-join on the key with the range as residual —
    * the scalable shape for "attach event to enclosing interval"
    * (ref: core/.../LocationVisitRepository.java:81-88).
    */
  def intervalJoin(probe: DataFrame, build: DataFrame, keyCols: Seq[String],
                   probeTsUs: Column, buildTsUs: Column,
                   windowUs: Long): DataFrame = {
    val range = buildTsUs >= probeTsUs - lit(windowUs) && buildTsUs < probeTsUs
    val cond = keyCols.map(k => probe(k) === build(k))
      .reduceOption(_ && _).map(_ && range).getOrElse(range)
    probe.join(build, cond, "inner")
  }

  /** Backward as-of join: for each probe row, the single most recent build
    * row (by ts, tie) at-or-before the probe's ts, per key.
    *
    * Implementation is the union-tag trick — one shuffle on the key, a
    * single ordered window pass, `last(_, ignoreNulls)` carries the most
    * recent build payload forward; NO pairwise join explosion. This is the
    * plan that survives 100 TB: cost is sort + linear scan, independent of
    * how far back the matching build row is.
    */
  def asOfJoinBackward(probe: DataFrame, build: DataFrame,
                       keyCols: Seq[String], tsUsCol: String, tieCol: String,
                       buildValueCols: Seq[String],
                       outPrefix: String = "asof_"): DataFrame = {
    val probeCols = probe.columns
    val payloadType = org.apache.spark.sql.types.StructType(
      buildValueCols.map(c => build.schema(c)))
    val pT = probe
      .withColumn("__side", lit(1))
      .withColumn("__build_payload", lit(null).cast(payloadType))
    val bT = build
      .select((keyCols ++ Seq(tsUsCol, tieCol)).map(col) :+
        struct(buildValueCols.map(col): _*).as("__build_payload"): _*)
      .withColumn("__side", lit(0))
    val all = pT.select((keyCols ++ Seq(tsUsCol, tieCol)).map(col) ++
      Seq(col("__side"), col("__build_payload")) ++
      probeCols.filterNot(c => keyCols.contains(c) || c == tsUsCol || c == tieCol)
        .map(col): _*)
      .unionByName(bT, allowMissingColumns = true)

    // Build rows sort before probe rows at equal ts (side 0 < 1) → "at or
    // before" semantics.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsUsCol), col("__side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = all.withColumn("__carr",
      last(col("__build_payload"), ignoreNulls = true).over(w))

    val out = carried.filter(col("__side") === 1)
    buildValueCols.foldLeft(out) { (d, c) =>
      d.withColumn(outPrefix + c, col("__carr").getField(c))
    }.drop("__side", "__build_payload", "__carr")
  }
}
