package graft.kernel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F5+F8: per-field tri-state folding (SURVEY.md §1.1.3, §2.2; ref:
  * core/.../RowState.java:140-145 + InterchangeValue.java:113-143).
  *
  * Update messages carry each mutable field as a struct<value, status>
  * with status ∈ {SAVE, DELETE, IGNORE}. Folding per key in
  * (validFrom, tie) order:
  *   SAVE   → field becomes the message value
  *   DELETE → field becomes NULL (explicit tombstone)
  *   IGNORE → field keeps whatever the previous version had
  *
  * Window formulation: the effective value at each version is the most
  * recent non-IGNORE action at or before it — `last(_, ignoreNulls)`
  * over an unbounded-preceding frame. One shuffle on the key; all
  * fields fold in the same window pass. The materialized versions then
  * feed `BitemporalKernel.applyBatch` unchanged (its F6 coalescing
  * collapses IGNORE-only versions automatically, because their
  * materialized payloads equal their predecessors').
  */
object TriStateFold {

  /** @param fieldCols names of struct<value,status> columns to fold;
    *                  output columns hold the materialized values.
    */
  def foldFields(updates: DataFrame, keyCols: Seq[String],
                 validFromUsCol: String, tieCol: String,
                 fieldCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(validFromUsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    fieldCols.foldLeft(updates) { (df, f) =>
      val action = last(
        when(col(f).getField("status") =!= "IGNORE", col(f)),
        ignoreNulls = true).over(w)
      df.withColumn(f,
        when(action.isNull, lit(null))
          .when(action.getField("status") === "DELETE", lit(null))
          .otherwise(action.getField("value")))
    }
  }

  /** Fold tri-state messages and apply the bitemporal kernel in one
    * call: the complete RowState save pattern (F5-F8 + O1/O2) as a
    * single operator.
    *
    * `messages` must be the RAW message history for the touched keys
    * (prior messages ∪ this batch): an IGNORE only resolves against the
    * values the earlier messages established, so materialization is a
    * re-fold over raw messages — which the reference also archives
    * verbatim (its IDS store) precisely to allow reprocessing.
    */
  def applyTriState(messages: DataFrame, keyCols: Seq[String],
                    validFromUsCol: String, tieCol: String,
                    fieldCols: Seq[String]): BitemporalKernel.KernelResult = {
    val materialized = foldFields(messages, keyCols, validFromUsCol, tieCol,
      fieldCols)
    BitemporalKernel.applyBatch(materialized.limit(0), materialized,
      keyCols, validFromUsCol, tieCol, fieldCols)
  }
}
