package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Identity-merge operators (SURVEY.md §2.4 O4/O5, §2.7 U1/U2, §2.5 A6).
  *
  * The reference maintains a two-level identity mapping: every MRN points
  * at its current "live" MRN, re-pointed on MergePatient, with boolean
  * flags (research opt-out) propagated across the merged set
  * (ref: core/.../PersonController.java:93-161, informdb/identity/MrnToLive.java).
  *
  * Batch formulation: the merged set is a partition; live id and flag
  * propagation are window aggregates over it — one shuffle, no iteration
  * (merges in the reference are single-hop by invariant).
  */
object IdentityMerge {

  /** Derive the mrn→live mapping and propagated opt-out over groups.
    * @param groupCol the merged-set key (cluster id)
    * @param idCol    member identifier
    * @param optOutCol boolean-ish flag to propagate (max over set)
    */
  def liveMapping(df: DataFrame, idCol: String, groupCol: String,
                  optOutCol: org.apache.spark.sql.Column): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
    df.select(
      col(idCol).as("mrn"),
      min(col(idCol)).over(w).as("live_mrn"),
      max(optOutCol.cast("int")).over(w).as("opt_out"))
  }

  /** O4: apply a batch of merge events (survivor, absorbed) to an existing
    * mrn→live pointer table: every row whose live pointer is any absorbed
    * id is re-pointed at the survivor's live id.
    */
  def applyMerges(mrnToLive: DataFrame, merges: DataFrame): DataFrame = {
    val m = broadcast(merges.select(col("absorbed"), col("survivor")))
    mrnToLive.as("t")
      .join(m.as("m"), col("t.live_mrn") === col("m.absorbed"), "left")
      .select(col("t.mrn").as("mrn"),
        coalesce(col("m.survivor"), col("t.live_mrn")).as("live_mrn"))
  }
}
