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
    *
    * The merge set is transitive-closed first: a single batch may carry
    * {A→B, B→C}, and the reference — processing serially — ends with A's
    * pointer at C (each merge re-points every row whose live equals any
    * previously-absorbed MRN, ref core/.../PersonController.java:113-132).
    * A plain single-hop join would leave A→B stale. The merge set is
    * admin-event-tiny (it is broadcast below for the same reason), so the
    * closure runs driver-side: pointer-jump each survivor to its root,
    * cycle-guarded (A→B plus B→A stops at the first repeat).
    */
  def applyMerges(mrnToLive: DataFrame, merges: DataFrame): DataFrame = {
    // dedup BEFORE the closure: a re-delivered merge event is a no-op,
    // and duplicate edges must not fan out the pointer join below
    val sel = merges.select(col("absorbed"), col("survivor")).distinct()
    val edges = sel.collect()
    // CONFLICTING merges (same absorbed, different survivors — a data
    // error, but one the framework must handle deterministically):
    // resolve to the max survivor by string order, so every run of the
    // same batch re-points identically regardless of partition order.
    val ptr = edges.map(r => r.get(0) -> r.get(1))
      .groupBy(_._1)
      .map { case (a, ss) =>
        a -> ss.map(_._2).maxBy(v => String.valueOf(v)) }
    def root(x: Any): Any = {
      var cur = x
      val seen = scala.collection.mutable.Set[Any]()
      while (ptr.contains(cur) && seen.add(cur)) cur = ptr(cur)
      if (seen.contains(cur)) x else cur // cycle: keep the original target
    }
    val closedRows = ptr.toSeq.map { case (a, s) =>
      org.apache.spark.sql.Row(a, root(s)) }
    val closed = sel.sparkSession.createDataFrame(
      sel.sparkSession.sparkContext.parallelize(closedRows, 1), sel.schema)

    val m = broadcast(closed)
    mrnToLive.as("t")
      .join(m.as("m"), col("t.live_mrn") === col("m.absorbed"), "left")
      .select(col("t.mrn").as("mrn"),
        coalesce(col("m.survivor"), col("t.live_mrn")).as("live_mrn"))
  }

  /** O5: ChangePatientIdentifiers — a message renames a patient's MRN
    * (ref core/.../PersonController.java:368-404). Two branches, decided
    * per change row against the CURRENT pointer table:
    *  - the new MRN already exists → this is really a merge (old absorbed
    *    into new), delegated to [[applyMerges]];
    *  - the new MRN is unknown → in-place key update: the old MRN row is
    *    re-keyed, and every live pointer at the old MRN follows.
    * `changes` columns: oldMrn, newMrn. Change sets are admin-event-tiny
    * → broadcast; the decision join streams the pointer table once.
    */
  def changeIdentifiers(mrnToLive: DataFrame, changes: DataFrame): DataFrame = {
    val known = mrnToLive.select(col("mrn")).distinct()
      .withColumnRenamed("mrn", "newMrn").withColumn("__known", lit(true))
    val tagged = changes.select(col("oldMrn"), col("newMrn")).distinct()
      .join(broadcast(known), Seq("newMrn"), "left")

    val renames = broadcast(tagged.filter(col("__known").isNull)
      .select(col("oldMrn"), col("newMrn")))
    val renamed = mrnToLive.as("t")
      .join(renames.as("rk"), col("t.mrn") === col("rk.oldMrn"), "left")
      .join(renames.as("rl"), col("t.live_mrn") === col("rl.oldMrn"), "left")
      .select(
        coalesce(col("rk.newMrn"), col("t.mrn")).as("mrn"),
        coalesce(col("rl.newMrn"), col("t.live_mrn")).as("live_mrn"))

    val merges = tagged.filter(col("__known").isNotNull)
      .select(col("oldMrn").as("absorbed"), col("newMrn").as("survivor"))
    applyMerges(renamed, merges)
  }
}
