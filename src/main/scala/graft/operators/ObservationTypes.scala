package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** O14 metadata side: the visit-observation-type dimension and its
  * two-sided identity unification (ref core/.../VisitObservationController
  * .java:60-215 + interchange FlowsheetMetadata).
  *
  * A type row can arrive half-identified: flowsheet messages create rows
  * knowing only the EPIC `interfaceId`; metadata extracts create rows
  * knowing only the Caboodle `idInApplication`. A MAPPING message names
  * the (interfaceId, idInApplication) pair; processing it must
  *  - skip pairs already unified (`mappingExists`),
  *  - enrich a Caboodle-only row with the interfaceId,
  *  - when BOTH half-rows exist, re-point every observation from the
  *    EPIC row to the enriched Caboodle row and delete the EPIC row
  *    (with audit),
  *  - enrich an EPIC-only row with the idInApplication when no Caboodle
  *    row exists,
  *  - create the row outright when neither half exists.
  *
  * Batch formulation: mappings are metadata-scale → broadcast both the
  * mapping set and the (tiny) dim against it; observations — the big
  * side — see ONE broadcast join against the re-point set. No shuffle
  * of the fact table, which is what matters at 100×.
  */
object ObservationTypes {

  final case class Unified(types: DataFrame, observations: DataFrame,
                           audit: DataFrame)

  /** @param types        (typeId, interfaceId?, idInApplication?, payload…)
    * @param mappings     (interfaceId, idInApplication, validFromUs)
    * @param observations fact rows carrying `observationTypeId`
    */
  def unify(types: DataFrame, mappings: DataFrame,
            observations: DataFrame): Unified = {
    val m = broadcast(mappings
      .select(col("interfaceId").as("m_if"),
        col("idInApplication").as("m_app"),
        col("validFromUs").as("m_vf"))
      .dropDuplicates("m_if", "m_app"))

    // classify the dim against the mapping set (dim is cache-bounded in
    // the reference — ≤10k rows — so three broadcast joins are free)
    val t = types.as("t")
      .join(m.as("me"), col("t.interfaceId") === col("me.m_if"), "left")
      .join(m.as("mc"), col("t.idInApplication") === col("mc.m_app"), "left")

    val bothKnown = col("t.interfaceId").isNotNull &&
      col("t.idInApplication").isNotNull
    // a Caboodle row matched by its mapping learns the interfaceId
    val caboodleHit = col("mc.m_app").isNotNull && !bothKnown
    // an EPIC row matched by its mapping...
    val epicHit = col("me.m_if").isNotNull && !bothKnown

    // does the mapping's OTHER half exist as a row? (drives delete vs
    // enrich for EPIC rows)
    // dedupe on the join key: a (bad-data) duplicate idInApplication row
    // must not fan out the dim — keep the smallest typeId
    // deterministically and let the audit surface the duplicate
    val caboodleRows = broadcast(types
      .filter(col("idInApplication").isNotNull)
      .groupBy(col("idInApplication").as("c_app"))
      .agg(min(col("typeId")).as("c_id")))
    val t2 = t.join(caboodleRows,
      col("me.m_app") === col("c_app"), "left")

    val enriched = t2.select(
      col("t.*"),
      caboodleHit.as("__gain_if"), col("mc.m_if").as("__new_if"),
      (epicHit && col("c_id").isNull).as("__gain_app"),
      col("me.m_app").as("__new_app"),
      (epicHit && col("c_id").isNotNull).as("__dead"),
      col("c_id").as("__replacement"),
      coalesce(col("me.m_vf"), col("mc.m_vf")).as("__m_vf"))

    val surviving = enriched.filter(!coalesce(col("__dead"), lit(false)))
      .withColumn("interfaceId",
        when(col("__gain_if"), col("__new_if")).otherwise(col("interfaceId")))
      .withColumn("idInApplication",
        when(col("__gain_app"), col("__new_app"))
          .otherwise(col("idInApplication")))
      .drop("__gain_if", "__new_if", "__gain_app", "__new_app",
        "__dead", "__replacement", "__m_vf")

    // mappings touching NO existing row (neither half) create the row.
    // Each half checks against ITS OWN identity space: m_if against
    // existing interfaceIds, m_app against existing idInApplications — a
    // pooled set would silently drop a mapping whose interfaceId merely
    // collides with some row's idInApplication (neither enriching nor
    // creating).
    val knownIf = types.select(col("interfaceId").as("k_if"))
      .filter(col("k_if").isNotNull).distinct()
    val knownApp = types.select(col("idInApplication").as("k_app"))
      .filter(col("k_app").isNotNull).distinct()
    val fresh = m.join(broadcast(knownIf), col("m_if") === col("k_if"), "left_anti")
      .join(broadcast(knownApp),
        col("m_app") === col("k_app"), "left_anti")
      .select(
        xxhash64(col("m_if"), col("m_app")).as("typeId"),
        col("m_if").as("interfaceId"), col("m_app").as("idInApplication"),
        col("m_vf").as("validFromUs"))
    val freshAligned = surviving.columns.foldLeft(fresh) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null))
    }.select(surviving.columns.map(col): _*)

    // the big side: one broadcast join re-points observations whose type
    // row died to its replacement
    val repoint = broadcast(enriched
      .filter(coalesce(col("__dead"), lit(false)))
      .select(col("typeId").as("r_old"), col("__replacement").as("r_new"),
        col("__m_vf").as("r_vf")))
    val obs = observations.as("o")
      .join(repoint, col("o.observationTypeId") === col("r_old"), "left")
      .withColumn("observationTypeId",
        coalesce(col("r_new"), col("o.observationTypeId")))
      .drop("r_old", "r_new", "r_vf")

    val audit = enriched.filter(coalesce(col("__dead"), lit(false)))
      .select(col("typeId"), col("interfaceId"), col("idInApplication"),
        col("__replacement").as("replacedByTypeId"),
        col("__m_vf").as("deletedAtUs"))

    Unified(surviving.unionByName(freshAligned), obs, audit)
  }

  /** Waveform streams register their own observation types
    * (VisitObservationController.getOrCreateFromWaveform:132-139): keyed
    * by the stream id on BOTH halves, named by the stream description,
    * flagged real-time. One distinct-aggregate over the chunk stream —
    * the earliest observation time per stream is its validFrom, ready
    * for the `visit_observation_type` registry upsert.
    */
  def fromWaveform(chunks: DataFrame, streamIdCol: String,
                   descriptionCol: String, obsTimeUsCol: String): DataFrame =
    chunks.groupBy(col(streamIdCol).as("interfaceId"))
      .agg(min(col(obsTimeUsCol)).as("validFromUs"),
        first(col(descriptionCol)).as("name"))
      .select(col("interfaceId"),
        col("interfaceId").as("idInApplication"),
        col("validFromUs"),
        concat(lit("wf:"), col("interfaceId")).as("msgId"),
        col("name"),
        lit(null).cast("string").as("displayName"),
        lit("waveform").as("valueType"),
        lit(null).cast("string").as("unit"),
        lit(null).cast("string").as("description"),
        lit(true).as("isRealTime"))
}
