package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.kernel.BitemporalKernel
import graft.kernel.BitemporalKernel.KernelResult

/** O14/O17-O20 + O10: the star entities whose upsert semantics are pure
  * instances of the bitemporal kernel, as a declarative registry —
  * natural key + event-time + mutable payload per entity (SURVEY.md §2.4;
  * keys from the reference's controllers, cited per entry).
  *
  * This is the Spark-first replacement for the reference's ~15
  * hand-written controller classes: one generic operator + a config row
  * per entity.
  */
object EntityUpserts {

  final case class EntityConfig(keyCols: Seq[String], validFromUsCol: String,
                                tieCol: String, payloadCols: Seq[String])

  /** Keys cited from the reference:
    *  - core_demographic: per-mrn single row (PersonController.java:241-311)
    *  - visit_observation (flowsheet O14): (visit, type, obsTime)
    *    (VisitObservationController.java:276-292)
    *  - patient_condition (O17): (mrn, conditionType, internalId)
    *    (PatientConditionController.java:185-195)
    *  - consultation_request (O20): internal consult id
    *    (ConsultationRequestController.java)
    *  - advance_decision (O20): internal id (AdvanceDecisionController.java)
    *  - question (O18): question text dedup key (QuestionController.java)
    *  - form_answer (O19): (form, question) (FormController.java)
    */
  val registry: Map[String, EntityConfig] = Map(
    "core_demographic" -> EntityConfig(Seq("mrn"), "validFromUs", "msgId",
      Seq("givenName", "familyName", "birthDate", "sex", "alive")),
    "visit_observation" -> EntityConfig(
      Seq("visitId", "observationTypeId", "observationTimeUs"),
      "updatedTimeUs", "msgId",
      Seq("valueType", "numericValue", "stringValue", "dateValue", "unit",
        "comment")),
    "patient_condition" -> EntityConfig(
      Seq("mrn", "conditionTypeId", "internalId"), "updatedTimeUs", "msgId",
      Seq("status", "severity", "onsetDate", "comment")),
    "consultation_request" -> EntityConfig(Seq("internalId"),
      "statusChangeTimeUs", "msgId",
      Seq("consultTypeId", "visitId", "closed", "cancelled", "comments")),
    "advance_decision" -> EntityConfig(Seq("internalId"),
      "statusChangeTimeUs", "msgId",
      Seq("decisionTypeId", "visitId", "cancelled", "closed")),
    "question" -> EntityConfig(Seq("questionHash"), "validFromUs", "msgId",
      Seq("questionText")),
    // O18: answers keyed by (question, parent request) — the reference's
    // RequestAnswer (QuestionController: answers attach to the consult /
    // lab order that asked them)
    "request_answer" -> EntityConfig(Seq("questionHash", "parentId"),
      "updatedTimeUs", "msgId", Seq("answer")),
    "form_answer" -> EntityConfig(Seq("formId", "questionHash"),
      "updatedTimeUs", "msgId", Seq("valueText", "valueNumeric")),
    // O19 metadata dims (ref core/.../FormController.java): the form
    // instance plus its two description dims
    "form" -> EntityConfig(Seq("internalId"), "firstFiledTimeUs", "msgId",
      Seq("formDefinitionId", "visitId", "mrn", "noteId")),
    "form_definition" -> EntityConfig(Seq("internalId"), "validFromUs",
      "msgId", Seq("name", "patientFriendlyName")),
    "form_question" -> EntityConfig(Seq("internalId"), "validFromUs",
      "msgId", Seq("conceptName", "conceptAbbrevName")),
    // O14 metadata dim (ref VisitObservationController.processMetadata +
    // interchange FlowsheetMetadata): naming rows upsert per half-key;
    // identity unification of the two halves is
    // [[graft.operators.ObservationTypes.unify]]
    "visit_observation_type" -> EntityConfig(
      Seq("interfaceId", "idInApplication"), "validFromUs", "msgId",
      Seq("name", "displayName", "valueType", "unit", "description")),
    // type-dim metadata feeds (ref ConsultationRequestController
    // .processMessage(ConsultMetadata) name-if-newer;
    // LabController.processLabMetadata battery/test split — route on
    // labsMetadataType BEFORE these upserts, unrecognised types to the
    // dead letter, matching its RequiredDataMissingException)
    "consultation_type" -> EntityConfig(Seq("code"), "validFromUs",
      "msgId", Seq("name")),
    "lab_battery" -> EntityConfig(Seq("batteryCode", "codingSystem"),
      "validFromUs", "msgId", Seq("name")),
    "lab_test_definition" -> EntityConfig(Seq("testCode", "codingSystem"),
      "validFromUs", "msgId", Seq("name")))

  def upsert(entity: String, state: DataFrame, updates: DataFrame)
      : KernelResult = {
    val c = registry(entity)
    BitemporalKernel.applyBatch(state, updates, c.keyCols, c.validFromUsCol,
      c.tieCol, c.payloadCols)
  }

  /** O18 helper: questions dedup by text — the stable key is the text
    * hash (ref QuestionController: questions deduped by text).
    */
  def withQuestionHash(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("questionHash", xxhash64(col(textCol)))

  final case class WriteOnce(merged: DataFrame, errors: DataFrame)

  /** J9 write-once dimension merge (ref LocationController.java:145-183:
    * the Department/Room/Bed hierarchy FKs are immutable — an update that
    * claims a DIFFERENT parent for an existing key is an error, never an
    * overwrite). New keys insert; identical re-sends are no-ops;
    * conflicting guarded columns route to the error channel with the
    * stored-vs-claimed diff.
    */
  def writeOnceUpsert(current: DataFrame, updates: DataFrame,
                      keyCols: Seq[String],
                      guardedCols: Seq[String]): WriteOnce = {
    val cols = keyCols ++ guardedCols
    val u = updates.select(cols.map(col): _*).dropDuplicates(keyCols).as("u")
    val c = current.select(cols.map(col): _*)
      .withColumn("__exists", lit(true)).as("c")
    val j = u.join(c, keyCols, "left")
    val differs = guardedCols
      .map(g => !(col(s"u.$g") <=> col(s"c.$g"))).reduce(_ || _)
    val errors = j.filter(col("__exists").isNotNull && differs)
      .select(keyCols.map(col) ++
        guardedCols.map(g => col(s"u.$g").as(s"claimed_$g")) ++
        guardedCols.map(g => col(s"c.$g").as(s"stored_$g")): _*)
      .withColumn("error", lit("ImmutableFieldChanged"))
    val inserts = j.filter(col("__exists").isNull)
      .select(keyCols.map(col) ++ guardedCols.map(g => col(s"u.$g").as(g)): _*)
    WriteOnce(current.unionByName(inserts, allowMissingColumns = true), errors)
  }

  /** O10: MoveVisitInformation — re-key a visit to a different patient
    * and encounter (ref: core/.../VisitController.java:289+,
    * AdtProcessor.java:138-145). Batch form: broadcast the (rare) move
    * set, rewrite the FK columns in one projection.
    * `moves` columns: visitId, newMrn, newEncounter, moveTimeUs.
    */
  def moveVisits(visits: DataFrame, moves: DataFrame): DataFrame = {
    val m = broadcast(moves.select(col("visitId"), col("newMrn"),
      col("newEncounter"), col("moveTimeUs")))
    visits.join(m, Seq("visitId"), "left")
      .withColumn("mrn",
        when(col("newMrn").isNotNull && col("moveTimeUs") > col("validFromUs"),
          col("newMrn")).otherwise(col("mrn")))
      .withColumn("encounter",
        when(col("newEncounter").isNotNull &&
          col("moveTimeUs") > col("validFromUs"),
          col("newEncounter")).otherwise(col("encounter")))
      .drop("newMrn", "newEncounter", "moveTimeUs")
  }
}
