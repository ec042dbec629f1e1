package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sources.{Hl7Wire, LabFunnel}

/** The full ingestion pipeline in one entry point — the Spark analog of
  * the reference's hl7-reader + core App pair: a raw HL7 stream is
  * routed by MSH-9 (S2), family-guarded (S3/S4 nack), funneled into each
  * family's interchange shape, and folded into that family's bitemporal
  * star state ([[StarPipeline]] bucketed fold) — every micro-batch, all
  * families, one query.
  *
  * State layout under `stateRoot`:
  *
  *   adt/ labs/ flowsheets/ conditions/ consults/   → StarPipeline dirs
  *   dead/router/batch=N   → unroutable / unhandled-type frames
  *   dead/<family>/batch=N → family-guard rejects (missing key/time)
  *
  * Dead-letter writes are per-batch overwrites — idempotent on replay,
  * like the folds themselves. Scale shape: one scan of the batch fans
  * into narrow parse branches; each family fold touches only the state
  * buckets its keys hash into.
  */
object WirePipeline {

  /** Per-family kernel configs (natural key, event time, tie, payload). */
  private def cfg(stateRoot: String, family: String, key: Seq[String],
                  vf: String, payload: Seq[String]) =
    StarPipeline.Config(s"$stateRoot/$family", key, vf, "sourceMessageId",
      payload, nBuckets = 8)

  def start(raw: DataFrame, rawCol: String, stateRoot: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    raw.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, rawCol, stateRoot)
      }
      .start()

  /** One micro-batch through the whole front end (also callable on a
    * static frame for backfill).
    */
  def foldBatch(batch: DataFrame, batchId: Long, rawCol: String,
                stateRoot: String): Unit = {
    // every family channel is a separate action over this batch — cache
    // it once so ten funnels don't re-read the source ten times
    val cached = batch.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try foldRouted(cached, batchId, rawCol, stateRoot)
    finally cached.unpersist()
  }

  private def foldRouted(batch: DataFrame, batchId: Long, rawCol: String,
                         stateRoot: String): Unit = {
    val r = Hl7Wire.route(batch, rawCol)
    r.dead.write.mode("overwrite")
      .parquet(s"$stateRoot/dead/router/batch=$batchId")

    def guardAndFold(parsed: DataFrame, family: String,
                     rules: Seq[(String, org.apache.spark.sql.Column)],
                     toMsgs: DataFrame => DataFrame,
                     key: Seq[String], vf: String,
                     payload: Seq[String]): Unit = {
      val routed = DeadLetter.route(parsed, rules)
      routed.dead.write.mode("overwrite")
        .parquet(s"$stateRoot/dead/$family/batch=$batchId")
      StarPipeline.foldBatch(toMsgs(routed.clean), batchId,
        cfg(stateRoot, family, key, vf, payload))
    }

    // ADT proper is guarded (a frame without MRN is a nack); the implied
    // ADT the reference derives from every ORU^R01/ORM^O01
    // (IdsOperations.buildAndAddAdtMessage, fromAdtStream=false) joins
    // the same person/visit fold but fails SILENTLY, as in the reference
    // — order messages legitimately arrive without patient context.
    val impliedOk = r.impliedAdt
      .filter(col("mrn").isNotNull && col("validFromUs").isNotNull)
    guardAndFold(r.adt, "adt",
      Seq("missing_mrn" -> col("mrn").isNull,
        "missing_valid_from" -> col("validFromUs").isNull),
      clean => clean.unionByName(impliedOk, allowMissingColumns = true)
        .select(col("mrn"), col("validFromUs"), col("sourceMessageId"),
          col("msgType"), col("patientClass"), col("fullLocationString")),
      Seq("mrn"), "validFromUs",
      Seq("msgType", "patientClass", "fullLocationString"))

    // Labs: the WinPath result stream plus the point-of-care / blood-bank
    // funnel channels union into ONE interchange shape and one fold —
    // same state dir, one batch id, no double-fold.
    val labGuard = DeadLetter.route(r.labOrders,
      Seq("missing_order" -> col("fillerOrderNumber").isNull,
        "missing_time" -> coalesce(col("observationDateTimeUs"),
          col("requestedDateTimeUs")).isNull))
    labGuard.dead.write.mode("overwrite")
      .parquet(s"$stateRoot/dead/labs/batch=$batchId")
    val funnelMsgs = Seq(
      "abl" -> r.ablLabs, "bioconnect" -> r.bioConnectLabs,
      "bankmanager" -> r.bankManagerLabs).map { case (name, ch) =>
        ch.filter(col("error").isNotNull).write.mode("overwrite")
          .parquet(s"$stateRoot/dead/labs_$name/batch=$batchId")
        LabFunnel.toLabMessages(ch)
      }.reduce(_ unionByName _)
    StarPipeline.foldBatch(
      Hl7Wire.wireToLabMessages(labGuard.clean).unionByName(funnelMsgs),
      batchId,
      cfg(stateRoot, "labs", Seq("battery", "labSpecimenNumber"),
        "statusChangeTimeUs", Seq("epicOrderNumber", "mrn", "results")))

    // ORM^O01 / ORR^O02 order messages carry no results but DO update
    // order state (the reference's WinPath/CoPath order builders:
    // number binding, status-change/sample-received times). They fold
    // into a status side-table keyed like the labs star, so the read
    // path joins them without risking a null-results overwrite of the
    // result-bearing fold.
    guardAndFold(r.labOrderAcks, "lab_status",
      Seq("builder_error" -> col("error").isNotNull,
        "missing_specimen" -> col("labSpecimenNumber").isNull,
        "missing_time" -> col("statusChangeTimeUs").isNull),
      _.select(col("battery"), col("labSpecimenNumber"),
        col("statusChangeTimeUs"), col("sourceMessageId"),
        col("orderControlId"), col("orderStatus"), col("epicOrderNumber"),
        col("orderTimeUs"), col("sampleReceivedTimeUs"),
        col("resultStatus")),
      Seq("battery", "labSpecimenNumber"), "statusChangeTimeUs",
      Seq("orderControlId", "orderStatus", "epicOrderNumber",
        "orderTimeUs", "sampleReceivedTimeUs", "resultStatus"))

    guardAndFold(r.flowsheets, "flowsheets",
      Seq("missing_visit" -> col("visitNumber").isNull,
        "missing_type" -> col("interfaceId").isNull,
        "missing_time" -> col("observationTimeUs").isNull),
      Hl7Wire.wireToFlowsheetMessages(_)
        .withColumnRenamed("msgId", "sourceMessageId"),
      Seq("visitId", "observationTypeId", "observationTimeUs"),
      "updatedTimeUs",
      Seq("valueType", "numericValue", "stringValue", "dateValue", "unit",
        "comment"))

    // Conditions: problems (PPR) + allergies (A60 IAM) + infections
    // (A05 ZIF, behind the serial progress gate) are three funnels into
    // ONE patient_condition fold — the reference's three condition
    // factories meeting in PatientConditionController.
    val probGuard = DeadLetter.route(r.problems,
      Seq("missing_mrn" -> col("mrn").isNull,
        "missing_time" -> col("updatedTimeUs").isNull))
    probGuard.dead.write.mode("overwrite")
      .parquet(s"$stateRoot/dead/conditions/batch=$batchId")
    val allerGuard = DeadLetter.route(r.allergies,
      Seq("invalid_action" -> col("error").isNotNull,
        "missing_mrn" -> col("mrn").isNull,
        "missing_time" -> col("updatedTimeUs").isNull))
    allerGuard.dead.write.mode("overwrite")
      .parquet(s"$stateRoot/dead/allergies/batch=$batchId")

    // Infection progress survives restarts the same way the fold state
    // does — a tiny high-watermark file advanced per batch (the
    // reference holds it in the factory across a service run,
    // PatientInfectionFactory.infectionProgress).
    val progressPath = java.nio.file.Paths.get(
      s"$stateRoot/conditions/_INF_PROGRESS")
    val infStart =
      if (java.nio.file.Files.exists(progressPath))
        new String(java.nio.file.Files.readAllBytes(progressPath)).trim.toLong
      else 0L
    val gatedInf = Hl7Wire.infectionGate(
      r.infections.filter(col("mrn").isNotNull),
      infStart, Seq("sourceMessageId", "infectionIdx"))

    val condMsgs = Hl7Wire.wireToConditionMessages(probGuard.clean)
      .unionByName(Hl7Wire.wireToAllergyMessages(allerGuard.clean)
        .drop("reactions"))
      .unionByName(Hl7Wire.wireToInfectionMessages(gatedInf))
    StarPipeline.foldBatch(
      condMsgs.withColumnRenamed("msgId", "sourceMessageId"), batchId,
      cfg(stateRoot, "conditions",
        Seq("mrn", "conditionTypeId", "internalId"), "updatedTimeUs",
        Seq("status", "severity", "onsetDate", "comment", "action")))

    val newProgress = gatedInf
      .agg(max(col("addedTimeUs"))).collect().headOption
      .flatMap(rw => Option(rw.get(0)).map(_.asInstanceOf[Long]))
    newProgress.filter(_ > infStart).foreach { p =>
      java.nio.file.Files.createDirectories(progressPath.getParent)
      java.nio.file.Files.write(progressPath, p.toString.getBytes)
    }

    guardAndFold(r.consults, "consults",
      Seq("missing_id" -> col("epicConsultId").isNull,
        "missing_time" -> col("statusChangeTimeUs").isNull),
      _.select(col("epicConsultId"), col("statusChangeTimeUs"),
        col("sourceMessageId"), col("mrn"), col("visitNumber"),
        col("consultationType"), col("cancelled"),
        col("closedDueToDischarge")),
      Seq("epicConsultId"), "statusChangeTimeUs",
      Seq("mrn", "visitNumber", "consultationType", "cancelled",
        "closedDueToDischarge"))
  }

  /** Current (non-deleted) conditions. A DE action folds as a TOMBSTONE
    * version — newest state wins under F7, an older re-add cannot
    * resurrect it, and the full version history stays queryable — the
    * audit-preserving batch analog of the reference's hard delete with
    * audit row (PatientConditionController delete path).
    */
  def liveConditions(spark: org.apache.spark.sql.SparkSession,
                     stateRoot: String): Option[DataFrame] =
    StarPipeline.readState(spark,
        cfg(stateRoot, "conditions",
          Seq("mrn", "conditionTypeId", "internalId"), "updatedTimeUs",
          Seq("status", "severity", "onsetDate", "comment", "action")),
        "live")
      .map(_.filter(coalesce(col("action") =!= "DE", lit(true))))
}
