package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{IdentityMerge, LocationVisits, PendingMovements}
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

  /** Was this state root folded in bitemporal mode? Decided from the
    * persisted manifests alone (any family manifest listing the
    * `bt_messages` table), so replay/backfill entry points land in the
    * SAME table family as the original fold without the caller having
    * to remember the flag.
    */
  def isBitemporal(stateRoot: String): Boolean = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(stateRoot)
    if (!java.nio.file.Files.isDirectory(root)) return false
    val s = java.nio.file.Files.list(root)
    try s.iterator().asScala.exists { d =>
      val cur = d.resolve("_CURRENT")
      java.nio.file.Files.isRegularFile(cur) && {
        val man = d.resolve(
          new String(java.nio.file.Files.readAllBytes(cur)).trim)
        java.nio.file.Files.isRegularFile(man) &&
          new String(java.nio.file.Files.readAllBytes(man))
            .contains("bt_messages")
      }
    } finally s.close()
  }

  def start(raw: DataFrame, rawCol: String, stateRoot: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
            bitemporal: Boolean = false,
            sink: StarSink = ManifestStarSink): StreamingQuery =
    raw.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, rawCol, stateRoot, bitemporal, sink)
      }
      .start()

  /** S4's second half: re-ingest dead-lettered frames after repair —
    * the Spark analog of the reference's nack-no-requeue + manual
    * re-publish workflow (a nacked message parks in the dead queue
    * until an operator fixes and re-publishes it). Every dead row still
    * carries the original raw frame (input columns ride along through
    * route() and the family guards), so the replay IS a foldBatch of
    * the repaired raw — one code path, not a parallel ingest.
    *
    * Idempotent convergence: folding is replay-safe (kernel message
    * dedup), so replaying a repaired frame lands the state exactly
    * where folding the corrected frame in the original batch would
    * have; frames the repair did NOT fix route straight back to the
    * dead letter under `newBatchId` and the state is untouched.
    *
    * @param source   which dead channel: "router" or a family name
    *                 (e.g. "adt", "labs")
    * @param batches  the dead batch ids to drain
    * @param repair   frame fixer applied before re-ingest (default:
    *                 replay as-is, e.g. after an allowlist/config fix)
    */
  def replayDeadLetters(spark: org.apache.spark.sql.SparkSession,
                        stateRoot: String, rawCol: String, source: String,
                        batches: Seq[Long], newBatchId: Long,
                        repair: DataFrame => DataFrame = identity,
                        sink: StarSink = ManifestStarSink): Unit = {
    val dirs = batches.map(b => s"$stateRoot/dead/$source/batch=$b")
      .filter(d => java.nio.file.Files.exists(java.nio.file.Paths.get(d)))
    if (dirs.isEmpty) return
    val dead = spark.read.parquet(dirs: _*)
    // replay into the SAME table family the stream folds into — a
    // bitemporal pipeline's repaired frames must appear in
    // readBelief/storedAsOf, not in a diverging valid-time-only set.
    // The manifest probe answers for the parquet store; a JDBC sink has
    // no manifests, so ask it whether any family's stored-axis table
    // exists (the adt star folds on every pipeline shape).
    val bt = isBitemporal(stateRoot) ||
      sink.read(spark, adtCfg(stateRoot), "bt_messages").isDefined
    foldBatch(repair(dead).select(col(rawCol)), newBatchId, rawCol,
      stateRoot, bitemporal = bt, sink = sink)
  }

  /** One micro-batch through the whole front end (also callable on a
    * static frame for backfill).
    *
    * @param bitemporal when true, every family folds through
    *   [[StarPipeline.foldBatchBitemporal]] with `storedFromUs` stamped
    *   as the batch id — the reference stamps storedFrom on EVERY table
    *   write (informdb/TemporalCore.java:29-32), and the batch id is
    *   its deterministic micro-batch analog (strictly increasing, one
    *   stamp per transaction boundary). "State as the DB knew it at
    *   batch S" then answers from the persisted star via
    *   [[StarPipeline.readBitemporal]] + `storedAsOf`.
    */
  def foldBatch(batch: DataFrame, batchId: Long, rawCol: String,
                stateRoot: String, bitemporal: Boolean = false,
                sink: StarSink = ManifestStarSink): Unit = {
    // every family channel is a separate action over this batch — cache
    // it once so ten funnels don't re-read the source ten times. Spread
    // a narrow batch over the executors first: the family parsers are
    // expression-heavy, and a single-partition micro-batch would run
    // EVERY channel's parse serially on one core.
    val np = batch.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (batch.rdd.getNumPartitions < np) batch.repartition(np) else batch
    val cached = spread.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    liftCodegenCap(batch.sparkSession)
    try foldRouted(cached, batchId, rawCol, stateRoot, bitemporal, sink)
    finally cached.unpersist()
  }

  // the parse projections are hundreds of fields wide — far over the
  // default whole-stage-codegen field cap, which silently drops them to
  // interpreted eval (~30% slower measured). Lift the cap ONCE per
  // session and leave it raised: a per-batch set/restore races with
  // concurrent queries on the same session (e.g. a WaveformPipeline
  // stream), which could run a fold under the default cap or leak a
  // half-restored value.
  private val codegenLifted = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[
      org.apache.spark.sql.SparkSession, java.lang.Boolean]())
  private def liftCodegenCap(spark: org.apache.spark.sql.SparkSession): Unit =
    if (codegenLifted.add(spark) &&
        spark.conf.get("spark.sql.codegen.maxFields", "100").toInt < 2000)
      spark.conf.set("spark.sql.codegen.maxFields", "2000")

  private def foldRouted(batch: DataFrame, batchId: Long, rawCol: String,
                         stateRoot: String, bitemporal: Boolean,
                         sink: StarSink): Unit = {
    val r = Hl7Wire.route(batch, rawCol)

    // Each parsed family channel feeds at least two actions (its guard's
    // dead-letter write + the star fold, sometimes a progress aggregate
    // too), and the parse is the expensive part of this pipeline —
    // materialize each channel ONCE and let every action read the cache.
    val mats = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def mat(df: DataFrame): DataFrame = {
      val p = df.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      mats += p; p
    }
    // valid-time fold, or the stored-stamped bitemporal twin — through
    // the deployment's StarSink (parquet+manifest or RDBMS MERGE)
    def foldStar(msgs: DataFrame, cfgC: StarPipeline.Config): Unit =
      if (!bitemporal) sink.fold(msgs, batchId, cfgC)
      else sink.foldBitemporal(
        msgs.withColumn("storedFromUs", lit(batchId)), batchId, cfgC)
    try {

    // ONE cheap pass over the cached batch decides which family folds
    // run at all: a production micro-batch is usually single-family,
    // and an absent family must cost ZERO jobs — not a dead-letter
    // write plus a bucket probe over an empty parse. (The reference's
    // consumer pays per message; our unit of work is the family fold.)
    // Two-phase: the (type, trigger) pass is a cheap MSH-only parse; the
    // coding-system classifier (an OBR/MSH multi-field probe, the
    // expensive bit) runs only over the lab/order rows that can carry
    // one — a pure-ADT batch never pays it. cs is null for every other
    // kind, exactly as route()'s dead rules read it.
    val rawc = col(rawCol)
    val mshStat = Hl7Wire.segment(rawc, "MSH")
    val tCol = Hl7Wire.cmp(Hl7Wire.mshFld(mshStat, 9), 1)
    val gCol = Hl7Wire.cmp(Hl7Wire.mshFld(mshStat, 9), 2)
    val labish = Set("ORU", "ORM", "ORR")
    val tgKinds = batch.groupBy(tCol.as("t"), gCol.as("g"))
      .count().collect().map(x => (x.getString(0), x.getString(1)))
    val csKinds =
      if (!tgKinds.exists(k => labish.contains(k._1))) Array.empty[(String, String, String)]
      else batch.filter(tCol.isin(labish.toSeq: _*))
        .groupBy(tCol.as("t"), gCol.as("g"),
          LabFunnel.codingSystem(rawc).as("cs"))
        .count().collect()
        .map(x => (x.getString(0), x.getString(1), x.getString(2)))
    val kinds = tgKinds.filterNot(k => labish.contains(k._1))
      .map { case (t, g) => (t, g, null: String) } ++ csKinds
    def has(p: (String, String, String) => Boolean) =
      kinds.exists { case (t, g, cs) => p(t, g, cs) }

    // Driver-side mirror of route()'s `handled` predicate (allowlist
    // empty ⇒ senderOk always true): if no (type, trigger, coding
    // system) kind in this batch can produce a dead-letter reason, the
    // router dead write is skipped outright — same rows, zero jobs.
    val r01Sys = Set(LabFunnel.WinPath, LabFunnel.CoPath,
      LabFunnel.BioConnect, LabFunnel.BankManager, LabFunnel.Pacs,
      LabFunnel.Flowsheet)
    def handledKind(t: String, g: String, cs: String): Boolean =
      t == "ADT" ||
        (t == "ORU" && g == "R01" && r01Sys.contains(cs)) ||
        (t == "ORU" && g == "R30" && cs == LabFunnel.Abl90) ||
        (t == "PPR" && Set("PC1", "PC2", "PC3").contains(g)) ||
        (t == "ORM" && g == "O01" &&
          Set(LabFunnel.ConsultOrder, LabFunnel.AdvanceDecision,
            LabFunnel.WinPath, LabFunnel.CoPath).contains(cs)) ||
        (t == "ORR" && g == "O02" &&
          Set(LabFunnel.WinPath, LabFunnel.CoPath).contains(cs))
    val anyDead = kinds.exists { case (t, g, cs) =>
      t == null || cs == LabFunnel.BloodProducts || !handledKind(t, g, cs)
    }
    if (anyDead) r.dead.write.mode("overwrite")
      .parquet(s"$stateRoot/dead/router/batch=$batchId")
    def r01Of(sys: String) =
      has((t, g, cs) => t == "ORU" && g == "R01" && cs == sys)
    val ormOrr = (t: String, g: String) =>
      (t == "ORM" && g == "O01") || (t == "ORR" && g == "O02")
    // implied ADT only comes from HANDLED ORU^R01/ORM^O01 frames — a
    // dead-lettered coding system discards its implied ADT too
    val hasImplied = has((t, g, cs) =>
      ((t == "ORU" && g == "R01") || (t == "ORM" && g == "O01")) &&
        handledKind(t, g, cs))
    val hasAdt = has((t, g, _) => t == "ADT" && g != "A60") || hasImplied
    val hasWinPath = r01Of(LabFunnel.WinPath)
    val hasCoPath = r01Of(LabFunnel.CoPath)
    val hasBio = r01Of(LabFunnel.BioConnect)
    val hasBank = r01Of(LabFunnel.BankManager)
    val hasImaging = r01Of(LabFunnel.Pacs)
    val hasAbl = has((t, g, cs) => t == "ORU" && g == "R30" &&
      cs == LabFunnel.Abl90)
    val hasAcks = has((t, g, cs) => ormOrr(t, g) &&
      (cs == LabFunnel.WinPath || cs == LabFunnel.CoPath))
    val hasFlowsheets = r01Of(LabFunnel.Flowsheet)
    val hasProblems = has((t, _, _) => t == "PPR")
    val hasAllergies = has((t, g, _) => t == "ADT" && g == "A60")
    val hasInfections = has((t, g, _) => t == "ADT" && g == "A05")
    val hasConsults = has((t, g, cs) => t == "ORM" && g == "O01" &&
      cs == LabFunnel.ConsultOrder)
    val hasAdvance = has((t, g, cs) => t == "ORM" && g == "O01" &&
      cs == LabFunnel.AdvanceDecision)

    def guardAndFold(parsed0: DataFrame, family: String,
                     rules: Seq[(String, org.apache.spark.sql.Column)],
                     toMsgs: DataFrame => DataFrame,
                     key: Seq[String], vf: String,
                     payload: Seq[String]): DataFrame = {
      val parsed = mat(parsed0)
      val routed = DeadLetter.route(parsed, rules)
      routed.dead.write.mode("overwrite")
        .parquet(s"$stateRoot/dead/$family/batch=$batchId")
      foldStar(toMsgs(routed.clean),
        cfg(stateRoot, family, key, vf, payload))
      routed.clean
    }

    // ADT proper is guarded (a frame without MRN is a nack); the implied
    // ADT the reference derives from every ORU^R01/ORM^O01
    // (IdsOperations.buildAndAddAdtMessage, fromAdtStream=false) joins
    // the same person/visit fold but fails SILENTLY, as in the reference
    // — order messages legitimately arrive without patient context.
    // The payload carries the full visit-op surface (cancel targets,
    // discharge/pending/merge/swap/move identifiers) so the derived
    // views ([[visitIntervals]], [[mrnToLive]], [[pendingTransfers]])
    // re-derive the reference's location/identity state from the
    // PERSISTED message history alone.
    // when no handled ORU/ORM kind is in the batch, skip the implied
    // branch entirely — its filter alone would re-run the coding-system
    // probe over every row
    def withImplied(clean: DataFrame): DataFrame =
      if (!hasImplied) clean
      else clean.unionByName(
        r.impliedAdt.filter(col("mrn").isNotNull &&
          col("validFromUs").isNotNull),
        allowMissingColumns = true)
    if (hasAdt) guardAndFold(r.adt, "adt",
      Seq("missing_mrn" -> col("mrn").isNull,
        "missing_valid_from" -> col("validFromUs").isNull),
      clean => withImplied(clean)
        .select(Seq(col("mrn"), col("validFromUs"), col("sourceMessageId"),
          when(col("msgType").startsWith("Cancel"),
            col("eventOccurredDateTimeUs")).as("targetTimeUs"),
          col("dischargeDateTimeUs").as("dischargeTimeUs")) ++
          AdtPayload.filterNot(Seq("targetTimeUs", "dischargeTimeUs")
            .contains).map(col): _*),
      Seq("mrn"), "validFromUs", AdtPayload)

    // Labs: the WinPath result stream plus the point-of-care /
    // blood-bank / histopathology / imaging funnel channels union into
    // ONE interchange shape and one fold — same state dir, one batch
    // id, no double-fold. Only channels PRESENT in this batch
    // contribute a branch (and a dead-letter write).
    def deadErrors(ch0: DataFrame, name: String): DataFrame = {
      val ch = mat(ch0)
      ch.filter(col("error").isNotNull).write.mode("overwrite")
        .parquet(s"$stateRoot/dead/labs_$name/batch=$batchId")
      ch
    }
    val winPathMsgs = if (!hasWinPath) Nil else {
      val labGuard = DeadLetter.route(mat(r.labOrders),
        Seq("missing_order" -> col("fillerOrderNumber").isNull,
          "missing_time" -> coalesce(col("observationDateTimeUs"),
            col("requestedDateTimeUs")).isNull))
      labGuard.dead.write.mode("overwrite")
        .parquet(s"$stateRoot/dead/labs/batch=$batchId")
      Seq(Hl7Wire.wireToLabMessages(labGuard.clean))
    }
    val labMsgs = winPathMsgs ++
      (if (hasAbl) Seq(LabFunnel.toLabMessages(
        deadErrors(r.ablLabs, "abl"))) else Nil) ++
      (if (hasBio) Seq(LabFunnel.toLabMessages(
        deadErrors(r.bioConnectLabs, "bioconnect"))) else Nil) ++
      (if (hasBank) Seq(LabFunnel.toLabMessages(
        deadErrors(r.bankManagerLabs, "bankmanager"))) else Nil) ++
      (if (hasCoPath) Seq(LabFunnel.coPathToLabMessages(
        deadErrors(r.coPathLabs, "copath"))) else Nil) ++
      (if (hasImaging) Seq(LabFunnel.imageToLabMessages(
        deadErrors(r.imagingLabs, "imaging"))) else Nil)
    if (labMsgs.nonEmpty) foldStar(
      labMsgs.reduce(_ unionByName _),
      cfg(stateRoot, "labs", Seq("battery", "labSpecimenNumber"),
        "statusChangeTimeUs", Seq("epicOrderNumber", "mrn", "results")))

    // ORM^O01 / ORR^O02 order messages carry no results but DO update
    // order state (the reference's WinPath/CoPath order builders:
    // number binding, status-change/sample-received times). They fold
    // into a status side-table keyed like the labs star, so the read
    // path joins them without risking a null-results overwrite of the
    // result-bearing fold.
    if (hasAcks) guardAndFold(r.labOrderAcks, "lab_status",
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

    if (hasFlowsheets) guardAndFold(r.flowsheets, "flowsheets",
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
    val probMsgs = if (!hasProblems) Nil else {
      val probGuard = DeadLetter.route(mat(r.problems),
        Seq("missing_mrn" -> col("mrn").isNull,
          "missing_time" -> col("updatedTimeUs").isNull))
      probGuard.dead.write.mode("overwrite")
        .parquet(s"$stateRoot/dead/conditions/batch=$batchId")
      Seq(Hl7Wire.wireToConditionMessages(probGuard.clean))
    }
    val allerMsgs = if (!hasAllergies) Nil else {
      val allerGuard = DeadLetter.route(mat(r.allergies),
        Seq("invalid_action" -> col("error").isNotNull,
          "missing_mrn" -> col("mrn").isNull,
          "missing_time" -> col("updatedTimeUs").isNull))
      allerGuard.dead.write.mode("overwrite")
        .parquet(s"$stateRoot/dead/allergies/batch=$batchId")
      Seq(Hl7Wire.wireToAllergyMessages(allerGuard.clean)
        .drop("reactions"))
    }

    // Infection progress survives restarts the same way the fold state
    // does — a tiny high-watermark file advanced per batch (the
    // reference holds it in the factory across a service run,
    // PatientInfectionFactory.infectionProgress).
    val progressPath = java.nio.file.Paths.get(
      s"$stateRoot/conditions/_INF_PROGRESS")
    val infMsgs = if (!hasInfections) Nil else {
      val infStart =
        if (java.nio.file.Files.exists(progressPath))
          new String(java.nio.file.Files.readAllBytes(progressPath))
            .trim.toLong
        else 0L
      val gatedInf = mat(Hl7Wire.infectionGate(
        r.infections.filter(col("mrn").isNotNull),
        infStart, Seq("sourceMessageId", "infectionIdx")))
      val newProgress = gatedInf
        .agg(max(col("addedTimeUs"))).collect().headOption
        .flatMap(rw => Option(rw.get(0)).map(_.asInstanceOf[Long]))
      newProgress.filter(_ > infStart).foreach { p =>
        java.nio.file.Files.createDirectories(progressPath.getParent)
        // tmp + ATOMIC_MOVE, matching the state manifest: a crash
        // mid-write must never leave a truncated high-water mark
        val tmp = progressPath.resolveSibling("_INF_PROGRESS.tmp")
        java.nio.file.Files.write(tmp, p.toString.getBytes)
        java.nio.file.Files.move(tmp, progressPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      Seq(Hl7Wire.wireToInfectionMessages(gatedInf))
    }

    // ConditionVisits link table: problems and allergies (NOT
    // infections) with a visit save an insert-once condition↔visit link
    // (ref core/.../PatientConditionController.java:337-348 —
    // savePatientConditionHospitalVisitLink inserts only when no row
    // exists, never updates, never deletes; links outlive a condition
    // tombstone). Fold shape: key = the whole link tuple, constant
    // payload — F6 run-coalescing makes every re-sighting a no-op, so
    // the live view IS the distinct pair set, permutation-invariant.
    val linkMsgs = probMsgs ++ allerMsgs
    if (linkMsgs.nonEmpty) foldStar(
      linkMsgs.reduce(_ unionByName _)
        .filter(col("visitNumber").isNotNull)
        .select(col("mrn"), col("conditionTypeId"), col("internalId"),
          col("visitNumber"), col("updatedTimeUs"),
          col("msgId").as("sourceMessageId"), lit(true).as("linked")),
      cfg(stateRoot, "condition_visits",
        Seq("mrn", "conditionTypeId", "internalId", "visitNumber"),
        "updatedTimeUs", Seq("linked")))

    val condMsgs = linkMsgs.map(_.drop("visitNumber")) ++ infMsgs
    if (condMsgs.nonEmpty) foldStar(
      condMsgs.reduce(_ unionByName _)
        .withColumnRenamed("msgId", "sourceMessageId"),
      cfg(stateRoot, "conditions",
        Seq("mrn", "conditionTypeId", "internalId"), "updatedTimeUs",
        Seq("status", "severity", "onsetDate", "comment", "action")))

    val consultClean = if (!hasConsults) None else Some(
      guardAndFold(r.consults, "consults",
      Seq("missing_id" -> col("epicConsultId").isNull,
        "missing_time" -> col("statusChangeTimeUs").isNull),
      _.select(col("epicConsultId"), col("statusChangeTimeUs"),
        col("sourceMessageId"), col("mrn"), col("visitNumber"),
        col("consultationType"), col("cancelled"),
        col("closedDueToDischarge")),
      Seq("epicConsultId"), "statusChangeTimeUs",
      Seq("mrn", "visitNumber", "consultationType", "cancelled",
        "closedDueToDischarge")))

    // Advance decisions (O20's second half): same ORM shape, own star
    // (ref core/.../AdvanceDecisionController.java).
    val advClean = if (!hasAdvance) None else Some(
      guardAndFold(r.advanceDecisions, "advance_decisions",
        Seq("missing_id" -> col("advanceDecisionNumber").isNull,
          "missing_time" -> col("statusChangeTimeUs").isNull),
        _.select(col("advanceDecisionNumber"), col("statusChangeTimeUs"),
          col("sourceMessageId"), col("mrn"), col("visitNumber"),
          col("careCode"), col("typeName"), col("requestedTimeUs"),
          col("cancelled"), col("closedDueToDischarge")),
        Seq("advanceDecisionNumber"), "statusChangeTimeUs",
        Seq("mrn", "visitNumber", "careCode", "typeName",
          "requestedTimeUs", "cancelled", "closedDueToDischarge")))

    // O18: consult + advance-decision NTE questions → ONE
    // question/answer star keyed by (parent table, parent id, question
    // text) — the reference dedups question rows by text and keys
    // answers by (question, parent request), QuestionController; newest
    // answer wins under the kernel's F7.
    val qMsgs =
      consultClean.map(Hl7Wire.wireToQuestionMessages(_)).toSeq ++
        advClean.map(Hl7Wire.wireToQuestionMessages(_,
          parentTable = "ADVANCE_DECISION",
          parentIdCol = "advanceDecisionNumber")).toSeq
    if (qMsgs.nonEmpty) foldStar(
      qMsgs.reduce(_ unionByName _)
        .withColumnRenamed("msgId", "sourceMessageId"),
      cfg(stateRoot, "questions",
        Seq("parentTable", "parentId", "questionText"), "updatedTimeUs",
        Seq("answer")))
    } finally mats.foreach(_.unpersist(false))
  }

  /** The visit-op payload persisted in the `adt` star — everything the
    * derived views need to re-derive location/identity/pending state
    * from the message history alone.
    */
  private val AdtPayload = Seq("msgType", "patientClass",
    "fullLocationString", "visitNumber", "previousMrn",
    "previousVisitNumber", "otherVisitNumber", "pendingDestination",
    "targetTimeUs", "dischargeTimeUs")

  private def adtCfg(stateRoot: String) =
    cfg(stateRoot, "adt", Seq("mrn"), "validFromUs", AdtPayload)

  /** Derived read views over the persisted ADT star — the Spark-first
    * counterpart of the reference's imperatively-maintained
    * location_visit / mrn_to_live / planned_movement tables
    * (core/.../PatientLocationController, PersonController,
    * PendingAdtController): instead of mutating derived tables per
    * message under row locks, the canonical state is RE-DERIVED from
    * the deduped message history, so any arrival order converges to the
    * same result (the property the reference's permutation suite
    * checks). Materialize per batch or on demand; cost is one window
    * pass over the history (bounded per bucket after compaction).
    */
  final case class DerivedState(intervals: DataFrame, mrnToLive: DataFrame,
                                pendings: DataFrame, demographics: DataFrame)

  /** A family's full bitemporal version table (requires the pipeline to
    * have folded with `bitemporal = true`). Query with
    * [[graft.functions.GraftFunctions.storedAsOf]] for "state as the
    * pipeline knew it after batch S".
    */
  def readBelief(spark: org.apache.spark.sql.SparkSession,
                 stateRoot: String, family: String): Option[DataFrame] =
    StarPipeline.readBitemporal(spark, s"$stateRoot/$family")

  private def btHistory(spark: org.apache.spark.sql.SparkSession,
                        c: StarPipeline.Config,
                        sink: StarSink): Option[DataFrame] =
    sink.read(spark, c, "bt_messages")

  private def btLive(spark: org.apache.spark.sql.SparkSession,
                     c: StarPipeline.Config,
                     sink: StarSink): Option[DataFrame] =
    sink.read(spark, c, "bt_table").map(
      _.filter(col("stored_until_us").isNull && col("valid_until_us").isNull)
        .drop("valid_until_us", "stored_from_us", "stored_until_us"))

  def derived(spark: org.apache.spark.sql.SparkSession, stateRoot: String,
              pendingWindowUs: Long = 72L * 3600L * 1000000L,
              bitemporal: Boolean = false,
              sink: StarSink = ManifestStarSink)
      : Option[DerivedState] = {
    val c = adtCfg(stateRoot)
    val hist =
      if (bitemporal) btHistory(spark, c, sink)
      else sink.read(spark, c, "history")
    hist.map { h =>
      val ops = Hl7Wire.adtOps(h)

      // O6/O7/O8 + O9 swap + O10 move: interval inference over the
      // visit-bearing messages, then the rare cross-key ops
      val msgs = h.select(col("visitNumber").as("visitId"), col("msgType"),
          col("fullLocationString").as("location"), col("validFromUs"),
          col("sourceMessageId"), col("targetTimeUs"),
          col("dischargeTimeUs"))
        .filter(col("visitId").isNotNull)
      val swapped = LocationVisits.swapLocations(
        LocationVisits.deriveIntervals(msgs), ops.swaps)
      // A45: the visit's intervals move to the new encounter id
      val mv = broadcast(ops.visitMoves.select(
        col("visitId").as("mv_v"), col("newEncounter")))
      val moved = swapped.join(mv, col("visitId") === col("mv_v"), "left")
        .withColumn("visitId",
          coalesce(col("newEncounter"), col("visitId")))
        .drop("mv_v", "newEncounter")

      // O11: A29 cascades — drop intervals of visits wholly older than
      // their person's delete (F7: a visit with any newer activity
      // survives)
      val dels = broadcast(ops.personDeletes)
      // the delete message's own row is not visit activity — only OTHER
      // messages newer than the delete keep a visit alive (F7)
      val delVisits = h.filter(col("visitNumber").isNotNull &&
          col("msgType") =!= "DeletePersonInformation")
        .groupBy(col("mrn"), col("visitNumber"))
        .agg(max(col("validFromUs")).as("__max_vf"))
        .join(dels, Seq("mrn"))
        .filter(col("__max_vf") < col("delTimeUs"))
        .select(col("visitNumber").as("visitId"))
      val intervals = moved.join(broadcast(delVisits), Seq("visitId"),
        "left_anti")

      // O4/O5: pointer table over every MRN the history has seen,
      // merge-closed then identifier-changed (U1)
      val base = h.select(col("mrn"))
        .unionByName(ops.merges.select(col("absorbed").as("mrn")))
        .unionByName(ops.merges.select(col("survivor").as("mrn")))
        .filter(col("mrn").isNotNull).distinct()
        .select(col("mrn"), col("mrn").as("live_mrn"))
      val mrnMap = IdentityMerge.changeIdentifiers(
        IdentityMerge.applyMerges(base, ops.merges),
        ops.identifierChanges)

      // O13: pending-transfer lifecycle
      val pendings = PendingMovements.derive(ops.pendings,
        ops.pendingCancels, pendingWindowUs)

      // person demographics: live ADT state minus A29 deletes (O3/O11).
      // The A29 row is an op marker, not demographic state — a person
      // whose NEWEST version is the delete itself is deleted.
      val live = (if (bitemporal) btLive(spark, c, sink)
        else sink.read(spark, c, "live"))
        .getOrElse(h.limit(0))
        .filter(col("msgType") =!= "DeletePersonInformation")
      val demographics = graft.kernel.BitemporalKernel.deleteIfNewer(
        live, dels.withColumnRenamed("delTimeUs", "validFromUs"),
        Seq("mrn"), "validFromUs").live

      DerivedState(intervals, mrnMap, pendings, demographics)
    }
  }

  /** Current (non-deleted) conditions. A DE action folds as a TOMBSTONE
    * version — newest state wins under F7, an older re-add cannot
    * resurrect it, and the full version history stays queryable — the
    * audit-preserving batch analog of the reference's hard delete with
    * audit row (PatientConditionController delete path).
    */
  def liveConditions(spark: org.apache.spark.sql.SparkSession,
                     stateRoot: String,
                     bitemporal: Boolean = false,
                     sink: StarSink = ManifestStarSink): Option[DataFrame] = {
    val c = cfg(stateRoot, "conditions",
      Seq("mrn", "conditionTypeId", "internalId"), "updatedTimeUs",
      Seq("status", "severity", "onsetDate", "comment", "action"))
    (if (bitemporal) btLive(spark, c, sink)
     else sink.read(spark, c, "live"))
      .map(_.filter(coalesce(col("action") =!= "DE", lit(true))))
  }

  /** The condition↔visit link set (ref ConditionVisits entity +
    * PatientConditionController.savePatientConditionHospitalVisitLink):
    * one row per distinct (mrn, conditionTypeId, internalId,
    * visitNumber) ever seen on a problem/allergy message with a visit.
    * Links are insert-once — a condition tombstone does NOT remove its
    * links (the reference never deletes from this table), so read it
    * unfiltered and join to [[liveConditions]] when only live
    * conditions' visits are wanted.
    */
  def conditionVisits(spark: org.apache.spark.sql.SparkSession,
                      stateRoot: String,
                      bitemporal: Boolean = false,
                      sink: StarSink = ManifestStarSink): Option[DataFrame] = {
    val c = cfg(stateRoot, "condition_visits",
      Seq("mrn", "conditionTypeId", "internalId", "visitNumber"),
      "updatedTimeUs", Seq("linked"))
    (if (bitemporal) btLive(spark, c, sink)
     else sink.read(spark, c, "live"))
      .map(_.select(col("mrn"), col("conditionTypeId"),
        col("internalId"), col("visitNumber")))
  }
}
