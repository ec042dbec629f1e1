package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hl7Timestamp.hl7TsUs

/** S2: HL7 v2 wire parsing — pipe/caret splitting of MSH/EVN/PID/PV1/
  * OBR/OBX segments plus MSH-9 type/trigger routing into the interchange
  * ADT shape (ref: hl7-reader/.../IdsOperations.java:351-477 for WHAT is
  * extracted; the HL7 v2 encoding rules themselves are public spec).
  *
  * Spark-first: every accessor is a pure `functions._` composition
  * (split / filter / get / element lookups), so parsing stays inside
  * whole-stage codegen and distributes like any projection — no UDF, no
  * driver loop, no per-row JVM object graph. A raw-message DataFrame at
  * any scale parses in one narrow map stage.
  *
  * Conventions:
  *  - segments split on CR (wire standard) or LF (file corpora);
  *  - field numbering is HL7's: for non-MSH segments, field i is the
  *    i-th pipe-delimited element after the segment id; MSH-1 IS the
  *    field separator, so MSH-i sits one split-index earlier;
  *  - only the first repetition (`~`) of a field is taken, matching the
  *    reference's single-identifier reads;
  *  - empty string → null (HL7 "not present"; tri-state semantics over
  *    parsed values live in [[graft.model.IValue.fromHl7]]).
  */
object Hl7Wire {

  /** Non-empty segments of a raw message. */
  def segments(raw: Column): Column =
    filter(split(raw, "[\\r\\n]+"), s => length(s) > 0)

  /** First segment with the given id ("PID"), null if absent. */
  def segment(raw: Column, id: String): Column =
    get(filter(segments(raw), s => substring(s, 1, 3) === id), lit(0))

  /** All segments with the given id (OBX/OBR/NTE repeat). */
  def segmentsOf(raw: Column, id: String): Column =
    filter(segments(raw), s => substring(s, 1, 3) === id)

  private def nullIfEmpty(c: Column): Column = when(c === "", lit(null)).otherwise(c)

  /** HL7 field i (1-based) of a non-MSH segment. */
  def fld(seg: Column, i: Int): Column =
    nullIfEmpty(get(split(seg, "\\|"), lit(i)))

  /** HL7 field i of the MSH segment (MSH-1 is the separator itself). */
  def mshFld(seg: Column, i: Int): Column =
    if (i == 1) lit("|") else nullIfEmpty(get(split(seg, "\\|"), lit(i - 1)))

  /** Component k (1-based, `^`-separated) of a field. */
  def cmp(f: Column, k: Int): Column =
    nullIfEmpty(get(split(f, "\\^"), lit(k - 1)))

  /** First repetition (`~`-separated) of a field. */
  def rep1(f: Column): Column = nullIfEmpty(get(split(f, "~"), lit(0)))

  /** Single-element-transform let binding: evaluates `value` once per
    * scope. Needed inside HOF lambdas, which get no subexpression
    * elimination (see LabFunnel.let).
    */
  private def letC(value: Column)(body: Column => Column): Column =
    get(transform(array(value), v => body(v)), lit(0))

  /** Field i from a pre-split field array (same indexing as [[fld]]). */
  private def gf(arr: Column, i: Int): Column =
    nullIfEmpty(get(arr, lit(i)))

  /** One mixed wire stream → per-family parsed channels, the analog of
    * the reference's central router (IdsOperations.messageFromHl7Message,
    * IdsOperations.java:413-477): MSH-9 type/trigger picks the message
    * family, then order/result messages fan further by coding system
    * ([[LabFunnel.codingSystem]] — the OrderAndResultService decision,
    * OrderAndResultService.java:49-216). Unroutable frames, unhandled
    * types, the deliberately-ignored blood-products feed and unknown
    * coding systems land in `dead` with a reason (S3/S4 nack semantics).
    * Each channel is a filter + its family parser over the same input —
    * at scale this is one scan fanned into narrow codegen'd branches, no
    * shuffle until the downstream folds.
    *
    *   ADT^*                      → adt
    *   ORU^R01  WIN_PATH          → labOrders (generic nested star shape)
    *                                + winPathLabs (full-fidelity builder)
    *   ORU^R01  CO_PATH           → coPathLabs
    *   ORU^R01  BIO_CONNECT       → bioConnectLabs
    *   ORU^R01  BANK_MANAGER      → bankManagerLabs
    *   ORU^R01  PACS              → imagingLabs
    *   ORU^R01  FLOWSHEET (Vitals)→ flowsheets
    *   ORU^R30  ABL90_FLEX_PLUS   → ablLabs
    *   ORM^O01  CONSULT_ORDER     → consults
    *   ORM^O01  ADVANCED_DECISION → advanceDecisions
    *   ORM^O01 / ORR^O02 WIN_PATH/CO_PATH → labOrderAcks (no results)
    *   PPR^PC1/PC2/PC3            → problems
    *   ORU^R01 / ORM^O01          → impliedAdt (person/visit context
    *                                the reference derives from every
    *                                order/result message)
    *   ADT^A05                    → adt (ImpliedAdt) + infections (ZIF)
    *   ADT^A60                    → allergies (IAM) only
    */
  final case class RoutedWire(adt: DataFrame, labOrders: DataFrame,
                              winPathLabs: DataFrame, coPathLabs: DataFrame,
                              ablLabs: DataFrame, bioConnectLabs: DataFrame,
                              bankManagerLabs: DataFrame, imagingLabs: DataFrame,
                              labOrderAcks: DataFrame, flowsheets: DataFrame,
                              problems: DataFrame, consults: DataFrame,
                              advanceDecisions: DataFrame,
                              impliedAdt: DataFrame, infections: DataFrame,
                              allergies: DataFrame, dead: DataFrame)

  /** @param adtSenderAllowlist when non-empty, ADT frames whose MSH-3
    *   sending application is not in the list are dead-lettered instead
    *   of parsed — the reference's `ALLOWED_ADT_SENDER` gate
    *   (IdsOperations.java:62,425-429, constant "EPIC").
    */
  def route(df: DataFrame, rawCol: String,
            adtSenderAllowlist: Seq[String] = Nil): RoutedWire = {
    val raw = col(rawCol)
    val msh = segment(raw, "MSH")
    val msgType = cmp(mshFld(msh, 9), 1)
    val trigger = cmp(mshFld(msh, 9), 2)
    val tagged = df.withColumn("__t", msgType).withColumn("__g", trigger)
      .withColumn("__cs", LabFunnel.codingSystem(raw))
    val cs = col("__cs")

    def is(t: String, gs: String*) =
      col("__t") === t &&
        (if (gs.isEmpty) lit(true) else col("__g").isin(gs: _*))
    val isOrm = is("ORM", "O01")
    val isOrr = is("ORR", "O02")
    val sender = cmp(mshFld(msh, 3), 1)
    val senderOk =
      if (adtSenderAllowlist.isEmpty) lit(true)
      else coalesce(sender.isin(adtSenderAllowlist: _*), lit(false))
    val r01Systems = Seq(LabFunnel.WinPath, LabFunnel.CoPath,
      LabFunnel.BioConnect, LabFunnel.BankManager, LabFunnel.Pacs,
      LabFunnel.Flowsheet)
    // null coding system must read as NOT handled, not three-valued null
    val handled = coalesce(
      (is("ADT") && senderOk) ||
        (is("ORU", "R01") && cs.isin(r01Systems: _*)) ||
        (is("ORU", "R30") && cs === LabFunnel.Abl90) ||
        is("PPR", "PC1", "PC2", "PC3") ||
        (isOrm && cs.isin(LabFunnel.ConsultOrder, LabFunnel.AdvanceDecision,
          LabFunnel.WinPath, LabFunnel.CoPath)) ||
        (isOrr && cs.isin(LabFunnel.WinPath, LabFunnel.CoPath)),
      lit(false))

    def branch(cond: Column, parse: (DataFrame, String) => DataFrame) =
      parse(tagged.filter(cond), rawCol).drop("__t", "__g", "__cs")
    def r01(system: String) = is("ORU", "R01") && cs === system

    val acksFor = (system: String) =>
      branch((isOrm || isOrr) && cs === system,
        LabFunnel.parseOrderMessages(_, _, system))

    RoutedWire(
      // A60 fans to the allergies channel only (the reference's A60 ADT
      // build throws NotImplemented and is swallowed,
      // IdsOperations.java:493-503); every other ADT trigger parses here.
      adt = branch(is("ADT") && senderOk && !is("ADT", "A60"), parseAdt),
      labOrders = branch(r01(LabFunnel.WinPath), parseLabOrders),
      winPathLabs = branch(r01(LabFunnel.WinPath), LabFunnel.parseWinPathResults),
      coPathLabs = branch(r01(LabFunnel.CoPath), LabFunnel.parseCoPath),
      ablLabs = branch(is("ORU", "R30") && cs === LabFunnel.Abl90,
        LabFunnel.parseAbl90),
      bioConnectLabs = branch(r01(LabFunnel.BioConnect), LabFunnel.parseBioConnect),
      bankManagerLabs = branch(r01(LabFunnel.BankManager), LabFunnel.parseBankManager),
      imagingLabs = branch(r01(LabFunnel.Pacs), LabFunnel.parseImage),
      labOrderAcks = acksFor(LabFunnel.WinPath)
        .unionByName(acksFor(LabFunnel.CoPath)),
      flowsheets = branch(r01(LabFunnel.Flowsheet), parseFlowsheets),
      problems = branch(is("PPR", "PC1", "PC2", "PC3"), parseProblems),
      consults = branch(isOrm && cs === LabFunnel.ConsultOrder, parseConsults),
      advanceDecisions = branch(isOrm && cs === LabFunnel.AdvanceDecision,
        parseAdvanceDecisions),
      // the reference also derives an implied ADT (person/visit context)
      // from every ORU^R01 and ORM^O01 (IdsOperations.java:431-460
      // buildAndAddAdtMessage with fromAdtStream=false) — parse failures
      // there are silent, here they're null-field rows the dead-letter
      // rules drop. Gated on `handled`: a frame the router dead-letters
      // (unknown/ignored coding system) discards its implied ADT too —
      // the reference's Hl7MessageIgnoredException throws the WHOLE
      // message away, already-built ADT included (LabFunnel
      // determineCodingSystem; OrderAndResultService.java:49-216).
      impliedAdt = branch((is("ORU", "R01") || isOrm) && handled, parseAdt),
      infections = branch(is("ADT", "A05") && senderOk, parseInfections),
      allergies = branch(is("ADT", "A60") && senderOk, parseAllergies),
      dead = tagged.withColumn("reason",
          when(col("__t").isNull, "unroutable")
            .when(is("ADT") && !senderOk,
              concat(lit("skipped_sender:"), coalesce(sender, lit(""))))
            .when((is("ORU") || isOrm || isOrr) &&
                cs === LabFunnel.BloodProducts,
              "ignored_coding_system:BLOOD_PRODUCTS")
            .when((is("ORU", "R01", "R30") || isOrm || isOrr) && !handled,
              "unknown_coding_system")
            .when(!handled, concat(lit("unhandled_type:"), col("__t"),
              lit("^"), coalesce(col("__g"), lit("")))))
        .filter(col("reason").isNotNull).drop("__t", "__g", "__cs"))
  }

  /** ADT trigger (MSH-9.2) → interchange operation — the FULL dispatch of
    * the reference's AdtMessageFactory.buildAdtMessageSubclass
    * (AdtMessageFactory.java:190-285): A01 admit; A02/A06/A07 transfer
    * (class changes are location-neutral transfers); A03 discharge; A04
    * register (unless EVN-4 is ENC_CREATE — not implemented); A05 and the
    * non-ADT R01/O01 are implied ADT; A08/A28/A31 update; A11/A12/A13
    * cancels; A14/A38 scheduling (not implemented); A15/A26 pending
    * transfer open/cancel; A17 swap locations; A29 delete person; A40
    * merge; A45 move visit; A47 change identifiers. Everything the
    * reference throws Hl7MessageNotImplementedException for keeps the
    * `Unhandled:` prefix so [[graft.streaming.DeadLetter.adtRules]]
    * routes it to the dead letter.
    */
  def triggerToOp(trigger: Column, eventReasonCode: Column): Column =
    when(trigger === "A01", "Admit")
      .when(trigger.isin("A02", "A06", "A07"), "Transfer")
      .when(trigger === "A03", "Discharge")
      .when(trigger === "A04",
        when(eventReasonCode === "ENC_CREATE", "Unhandled:ENC_CREATE")
          .otherwise("Register"))
      .when(trigger.isin("A05") || trigger.isin("R01", "O01"), "ImpliedAdt")
      .when(trigger.isin("A08", "A28", "A31"), "UpdateInfo")
      .when(trigger === "A11", "CancelAdmit")
      .when(trigger === "A12", "CancelTransfer")
      .when(trigger === "A13", "CancelDischarge")
      .when(trigger.isin("A14", "A38"),
        concat(lit("Unhandled:scheduling:"), trigger))
      .when(trigger === "A15", "PendingTransfer")
      .when(trigger === "A17", "SwapLocations")
      .when(trigger === "A26", "CancelPendingTransfer")
      .when(trigger === "A29", "DeletePersonInformation")
      .when(trigger === "A40", "MergePatient")
      .when(trigger === "A45", "MoveVisit")
      .when(trigger === "A47", "ChangeIdentifiers")
      .otherwise(concat(lit("Unhandled:"), trigger))

  def triggerToOp(trigger: Column): Column =
    triggerToOp(trigger, lit(null).cast("string"))

  /** Parse raw ADT messages into the interchange ADT shape
    * ([[graft.model.AdtMessage]] column-for-column, plus `trigger` and
    * the X1 `validFromUs` best-guess). Messages missing MSH parse to
    * null fields — route through [[graft.streaming.DeadLetter.adtRules]]
    * for the clean/dead split. Input columns ride along after the parsed
    * fields (name clashes resolve to the parsed field), so the dead
    * letter keeps its original payload and callers keep their context.
    */
  def parseAdt(df: DataFrame, rawCol: String): DataFrame = {
    val raw = col(rawCol)
    val msh = segment(raw, "MSH")
    val evn = segment(raw, "EVN")
    val pid = segment(raw, "PID")
    val pv1 = segment(raw, "PV1")
    // A17 swap carries a second PID/PV1 group (the other patient of the
    // swap, AdtMessageFactory.buildSwapLocations); A45 nests its MRG+PV1
    // in a MERGE_INFO group, which on the wire is just the segments.
    val pid2 = get(segmentsOf(raw, "PID"), lit(1))
    val pv12 = get(segmentsOf(raw, "PV1"), lit(1))
    val mrg = segment(raw, "MRG")

    val trigger = cmp(mshFld(msh, 9), 2)
    val recordedUs = coalesce(hl7TsUs(mshFld(msh, 7)), hl7TsUs(fld(evn, 2)))
    val occurredUs = hl7TsUs(fld(evn, 6))
    val name = fld(pid, 5)
    def nhsOf(pidSeg: Column): Column =
      get(transform(
        filter(split(fld(pidSeg, 3), "~"),
          r => get(split(r, "\\^"), lit(4)) === "NHSNMBR"),
        r => get(split(r, "\\^"), lit(0))), lit(0))

    val parsed = Seq(
      triggerToOp(trigger, fld(evn, 4)).as("msgType"),
      trigger.as("trigger"),
      mshFld(msh, 10).as("sourceMessageId"),
      mshFld(msh, 3).as("sourceSystem"),
      recordedUs.as("recordedDateTimeUs"),
      occurredUs.as("eventOccurredDateTimeUs"),
      cmp(rep1(fld(pid, 3)), 1).as("mrn"),
      // NHS number: the PID-3 repetition whose identifier-type (CX.5)
      // is NHSNMBR — scan repetitions, take the first match
      nhsOf(pid).as("nhsNumber"),
      cmp(fld(pv1, 19), 1).as("visitNumber"),
      fld(pv1, 3).as("fullLocationString"),
      fld(pv1, 6).as("previousLocation"),
      cmp(fld(pv1, 2), 1).as("patientClass"),
      patientClassName(cmp(fld(pv1, 2), 1)).as("patientClassName"),
      cmp(name, 2).as("patientGivenName"),
      cmp(name, 1).as("patientFamilyName"),
      // full PatientInfoHl7 demographics (AdtMessageFactory.java:119-151)
      cmp(name, 3).as("patientMiddleName"),
      cmp(name, 5).as("patientTitle"),
      cmp(fld(pid, 8), 1).as("patientSex"),
      hl7TsUs(fld(pid, 7)).as("patientBirthDateTimeUs"),
      date_format(timestamp_micros(hl7TsUs(fld(pid, 7))), "yyyy-MM-dd")
        .as("patientBirthDate"),
      cmp(rep1(fld(pid, 11)), 5).as("patientZipOrPostalCode"),
      cmp(fld(pid, 17), 1).as("patientReligion"),
      cmp(rep1(fld(pid, 22)), 1).as("ethnicGroupCode"),
      // death info can arrive in ANY message, not just A03; the
      // indicator is tri-state (Y→dead, N→alive, else unknown/IGNORE),
      // and the death time is kept even when the indicator denies it
      hl7TsUs(fld(pid, 29)).as("patientDeathDateTimeUs"),
      when(fld(pid, 30) === "Y", lit(false))
        .when(fld(pid, 30) === "N", lit(true))
        .as("patientIsAlive"),
      cmp(fld(segment(raw, "PV2"), 38), 1).as("modeOfArrival"),
      hl7TsUs(fld(pv1, 44)).as("admissionDateTimeUs"),
      hl7TsUs(fld(pv1, 45)).as("dischargeDateTimeUs"),
      // A03 extras (PV1Wrap.getDischargeDisposition / getDischargeLocation)
      fld(pv1, 36).as("dischargeDisposition"),
      fld(pv1, 37).as("dischargeLocation"),
      // A12: the cancelled transfer's location is PV1-6 (prior location)
      fld(pv1, 6).as("cancelledLocation"),
      // A15/A26: pending destination is PV1-42
      fld(pv1, 42).as("pendingDestination"),
      // A40/A45/A47: MRG-1 rep 1 = prior MRN, rep 2 = prior NHS number
      // (AdtMessageFactory.setPreviousIdentifiers); MRG-5 = prior visit
      cmp(rep1(fld(mrg, 1)), 1).as("previousMrn"),
      cmp(get(split(fld(mrg, 1), "~"), lit(1)), 1).as("previousNhsNumber"),
      cmp(fld(mrg, 5), 1).as("previousVisitNumber"),
      // A17: the other patient/visit of the swap (second PID/PV1 group)
      cmp(rep1(fld(pid2, 3)), 1).as("otherMrn"),
      nhsOf(pid2).as("otherNhsNumber"),
      cmp(fld(pv12, 19), 1).as("otherVisitNumber"),
      fld(pv12, 3).as("otherFullLocationString"),
      coalesce(occurredUs, recordedUs).as("validFromUs"))
    val parsedNames = Set("msgType", "trigger", "sourceMessageId",
      "sourceSystem", "recordedDateTimeUs", "eventOccurredDateTimeUs",
      "mrn", "nhsNumber", "visitNumber", "fullLocationString",
      "previousLocation", "patientClass", "patientClassName",
      "patientGivenName", "patientFamilyName", "patientMiddleName",
      "patientTitle", "patientSex", "patientBirthDateTimeUs",
      "patientBirthDate", "patientZipOrPostalCode", "patientReligion",
      "ethnicGroupCode", "patientDeathDateTimeUs", "patientIsAlive",
      "modeOfArrival",
      "admissionDateTimeUs", "dischargeDateTimeUs",
      "dischargeDisposition", "dischargeLocation", "cancelledLocation",
      "pendingDestination", "previousMrn", "previousNhsNumber",
      "previousVisitNumber", "otherMrn", "otherNhsNumber",
      "otherVisitNumber", "otherFullLocationString", "validFromUs")
    val carried = df.columns.filterNot(parsedNames.contains).map(col)
    df.select(parsed ++ carried: _*)
  }

  /** PV1-2 code → the reference's PatientClass enum name
    * (interchange PatientClass: E/I/N/B/P/O + the two spelled-out
    * codes); unknown codes stay null — the reference throws, we
    * dead-letter on a rule over this null + non-null raw code.
    */
  def patientClassName(code: Column): Column =
    when(code === "E", "EMERGENCY")
      .when(code === "I", "INPATIENT")
      .when(code === "N", "NOT_APPLICABLE")
      .when(code === "B", "NEW_BORN")
      .when(code === "P", "PRE_ADMIT")
      .when(code === "O", "OUTPATIENT")
      .when(code === "DAY CASE", "DAY_CASE")
      .when(code === "SURG ADMIT", "SURGICAL_ADMISSION")

  /** Ethnic-group code → display name via a caller-supplied mapping
    * (the reference ships a CSV lookup, hl7/parser/EthnicGroup.java;
    * the mapping is site data, so it arrives as a parameter here).
    * Unmapped codes pass through unchanged, like the reference's
    * default branch.
    */
  def ethnicGroupName(code: Column, mapping: Map[String, String]): Column =
    if (mapping.isEmpty) code
    else {
      val m = map(mapping.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      coalesce(element_at(m, code), code)
    }

  /** Explode a message's OBX result segments into one row each:
    * (setId, valueType, observationId, subId, value, units, obsTimeUs,
    * resultStatus). Carries every column of `df` through, so callers
    * join results to their parsed order/ADT context for free.
    */
  def parseObx(df: DataFrame, rawCol: String): DataFrame = {
    val obx = col("__obx")
    // outer + null filter ≡ explode, but dodges the optimizer's
    // InferFiltersFromGenerate, whose inferred size() predicate
    // re-evaluates the generator child once more per row
    df.withColumn("__obx", explode_outer(segmentsOf(col(rawCol), "OBX")))
      .filter(col("__obx").isNotNull)
      .withColumn("obxSetId", fld(obx, 1).cast("int"))
      .withColumn("valueType", fld(obx, 2))
      .withColumn("observationId", cmp(fld(obx, 3), 1))
      .withColumn("observationSubId", fld(obx, 4))
      .withColumn("value", rep1(fld(obx, 5)))
      .withColumn("units", cmp(fld(obx, 6), 1))
      .withColumn("resultStatus", fld(obx, 11))
      .withColumn("obsTimeUs", hl7TsUs(fld(obx, 14)))
      .drop("__obx")
  }

  /** Explode OBR order segments: (orderNumber, testId, requestedUs,
    * obsUs, status). */
  def parseObr(df: DataFrame, rawCol: String): DataFrame = {
    val obr = col("__obr")
    df.withColumn("__obr", explode_outer(segmentsOf(col(rawCol), "OBR")))
      .filter(col("__obr").isNotNull)
      .withColumn("fillerOrderNumber", cmp(fld(obr, 3), 1))
      .withColumn("testId", cmp(fld(obr, 4), 1))
      .withColumn("requestedDateTimeUs", hl7TsUs(fld(obr, 6)))
      .withColumn("observationDateTimeUs", hl7TsUs(fld(obr, 7)))
      .withColumn("resultStatus", fld(obr, 25))
      .drop("__obr")
  }

  /** ORU^R01 → the NESTED interchange lab shape: one row per OBR order
    * carrying its OBX results as an array of structs — the counterpart
    * of the reference's lab builders, which group each order's results
    * into `LabOrderMsg.labResultMsgs`
    * (hl7-reader/.../labs/LabOrderBuilder + LabFunnel routing,
    * IdsOperations.java:442-477).
    *
    * Grouping is positional, as the wire format defines it: an OBX
    * belongs to the most recent OBR above it. Implemented entirely with
    * array higher-order functions (transform-with-index / filter /
    * posexplode), so the builder stays a codegen'd narrow projection —
    * message count in, order count out, zero shuffles at any scale.
    *
    * Output per order: sourceMessageId/sourceSystem/mrn context,
    * orderIdx (0-based position of the OBR in its message),
    * fillerOrderNumber, testId, codingSystem, requested/observation
    * DTMs, resultStatus, and `results` = array of structs
    * (setId, valueType, observationId, subId, value, units, refRange,
    * abnormalFlag, status, obsTimeUs). Input columns ride along.
    */
  def parseLabOrders(df: DataFrame, rawCol: String): DataFrame = {
    val raw = col(rawCol)
    val segs = segments(raw)
    // (segment text, position) pairs; positions anchor OBX→OBR ownership
    val withPos = transform(segs,
      (s, i) => struct(s.as("seg"), i.as("pos")))
    val obrs = filter(withPos,
      x => substring(x.getField("seg"), 1, 3) === "OBR")
    val obxs = filter(withPos,
      x => substring(x.getField("seg"), 1, 3) === "OBX")

    val msh = segment(raw, "MSH")
    val pid = segment(raw, "PID")

    val exploded = df
      .withColumn("__obrs", obrs)
      .withColumn("__obxs", obxs)
      .select(col("*"),
        posexplode_outer(col("__obrs")).as(Seq("orderIdx", "__obr")))
      .filter(col("__obr").isNotNull)

    val obrSeg = col("__obr").getField("seg")
    val obrPos = col("__obr").getField("pos")
    // this order owns OBX rows strictly between its OBR and the next OBR
    val nextPos = coalesce(
      get(col("__obrs"), col("orderIdx") + 1).getField("pos"),
      size(segments(raw)))
    val mine = filter(col("__obxs"),
      o => o.getField("pos") > obrPos && o.getField("pos") < nextPos)
    // one split per OBX, not one per field — HOF lambdas get no CSE
    val results = transform(mine, o =>
      letC(split(o.getField("seg"), "\\|")) { xf =>
        struct(
          gf(xf, 1).cast("int").as("setId"),
          gf(xf, 2).as("valueType"),
          cmp(gf(xf, 3), 1).as("observationId"),
          gf(xf, 4).as("subId"),
          rep1(gf(xf, 5)).as("value"),
          cmp(gf(xf, 6), 1).as("units"),
          gf(xf, 7).as("refRange"),
          gf(xf, 8).as("abnormalFlag"),
          gf(xf, 11).as("status"),
          hl7TsUs(gf(xf, 14)).as("obsTimeUs"))
      })

    val parsedNames = Set("sourceMessageId", "sourceSystem", "mrn",
      "orderIdx", "fillerOrderNumber", "testId", "codingSystem",
      "requestedDateTimeUs", "observationDateTimeUs", "resultStatus",
      "results")
    exploded.select(
      Seq(
        mshFld(msh, 10).as("sourceMessageId"),
        mshFld(msh, 3).as("sourceSystem"),
        cmp(rep1(fld(pid, 3)), 1).as("mrn"),
        col("orderIdx"),
        cmp(fld(obrSeg, 3), 1).as("fillerOrderNumber"),
        cmp(fld(obrSeg, 4), 1).as("testId"),
        cmp(fld(obrSeg, 4), 3).as("codingSystem"),
        hl7TsUs(fld(obrSeg, 6)).as("requestedDateTimeUs"),
        hl7TsUs(fld(obrSeg, 7)).as("observationDateTimeUs"),
        fld(obrSeg, 25).as("resultStatus"),
        results.as("results")) ++
        df.columns.filterNot(parsedNames.contains).map(col): _*)
  }

  /** PPR^PC1/2/3 → patient-problem rows, one per PRB segment (a message
    * may carry a whole problem list). Field map follows the reference's
    * PatientProblemFactory (hl7-reader/.../conditons/
    * PatientProblemFactory.java:74-86): PRB-1 action, PRB-2 updated DTM,
    * PRB-3 code^name^codingSystem, PRB-4 problem instance id, PRB-7
    * added date, PRB-9 resolved date, PRB-13 confirmation status,
    * PRB-16 onset date. MSH/PID/PV1 context rides along; input columns
    * are carried through.
    */
  def parseProblems(df: DataFrame, rawCol: String): DataFrame = {
    val raw = col(rawCol)
    val msh = segment(raw, "MSH")
    val pid = segment(raw, "PID")
    val pv1 = segment(raw, "PV1")
    val prb = col("__prb").getField("seg")
    val withPos = transform(segments(raw),
      (s, i) => struct(s.as("seg"), i.as("pos")))
    def ofId(id: String) = filter(withPos,
      x => substring(x.getField("seg"), 1, 3) === id)

    val exploded = df
      .withColumn("__prbs", ofId("PRB"))
      .withColumn("__ntes", ofId("NTE"))
      .select(col("*"),
        posexplode_outer(col("__prbs")).as(Seq("__prbIdx", "__prb")))
      .filter(col("__prb").isNotNull)

    // a problem's comment = all NTE comment repetitions under its PRB,
    // space-joined (PatientProblemFactory.java:44-50 concatenates every
    // NTE-3 repetition; we trim the factory's leading-space artifact)
    val prbPos = col("__prb").getField("pos")
    val nextPrbPos = coalesce(
      get(col("__prbs"), col("__prbIdx") + 1).getField("pos"),
      size(segments(raw)))
    val myNtes = filter(col("__ntes"),
      n => n.getField("pos") > prbPos && n.getField("pos") < nextPrbPos)
    val commentParts = flatten(transform(myNtes,
      n => split(coalesce(fld(n.getField("seg"), 3), lit("")), "~")))
    val comment = when(size(myNtes) > 0,
      nullIfEmpty(trim(array_join(commentParts, " "))))

    exploded
      .withColumn("comment", comment)
      .withColumn("sourceMessageId", mshFld(msh, 10))
      .withColumn("sourceSystem", mshFld(msh, 3))
      .withColumn("mrn", cmp(rep1(fld(pid, 3)), 1))
      .withColumn("visitNumber", cmp(fld(pv1, 19), 1))
      .withColumn("action", fld(prb, 1))
      .withColumn("updatedTimeUs", hl7TsUs(fld(prb, 2)))
      .withColumn("conditionCode", cmp(fld(prb, 3), 1))
      .withColumn("conditionName", cmp(fld(prb, 3), 2))
      .withColumn("codingSystem", cmp(fld(prb, 3), 3))
      .withColumn("epicProblemId", cmp(fld(prb, 4), 1))
      .withColumn("addedTimeUs", hl7TsUs(fld(prb, 7)))
      .withColumn("resolvedTimeUs", hl7TsUs(fld(prb, 9)))
      .withColumn("status", cmp(fld(prb, 13), 1))
      .withColumn("onsetTimeUs", hl7TsUs(fld(prb, 16)))
      .drop("__prb", "__prbs", "__ntes", "__prbIdx")
  }

  /** ADT^A05 → patient-infection rows, one per repetition of the custom
    * ZIF-1 field (ref PatientInfectionFactory.java:47-83; the ZIF segment
    * is one repeating `name^addedDTM^resolvedDTM` composite,
    * hl7/custom/v26/segment/ZIF.java + field/Infection.java). Context:
    * MSH-3 source system, MSH-10 source id, PID-3 MRN, EVN-2 updated DTM.
    * Rows with no added datetime carry it null — [[infectionGate]]
    * applies the reference's progress filter.
    */
  def parseInfections(df: DataFrame, rawCol: String): DataFrame = {
    val raw = col(rawCol)
    val msh = segment(raw, "MSH")
    val pid = segment(raw, "PID")
    val evn = segment(raw, "EVN")
    val zif = segment(raw, "ZIF")
    val inf = col("__inf")
    df.select(col("*"),
        posexplode_outer(split(fld(zif, 1), "~"))
          .as(Seq("infectionIdx", "__inf")))
      .filter(col("__inf").isNotNull)
      .withColumn("sourceMessageId", mshFld(msh, 10))
      .withColumn("sourceSystem", mshFld(msh, 3))
      .withColumn("mrn", cmp(rep1(fld(pid, 3)), 1))
      .withColumn("updatedTimeUs", hl7TsUs(fld(evn, 2)))
      .withColumn("conditionCode", cmp(inf, 1))
      .withColumn("addedTimeUs", hl7TsUs(cmp(inf, 2)))
      .withColumn("resolvedTimeUs", hl7TsUs(cmp(inf, 3)))
      .drop("__inf")
  }

  /** The reference's infection progress filter
    * (conditons/PatientStatusService.java:22-30 + the factory's serial
    * replay): processing messages in source order, an infection is kept
    * iff its added datetime is present and not before the progress
    * high-water mark, and every kept infection advances the mark.
    * Because a row is only rejected when its added time is BELOW the
    * current mark, the mark always equals the running maximum of the
    * added times seen so far — keep iff `added >= max(added) over
    * preceding rows` (in `orderCols` order), seeded with the
    * service-start instant.
    *
    * Scale shape — a global prefix max WITHOUT a single-partition
    * window: range-partition on the order key, compute the running max
    * within each partition, then carry each partition's total max into
    * its successors as a driver-computed prefix (≤ numPartitions
    * scalars, folded into a literal map). Every stage is distributed;
    * the only driver traffic is one row per partition.
    */
  def infectionGate(df: DataFrame, serviceStartUs: Long,
                    orderCols: Seq[String]): DataFrame = {
    // count-gate FIRST: a mixed batch whose A05s carry zero ZIF
    // infections must not pay the eager checkpoint below (isEmpty is a
    // limit-1 probe; the caller's batch cache makes it cheap)
    if (df.isEmpty) return df.filter(lit(false))
    // eager localCheckpoint: the carry probe and the final filter must
    // see the SAME partition assignment (range boundaries are sampled,
    // so a recompute could renumber partitions under the carry map)
    val parted = df.repartitionByRange(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // per-partition total max → prefix-max carry-in per partition id
    val partMax = parted.groupBy(col("__pid"))
      .agg(max(col("addedTimeUs")).as("__max"))
      .collect()
      .map(r => r.getInt(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .sortBy(_._1)
    if (partMax.isEmpty) return df.filter(lit(false))
    val carries = partMax.scanLeft(-1 -> serviceStartUs) {
      case ((_, acc), (pid, m)) => pid -> math.max(acc, m.getOrElse(Long.MinValue))
    }
    // carry for partition p = running max over partitions < p (seeded)
    val carryIn = carries.sliding(2).collect {
      case Array((_, prev), (pid, _)) => Seq(lit(pid), lit(prev))
    }.flatten.toSeq
    val wIn = Window.partitionBy(col("__pid"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .withColumn("__carry",
        coalesce(element_at(map(carryIn: _*), col("__pid")),
          lit(serviceStartUs)))
      .withColumn("__progress",
        greatest(coalesce(max(col("addedTimeUs")).over(wIn),
          col("__carry")), col("__carry")))
      .filter(col("addedTimeUs").isNotNull &&
        col("addedTimeUs") >= col("__progress"))
      .drop("__pid", "__carry", "__progress")
  }

  /** ADT^A60 → patient-allergy rows, one per IAM segment (ref
    * PatientAllergyFactory.java:41-117): IAM-2.1 allergen type (subType),
    * IAM-3.2 allergen code/name (the reference reads the CWE *text*
    * component), IAM-4.1 severity, IAM-5 reactions (repeating), IAM-6.1
    * action (A=ADD, D=DELETE, U/X=UPDATE, anything else is an error —
    * surfaced in the `error` column for the dead-letter split, never a
    * throw), IAM-7.1 epic condition id, IAM-11 onset date, IAM-13
    * reported DTM (addedTimeUs), IAM-17.1 clinical status. Context:
    * MSH-3/MSH-10/PID-3/EVN-2 like infections.
    */
  def parseAllergies(df: DataFrame, rawCol: String): DataFrame = {
    val raw = col(rawCol)
    val msh = segment(raw, "MSH")
    val pid = segment(raw, "PID")
    val pv1 = segment(raw, "PV1")
    val evn = segment(raw, "EVN")
    val iam = col("__iam")
    val actionRaw = cmp(fld(iam, 6), 1)
    df.select(col("*"),
        posexplode_outer(segmentsOf(raw, "IAM"))
          .as(Seq("allergyIdx", "__iam")))
      .filter(col("__iam").isNotNull)
      .withColumn("sourceMessageId", mshFld(msh, 10))
      .withColumn("sourceSystem", mshFld(msh, 3))
      .withColumn("mrn", cmp(rep1(fld(pid, 3)), 1))
      .withColumn("visitNumber", cmp(fld(pv1, 19), 1))
      .withColumn("updatedTimeUs", hl7TsUs(fld(evn, 2)))
      .withColumn("subType", cmp(fld(iam, 2), 1))
      .withColumn("conditionCode", cmp(fld(iam, 3), 2))
      .withColumn("severity", cmp(fld(iam, 4), 1))
      .withColumn("reactions",
        filter(transform(split(fld(iam, 5), "~"), r => cmp(r, 1)),
          r => r.isNotNull))
      .withColumn("action",
        when(actionRaw === "A", "AD")
          .when(actionRaw === "D", "DE")
          .when(actionRaw.isin("U", "X"), "UP"))
      .withColumn("epicConditionId", cmp(fld(iam, 7), 1).cast("long"))
      .withColumn("onsetDate",
        date_format(timestamp_micros(hl7TsUs(fld(iam, 11))), "yyyy-MM-dd"))
      .withColumn("addedTimeUs", hl7TsUs(fld(iam, 13)))
      .withColumn("status", cmp(fld(iam, 17), 1))
      .withColumn("error",
        when(col("action").isNull,
          concat(lit("invalid_allergy_action:"),
            coalesce(actionRaw, lit("")))))
      .drop("__iam")
  }

  /** ORM^O01 consult orders → consult-request rows, one per message
    * (the reference rejects multi-order consults,
    * ConsultFactory.java:37-49): ORC-2 epic consult id, ORC-9 status
    * change DTM, OBR-36 scheduled DTM, OBR-44 consultation type; an
    * ORC-1 of OC is a cancellation — attributed to automated discharge
    * (closedDueToDischarge) when MSH-8's security code is DISCHAUTO
    * (ConsultFactory.java:67-82). NTE notes split on `->` into
    * question→answer entries; NTEs without the separator are comments.
    */
  def parseConsults(df: DataFrame, rawCol: String): DataFrame = {
    val raw = col(rawCol)
    val msh = segment(raw, "MSH")
    val pid = segment(raw, "PID")
    val pv1 = segment(raw, "PV1")
    val orc = segment(raw, "ORC")
    val obr = segment(raw, "OBR")
    val ntes = transform(segmentsOf(raw, "NTE"), s => fld(s, 3))
    val qa = filter(ntes, n => n.contains("->"))
    val security = mshFld(msh, 8)
    val cancelledOrc = fld(orc, 1) === "OC"
    df
      .withColumn("sourceMessageId", mshFld(msh, 10))
      .withColumn("sourceSystem", mshFld(msh, 3))
      .withColumn("mrn", cmp(rep1(fld(pid, 3)), 1))
      .withColumn("visitNumber", cmp(fld(pv1, 19), 1))
      .withColumn("epicConsultId", cmp(fld(orc, 2), 1).cast("long"))
      .withColumn("statusChangeTimeUs", hl7TsUs(fld(orc, 9)))
      .withColumn("scheduledTimeUs", hl7TsUs(fld(obr, 36)))
      .withColumn("consultationType", cmp(fld(obr, 44), 1))
      .withColumn("cancelled",
        coalesce(cancelledOrc && security =!= "DISCHAUTO", lit(false)))
      .withColumn("closedDueToDischarge",
        coalesce(cancelledOrc && security === "DISCHAUTO", lit(false)))
      .withColumn("questions", map_from_entries(transform(qa, n => struct(
        get(split(n, "->", 2), lit(0)).as("question"),
        get(split(n, "->", 2), lit(1)).as("answer")))))
      .withColumn("comments",
        filter(ntes, n => !coalesce(n.contains("->"), lit(false))))
  }

  /** ORU^R30/R01 vital-signs → flowsheet rows, one per OBX (ref
    * FlowsheetFactory.java:83-210): interface id OBX-3.1, value-type
    * dispatch on OBX-2 (NM → NUMERIC double, DT → DATE, else TEXT),
    * units OBX-6.1, observation time OBX-14, updated time MSH-7. An OBX
    * with an EMPTY value is an explicit tombstone — the reference maps
    * it to InterchangeValue.delete() (FlowsheetFactory.java:186,198,207)
    * — surfaced here as status=DELETE with null value columns. NTE
    * comment segments attach to the OBX directly above them (positional,
    * like the lab builder); multiple NTE lines join with newlines.
    * Sub-message id = MSH-10 + "$" + zero-padded OBX set id (X10).
    */
  def parseFlowsheets(df: DataFrame, rawCol: String): DataFrame = {
    val raw = col(rawCol)
    val withPos = transform(segments(raw),
      (s, i) => struct(s.as("seg"), i.as("pos")))
    def ofId(id: String) = filter(withPos,
      x => substring(x.getField("seg"), 1, 3) === id)

    val msh = segment(raw, "MSH")
    val pid = segment(raw, "PID")
    val pv1 = segment(raw, "PV1")

    val exploded = df
      .withColumn("__obxs", ofId("OBX"))
      .withColumn("__ntes", ofId("NTE"))
      .select(col("*"),
        posexplode_outer(col("__obxs")).as(Seq("obxIdx", "__obx")))
      .filter(col("__obx").isNotNull)

    val x = col("__obx").getField("seg")
    val obxPos = col("__obx").getField("pos")
    val nextObxPos = coalesce(
      get(col("__obxs"), col("obxIdx") + 1).getField("pos"),
      size(segments(raw)))
    val comments = transform(
      filter(col("__ntes"),
        n => n.getField("pos") > obxPos && n.getField("pos") < nextObxPos),
      n => fld(n.getField("seg"), 3))
    val rawType = fld(x, 2)
    val value = rep1(fld(x, 5))
    val setId = fld(x, 1).cast("int")

    exploded.select(
      Seq(
        concat(mshFld(msh, 10), lit("$"),
          lpad(setId.cast("string"), 2, "0")).as("sourceMessageId"),
        mshFld(msh, 3).as("sourceSystem"),
        cmp(rep1(fld(pid, 3)), 1).as("mrn"),
        cmp(fld(pv1, 19), 1).as("visitNumber"),
        cmp(fld(x, 3), 1).as("interfaceId"),
        when(rawType === "NM", "NUMERIC").when(rawType === "DT", "DATE")
          .otherwise("TEXT").as("valueType"),
        when(rawType === "NM", value.cast("double")).as("numericValue"),
        when(rawType =!= "NM" && rawType =!= "DT", trim(value))
          .as("stringValue"),
        when(rawType === "DT",
          date_format(timestamp_micros(hl7TsUs(value)), "yyyy-MM-dd"))
          .as("dateValue"),
        when(value.isNull, "DELETE").otherwise("SAVE").as("status"),
        cmp(fld(x, 6), 1).as("unit"),
        hl7TsUs(fld(x, 14)).as("observationTimeUs"),
        hl7TsUs(mshFld(msh, 7)).as("updatedTimeUs"),
        when(size(comments) > 0, array_join(comments, "\n")).as("comment")) ++
        df.columns.filterNot(Set("sourceMessageId", "sourceSystem", "mrn",
          "visitNumber", "interfaceId", "valueType", "numericValue",
          "stringValue", "dateValue", "status", "unit", "observationTimeUs",
          "updatedTimeUs", "comment").contains).map(col): _*)
  }

  /** ORM^O01 advance-decision orders — the reference's factory is a
    * near-twin of the consult one (AdvanceDecisionFactory.java:55-80):
    * same ORC/OBR/NTE layout, plus the decision type's display name at
    * OBR-4.5. Columns renamed to the advance-decision vocabulary.
    */
  def parseAdvanceDecisions(df: DataFrame, rawCol: String): DataFrame = {
    val obr = segment(col(rawCol), "OBR")
    parseConsults(df, rawCol)
      .withColumnRenamed("epicConsultId", "advanceDecisionNumber")
      .withColumnRenamed("consultationType", "careCode")
      .withColumnRenamed("scheduledTimeUs", "requestedTimeUs")
      .withColumn("typeName", cmp(fld(obr, 4), 5))
  }

  /** Funnel: [[parseConsults]] question→answer entries → one row per
    * question for the question / request_answer registries (O18: the
    * reference dedups questions by text and keys answers by
    * (question, parent request), QuestionController).
    */
  def wireToQuestionMessages(consults: DataFrame,
                             parentTable: String = "CONSULT_REQUEST",
                             parentIdCol: String = "epicConsultId"): DataFrame =
    consults.select(
        lit(parentTable).as("parentTable"),
        col(parentIdCol).cast("string").as("parentId"),
        col("statusChangeTimeUs").as("updatedTimeUs"),
        col("sourceMessageId").as("msgId"),
        explode(map_entries(col("questions"))).as("qa"))
      .select(col("parentTable"), col("parentId"), col("updatedTimeUs"),
        col("msgId"),
        col("qa.key").as("questionText"), col("qa.value").as("answer"))

  /** Funnel: [[parseFlowsheets]] output → the visit_observation registry
    * shape (key (visitId, observationTypeId, observationTimeUs); O14).
    * DELETE tombstones carry null value columns — the kernel's payload
    * fold nulls the stored values, the F6 diff check makes re-sent
    * tombstones no-ops.
    */
  def wireToFlowsheetMessages(flowsheets: DataFrame): DataFrame =
    flowsheets.select(
      col("visitNumber").as("visitId"),
      col("interfaceId").as("observationTypeId"),
      col("observationTimeUs"),
      col("updatedTimeUs"),
      col("sourceMessageId").as("msgId"),
      col("valueType"),
      col("numericValue"),
      col("stringValue"),
      col("dateValue"),
      col("unit"),
      col("comment"))

  /** Funnel: [[parseProblems]] output → the patient_condition registry
    * shape ([[graft.operators.EntityUpserts]] `patient_condition`:
    * key (mrn, conditionTypeId, internalId), event time updatedTimeUs).
    * The condition type's natural identity is its code+coding-system
    * pair (ref PatientConditionController.java:185-195); AD/UP both
    * upsert, DE rows are returned for the caller to feed the kernel's
    * delete-if-newer path (ConditionAction semantics).
    */
  def wireToConditionMessages(problems: DataFrame): DataFrame =
    problems.select(
      col("mrn"),
      concat_ws(":", col("codingSystem"), col("conditionCode"))
        .as("conditionTypeId"),
      col("epicProblemId").as("internalId"),
      col("updatedTimeUs"),
      col("sourceMessageId").as("msgId"),
      col("status"),
      lit(null).cast("string").as("severity"),
      date_format(timestamp_micros(col("onsetTimeUs")), "yyyy-MM-dd")
        .as("onsetDate"),
      col("comment"),
      col("action"),
      col("visitNumber"))

  /** Funnel: [[parseAllergies]] output → the patient_condition registry
    * shape (same contract as [[wireToConditionMessages]]; ref
    * PatientConditionFactory allergy path). Reactions ride along for the
    * caller's reaction table; rows with a non-null `error` should be
    * dead-lettered before this funnel.
    */
  def wireToAllergyMessages(allergies: DataFrame): DataFrame =
    allergies.filter(col("error").isNull).select(
      col("mrn"),
      concat(lit("ALLERGY:"), coalesce(col("conditionCode"), lit("")))
        .as("conditionTypeId"),
      col("epicConditionId").cast("string").as("internalId"),
      col("updatedTimeUs"),
      col("sourceMessageId").as("msgId"),
      col("status"),
      col("severity"),
      col("onsetDate"),
      lit(null).cast("string").as("comment"),
      col("action"),
      col("visitNumber"),
      col("reactions"))

  /** Funnel: [[parseInfections]] (post-[[infectionGate]]) → the
    * patient_condition registry shape. Infections carry no external id
    * or action — every surviving row is an upsert (ref
    * PatientConditionController infection path).
    */
  def wireToInfectionMessages(infections: DataFrame): DataFrame =
    infections.select(
      col("mrn"),
      concat(lit("INFECTION:"), coalesce(col("conditionCode"), lit("")))
        .as("conditionTypeId"),
      lit(null).cast("string").as("internalId"),
      col("updatedTimeUs"),
      col("sourceMessageId").as("msgId"),
      lit(null).cast("string").as("status"),
      lit(null).cast("string").as("severity"),
      date_format(timestamp_micros(col("addedTimeUs")), "yyyy-MM-dd")
        .as("onsetDate"),
      lit(null).cast("string").as("comment"),
      lit("AD").as("action"))

  /** Demux of a parsed ADT channel into the rare cross-key operations'
    * input shapes (SURVEY §2.4 O4/O5/O9/O10/O13 + O11): the reference
    * processes these serially under MrnLock; here each family is a
    * filtered projection feeding its batch operator —
    * [[graft.operators.PendingMovements.derive]],
    * [[graft.operators.LocationVisits]] swap,
    * [[graft.operators.IdentityMerge.applyMerges]]/changeIdentifiers,
    * [[graft.operators.EntityUpserts.moveVisits]],
    * [[graft.operators.CascadingDelete.person]].
    */
  final case class AdtOps(pendings: DataFrame, pendingCancels: DataFrame,
                          swaps: DataFrame, merges: DataFrame,
                          identifierChanges: DataFrame, visitMoves: DataFrame,
                          personDeletes: DataFrame)

  def adtOps(adt: DataFrame): AdtOps = {
    def opIs(name: String) = adt.filter(col("msgType") === name)
    AdtOps(
      // surrogate ids via xxhash64(sourceMessageId) — the repo-wide
      // deterministic-key policy (no sequence bottleneck)
      pendings = opIs("PendingTransfer").select(
        xxhash64(col("sourceMessageId")).as("pendingId"),
        col("visitNumber").as("visitId"),
        col("pendingDestination").as("location"),
        col("validFromUs").as("tsUs")),
      pendingCancels = opIs("CancelPendingTransfer").select(
        xxhash64(col("sourceMessageId")).as("cancelId"),
        col("visitNumber").as("visitId"),
        col("pendingDestination").as("location"),
        col("validFromUs").as("tsUs")),
      swaps = opIs("SwapLocations").select(
        col("visitNumber").as("visitA"),
        col("otherVisitNumber").as("visitB")),
      merges = opIs("MergePatient").select(
        col("previousMrn").as("absorbed"),
        col("mrn").as("survivor")),
      identifierChanges = opIs("ChangeIdentifiers").select(
        col("previousMrn").as("oldMrn"),
        col("mrn").as("newMrn")),
      visitMoves = opIs("MoveVisit").select(
        col("previousVisitNumber").as("visitId"),
        col("mrn").as("newMrn"),
        col("visitNumber").as("newEncounter"),
        col("validFromUs").as("moveTimeUs")),
      personDeletes = opIs("DeletePersonInformation").select(
        col("mrn"),
        col("validFromUs").as("delTimeUs")))
  }

  /** The funnel: [[parseLabOrders]] output → the interchange lab-message
    * shape [[graft.operators.Labs.deriveStar]] consumes (the reference's
    * LabFunnel step between the HL7 builders and the core controllers).
    * NM values dispatch to the NUMERIC mime type with a parsed double;
    * everything else stays TEXT — the reference's value-type dispatch
    * (core/.../LabResultController.java:122-137).
    */
  def wireToLabMessages(nested: DataFrame): DataFrame =
    nested.select(
      col("fillerOrderNumber").as("epicOrderNumber"),
      col("fillerOrderNumber").as("labSpecimenNumber"),
      col("testId").as("battery"),
      col("mrn"),
      lit(null).cast("string").as("visitNumber"),
      col("observationDateTimeUs").as("collectionTimeUs"),
      coalesce(col("observationDateTimeUs"), col("requestedDateTimeUs"))
        .as("statusChangeTimeUs"),
      col("sourceMessageId"),
      transform(col("results"), r => struct(
        r.getField("observationId").as("testCode"),
        when(r.getField("valueType") === "NM", "NUMERIC").otherwise("TEXT")
          .as("mimeType"),
        when(r.getField("valueType") === "NM",
          r.getField("value").cast("double")).as("numericValue"),
        when(r.getField("valueType") =!= "NM", r.getField("value"))
          .as("stringValue"),
        r.getField("units").as("units"),
        coalesce(r.getField("obsTimeUs"),
          col("observationDateTimeUs")).as("resultTimeUs"),
        lit(null).cast("string").as("isolateCode"),
        lit(null).cast(
          "array<struct<agent:string,value:string,resultTimeUs:bigint>>")
          .as("sensitivities"))).as("results"))
}
