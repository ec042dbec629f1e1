package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{StarPipeline, WirePipeline}

/** End-to-end front door: one mixed raw HL7 batch → router → family
  * funnels → per-family bucketed star folds, including the three-way
  * conditions union (problems + allergies + gated infections) and the
  * implied-ADT side channel from order/result messages.
  */
class WirePipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private def pv1(visit: String) =
    (Seq("PV1", "1", "I", "W^R^B") ++ Seq.fill(15)("") :+ visit).mkString("|")

  private val WirePayload = Seq("msgType", "patientClass",
    "fullLocationString", "visitNumber", "previousMrn",
    "previousVisitNumber", "otherVisitNumber", "pendingDestination",
    "targetTimeUs", "dischargeTimeUs")

  test("one mixed batch fans into adt/labs/conditions folds; progress persists") {
    val root = Files.createTempDirectory("wire_pipe").toString

    val batch1 = Seq(
      // plain ADT admit
      "MSH|^~\\&|EPIC|UCLH|||20240101080000||ADT^A01|W1|P|2.4\r" +
        "PID|1||M1^^^MRN^MRN\r" + pv1("V1"),
      // WinPath lab result → labs fold + implied ADT for M2
      "MSH|^~\\&|WP|UCLH|||20240101090000||ORU^R01|W2|P|2.4\r" +
        "PID|1||M2^^^MRN^MRN\r" + pv1("V2") + "\r" +
        "OBR|1||ORD1^LAB|FBC^FBC^WinPath|||20240101090000\r" +
        "OBX|1|NM|HGB||13.5|g/dL|||||F",
      // problem list for M3
      "MSH|^~\\&|EPIC|Problem List|||20240101100000|X|PPR^PC1|W3|P|2.4\r" +
        "PID|1||M3^^^MRN^MRN\r" +
        "PRB|AD|20240101100000|C1^Asthma^I10UK|700|||20240101100000",
      // allergies for M4: one good, one invalid action
      "MSH|^~\\&|EPIC|UCLH|||20240101110000||ADT^A60|W4|P|2.4\r" +
        "EVN|A60|20240101110000\r" +
        "PID|1||M4^^^MRN^MRN\r" +
        "IAM|1|DA^Drug|1^PENICILLIN^ALG|SV^Severe|RASH|A|771^EPIC" +
        "||||20230115||20240101110000||||Active\r" +
        "IAM|2|DA^Drug|2^ASPIRIN^ALG||R|Q|772^EPIC",
      // infections for M5: Jan 2 advances progress, Jan 1 rejected
      "MSH|^~\\&|EPIC|UCLH|||20240103120000||ADT^A05|W5|P|2.4\r" +
        "EVN|A05|20240103120000\r" +
        "PID|1||M5^^^MRN^MRN\r" +
        "ZIF|Covid^20240102000000~Flu^20240101000000",
      // WinPath ORR ack: status update, no results → lab_status fold
      "MSH|^~\\&|WP|UCLH|||20240101120000||ORR^O02|W6A|P|2.4\r" +
        "PID|1||M2^^^MRN^MRN\r" +
        "ORC|NA|94000010|123456789||||||20240101113000\r" +
        "OBR|1|94000010|123456789|FBC^F^WinPath|||20240101090000")
      .toDF("raw")

    WirePipeline.foldBatch(batch1, 1L, "raw", root)

    def live(family: String, key: Seq[String], vf: String,
             payload: Seq[String]) =
      StarPipeline.readState(spark,
        StarPipeline.Config(s"$root/$family", key, vf, "sourceMessageId",
          payload, nBuckets = 8), "live").get

    // adt fold: the admit AND the implied-ADT person context from the lab
    val adt = live("adt", Seq("mrn"), "validFromUs", WirePayload)
    // M2 implied from the lab message; M5 implied from its A05 (the
    // reference builds an ADT message for A05 alongside the infections)
    assert(adt.select("mrn", "msgType").as[(String, String)].collect()
      .toSet == Set(("M1", "Admit"), ("M2", "ImpliedAdt"),
        ("M5", "ImpliedAdt")))

    // labs fold: one order
    val labs = live("labs", Seq("battery", "labSpecimenNumber"),
      "statusChangeTimeUs", Seq("epicOrderNumber", "mrn", "results"))
    assert(labs.select("mrn").as[String].collect().toSeq == Seq("M2"))

    // lab-status fold: the ack binds numbers + status time, no results
    val labStatus = live("lab_status", Seq("battery", "labSpecimenNumber"),
      "statusChangeTimeUs",
      Seq("orderControlId", "orderStatus", "epicOrderNumber",
        "orderTimeUs", "sampleReceivedTimeUs", "resultStatus"))
    assert(labStatus
      .select("labSpecimenNumber", "orderControlId")
      .as[(String, String)].collect().toSeq == Seq(("123456789", "NA")))

    // conditions fold: problem + allergy + ONE gated infection
    val condKey = Seq("mrn", "conditionTypeId", "internalId")
    val condPay = Seq("status", "severity", "onsetDate", "comment", "action")
    val cond1 = live("conditions", condKey, "updatedTimeUs", condPay)
    assert(cond1.select("conditionTypeId").as[String].collect().toSet ==
      Set("I10UK:C1", "ALLERGY:PENICILLIN", "INFECTION:Covid"))

    // the invalid allergy action is a nack row, not a dropped message
    val dead = spark.read.parquet(s"$root/dead/allergies/batch=1")
    assert(dead.select("reason").as[String].collect().toSeq ==
      Seq("invalid_action"))

    // progress advanced to the accepted infection's added time (Jan 2)
    val prog = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/conditions/_INF_PROGRESS"))).toLong
    assert(prog == 1704153600000000L)

    // batch 2: a pre-progress infection is rejected ACROSS batches; a
    // newer one lands
    val batch2 = Seq(
      "MSH|^~\\&|EPIC|UCLH|||20240104120000||ADT^A05|W6|P|2.4\r" +
        "EVN|A05|20240104120000\r" +
        "PID|1||M6^^^MRN^MRN\r" +
        "ZIF|RSV^20240101060000~Strep^20240103000000",
      // DE action for M3's problem → tombstone version, not a lost row
      "MSH|^~\\&|EPIC|Problem List|||20240102100000|X|PPR^PC1|W7|P|2.4\r" +
        "PID|1||M3^^^MRN^MRN\r" +
        "PRB|DE|20240102100000|C1^Asthma^I10UK|700|||20240101100000")
      .toDF("raw")
    WirePipeline.foldBatch(batch2, 2L, "raw", root)

    val cond2 = live("conditions", condKey, "updatedTimeUs", condPay)
    val types = cond2.select("conditionTypeId").as[String].collect().toSet
    assert(types.contains("INFECTION:Strep") && !types.contains("INFECTION:RSV"))
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/conditions/_INF_PROGRESS"))).toLong ==
      1704240000000000L)

    // the tombstone wins in raw live state but is filtered from the
    // current-conditions view
    assert(cond2.filter(col("conditionTypeId") === "I10UK:C1")
      .select("action").as[String].collect().toSeq == Seq("DE"))
    val current = WirePipeline.liveConditions(spark, root).get
    assert(!current.select("conditionTypeId").as[String].collect()
      .toSet.contains("I10UK:C1"))
  }

  test("condition-visit links: insert-once distinct set, arrival-order " +
    "invariant, survives the condition tombstone; infections never link") {
    def msg(id: String, mrn: String, act: String, dtm: String,
            visit: Option[String]) = {
      val segs = Seq(
        s"MSH|^~\\&|EPIC|Problem List|||$dtm|X|PPR^PC1|$id|P|2.4",
        s"PID|1||$mrn^^^MRN^MRN") ++
        visit.map(pv1) :+
        s"PRB|$act|$dtm|C9^Asthma^I10UK|900"
      segs.mkString("\r")
    }
    val frames = Seq(
      msg("P1", "M1", "AD", "20240101100000", Some("V1")),
      msg("P2", "M1", "UP", "20240102100000", Some("V2")),
      // re-sighting of V1 → no second link row
      msg("P3", "M1", "UP", "20240103100000", Some("V1")),
      // no PV1 → no link (the reference's visit-null guard)
      msg("P4", "M1", "UP", "20240104100000", None),
      // the DE message still links its visit, then tombstones
      msg("P5", "M1", "DE", "20240105100000", Some("V3")),
      // infection for the same patient: folds, but never links
      "MSH|^~\\&|EPIC|UCLH|||20240103120000||ADT^A05|P6|P|2.4\r" +
        "EVN|A05|20240103120000\r" + "PID|1||M1^^^MRN^MRN\r" +
        pv1("V9") + "\r" + "ZIF|Covid^20240102000000")

    def foldInto(order: Seq[Seq[String]]): String = {
      val root = Files.createTempDirectory("cond_visits").toString
      order.zipWithIndex.foreach { case (b, i) =>
        WirePipeline.foldBatch(b.toDF("raw"), i + 1L, "raw", root)
      }
      root
    }
    val rootA = foldInto(Seq(frames.take(3), frames.drop(3)))
    val rootB = foldInto(Seq(frames.reverse.take(2), frames.reverse.drop(2)))

    def linkSet(root: String) = WirePipeline.conditionVisits(spark, root)
      .get.select("mrn", "conditionTypeId", "internalId", "visitNumber")
      .as[(String, String, String, String)].collect().toSet

    val expected = Set(
      ("M1", "I10UK:C9", "900", "V1"),
      ("M1", "I10UK:C9", "900", "V2"),
      ("M1", "I10UK:C9", "900", "V3"))
    assert(linkSet(rootA) == expected)
    // permutation convergence: reversed arrival, different batch split
    assert(linkSet(rootB) == expected)

    // exactly ONE live version per link (re-sighting coalesced, F6)
    assert(WirePipeline.conditionVisits(spark, rootA).get.count() == 3)
    // the condition itself is tombstoned, links remain queryable
    assert(WirePipeline.liveConditions(spark, rootA).get.count() == 1)
  }

  test("adt ops route into derived state: chained A40 + A17 in ONE batch, " +
      "A15 pending, A29 cascade, CoPath/imaging/questions folds") {
    val root = Files.createTempDirectory("wire_derived").toString
    def msh(trig: String, id: String, dtm: String) =
      s"MSH|^~\\&|EPIC|UCLH|||$dtm||ADT^$trig|$id|P|2.4"
    def evn(trig: String, dtm: String, occurred: String = "") =
      Seq("EVN", trig, dtm, "", "", "", occurred).mkString("|")
    def pv1At(loc: String, visit: String) =
      (Seq("PV1", "1", "I", loc) ++ Seq.fill(15)("") :+ visit).mkString("|")

    val batch1 = Seq(
      // two admits → open intervals in W1 / W2
      Seq(msh("A01", "D1", "20240201080000"), evn("A01", "20240201080000"),
        "PID|1||P1^^^MRN^MRN", pv1At("W1", "V1")).mkString("\r"),
      Seq(msh("A01", "D2", "20240201080500"), evn("A01", "20240201080500"),
        "PID|1||P2^^^MRN^MRN", pv1At("W2", "V2")).mkString("\r"),
      // third patient, to be deleted by A29 later in the SAME batch
      Seq(msh("A01", "D3", "20240201081000"), evn("A01", "20240201081000"),
        "PID|1||P3^^^MRN^MRN", pv1At("W3", "V3")).mkString("\r"),
      // A17: swap V1 and V2's open locations (second PID/PV1 group)
      Seq(msh("A17", "D4", "20240201090000"), evn("A17", "20240201090000"),
        "PID|1||P1^^^MRN^MRN", pv1At("W1", "V1"),
        "PID|2||P2^^^MRN^MRN", pv1At("W2", "V2")).mkString("\r"),
      // chained A40s in one batch: P4→P5 and P5→P6 must close to P6
      Seq(msh("A40", "D5", "20240201100000"), evn("A40", "20240201100000"),
        "PID|1||P5^^^MRN^MRN", "MRG|P4^^^MRN^MRN").mkString("\r"),
      Seq(msh("A40", "D6", "20240201100500"), evn("A40", "20240201100500"),
        "PID|1||P6^^^MRN^MRN", "MRG|P5^^^MRN^MRN").mkString("\r"),
      // A15 pending transfer for V1, destination in PV1-42
      Seq(msh("A15", "D7", "20240201110000"), evn("A15", "20240201110000"),
        "PID|1||P1^^^MRN^MRN",
        (Seq("PV1", "1", "I", "W2") ++ Seq.fill(15)("") ++ Seq("V1") ++
          Seq.fill(22)("") :+ "DEST1").mkString("|")).mkString("\r"),
      // A29 delete person P3 (after their admit)
      Seq(msh("A29", "D8", "20240201120000"), evn("A29", "20240201120000"),
        "PID|1||P3^^^MRN^MRN", pv1At("W3", "V3")).mkString("\r"),
      // CoPath report with a TEXT section → labs star
      ("MSH|^~\\&|Co-Path|UCLH|||20240201130000||ORU^R01|D9|P|2.4\r" +
        "PID|1||P1^^^MRN^MRN\r" +
        "ORC|RE|CP100|SPEC100^CoPathPlus||CM\r" +
        "OBR|1|CP100|SPEC100^CoPathPlus|UH^Histology^CPEAP|||20240201120000\r" +
        "OBX|1|TX|TX^Report^CoPath||Malignant cells seen||||||F"),
      // PACS imaging report → labs star (GDT narrative)
      ("MSH|^~\\&|IMG_RESULT|UCLH|||20240201140000||ORU^R01|D10|P|2.4\r" +
        "PID|1||P2^^^MRN^MRN\r" +
        "ORC|RE|IMG200|ACC200||CM\r" +
        "OBR|1|IMG200|ACC200|XR^Chest XRay^PACS|||20240201130000\r" +
        "OBX|1|TX|GDT^^PACS||No acute findings||||||F"),
      // consult with a question → questions star
      ("MSH|^~\\&|EPIC|Consult Orders|||20240201150000|OP|ORM^O01|D11|P|2.4\r" +
        "PID|1||P1^^^MRN^MRN\r" +
        "ORC|NW|9001^EPC|||||||20240201150000\r" +
        "NTE|1||Reason?->sepsis")).toDF("raw")

    WirePipeline.foldBatch(batch1, 1L, "raw", root)
    val d = WirePipeline.derived(spark, root).get

    // A17 applied: V1's open interval sits in W2, V2's in W1
    val open = d.intervals.filter(col("dischargeUs").isNull)
      .select("visitId", "location").as[(String, String)].collect().toMap
    assert(open("V1") == "W2" && open("V2") == "W1")
    // A29 cascade: V3's intervals are gone, P3 not in demographics
    assert(!open.contains("V3"))
    assert(!d.demographics.select("mrn").as[String].collect().toSet
      .contains("P3"))

    // chained A40 transitively closed INSIDE one batch
    val m = d.mrnToLive.select("mrn", "live_mrn").as[(String, String)]
      .collect().toMap
    assert(m("P4") == "P6" && m("P5") == "P6" && m("P1") == "P1")

    // A15 pending open for V1 → DEST1
    val p = d.pendings.select("visitId", "location", "cancelledTsUs")
      .as[(String, String, Option[Long])].collect()
    assert(p.toSeq == Seq(("V1", "DEST1", None)))

    // CoPath + imaging landed in the SAME labs star
    val labs = StarPipeline.readState(spark,
      StarPipeline.Config(s"$root/labs",
        Seq("battery", "labSpecimenNumber"), "statusChangeTimeUs",
        "sourceMessageId", Seq("epicOrderNumber", "mrn", "results"),
        nBuckets = 8), "live").get
    val labRows = labs.select(col("battery"),
        explode(col("results")).as("r"))
      .select(col("battery"), col("r.mimeType"), col("r.stringValue"))
      .as[(String, String, String)].collect().toSet
    assert(labRows.contains(("UH", "TEXT", "Malignant cells seen")))
    assert(labRows.contains(("XR", "TEXT", "No acute findings")))

    // the consult question landed in the questions star
    val q = StarPipeline.readState(spark,
      StarPipeline.Config(s"$root/questions",
        Seq("parentTable", "parentId", "questionText"), "updatedTimeUs",
        "sourceMessageId", Seq("answer"), nBuckets = 8), "live").get
    assert(q.select("parentTable", "parentId", "questionText", "answer")
      .as[(String, String, String, String)].collect().toSeq ==
      Seq(("CONSULT_REQUEST", "9001", "Reason?", "sepsis")))
  }

  test("dead-letter replay: repaired frames fold to the same state as an " +
      "originally-correct stream; unrepaired frames return to the dead letter") {
    val root = Files.createTempDirectory("wire_replay").toString
    val good =
      "MSH|^~\\&|EPIC|UCLH|||20240301080000||ADT^A01|R1|P|2.4\r" +
        "PID|1||M1^^^MRN^MRN\r" + pv1("V1")
    val broken = // missing MRN → family nack
      "MSH|^~\\&|EPIC|UCLH|||20240301090000||ADT^A01|R2|P|2.4\r" +
        "PID|1||^^^MRN^MRN\r" + pv1("V2")
    val fixed = broken.replace("PID|1||^^^", "PID|1||M9^^^")
    WirePipeline.foldBatch(Seq(good, broken).toDF("raw"), 1L, "raw", root)

    def liveMrns = StarPipeline.readState(spark,
      StarPipeline.Config(s"$root/adt", Seq("mrn"), "validFromUs",
        "sourceMessageId", WirePayload, nBuckets = 8), "live").get
      .select("mrn").as[String].collect().toSet
    assert(liveMrns == Set("M1"))
    assert(spark.read.parquet(s"$root/dead/adt/batch=1")
      .select("reason").as[String].collect().toSeq == Seq("missing_mrn"))

    // replay as-is (no repair): the frame routes straight back to the
    // dead letter under the new batch id, state untouched
    WirePipeline.replayDeadLetters(spark, root, "raw", "adt", Seq(1L), 50L)
    assert(liveMrns == Set("M1"))
    assert(spark.read.parquet(s"$root/dead/adt/batch=50")
      .select("reason").as[String].collect().toSeq == Seq("missing_mrn"))

    // replay with a repair: converges to the originally-correct stream
    WirePipeline.replayDeadLetters(spark, root, "raw", "adt", Seq(1L), 51L,
      df => df.withColumn("raw",
        regexp_replace(col("raw"), "PID\\|1\\|\\|\\^\\^\\^",
          "PID|1||M9^^^")))
    assert(liveMrns == Set("M1", "M9"))

    val oracle = Files.createTempDirectory("wire_replay_oracle").toString
    WirePipeline.foldBatch(Seq(good, fixed).toDF("raw"), 1L, "raw", oracle)
    val expect = StarPipeline.readState(spark,
      StarPipeline.Config(s"$oracle/adt", Seq("mrn"), "validFromUs",
        "sourceMessageId", WirePayload, nBuckets = 8), "live").get
      .select("mrn", "msgType", "visitNumber", "validFromUs")
      .as[(String, String, String, Long)].collect().toSet
    def replayed = StarPipeline.readState(spark,
      StarPipeline.Config(s"$root/adt", Seq("mrn"), "validFromUs",
        "sourceMessageId", WirePayload, nBuckets = 8), "live").get
      .select("mrn", "msgType", "visitNumber", "validFromUs")
      .as[(String, String, String, Long)].collect().toSet
    assert(replayed == expect)

    // replaying the same repair again is a no-op (kernel message dedup)
    WirePipeline.replayDeadLetters(spark, root, "raw", "adt", Seq(1L), 52L,
      df => df.withColumn("raw",
        regexp_replace(col("raw"), "PID\\|1\\|\\|\\^\\^\\^",
          "PID|1||M9^^^")))
    assert(replayed == expect)
  }

  test("bitemporal mode: wire folds stamp the stored axis; current views " +
      "match the valid-time pipeline; old beliefs remain answerable") {
    val adt = (n: Int, mrn: String, loc: String, dtm: String) =>
      s"MSH|^~\\&|EPIC|UCLH|||$dtm||ADT^A02|T$n|P|2.4\r" +
        s"PID|1||$mrn^^^MRN^MRN\r" +
        (Seq("PV1", "1", "I", loc) ++ Seq.fill(15)("") :+ s"V$mrn")
          .mkString("|")
    val prb = (n: Int, mrn: String, code: String, dtm: String) =>
      s"MSH|^~\\&|EPIC|Problem List|||$dtm|X|PPR^PC1|P$n|P|2.4\r" +
        s"PID|1||$mrn^^^MRN^MRN\r" +
        s"PRB|AD|$dtm|$code^X^I10UK|9|||$dtm"
    val b1 = Seq(adt(1, "M1", "W1", "20240401080000"),
      prb(2, "M1", "C1", "20240401080000")).toDF("raw")
    val b2 = Seq(adt(3, "M1", "W2", "20240401090000"),
      prb(4, "M1", "C2", "20240401090000")).toDF("raw")

    val bt = Files.createTempDirectory("wire_bt").toString
    val vt = Files.createTempDirectory("wire_vt").toString
    for ((root, flag) <- Seq((bt, true), (vt, false))) {
      WirePipeline.foldBatch(b1, 1L, "raw", root, bitemporal = flag)
      WirePipeline.foldBatch(b2, 2L, "raw", root, bitemporal = flag)
    }

    // current state agrees across modes
    def conds(root: String, flag: Boolean) =
      WirePipeline.liveConditions(spark, root, bitemporal = flag).get
        .select("conditionTypeId").as[String].collect().toSet
    assert(conds(bt, flag = true) == conds(vt, flag = false))
    def locs(root: String, flag: Boolean) =
      WirePipeline.derived(spark, root, bitemporal = flag).get
        .demographics.select("mrn", "fullLocationString")
        .as[(String, String)].collect().toSet
    assert(locs(bt, flag = true) == locs(vt, flag = false))
    assert(locs(bt, flag = true) == Set(("M1", "W2")))

    // the stored axis answers "what did the pipeline believe after
    // batch 1": W1 open, W2 unknown
    import graft.functions.GraftFunctions.storedAsOf
    val belief1 = WirePipeline.readBelief(spark, bt, "adt").get
      .filter(storedAsOf(lit(1L), col("stored_from_us"),
        col("stored_until_us")))
    assert(belief1.select("fullLocationString").as[String]
      .collect().toSeq == Seq("W1"))
    assert(belief1.filter(col("valid_until_us").isNull).count() == 1)
  }

  test("conditions vertical through the JDBC StarSink: fold + link table + " +
    "gate watermark match the manifest sink; replay is a no-op") {
    import graft.streaming.{JdbcStarSink, ManifestStarSink, StarSink}
    System.setProperty("derby.system.home",
      Files.createTempDirectory("derby_home_wire").toString)
    // ONE sink instance hosts every family (prefix derived per config)
    val jdbc: StarSink = new JdbcStarSink(
      "jdbc:derby:memory:wiresink;create=true")
    val manifest: StarSink = ManifestStarSink
    val roots: Map[String, (StarSink, String)] = Map(
      "jdbc" -> (jdbc, Files.createTempDirectory("wire_jdbc").toString),
      "manifest" ->
        (manifest, Files.createTempDirectory("wire_mani").toString))

    val batch1 = Seq(
      // problem with a visit → conditions fold + condition_visits link
      "MSH|^~\\&|EPIC|Problem List|||20240101100000|X|PPR^PC1|W1|P|2.4\r" +
        "PID|1||M3^^^MRN^MRN\r" + pv1("V1") + "\r" +
        "PRB|AD|20240101100000|C1^Asthma^I10UK|700|||20240101100000",
      // allergy with a visit (one valid IAM, one invalid-action nack)
      "MSH|^~\\&|EPIC|UCLH|||20240101110000||ADT^A60|W2|P|2.4\r" +
        "EVN|A60|20240101110000\r" + "PID|1||M4^^^MRN^MRN\r" + pv1("V2") +
        "\r" + "IAM|1|DA^Drug|1^PENICILLIN^ALG|SV^Severe|RASH|A|771^EPIC" +
        "||||20230115||20240101110000||||Active\r" +
        "IAM|2|DA^Drug|2^ASPIRIN^ALG||R|Q|772^EPIC",
      // infections: Jan 2 advances the gate watermark, Jan 1 rejected
      "MSH|^~\\&|EPIC|UCLH|||20240103120000||ADT^A05|W3|P|2.4\r" +
        "EVN|A05|20240103120000\r" + "PID|1||M5^^^MRN^MRN\r" +
        "ZIF|Covid^20240102000000~Flu^20240101000000").toDF("raw")
    val batch2 = Seq(
      // pre-watermark infection rejected ACROSS batches; newer lands
      "MSH|^~\\&|EPIC|UCLH|||20240104120000||ADT^A05|W4|P|2.4\r" +
        "EVN|A05|20240104120000\r" + "PID|1||M6^^^MRN^MRN\r" +
        "ZIF|RSV^20240101060000~Strep^20240103000000",
      // DE tombstone for M3's problem, new visit V3 still links
      "MSH|^~\\&|EPIC|Problem List|||20240102100000|X|PPR^PC1|W5|P|2.4\r" +
        "PID|1||M3^^^MRN^MRN\r" + pv1("V3") + "\r" +
        "PRB|DE|20240102100000|C1^Asthma^I10UK|700|||20240101100000")
      .toDF("raw")

    roots.values.foreach { case (s, root) =>
      WirePipeline.foldBatch(batch1, 1L, "raw", root, sink = s)
      WirePipeline.foldBatch(batch2, 2L, "raw", root, sink = s)
    }

    def condCfg(root: String) = StarPipeline.Config(s"$root/conditions",
      Seq("mrn", "conditionTypeId", "internalId"), "updatedTimeUs",
      "sourceMessageId",
      Seq("status", "severity", "onsetDate", "comment", "action"),
      nBuckets = 8)
    def rawLive(name: String) = { val (s, root) = roots(name)
      s.read(spark, condCfg(root), "live").get
        .select("mrn", "conditionTypeId", "internalId", "updatedTimeUs",
          "action")
        .as[(String, String, String, Long, Option[String])]
        .collect().toSeq.sorted }
    def current(name: String) = { val (s, root) = roots(name)
      WirePipeline.liveConditions(spark, root, sink = s).get
        .select("conditionTypeId").as[String].collect().toSet }
    def links(name: String) = { val (s, root) = roots(name)
      WirePipeline.conditionVisits(spark, root, sink = s).get
        .select("mrn", "conditionTypeId", "internalId", "visitNumber")
        .as[(String, String, String, String)].collect().toSet }
    def watermark(name: String) = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"${roots(name)._2}/conditions/_INF_PROGRESS")))
      .trim.toLong

    // full raw state (incl. the DE tombstone version) matches
    assert(rawLive("jdbc") == rawLive("manifest"))
    assert(rawLive("jdbc").nonEmpty)
    // the DE-filtered current view agrees and drops the tombstone
    assert(current("jdbc") == current("manifest"))
    assert(!current("jdbc").contains("I10UK:C1") &&
      current("jdbc").contains("INFECTION:Strep") &&
      !current("jdbc").contains("INFECTION:RSV"))
    // insert-once link set identical (incl. the tombstone's V3 link)
    assert(links("jdbc") == links("manifest"))
    assert(links("jdbc") == Set(
      ("M3", "I10UK:C1", "700", "V1"),
      ("M4", "ALLERGY:PENICILLIN", "771", "V2"),
      ("M3", "I10UK:C1", "700", "V3")))
    // the serial-gate watermark advanced identically on both paths
    assert(watermark("jdbc") == watermark("manifest"))
    assert(watermark("jdbc") == 1704240000000000L)

    // W2: replaying a committed batch through the JDBC deployment is an
    // exact no-op per family (progress marks short-circuit)
    val before = (rawLive("jdbc"), links("jdbc"))
    WirePipeline.foldBatch(batch2, 2L, "raw", roots("jdbc")._2, sink = jdbc)
    assert((rawLive("jdbc"), links("jdbc")) == before)
  }
}
