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
    val adt = live("adt", Seq("mrn"), "validFromUs",
      Seq("msgType", "patientClass", "fullLocationString"))
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
}
