package graft

import org.apache.spark.sql.types._
import graft.kernel.TriStateFold
import graft.operators.LocationVisits
import graft.sources.FixtureSource

import java.io.File

/** S10: the fixture corpus drives end-state tests exactly like the
  * reference's yaml corpus drives its MessageProcessingBase suites —
  * including the monitored-files guarantee that no fixture rots unused.
  */
class FixtureSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpusRoot =
    new File(getClass.getResource("/fixtures").toURI)

  private val adtSchema = StructType(Seq(
    StructField("visitId", StringType), StructField("msgType", StringType),
    StructField("location", StringType),
    StructField("validFromUs", LongType),
    StructField("sourceMessageId", LongType),
    StructField("targetTimeUs", LongType),
    StructField("dischargeTimeUs", LongType)))

  private val ivString = StructType(Seq(
    StructField("value", StringType), StructField("status", StringType)))
  private val demoSchema = StructType(Seq(
    StructField("mrn", StringType), StructField("validFromUs", LongType),
    StructField("msgId", LongType), StructField("givenName", ivString),
    StructField("postalCode", ivString)))

  test("ADT fixture corpus end-state: moves + cancel converge") {
    val fx = new FixtureSource(corpusRoot)
    val msgs = fx.loadDir(spark, "AdtMessages/Moves", adtSchema)
    val intervals = LocationVisits.deriveIntervals(msgs)
      .orderBy("admissionUs")
      .select("location", "admissionUs", "dischargeUs")
      .as[(String, Long, Long)].collect().toSeq
    // T11S transfer cancelled → first ward runs until ICU admission
    assert(intervals == Seq(
      ("T42E^T42E BY02^BY02-17", 0L, 7200000000L),
      ("ICU^ICU BY01^BY01-01", 7200000000L, 10800000000L)))
    // X8: location strings split dept^room^bed
    val dept = msgs.selectExpr("split(location, '\\\\^')[0] AS d")
      .filter($"d".isNotNull).distinct().as[String].collect().toSet
    assert(dept == Set("T42E", "T11S", "ICU"))
  }

  test("tri-state demographic fixtures fold SAVE/IGNORE/DELETE") {
    val fx = new FixtureSource(corpusRoot)
    val msgs = fx.load(spark, "AdtMessages/generic/update_info.json",
      demoSchema)
    val r = TriStateFold.applyTriState(msgs, Seq("mrn"), "validFromUs",
      "msgId", Seq("givenName", "postalCode"))
    val live = r.live.select("givenName", "postalCode")
      .as[(Option[String], Option[String])].head()
    assert(live == (Some("ALICE"), None)) // IGNORE kept name, DELETE nulled postcode
  }

  test("raw wire corpus: every family parses through its builder") {
    import graft.sources.Hl7Wire
    import org.apache.spark.sql.functions.col
    val fx = new FixtureSource(corpusRoot)
    val wire = fx.loadWireDir(spark, "Hl7Wire")
    assert(wire.count() == 13)

    val abl = graft.sources.LabFunnel.parseAbl90(
      wire.filter(col("raw").contains("ORU^R30")), "raw")
    assert(abl.select("labSpecimenNumber").as[String].collect().toSeq ==
      Seq("66554"))

    val adt = Hl7Wire.parseAdt(wire, "raw")
      .filter(col("msgType") === "Admit")
    assert(adt.select("mrn", "visitNumber").as[(String, String)]
      .collect().toSeq == Seq(("51900001", "443322")))

    val labs = Hl7Wire.parseLabOrders(
      wire.filter(col("raw").contains("ORU^R01")), "raw")
    assert(labs.count() == 2) // two OBRs in the multi-order message
    assert(labs.filter(col("testId") === "CRP").count() == 1)

    val problems = Hl7Wire.parseProblems(wire, "raw")
    assert(problems.select("conditionCode").as[String].collect().toSeq ==
      Seq("J45.9"))

    val consults = Hl7Wire.parseConsults(
      wire.filter(col("raw").contains("ORM^O01")), "raw")
    assert(consults.select("epicConsultId").as[Long].collect().toSeq ==
      Seq(9900221L))
    assert(consults.select("consultationType").as[String].collect()
      .toSeq == Seq("CON310"))

    val flows = Hl7Wire.parseFlowsheets(
      wire.filter(col("raw").contains("|Vitals|")), "raw")
    assert(flows.select("interfaceId", "numericValue", "comment")
      .as[(String, Double, String)].collect().toSeq ==
      Seq(("5", 78.0, "resting")))

    // cross-key trigger family: pending/swap/merge/move extractions
    val allAdt = Hl7Wire.parseAdt(wire, "raw")
    val pending = allAdt.filter(col("msgType") === "PendingTransfer")
    assert(pending.select("visitNumber", "pendingDestination")
      .as[(String, String)].collect().toSeq ==
      Seq(("443323", "T11E^T11E BY02^BY02-17")))
    assert(allAdt.filter(col("msgType") === "CancelPendingTransfer")
      .count() == 1)
    val swap = allAdt.filter(col("msgType") === "SwapLocations")
    assert(swap.select("visitNumber", "otherVisitNumber")
      .as[(String, String)].collect().toSeq == Seq(("443324", "443325")))
    val merge = allAdt.filter(col("msgType") === "MergePatient")
    assert(merge.select("previousMrn", "previousNhsNumber")
      .as[(String, String)].collect().toSeq ==
      Seq(("51900006", "6666666666")))
    val move = allAdt.filter(col("msgType") === "MoveVisit")
    assert(move.select("previousVisitNumber", "visitNumber")
      .as[(String, String)].collect().toSeq == Seq(("443326", "443327")))

    // conditions wire family: ZIF infections + IAM allergies
    val inf = Hl7Wire.parseInfections(
      wire.filter(col("raw").contains("ADT^A05")), "raw")
    assert(inf.select("conditionCode").as[String].collect().toSet ==
      Set("MRSA", "COVID-19"))
    val aller = Hl7Wire.parseAllergies(
      wire.filter(col("raw").contains("ADT^A60")), "raw")
    assert(aller.select("conditionCode", "action").as[(String, String)]
      .collect().toSet == Set(("PENICILLIN", "AD"), ("PEANUT", "UP")))
    assert(aller.filter(col("error").isNotNull).count() == 0)
  }

  test("monitored corpus flags unconsumed fixtures") {
    val fx = new FixtureSource(corpusRoot)
    fx.load(spark, "AdtMessages/generic/update_info.json", demoSchema)
    val e = intercept[IllegalStateException](fx.assertAllConsumed())
    assert(e.getMessage.contains("moves_hourly.json"))
    // consuming the full corpus satisfies the guarantee (schemas are the
    // per-family contracts exercised in FixturePermutationSpec; here the
    // monitored walk only needs each file touched through the source)
    fx.loadDir(spark, "AdtMessages/Moves", adtSchema)
    import org.apache.spark.sql.types.StructType
    val touchAll = Seq("Flowsheets", "PatientConditions", "ConsultRequests",
      "Forms", "DeptStates", "LabOrders")
    touchAll.foreach(d => fx.loadDir(spark, d, new StructType()))
    fx.loadWireDir(spark, "Hl7Wire")
    fx.assertAllConsumed()
  }
}
