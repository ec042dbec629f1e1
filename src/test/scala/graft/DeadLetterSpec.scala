package graft

import org.apache.spark.sql.functions._
import graft.sources.Hl7Wire
import graft.streaming.DeadLetter

/** S3/S4: dead-letter routing — the ack/nack analog. A corrupted wire
  * corpus splits into a clean channel (enters the fold) and a dead
  * channel tagged with the first matching rejection reason.
  */
class DeadLetterSpec extends SparkSpecBase {
  import spark.implicits._

  private val good =
    "MSH|^~\\&|EPIC|UCLH|||20240102030405||ADT^A01|GOOD|P|2.4\r" +
      "PID|1||1234^^^MRN^MRN\rPV1|1|I|W^R^B"
  private val junk = "NOTHL7 at all"
  private val unhandledType =
    "MSH|^~\\&|EPIC|UCLH|||20240102030405||ADT^A99|UNH|P|2.4\r" +
      "PID|1||1234^^^MRN^MRN"
  private val noMrn =
    "MSH|^~\\&|EPIC|UCLH|||20240102030405||ADT^A01|NOMRN|P|2.4\rPID|1||"
  private val noTime =
    "MSH|^~\\&|EPIC|UCLH|||||ADT^A01|NOTIME|P|2.4\rPID|1||1234^^^MRN^MRN"
  // missing MRN *and* missing timestamp: first matching rule must win
  private val doubleBad = "MSH|^~\\&|EPIC|UCLH|||||ADT^A01|BOTH|P|2.4"

  private def routed = DeadLetter.route(
    Hl7Wire.parseAdt(
      Seq(good, junk, unhandledType, noMrn, noTime, doubleBad).toDF("raw"),
      "raw"),
    DeadLetter.adtRules)

  test("clean channel keeps exactly the processable messages") {
    val clean = routed.clean
    assert(clean.select("sourceMessageId").as[String].collect().toSeq ==
      Seq("GOOD"))
    // schema is untouched: no reason column leaks into the fold input
    assert(!clean.columns.contains("reason"))
    // original payload rides along for replay
    assert(clean.columns.contains("raw"))
  }

  test("dead channel tags each reject with its first matching reason") {
    val dead = routed.dead
      .select(coalesce(col("sourceMessageId"), col("raw")), col("reason"))
      .as[(String, String)].collect().toMap
    assert(dead == Map(
      junk -> "unroutable",
      "UNH" -> "unhandled_type",
      "NOMRN" -> "missing_mrn",
      "NOTIME" -> "missing_valid_from",
      "BOTH" -> "missing_mrn")) // mrn rule ordered before timestamp rule
  }

  test("channels partition the input: no loss, no duplication") {
    assert(routed.clean.count() + routed.dead.count() == 6)
  }

  test("routing refuses an input that already has a reason column") {
    val df = Seq(("x", "y")).toDF("raw", "reason")
    intercept[IllegalArgumentException] {
      DeadLetter.route(df, Seq("r" -> lit(true)))
    }
  }
}
