package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Labs

import scala.util.Random

case class Sens(agent: String, value: String, resultTimeUs: Long)
case class Res(testCode: String, mimeType: String,
               numericValue: Option[Double], stringValue: Option[String],
               units: Option[String], resultTimeUs: Long,
               isolateCode: Option[String], sensitivities: Seq[Sens])
case class Ord(epicOrderNumber: String, labSpecimenNumber: String,
               battery: String, mrn: String, visitNumber: Option[String],
               collectionTimeUs: Long, statusChangeTimeUs: Long,
               sourceMessageId: Long, results: Seq[Res])

/** O16 semantics ported from the reference's winpath incremental_orders /
  * TestLabsProcessingUnorderedMessages shape: an order arrives in several
  * increasingly-complete messages (possibly out of order); the final star
  * must converge to the newest value per (order, test) regardless of
  * arrival order, with isolate sensitivities merged per agent.
  */
class LabsSpec extends SparkSpecBase {
  import spark.implicits._

  private val msgs: Seq[Ord] = Seq(
    // initial order, one numeric result (ALP=104 like the winpath fixture)
    Ord("epic1", "spec1", "BC", "mrn1", Some("v1"), 1000L, 2000L, 1, Seq(
      Res("ALP", "NUMERIC", Some(104.0), None, Some("IU/L"), 2000L, None, Nil))),
    // incremental update: corrected ALP + new ALB
    Ord("epic1", "spec1", "BC", "mrn1", Some("v1"), 1000L, 3000L, 2, Seq(
      Res("ALP", "NUMERIC", Some(105.0), None, Some("IU/L"), 3000L, None, Nil),
      Res("ALB", "NUMERIC", Some(48.0), None, Some("g/L"), 3000L, None, Nil))),
    // micro order with isolate + per-agent sensitivities
    Ord("epic2", "spec2", "MICRO", "mrn1", None, 1500L, 2500L, 3, Seq(
      Res("CULT", "LAB_ISOLATE", None, None, None, 2500L, Some("ECOLI"), Seq(
        Sens("AMOX", "R", 2500L), Sens("GENT", "S", 2500L))))),
    // later sensitivity revision: AMOX R → S
    Ord("epic2", "spec2", "MICRO", "mrn1", None, 1500L, 3500L, 4, Seq(
      Res("CULT", "LAB_ISOLATE", None, None, None, 3500L, Some("ECOLI"), Seq(
        Sens("AMOX", "S", 3500L))))))

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def star(ms: Seq[Ord]) = Labs.deriveStar(ms.toDF())

  test("incremental orders converge to newest values per (order, test)") {
    val s = star(msgs)
    val res = s.results
      .select("testCode", "numericValue", "resultTimeUs")
      .as[(String, Option[Double], Long)].collect().toSet
    // CULT's second message is payload-identical → F6: no-op update does
    // not bump validFrom (stays 2500), exactly the reference's RowState
    // diff-or-skip behavior.
    assert(res == Set(("ALP", Some(105.0), 3000L),
      ("ALB", Some(48.0), 3000L), ("CULT", None, 2500L)))
    assert(s.orders.count() == 2)
    assert(s.samples.count() == 2)
  }

  test("sensitivities merge per agent with newest value winning") {
    val s = star(msgs)
    val sens = s.sensitivities.select("agent", "value", "resultTimeUs")
      .as[(String, String, Long)].collect().toSet
    assert(sens == Set(("AMOX", "S", 3500L), ("GENT", "S", 2500L)))
  }

  test("unordered message permutations converge (reference permutation suite)") {
    val ref = (canon(star(msgs).results), canon(star(msgs).sensitivities),
      canon(star(msgs).orders))
    val rnd = new Random(17)
    for (_ <- 1 to 4) {
      val p = rnd.shuffle(msgs)
      assert((canon(star(p).results), canon(star(p).sensitivities),
        canon(star(p).orders)) == ref)
    }
  }

  test("ORR cancel deletes order+results only when newer (O3)") {
    val s = star(msgs)
    // cancel BC order with an OLDER time → no-op (the live BC order's
    // validFrom is 2000: the msg-2 update was payload-identical at the
    // order level, so F6 kept the original version's validFrom)
    val stale = Labs.applyCancels(s,
      Seq(("BC", "spec1", 1500L)).toDF("battery", "labSpecimenNumber",
        "cancelTimeUs"))
    assert(stale.orders.count() == 2)
    // newer cancel → BC order + its results gone, MICRO untouched
    val fresh = Labs.applyCancels(s,
      Seq(("BC", "spec1", 9000L)).toDF("battery", "labSpecimenNumber",
        "cancelTimeUs"))
    assert(fresh.orders.select("battery").as[String].collect().toSeq ==
      Seq("MICRO"))
    assert(fresh.results.select("testCode").as[String].collect().toSeq ==
      Seq("CULT"))
  }
}
