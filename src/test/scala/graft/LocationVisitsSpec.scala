package graft

import org.apache.spark.sql.DataFrame
import graft.operators.LocationVisits

import scala.util.Random

/** Port of the reference's location permutation suites (FIXTURES.md §1:
  * AdtMessages/Location/{Moves,CancelAdmit,CancelDischarge,CancelTransfer,
  * DuplicateSimple}): hourly moves must converge to one interval per
  * location with hour-long spans for EVERY processing order
  * (ref: core/src/test/.../adt/LocationPermutationTestProducer.java:77-91).
  */
case class AdtM(visitId: String, msgType: String, location: String,
                validFromUs: Long, sourceMessageId: Long,
                targetTimeUs: Option[Long],
                dischargeTimeUs: Option[Long])

class LocationVisitsSpec extends SparkSpecBase {
  import spark.implicits._

  private val H = 3600000000L // 1h in µs

  private type M = AdtM
  private def M(visitId: String, msgType: String, location: String,
                validFromUs: Long, sourceMessageId: Long,
                targetTimeUs: Option[Long],
                dischargeTimeUs: Option[Long]): AdtM =
    AdtM(visitId, msgType, location, validFromUs, sourceMessageId,
      targetTimeUs, dischargeTimeUs)

  private def toDf(ms: Seq[M]): DataFrame = ms.toDF()

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val moves: Seq[M] = Seq(
    M("v1", "Admit", "A", 0L, 1, None, None),
    M("v1", "Transfer", "B", 1 * H, 2, None, None),
    M("v1", "Transfer", "C", 2 * H, 3, None, None),
    M("v1", "Transfer", "D", 3 * H, 4, None, None),
    M("v1", "Discharge", null, 4 * H, 5, None, Some(4 * H)))

  test("Moves permutation: hourly intervals converge for every order") {
    val ref = canon(LocationVisits.deriveIntervals(toDf(moves)))
    // expected: four hour-long intervals, inferred discharges except last
    assert(ref.size == 4)
    val rnd = new Random(5)
    for (_ <- 1 to 6)
      assert(canon(LocationVisits.deriveIntervals(
        toDf(rnd.shuffle(moves)))) == ref)
  }

  test("DuplicateSimple: redelivered messages are no-ops") {
    val ref = canon(LocationVisits.deriveIntervals(toDf(moves)))
    assert(canon(LocationVisits.deriveIntervals(
      toDf(moves ++ moves))) == ref)
  }

  test("CancelTransfer annihilates the move and merges adjacent intervals") {
    val cancel = M("v1", "CancelTransfer", "C", 5 * H, 6, Some(2 * H), None)
    val got = LocationVisits.deriveIntervals(toDf(moves :+ cancel))
      .orderBy("admissionUs")
      .select("location", "admissionUs", "dischargeUs")
      .as[(String, Long, Long)].collect().toSeq
    // C gone; B's interval now runs to D's admission
    assert(got == Seq(("A", 0L, H), ("B", H, 3 * H), ("D", 3 * H, 4 * H)))
    // ...in any order
    val rnd = new Random(11)
    val ref = canon(LocationVisits.deriveIntervals(toDf(moves :+ cancel)))
    for (_ <- 1 to 4)
      assert(canon(LocationVisits.deriveIntervals(
        toDf(rnd.shuffle(moves :+ cancel)))) == ref)
  }

  test("CancelDischarge reopens the final interval") {
    val cancel = M("v1", "CancelDischarge", null, 5 * H, 6, Some(4 * H), None)
    val got = LocationVisits.deriveIntervals(toDf(moves :+ cancel))
      .orderBy("admissionUs")
    val last = got.collect().last
    assert(last.getAs[String]("location") == "D")
    assert(last.isNullAt(last.fieldIndex("dischargeUs")))
  }

  test("CancelAdmit before re-admit leaves later location chain intact") {
    val ms = Seq(
      M("v2", "Admit", "X", 0L, 1, None, None),
      M("v2", "CancelAdmit", "X", 1 * H, 2, Some(0L), None),
      M("v2", "Admit", "Y", 2 * H, 3, None, None))
    val got = LocationVisits.deriveIntervals(toDf(ms))
      .select("location", "admissionUs").as[(String, Long)].collect().toSeq
    assert(got == Seq(("Y", 2 * H)))
  }

  test("discharge for unknown visit materializes 1s inferred interval (O7)") {
    val ms = Seq(M("v3", "Discharge", null, 9 * H, 1, None, Some(9 * H)))
    val got = LocationVisits.deriveIntervals(toDf(ms)).collect()(0)
    assert(got.getAs[Long]("admissionUs") == 9 * H - 1000000L)
    assert(got.getAs[Boolean]("inferredAdmission"))
  }

  test("zero/negative-length intervals are rejected to the error channel") {
    // surviving Discharge BEFORE the last admission → negative interval
    val bad = Seq(
      M("v1", "Admit", "A", 2 * H, 1, None, None),
      M("v1", "Discharge", null, 3 * H, 2, None, Some(1 * H)))
    val valid = LocationVisits.deriveIntervals(toDf(bad))
    assert(valid.count() == 0)
    val errs = LocationVisits.intervalErrors(toDf(bad)).collect()
    assert(errs.length == 1 &&
      errs.head.getAs[Long]("dischargeUs") == 1 * H &&
      errs.head.getAs[Long]("admissionUs") == 2 * H)

    // a healthy visit is untouched by the guard
    val ok = LocationVisits.deriveIntervals(toDf(moves))
    assert(ok.count() == 4 &&
      LocationVisits.intervalErrors(toDf(moves)).count() == 0)
  }

  test("occupancy as-of (flagship bed-occupancy query, F10)") {
    val intervals = LocationVisits.deriveIntervals(toDf(moves))
    val at = LocationVisits.occupancyAsOf(intervals, 2 * H + 1)
      .select("location").as[String].collect().toSeq
    assert(at == Seq("C"))
    // after discharge: nobody anywhere
    assert(LocationVisits.occupancyAsOf(intervals, 5 * H).count() == 0)
  }

  test("O9 swap exchanges open-interval locations atomically") {
    val ms = Seq(
      M("va", "Admit", "BED1", 0L, 1, None, None),
      M("vb", "Admit", "BED2", 0L, 2, None, None))
    val intervals = LocationVisits.deriveIntervals(toDf(ms))
    val swapped = LocationVisits.swapLocations(intervals,
      Seq(("va", "vb")).toDF("visitA", "visitB"))
    val locs = swapped.select("visitId", "location")
      .as[(String, String)].collect().toMap
    assert(locs == Map("va" -> "BED2", "vb" -> "BED1"))
  }
}
