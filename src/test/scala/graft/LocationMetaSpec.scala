package graft

import org.apache.spark.sql.functions._
import graft.operators.LocationMeta

/** Room/bed/bed-facility metadata verticals (ref
  * LocationController.java:128-146, RoomController, BedController).
  */
class LocationMetaSpec extends SparkSpecBase {
  import spark.implicits._

  private def roomMsgs(rows: Seq[(Long, String, String, Long, Long, String, Boolean, Long)]) =
    rows.toDF("departmentId", "roomHl7", "roomName", "roomCsn",
      "roomContactUs", "roomRecordState", "isRoomReady", "msgId")

  private def bedMsgs(rows: Seq[(Long, String, String, Long, Long, String, Boolean, Boolean, Boolean, String, Long)]) =
    rows.toDF("departmentId", "roomHl7", "bedHl7", "bedCsn",
      "bedContactUs", "bedRecordState", "isPoolBed", "isBunkBed",
      "bedIsInCensus", "bedFacility", "msgId")

  test("room states: CSN dedup, SCD-2 invalidation, write-once name") {
    val msgs = roomMsgs(Seq(
      (1L, "R1", "Room One", 100L, 1000L, "ACTIVE", true, 1L),
      // same CSN again, later — a no-op (existing-CSN check)
      (1L, "R1", "Room One", 100L, 2000L, "INACTIVE", false, 2L),
      // new CSN closes the previous state
      (1L, "R1", "Room One", 101L, 3000L, "INACTIVE", false, 3L),
      // name change → rejected, must NOT appear as a state
      (1L, "R1", "Renamed", 102L, 4000L, "ACTIVE", true, 4L)))
    val r = LocationMeta.roomStates(msgs)

    val states = r.states.orderBy("csn").collect()
    assert(states.map(_.getAs[Long]("csn")).toSeq === Seq(100L, 101L))
    assert(states(0).getAs[Long]("validFromUs") === 1000L)
    assert(states(0).getAs[Long]("validUntilUs") === 3000L)
    assert(states(1).isNullAt(states(1).fieldIndex("validUntilUs")))

    val errs = r.errors.collect()
    assert(errs.length === 1 && errs(0).getAs[Long]("msgId") === 4L)
    assert(errs(0).getAs[String]("claimed_name") === "Renamed")

    val rooms = r.rooms.collect()
    assert(rooms.length === 1 &&
      rooms(0).getAs[String]("name") === "Room One")
  }

  test("bed states: pool count accumulates, facilities attach per state") {
    val msgs = bedMsgs(Seq(
      // three pool messages at one contact time → ONE state, count 3
      (1L, "R1", "B1", 200L, 1000L, "ACTIVE", true, false, true, "COT", 1L),
      (1L, "R1", "B1", 201L, 1000L, "ACTIVE", true, false, true, null, 2L),
      (1L, "R1", "B1", 202L, 1000L, "ACTIVE", true, false, true, "MONITOR", 3L),
      // a later non-pool state closes the pool state
      (1L, "R1", "B1", 300L, 5000L, "INACTIVE", false, true, false, "COT", 4L),
      // repeated CSN: no new state, but its facility still attaches
      (1L, "R1", "B1", 300L, 6000L, "ACTIVE", false, false, true, "PUMP", 5L)))
    val b = LocationMeta.bedStates(msgs)

    val states = b.states.orderBy("validFromUs").collect()
    assert(states.length === 2)
    assert(states(0).getAs[Long]("csn") === 200L)
    assert(states(0).getAs[Long]("poolBedCount") === 3L)
    assert(states(0).getAs[Long]("validUntilUs") === 5000L)
    assert(states(1).getAs[Long]("csn") === 300L)
    assert(states(1).isNullAt(states(1).fieldIndex("poolBedCount")))

    val fac = b.facilities.orderBy("csn", "facility").collect()
      .map(r => (r.getAs[Long]("csn"), r.getAs[String]("facility")))
    assert(fac.toSeq === Seq((200L, "COT"), (200L, "MONITOR"),
      (300L, "COT"), (300L, "PUMP")))
  }

  test("location FK table is write-once with an error channel") {
    val msgs = Seq(
      ("D1^R1^B1", 1L, "R1", "B1", 1L),
      ("D1^R1^B1", 1L, "R1", "B1", 2L), // same FKs: fine
      ("D1^R1^B1", 2L, "R1", "B1", 3L)  // dept changed: error
    ).toDF("hl7String", "departmentId", "roomHl7", "bedHl7", "msgId")
    val l = LocationMeta.locations(msgs)
    val locs = l.locations.collect()
    assert(locs.length === 1 && locs(0).getAs[Long]("departmentId") === 1L)
    val errs = l.errors.collect()
    assert(errs.length === 1 && errs(0).getAs[Long]("msgId") === 3L)
  }

  test("permutation convergence: any arrival order folds identically") {
    val rows = Seq(
      (1L, "R1", "B1", 200L, 1000L, "ACTIVE", true, false, true, "COT", 1L),
      (1L, "R1", "B1", 201L, 1000L, "ACTIVE", true, false, true, null, 2L),
      (1L, "R1", "B2", 300L, 2000L, "ACTIVE", false, true, false, "PUMP", 3L),
      (2L, "R2", "B1", 400L, 3000L, "INACTIVE", false, false, true, null, 4L),
      (1L, "R1", "B1", 500L, 4000L, "ACTIVE", false, false, false, "COT", 5L))
    def fold(perm: Seq[(Long, String, String, Long, Long, String, Boolean, Boolean, Boolean, String, Long)]) = {
      val b = LocationMeta.bedStates(bedMsgs(perm))
      (b.states.orderBy("departmentId", "roomHl7", "bedHl7", "csn")
        .collect().toSeq,
        b.facilities.orderBy("departmentId", "roomHl7", "bedHl7", "csn",
          "facility").collect().toSeq)
    }
    val canonical = fold(rows)
    for (p <- Seq(rows.reverse, rows.sortBy(_._4), scala.util.Random.shuffle(rows))) {
      assert(fold(p) === canonical)
    }
  }
}
