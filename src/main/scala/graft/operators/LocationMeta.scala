package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Location metadata verticals — rooms, beds, bed facilities, and the
  * location-string FK table, driven from ONE LocationMetadata message
  * shape (ref interchange/location/LocationMetadata.java: hl7String +
  * departmentId + optional RoomMetadata + optional BedMetadata; core
  * controllers LocationController.java:128-146 `processMessage`,
  * RoomController `updateOrCreateRoomAndState`:353+, BedController
  * `processBedStateAndFacility`:430+).
  *
  * The reference processes serially per message: get-or-create the
  * static entity (room by (hl7, department), bed by (hl7, room)), then
  * SCD-2 the state chain keyed by Epic CSN — a repeated CSN is a no-op,
  * a new CSN closes the previous state; pool beds fold ALL same-contact
  * pool messages into one state with a running count; a bed facility
  * attaches (insert-if-absent) to whatever state its message resolved
  * to. Room names are write-once (a different non-null name throws
  * IncompatibleDatabaseState and rejects the message).
  *
  * Batch formulation — everything is window algebra over the CANONICAL
  * (contactTime, msgId) order, one hash shuffle per vertical, no typed
  * fold needed:
  *
  *   - CSN dedup   = row_number() over (key, csn ordered by contact,
  *     msgId) == 1 (keep FIRST, like the reference's existing-CSN
  *     no-op);
  *   - SCD-2       = lead(validFrom) over (key ordered by contact,
  *     msgId) (the invalidate-previous write);
  *   - pool count  = count of pool messages per (bed, contactTime) —
  *     COUNT of DISTINCT messages, so a replayed batch is idempotent
  *     where the reference's serial increment double-counts (its own
  *     javadoc accepts the inflation; we keep the deterministic form);
  *   - name guard  = first(name) over the key's canonical order; a
  *     different non-null name is an error row, excluded from the fold
  *     (the reference rejects the whole message).
  *
  * Arrival-order note: the reference assumes in-contact-order delivery
  * ("We should receive rooms in order of their valid from") and throws
  * on an out-of-order CSN; the canonical fold instead places it where
  * it belongs — identical results under in-order delivery, convergent
  * (rather than failing) under permutation, matching the kernel's
  * treatment of RowState ordering.
  *
  * Scale: location metadata is dimension-scale, but every step is a
  * plain hash-partition + window (no driver loops, no collect) so the
  * vertical would survive an implausibly large location census.
  */
object LocationMeta {

  /** rooms: one row per (departmentId, roomHl7) with the write-once
    * name; states: SCD-2 chain; errors: rejected name-change messages.
    */
  final case class RoomResult(rooms: DataFrame, states: DataFrame,
                              errors: DataFrame)

  /** beds: one row per (departmentId, roomHl7, bedHl7); states: SCD-2
    * chain incl. pool counts; facilities: (bed, stateCsn, facility)
    * child rows (insert-only accumulate, ref
    * `createBedFacilityIfNotExists`).
    */
  final case class BedResult(beds: DataFrame, states: DataFrame,
                             facilities: DataFrame)

  private val roomKey = Seq("departmentId", "roomHl7")
  private val bedKey = Seq("departmentId", "roomHl7", "bedHl7")

  /** Fold room metadata messages. Input columns: departmentId, roomHl7,
    * roomName (nullable), roomCsn, roomContactUs, roomRecordState,
    * isRoomReady, msgId.
    */
  def roomStates(msgs: DataFrame): RoomResult = {
    val rows = msgs.filter(col("roomHl7").isNotNull &&
      col("departmentId").isNotNull)
    val wKey = Window.partitionBy(roomKey.map(col): _*)
      .orderBy(col("roomContactUs"), col("msgId"))

    // write-once name: the FIRST message's name (nullable) is the
    // room's name forever (Room is constructed once,
    // RoomController:362-366); any later different non-null name
    // rejects its message
    val named = rows.withColumn("__name0", first(col("roomName")).over(wKey))
    val bad = col("roomName").isNotNull && !(col("roomName") <=> col("__name0"))
    val errors = named.filter(bad)
      .select(roomKey.map(col) ++ Seq(col("roomCsn"), col("msgId"),
        col("roomName").as("claimed_name"), col("__name0").as("stored_name"),
        lit("IncompatibleDatabaseState: Room can't change it's name")
          .as("error")): _*)
    val ok = named.filter(!bad)

    val wCsn = Window
      .partitionBy((roomKey :+ "roomCsn").map(col): _*)
      .orderBy(col("roomContactUs"), col("msgId"))
    val firsts = ok.withColumn("__rn", row_number().over(wCsn))
      .filter(col("__rn") === 1).drop("__rn")

    val states = firsts
      .withColumn("validUntilUs", lead(col("roomContactUs"), 1).over(wKey))
      .select(roomKey.map(col) ++ Seq(col("roomCsn").as("csn"),
        col("roomRecordState").as("status"), col("isRoomReady"),
        col("roomContactUs").as("validFromUs"), col("validUntilUs")): _*)

    val rooms = ok.withColumn("__rn", row_number().over(wKey))
      .filter(col("__rn") === 1)
      .select(roomKey.map(col) :+ col("__name0").as("name"): _*)
    RoomResult(rooms, states, errors)
  }

  /** Fold bed metadata messages. Input columns: departmentId, roomHl7,
    * bedHl7, bedCsn, bedContactUs, bedRecordState, isPoolBed, isBunkBed,
    * bedIsInCensus, bedFacility (nullable), msgId.
    */
  def bedStates(msgs: DataFrame): BedResult = {
    val rows = msgs.filter(col("bedHl7").isNotNull &&
      col("departmentId").isNotNull)
    val isPool = coalesce(col("isPoolBed"), lit(false))

    // pool states: ALL pool messages at one (bed, contactTime) fold
    // into one state — csn/fields of the canonically-first message,
    // count of distinct messages (BedController
    // `findExistingPoolBedByValidFrom` + `incrementPoolBedAndSave`)
    val pool = rows.filter(isPool)
      .groupBy((bedKey :+ "bedContactUs").map(col): _*)
      .agg(
        min(struct(col("msgId"), col("bedCsn"), col("bedRecordState"),
          col("isBunkBed"), col("bedIsInCensus"))).as("__f"),
        countDistinct(col("msgId")).as("poolBedCount"))
      .select(bedKey.map(col) ++ Seq(col("bedContactUs"),
        col("__f.msgId").as("msgId"), col("__f.bedCsn").as("bedCsn"),
        col("__f.bedRecordState").as("bedRecordState"),
        col("__f.isBunkBed").as("isBunkBed"),
        col("__f.bedIsInCensus").as("bedIsInCensus"),
        col("poolBedCount")): _*)

    val nonPool = rows.filter(!isPool)
      .select(bedKey.map(col) ++ Seq(col("bedContactUs"), col("msgId"),
        col("bedCsn"), col("bedRecordState"), col("isBunkBed"),
        col("bedIsInCensus"),
        lit(null).cast("long").as("poolBedCount")): _*)

    // existing-CSN no-op across BOTH classes: keep the canonically
    // first state per (bed, csn)
    val wCsn = Window.partitionBy((bedKey :+ "bedCsn").map(col): _*)
      .orderBy(col("bedContactUs"), col("msgId"))
    val candidates = pool.unionByName(nonPool)
      .withColumn("__rn", row_number().over(wCsn))
      .filter(col("__rn") === 1).drop("__rn")

    val wKey = Window.partitionBy(bedKey.map(col): _*)
      .orderBy(col("bedContactUs"), col("msgId"))
    val states = candidates
      .withColumn("validUntilUs", lead(col("bedContactUs"), 1).over(wKey))
      .select(bedKey.map(col) ++ Seq(col("bedCsn").as("csn"),
        col("bedRecordState").as("status"), col("isBunkBed"),
        col("bedIsInCensus"), col("poolBedCount"),
        col("bedContactUs").as("validFromUs"), col("validUntilUs")): _*)

    // facility resolution mirrors processBedState's return: a pool
    // message lands on its (bed, contactTime) pool-group's state, a
    // non-pool message on the state carrying its csn; (bed, csn) is
    // unique after the dedup, so the csn IS the state key
    val poolCsn = rows.filter(isPool)
      .groupBy((bedKey :+ "bedContactUs").map(col): _*)
      .agg(min(struct(col("msgId"), col("bedCsn"))).as("__f"))
      .select(bedKey.map(col) ++ Seq(col("bedContactUs"),
        col("__f.bedCsn").as("stateCsn")): _*)
    val facPool = rows.filter(isPool && col("bedFacility").isNotNull)
      .join(poolCsn, bedKey :+ "bedContactUs")
      .select(bedKey.map(col) ++ Seq(col("stateCsn").as("csn"),
        col("bedFacility").as("facility")): _*)
    val facNonPool = rows.filter(!isPool && col("bedFacility").isNotNull)
      .select(bedKey.map(col) ++ Seq(col("bedCsn").as("csn"),
        col("bedFacility").as("facility")): _*)
    val facilities = facPool.unionByName(facNonPool).distinct()

    val beds = candidates.withColumn("__rn", row_number().over(wKey))
      .filter(col("__rn") === 1)
      .select(bedKey.map(col): _*)
    BedResult(beds, states, facilities)
  }

  /** The location-string FK table (hl7String → department/room/bed),
    * write-once per LocationController.addLocationForeignKeys: the
    * first message binds the FKs; a message claiming DIFFERENT FKs for
    * the same string is an error row.
    */
  final case class LocationResult(locations: DataFrame, errors: DataFrame)

  def locations(msgs: DataFrame): LocationResult = {
    val rows = msgs.filter(col("hl7String").isNotNull)
      .select(col("hl7String"), col("departmentId"), col("roomHl7"),
        col("bedHl7"), col("msgId"))
    val w = Window.partitionBy(col("hl7String"))
      .orderBy(col("msgId"))
    val flagged = rows
      .withColumn("__d0", first(col("departmentId")).over(w))
      .withColumn("__r0", first(col("roomHl7")).over(w))
      .withColumn("__b0", first(col("bedHl7")).over(w))
    val bad = !(col("departmentId") <=> col("__d0")) ||
      !(col("roomHl7") <=> col("__r0")) || !(col("bedHl7") <=> col("__b0"))
    LocationResult(
      locations = flagged.filter(!bad)
        .groupBy(col("hl7String"))
        .agg(first(col("__d0")).as("departmentId"),
          first(col("__r0")).as("roomHl7"),
          first(col("__b0")).as("bedHl7")),
      errors = flagged.filter(bad)
        .select(col("hl7String"), col("msgId"),
          lit("IncompatibleDatabaseState: location FK changed").as("error")))
  }
}
