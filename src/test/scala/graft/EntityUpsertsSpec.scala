package graft

import org.apache.spark.sql.functions._
import graft.operators.EntityUpserts

case class Flow(visitId: String, observationTypeId: Long,
                observationTimeUs: Long, updatedTimeUs: Long, msgId: Long,
                valueType: String, numericValue: Option[Double],
                stringValue: Option[String], dateValue: Option[String],
                unit: Option[String], comment: Option[String])

class EntityUpsertsSpec extends SparkSpecBase {
  import spark.implicits._

  test("O14 flowsheet upsert on (visit, type, obsTime) with typed values") {
    val updates = Seq(
      Flow("v1", 7, 1000, 2000, 1, "NUMERIC", Some(36.6), None, None,
        Some("degC"), None),
      // correction for the same observation, newer update time
      Flow("v1", 7, 1000, 3000, 2, "NUMERIC", Some(37.1), None, None,
        Some("degC"), None),
      // different observation time → separate row
      Flow("v1", 7, 5000, 5500, 3, "NUMERIC", Some(36.9), None, None,
        Some("degC"), None),
      // TEXT-typed observation (mime dispatch via valueType)
      Flow("v1", 9, 1000, 2000, 4, "TEXT", None, Some("sitting"), None,
        None, None)).toDS().toDF()
    val r = EntityUpserts.upsert("visit_observation", updates.limit(0),
      updates)
    val live = r.live
      .select("observationTypeId", "observationTimeUs", "numericValue",
        "stringValue")
      .as[(Long, Long, Option[Double], Option[String])].collect().toSet
    assert(live == Set(
      (7L, 1000L, Some(37.1), None),
      (7L, 5000L, Some(36.9), None),
      (9L, 1000L, None, Some("sitting"))))
    assert(r.audit.count() == 1) // the corrected temperature
  }

  test("O18 question dedup by text hash") {
    val qs = Seq(("Why?", 1000L, 1L), ("Why?", 2000L, 2L),
      ("How?", 1000L, 3L))
      .toDF("questionText", "validFromUs", "msgId")
    val hashed = EntityUpserts.withQuestionHash(qs, "questionText")
    val r = EntityUpserts.upsert("question", hashed.limit(0), hashed)
    // duplicate text collapses to one live question (F6: identical
    // payload, no audit churn)
    assert(r.live.count() == 2)
    assert(r.audit.count() == 0)
  }

  test("O19 form metadata dims upsert via registry") {
    val defs = Seq((10L, 1000L, 1L, "ICU admission", "ICU form"),
      (10L, 2000L, 2L, "ICU admission v2", "ICU form"))
      .toDF("internalId", "validFromUs", "msgId", "name",
        "patientFriendlyName")
    val r = EntityUpserts.upsert("form_definition", defs.limit(0), defs)
    val live = r.live.select("internalId", "name").as[(Long, String)]
      .collect().toSeq
    assert(live == Seq((10L, "ICU admission v2")))
    assert(r.audit.count() == 1) // v1 name closed by the rename

    val forms = Seq((77L, 5000L, 3L, 10L, "v1", "m1", Option.empty[Long]))
      .toDF("internalId", "firstFiledTimeUs", "msgId", "formDefinitionId",
        "visitId", "mrn", "noteId")
    val f = EntityUpserts.upsert("form", forms.limit(0), forms)
    assert(f.live.count() == 1)
  }

  test("J9 write-once dim: new inserts, identical no-op, changed FK errors") {
    val current = Seq(("bed1", "room1"), ("bed2", "room1"))
      .toDF("bedId", "roomId")
    val updates = Seq(
      ("bed1", "room1"), // identical → no-op
      ("bed2", "room9"), // CHANGED parent → error, not overwrite
      ("bed3", "room2")) // new → insert
      .toDF("bedId", "roomId")
    val r = EntityUpserts.writeOnceUpsert(current, updates,
      Seq("bedId"), Seq("roomId"))
    val merged = r.merged.select("bedId", "roomId").as[(String, String)]
      .collect().toMap
    assert(merged == Map("bed1" -> "room1", "bed2" -> "room1",
      "bed3" -> "room2"))
    val errs = r.errors.collect()
    assert(errs.length == 1)
    assert(errs.head.getAs[String]("bedId") == "bed2" &&
      errs.head.getAs[String]("claimed_roomId") == "room9" &&
      errs.head.getAs[String]("stored_roomId") == "room1" &&
      errs.head.getAs[String]("error") == "ImmutableFieldChanged")
  }

  test("O10 move visit re-keys to new patient when move is newer") {
    val visits = Seq(("v1", "mOld", "encOld", 1000L),
      ("v2", "mX", "encX", 1000L))
      .toDF("visitId", "mrn", "encounter", "validFromUs")
    val moves = Seq(("v1", "mNew", "encNew", 5000L))
      .toDF("visitId", "newMrn", "newEncounter", "moveTimeUs")
    val got = EntityUpserts.moveVisits(visits, moves)
      .select("visitId", "mrn", "encounter")
      .as[(String, String, String)].collect().toSet
    assert(got == Set(("v1", "mNew", "encNew"), ("v2", "mX", "encX")))
    // stale move (older than the visit) is a no-op
    val stale = Seq(("v2", "mNew", "encNew", 500L))
      .toDF("visitId", "newMrn", "newEncounter", "moveTimeUs")
    assert(EntityUpserts.moveVisits(visits, stale)
      .filter($"visitId" === "v2").select("mrn").as[String].head() == "mX")
  }

  test("O14 metadata: observation-type naming upsert via registry") {
    val updates = Seq(
      // Caboodle naming row (no interfaceId yet)
      (null.asInstanceOf[String], "F1", 1000L, 1L, "Heart Rate", "HR",
        "NUMERIC", "bpm", "beats per minute"),
      // EPIC half-row from the flowsheet stream (interfaceId only)
      ("I1", null.asInstanceOf[String], 1500L, 2L, null, null, null,
        null, null),
      // newer naming correction for the Caboodle row
      (null.asInstanceOf[String], "F1", 2000L, 3L, "Heart Rate", "HR",
        "NUMERIC", "/min", "beats per minute"))
      .toDF("interfaceId", "idInApplication", "validFromUs", "msgId",
        "name", "displayName", "valueType", "unit", "description")
    val r = EntityUpserts.upsert("visit_observation_type",
      updates.limit(0), updates)
    val live = r.live.orderBy("validFromUs")
      .select("interfaceId", "idInApplication", "unit")
      .as[(Option[String], Option[String], Option[String])].collect().toSeq
    assert(live == Seq(
      (Some("I1"), None, None),
      (None, Some("F1"), Some("/min"))))
  }

  test("type-dim metadata: consult / lab battery / test definition upserts") {
    // consult type: newer name wins, older loses (name-if-newer)
    val consult = Seq(("CON1", 2000L, 1L, "Cardiology"),
      ("CON1", 1000L, 2L, "Old Cardio"), ("CON2", 1000L, 3L, "Renal"))
      .toDF("code", "validFromUs", "msgId", "name")
    val ct = EntityUpserts.upsert("consultation_type",
      consult.limit(0), consult)
    assert(ct.live.orderBy("code").select("code", "name")
      .as[(String, String)].collect().toSeq ==
      Seq(("CON1", "Cardiology"), ("CON2", "Renal")))

    // lab metadata: same shortCode under two coding systems stays two rows
    val labs = Seq(("FBC", "WIN_PATH", 1000L, 1L, "Full blood count"),
      ("FBC", "CO_PATH", 1000L, 2L, "FBC (path)"))
    val bat = labs.toDF("batteryCode", "codingSystem", "validFromUs",
      "msgId", "name")
    val lb = EntityUpserts.upsert("lab_battery", bat.limit(0), bat)
    assert(lb.live.count() == 2)
    val defs = labs.toDF("testCode", "codingSystem", "validFromUs",
      "msgId", "name")
    val ld = EntityUpserts.upsert("lab_test_definition",
      defs.limit(0), defs)
    assert(ld.live.count() == 2)
  }

  test("waveform streams register real-time observation types") {
    import graft.operators.ObservationTypes
    val chunks = Seq(
      ("52A", "ecg", 2000L), ("52A", "ecg", 1000L), ("61B", "spo2", 500L))
      .toDF("streamId", "mapped", "obsTimeUs")
    val types = ObservationTypes.fromWaveform(chunks, "streamId",
      "mapped", "obsTimeUs")
    val got = types.orderBy("interfaceId")
      .select("interfaceId", "idInApplication", "validFromUs", "name")
      .as[(String, String, Long, String)].collect().toSeq
    assert(got == Seq(("52A", "52A", 1000L, "ecg"),
      ("61B", "61B", 500L, "spo2")))
    // and the shape feeds the registry upsert directly
    val r = EntityUpserts.upsert("visit_observation_type",
      types.drop("isRealTime").limit(0), types.drop("isRealTime"))
    assert(r.live.count() == 2)
  }

  test("O14 metadata: mapping message unifies the two half-rows") {
    import graft.operators.ObservationTypes
    val types = Seq(
      (100L, null.asInstanceOf[String], "F1", "Heart Rate", 1000L),
      (200L, "I1", null.asInstanceOf[String], null, 1500L),
      (300L, "I9", "F9", "Already Mapped", 500L),
      (400L, "I5", null.asInstanceOf[String], "Epic Only", 800L))
      .toDF("typeId", "interfaceId", "idInApplication", "name",
        "validFromUs")
    val mappings = Seq(
      ("I1", "F1", 3000L),   // unify: 100 absorbs I1, 200 dies
      ("I9", "F9", 3000L),   // already unified → no-op
      ("I5", "F5", 3000L),   // EPIC-only row learns its app id
      ("I7", "F7", 3000L))   // unknown pair → fresh row
      .toDF("interfaceId", "idInApplication", "validFromUs")
    val obs = Seq(("o1", 200L), ("o2", 100L), ("o3", 400L))
      .toDF("obsId", "observationTypeId")

    val u = ObservationTypes.unify(types, mappings, obs)
    val got = u.types.orderBy("typeId")
      .select("typeId", "interfaceId", "idInApplication")
      .as[(Long, Option[String], Option[String])].collect().toSeq
    val freshId = got.map(_._1).filterNot(Seq(100L, 300L, 400L).contains).head
    assert(got == Seq(
      (100L, Some("I1"), Some("F1")),
      (300L, Some("I9"), Some("F9")),
      (400L, Some("I5"), Some("F5")),
      (freshId, Some("I7"), Some("F7"))).sortBy(_._1))

    // observations of the dead EPIC row re-point to the survivor
    val o = u.observations.orderBy("obsId")
      .select("obsId", "observationTypeId")
      .as[(String, Long)].collect().toSeq
    assert(o == Seq(("o1", 100L), ("o2", 100L), ("o3", 400L)))

    // the death is audited with its replacement
    val a = u.audit.select("typeId", "replacedByTypeId")
      .as[(Long, Long)].collect().toSeq
    assert(a == Seq((200L, 100L)))
  }
}
