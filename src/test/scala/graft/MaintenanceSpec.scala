package graft

import org.apache.spark.sql.functions._
import graft.kernel.TriStateFold
import graft.streaming.{Maintenance, WaveformCollator}
import graft.sources.WaveformGenerator

case class TsMsg(key: Long, ts_us: Long, msg_id: Long,
                 name: IV, city: IV)
case class IV(value: String, status: String)

class MaintenanceSpec extends SparkSpecBase {
  import spark.implicits._

  test("F5-F8: tri-state fold materializes SAVE/DELETE/IGNORE per field") {
    val msgs = Seq(
      TsMsg(1, 100, 1, IV("alice", "SAVE"), IV("london", "SAVE")),
      TsMsg(1, 200, 2, IV(null, "IGNORE"), IV("paris", "SAVE")),
      TsMsg(1, 300, 3, IV(null, "DELETE"), IV(null, "IGNORE")),
      TsMsg(1, 400, 4, IV(null, "IGNORE"), IV(null, "IGNORE"))).toDS().toDF()
    val folded = TriStateFold.foldFields(msgs, Seq("key"), "ts_us",
      "msg_id", Seq("name", "city"))
      .orderBy("ts_us").select("name", "city")
      .as[(Option[String], Option[String])].collect().toSeq
    assert(folded == Seq(
      (Some("alice"), Some("london")),
      (Some("alice"), Some("paris")),   // IGNORE keeps, SAVE overwrites
      (None, Some("paris")),            // DELETE nulls, IGNORE keeps
      (None, Some("paris"))))           // all-IGNORE: unchanged

    val r = TriStateFold.applyTriState(msgs, Seq("key"), "ts_us", "msg_id",
      Seq("name", "city"))
    // the all-IGNORE message materializes identically → F6 coalesces it:
    // 3 real versions, live is the DELETE-applied one at ts 300
    assert(r.live.select("ts_us").as[Long].head() == 300L)
    assert(r.audit.count() == 2)
  }

  test("S9: retention keeps only rows within window of newest observation") {
    val rows = Seq((1L, 0L), (2L, 5000L), (3L, 9000L), (4L, 10000L))
      .toDF("id", "obs_us")
    val kept = Maintenance.retain(rows, col("obs_us"), retentionUs = 4000L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(3L, 4L)) // cutoff = 10000 - 4000 = 6000
  }

  test("A4/A8: waveform gap audit is clean for collated sine stream") {
    implicit val s = spark
    val msgs = WaveformGenerator.messages(spark, nLocations = 2, rateHz = 300,
      seconds = 30, samplesPerMsg = 40)
      .as[WaveformCollator.WaveMsg]
    val chunks = WaveformCollator.collateBatch(msgs).toDF()
    assert(chunks.count() > 0)
    assert(Maintenance.waveformGapAudit(chunks).count() == 0)
    // inject a gap → audit flags exactly that stream position
    val shifted = chunks.withColumn("obsTimeUs",
      when(col("obsTimeUs") > 15_000_000L,
        col("obsTimeUs") + 50_000L).otherwise(col("obsTimeUs")))
    assert(Maintenance.waveformGapAudit(shifted).count() == 2) // one per loc
  }

  test("O15: orphan repair attaches chunks to enclosing visits via J5") {
    val chunks = Seq(
      ("LOC1", "300hz", 5000L, null.asInstanceOf[String]),
      ("LOC1", "300hz", 99999L, null.asInstanceOf[String]),
      ("LOC2", "300hz", 5000L, "vKnown"))
      .toDF("locationId", "streamId", "obsTimeUs", "visitId")
    val visits = Seq(("LOC1", "v9", 0L, Some(10000L)))
      .toDF("location", "visitId", "admissionUs", "dischargeUs")
    val repaired = Maintenance.repairOrphans(chunks, visits)
    val m = repaired.select("locationId", "obsTimeUs", "visitId")
      .as[(String, Long, Option[String])].collect()
      .map { case (l, t, v) => (l, t) -> v }.toMap
    assert(m(("LOC1", 5000L)) == Some("v9"))
    assert(m(("LOC1", 99999L)).isEmpty) // outside interval: stays orphan
    assert(m(("LOC2", 5000L)) == Some("vKnown"))
    assert(Maintenance.orphanAudit(repaired, "visitId").count() == 1)
  }

  test("W5: priority union tags live before backfill") {
    val live = Seq((1L, "x")).toDF("id", "v")
    val bf = Seq((2L, "y")).toDF("id", "v")
    val u = Maintenance.priorityUnion(live, bf)
      .orderBy("__priority").select("id").as[Long].collect().toSeq
    assert(u == Seq(1L, 2L))
  }
}
