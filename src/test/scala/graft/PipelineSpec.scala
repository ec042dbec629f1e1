package graft

import org.apache.spark.sql.functions._
import graft.operators.{CascadingDelete, PendingMovements}
import graft.streaming.{DeadLetter, EffectLog, StarPipeline}

import java.nio.file.Files

case class StarMsg(key: Long, ts_us: Long, msg_id: Long, state: String,
                   value: Double)

class PipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("O11: cascading person delete removes only older rows, with audit") {
    val deletes = Seq(("m1", 5000L)).toDF("mrn", "delTimeUs")
    val demo = Seq(("m1", 1000L, "alice"), ("m2", 1000L, "bob"))
      .toDF("mrn", "validFromUs", "name")
    val visits = Seq(("m1", "v1", 1000L), ("m1", "v2", 9000L),
      ("m2", "v3", 1000L)).toDF("mrn", "visitId", "validFromUs")
    val labs = Seq(("v1", 2000L, "ALP"), ("v2", 2000L, "ALB"),
      ("v3", 2000L, "HB")).toDF("visitId", "validFromUs", "test")

    val r = CascadingDelete.person(deletes, demo, visits,
      Map("labs" -> labs))
    assert(r.demographics.live.select("mrn").as[String].collect().toSeq
      == Seq("m2"))
    assert(r.demographics.audit.count() == 1)
    // v2 is NEWER than the delete → survives (F7 newer-only guard)
    assert(r.visits.live.select("visitId").as[String].collect().sorted
      .toSeq == Seq("v2", "v3"))
    // children of deleted visits go; v2's and v3's labs stay
    assert(r.children("labs").live.select("visitId").as[String].collect()
      .sorted.toSeq == Seq("v2", "v3"))
  }

  test("O13: cancel binds to most recent pending within window") {
    val pendings = Seq((10L, "v1", "ICU", 1000L), (11L, "v1", "ICU", 5000L),
      (12L, "v2", "ER", 1000L)).toDF("pendingId", "visitId", "location", "tsUs")
    val cancels = Seq((20L, "v1", "ICU", 6000L), (21L, "v2", "ER", 90000L))
      .toDF("cancelId", "visitId", "location", "tsUs")
    val r = PendingMovements.derive(pendings, cancels, matchWindowUs = 10000L)
      .select("pendingId", "cancelledTsUs").as[(Long, Option[Long])]
      .collect().toMap
    assert(r(11L) == Some(6000L)) // binds to the MOST RECENT pending
    assert(r(10L) == None)        // superseded pending untouched
    assert(r(12L) == None)        // cancel outside the window
  }

  test("S8/W1: streaming star pipeline folds micro-batches into state") {
    implicit val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val stateDir = Files.createTempDirectory("star_state").toString
    val ckpt = Files.createTempDirectory("star_ckpt").toString
    val cfg = StarPipeline.Config(stateDir, Seq("key"), "ts_us", "msg_id",
      Seq("state", "value"))

    val input = MemoryStream[StarMsg](spark)
    val q = StarPipeline.start(input.toDS().toDF(), cfg, ckpt,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    // batch 1 arrives AFTER batch 2's event times (out-of-order, W1)
    input.addData(Seq(StarMsg(1, 2000, 2, "b", 2.0),
      StarMsg(1, 3000, 3, "c", 3.0)))
    q.processAllAvailable(); q.stop()

    val q2 = StarPipeline.start(input.toDS().toDF(), cfg, ckpt,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    input.addData(Seq(StarMsg(1, 1000, 1, "a", 1.0))) // years late, still lands
    q2.processAllAvailable(); q2.stop()

    val live = StarPipeline.readState(spark, cfg, "live").get
      .select("ts_us", "state").as[(Long, String)].collect().toSeq
    assert(live == Seq((3000L, "c")))
    val audit = StarPipeline.readState(spark, cfg, "audit").get
      .orderBy("ts_us").select("ts_us", "valid_until_us")
      .as[(Long, Long)].collect().toSeq
    // late message retro-inserted into history with repaired intervals
    assert(audit == Seq((1000L, 2000L), (2000L, 3000L)))
  }

  test("S8 bucketed fold rewrites only touched buckets (incremental state)") {
    import graft.kernel.BitemporalKernel
    val stateDir = Files.createTempDirectory("star_bucket").toString
    val cfg = StarPipeline.Config(stateDir, Seq("key"), "ts_us", "msg_id",
      Seq("state", "value"), nBuckets = 8)
    val b1 = (1L to 8L).map(k => StarMsg(k, 1000L * k, k, "a", k.toDouble)).toDF()
    StarPipeline.foldBatch(b1, 1L, cfg)
    def bucketDirs(v: String) = new java.io.File(s"$stateDir/data/history/$v")
      .listFiles().filter(_.getName.startsWith("__bucket=")).map(_.getName).toSet
    val v1Before = bucketDirs("v1")

    val b2 = Seq(StarMsg(1L, 500L, 100L, "z", 0.5)).toDF()
    StarPipeline.foldBatch(b2, 2L, cfg)

    // v2 holds exactly the buckets batch 2 touched; v1's files are intact
    val touched = b2.select(pmod(xxhash64(col("key")), lit(8)).cast("string"))
      .distinct().as[String].collect().map("__bucket=" + _).toSet
    assert(bucketDirs("v2") == touched)
    assert(bucketDirs("v1") == v1Before)

    // combined state == from-scratch fold of all messages
    val expect = BitemporalKernel.applyBatch(b1.limit(0), b1.unionByName(b2),
      Seq("key"), "ts_us", "msg_id", Seq("state", "value"))
    val gotLive = StarPipeline.readState(spark, cfg, "live").get
      .orderBy("key").select("key", "ts_us", "state")
      .as[(Long, Long, String)].collect().toSeq
    val expLive = expect.live.orderBy("key").select("key", "ts_us", "state")
      .as[(Long, Long, String)].collect().toSeq
    assert(gotLive == expLive && gotLive.nonEmpty)
  }

  test("S8 JDBC MERGE sink folds to the same state as the manifest sink; " +
    "replayed batches are exact no-ops") {
    import graft.streaming.{JdbcStarSink, ManifestStarSink, StarSink}
    System.setProperty("derby.system.home",
      Files.createTempDirectory("derby_home").toString)
    val jdbc: StarSink = new graft.streaming.JdbcStarSink(
      "jdbc:derby:memory:starsink;create=true", "conditions")
    val manifest: StarSink = ManifestStarSink
    val cfg = StarPipeline.Config(
      Files.createTempDirectory("star_jdbc_ref").toString,
      Seq("key"), "ts_us", "msg_id", Seq("state", "value"), nBuckets = 8)

    // out-of-order arrivals + a no-op payload repeat (F6) + a key that
    // empties later (run coalescing must DELETE its vanished audit row)
    val b1 = Seq(StarMsg(1, 2000, 2, "b", 2.0), StarMsg(1, 3000, 3, "b", 2.0),
      StarMsg(2, 1000, 4, "x", 1.0)).toDF()
    val b2 = Seq(StarMsg(1, 1000, 1, "a", 1.0), // late, retro-inserts
      StarMsg(2, 5000, 5, "y", 9.0)).toDF()
    Seq(jdbc, manifest).foreach { s =>
      s.fold(b1, 1L, cfg); s.fold(b2, 2L, cfg)
    }

    def dump(s: StarSink, t: String) =
      s.read(spark, cfg, t).get
        .select("key", "ts_us", "msg_id", "state", "value")
        .as[(Long, Long, Long, String, Double)].collect().toSeq.sorted
    Seq("history", "live", "audit").foreach { t =>
      assert(dump(jdbc, t) == dump(manifest, t), s"table $t diverged")
    }
    assert(dump(jdbc, "live").nonEmpty)

    // replay of a committed batch: progress mark short-circuits, state
    // unchanged (W2)
    val before = dump(jdbc, "history")
    jdbc.fold(b2, 2L, cfg)
    assert(dump(jdbc, "history") == before)
  }

  test("S8 JDBC sink bitemporal fold == manifest bitemporal fold, " +
    "bit for bit; stage tables see no DDL after the first batch") {
    import graft.streaming.{JdbcStarSink, ManifestStarSink, StarSink}
    System.setProperty("derby.system.home",
      Files.createTempDirectory("derby_home_bt").toString)
    val jdbc: StarSink = new graft.streaming.JdbcStarSink(
      "jdbc:derby:memory:starsinkbt;create=true", "conditions")
    val manifest: StarSink = ManifestStarSink
    val cfg = StarPipeline.Config(
      Files.createTempDirectory("star_jdbc_bt").toString,
      Seq("key"), "ts_us", "msg_id", Seq("state", "value"), nBuckets = 8,
      storedFromUsCol = "stored_us")

    // the q70 shape: out-of-order valid times across batches, so the
    // stored axis must close batch-1 records when batch 2's late
    // arrivals rewrite valid-time history (incl. an F6 no-op repeat
    // that must cause no stored churn)
    def batch(b: Long) = ((1L to 6L).map { k =>
      StarMsg(k, 1000L * ((b * 3 + k) % 7 + 1), b * 100 + k,
        s"s$b", b.toDouble)
    } :+ StarMsg(1L, 500L * b, 900 + b, "x", 0.5)).toDF()
      .withColumn("stored_us", lit(b))

    (1L to 3L).foreach { b =>
      jdbc.foldBitemporal(batch(b), b, cfg)
      manifest.foldBitemporal(batch(b), b, cfg)
    }

    def snap(s: StarSink, t: String) = s.read(spark, cfg, t).get
      .select("key", "ts_us", "msg_id", "state", "value",
        "valid_until_us", "stored_from_us", "stored_until_us")
      .as[(Long, Long, Long, String, Double, Option[Long], Option[Long],
        Option[Long])].collect().toSeq.sorted
    assert(snap(jdbc, "bt_table") == snap(manifest, "bt_table"),
      "bt_table diverged between sinks")
    assert(snap(jdbc, "bt_table").nonEmpty)
    def msgs(s: StarSink) = s.read(spark, cfg, "bt_messages").get
      .select("key", "ts_us", "msg_id", "state", "value")
      .as[(Long, Long, Long, String, Double)].collect().toSeq.sorted
    assert(msgs(jdbc) == msgs(manifest), "bt_messages diverged")

    // replay of a committed batch: progress mark short-circuits (W2)
    val before = snap(jdbc, "bt_table")
    jdbc.foldBitemporal(batch(2), 2L, cfg)
    assert(snap(jdbc, "bt_table") == before)

    // staging hygiene: Derby assigns a fresh TABLEID on CREATE, so a
    // DROP/CREATE-per-batch stage write would change it between folds.
    // It must be stable from the first batch onward (truncate+append).
    def stageIds(): Map[String, String] = {
      val c = java.sql.DriverManager
        .getConnection("jdbc:derby:memory:starsinkbt")
      try {
        val rs = c.createStatement().executeQuery(
          """SELECT TABLENAME, TABLEID FROM SYS.SYSTABLES
            |WHERE TABLENAME LIKE '%_STAGE'""".stripMargin)
        val b = Map.newBuilder[String, String]
        while (rs.next()) b += rs.getString(1) -> rs.getString(2)
        b.result()
      } finally c.close()
    }
    val idsBefore = stageIds()
    assert(idsBefore.keySet.exists(_.contains("BT_TABLE")))
    jdbc.foldBitemporal(batch(4), 4L, cfg)
    assert(stageIds() == idsBefore,
      "stage tables were re-created (DDL per batch) instead of truncated")
  }

  test("W6 compaction: cold split preserves history, folds stay identical") {
    def mkDir() = Files.createTempDirectory("star_compact").toString
    val dirA = mkDir(); val dirB = mkDir()
    val cfgA = StarPipeline.Config(dirA, Seq("key"), "ts_us", "msg_id",
      Seq("state", "value"), nBuckets = 8)
    val cfgB = cfgA.copy(stateDir = dirB)

    // two folds build up closed versions (1000→2000→3000 per key)
    val b1 = (1L to 6L).map(k => StarMsg(k, 1000L, k, "a", 1.0)).toDF()
    val b2 = (1L to 6L).flatMap(k => Seq(
      StarMsg(k, 2000L, 10 + k, "b", 2.0),
      StarMsg(k, 3000L, 20 + k, "c", 3.0))).toDF()
    Seq(cfgA, cfgB).foreach { c =>
      StarPipeline.foldBatch(b1, 1L, c)
      StarPipeline.foldBatch(b2, 2L, c)
    }

    // compact A at horizon 2500: versions closed before 2500 go cold
    StarPipeline.compact(spark, cfgA, horizonUs = 2500L, batchId = 3L)
    assert(StarPipeline.compactionHorizon(cfgA).contains(2500L))

    // hot ∪ cold == the uncompacted history, row for row
    def hist(c: StarPipeline.Config, full: Boolean) =
      (if (full) StarPipeline.readFull(spark, c, "history")
       else StarPipeline.readState(spark, c, "history")).get
        .orderBy("key", "ts_us")
        .select("key", "ts_us", "state")
        .as[(Long, Long, String)].collect().toSeq
    assert(hist(cfgA, full = true) == hist(cfgB, full = false))
    // and the hot side really shrank (closed-before-horizon rows left)
    assert(hist(cfgA, full = false).size < hist(cfgB, full = false).size)
    // exactly the 1000-versions are cold (their successor is at 2000 < H)
    val coldRows = StarPipeline.readState(spark, cfgA, "history.cold").get
    assert(coldRows.count() == 6 &&
      coldRows.select(max(col("ts_us"))).as[Long].collect().head == 1000L)

    // a post-horizon fold produces identical state on both paths
    val b3 = (1L to 6L).map(k => StarMsg(k, 4000L, 30 + k, "d", 4.0)).toDF()
    StarPipeline.foldBatch(b3, 4L, cfgA)
    StarPipeline.foldBatch(b3, 4L, cfgB)
    assert(hist(cfgA, full = true) == hist(cfgB, full = false))
    def live(c: StarPipeline.Config) =
      StarPipeline.readState(spark, c, "live").get
        .orderBy("key").select("key", "ts_us", "state")
        .as[(Long, Long, String)].collect().toSeq
    assert(live(cfgA) == live(cfgB) && live(cfgA).size == 6)

    // cold entries are carried by reference across folds and compactions
    val before = new java.io.File(s"$dirA/data/history.cold/v3")
      .listFiles().map(f => f.getName -> f.lastModified).toMap
    StarPipeline.compact(spark, cfgA, horizonUs = 2500L, batchId = 5L)
    val after = new java.io.File(s"$dirA/data/history.cold/v3")
      .listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(after == before)
    assert(hist(cfgA, full = true) == hist(cfgB, full = false))

    // late arrivals (validFrom < horizon) split to the slow path
    val mixed = Seq(StarMsg(1L, 2400L, 99L, "late", 0.0),
      StarMsg(2L, 5000L, 98L, "ok", 5.0)).toDF()
    val (ok, late) = StarPipeline.lateSplit(mixed, cfgA)
    assert(ok.select("key").as[Long].collect().toSeq == Seq(2L))
    assert(late.select("key").as[Long].collect().toSeq == Seq(1L))
    // no horizon (dirB) → nothing splits late
    val (okB, lateB) = StarPipeline.lateSplit(mixed, cfgB)
    assert(okB.count() == 2 && lateB.count() == 0)

    // repairLate: the pre-horizon arrival folds over hot ∪ cold of its
    // bucket and lands exactly where arrival-order processing would put
    // it; only that bucket un-compacts
    val lateMsg = Seq(StarMsg(1L, 1500L, 97L, "lateX", 1.5)).toDF()
    StarPipeline.repairLate(lateMsg, 6L, cfgA)
    StarPipeline.foldBatch(lateMsg, 6L, cfgB)
    assert(hist(cfgA, full = true) == hist(cfgB, full = false))
    assert(live(cfgA) == live(cfgB))
    val keyBucket = (k: Long) => Seq(k).toDF("key")
      .select(pmod(xxhash64(col("key")), lit(8))).as[Long].head()
    val sharedBucket = (1L to 6L).filter(k => keyBucket(k) == keyBucket(1L))
    val coldLeft = StarPipeline.readState(spark, cfgA, "history.cold").get
    assert(coldLeft.filter(col("key").isin(sharedBucket: _*)).count() == 0)
    assert(coldLeft.count() == 6 - sharedBucket.size)
  }

  test("bitemporal fold: persisted stored axis == in-memory kernel fold, " +
      "survives restart, replay, compaction, and late arrivals") {
    import graft.kernel.BitemporalKernel
    val dir = Files.createTempDirectory("star_bt").toString
    val mk = () => StarPipeline.Config(dir, Seq("key"), "ts_us", "msg_id",
      Seq("state", "value"), nBuckets = 8, storedFromUsCol = "stored_us")
    val cfg = mk()

    // out-of-order stream: batch 2 carries ts BEFORE batch 1's (late in
    // valid time), so the stored axis must close batch-1 records
    def batch(b: Long) = ((1L to 6L).map { k =>
      StarMsg(k, 1000L * ((b * 3 + k) % 7 + 1), b * 100 + k,
        s"s$b", b.toDouble)
    } :+ StarMsg(1L, 500L * b, 900 + b, "x", 0.5)).toDF()
      .withColumn("stored_us", lit(b))

    (1L to 3L).foreach(b => StarPipeline.foldBatchBitemporal(batch(b), b, cfg))
    // "restart": a fresh Config instance — all state must come off disk
    StarPipeline.foldBatchBitemporal(batch(4), 4L, mk())

    // expected: the in-memory kernel fold of the same four batches
    val expected = (1L to 4L).foldLeft(BitemporalKernel.emptyBitemporal(
        batch(1), Seq("key"), "ts_us", "msg_id", Seq("state", "value"))) {
      (acc, b) =>
        val next = BitemporalKernel.applyBitemporal(acc, batch(b),
          Seq("key"), "ts_us", "msg_id", "stored_us", Seq("state", "value"))
        BitemporalKernel.BitemporalState(
          next.messages.localCheckpoint(), next.table.localCheckpoint())
    }
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select("key", "ts_us", "msg_id", "state", "value",
        "valid_until_us", "stored_from_us", "stored_until_us")
      .as[(Long, Long, Long, String, Double, Option[Long], Option[Long],
        Option[Long])].collect().toSeq.sorted
    assert(snap(StarPipeline.readBitemporal(spark, cfg).get) ==
      snap(expected.table))

    // W2 replay: re-folding batch 3 is a no-op on BOTH axes
    StarPipeline.foldBatchBitemporal(batch(3), 5L, cfg)
    assert(snap(StarPipeline.readBitemporal(spark, cfg).get) ==
      snap(expected.table))

    // compaction: archive stored-closed + valid-frozen rows, then prove
    // a post-horizon fold matches an uncompacted twin
    val dirB = Files.createTempDirectory("star_bt_b").toString
    val cfgB = cfg.copy(stateDir = dirB)
    (1L to 4L).foreach(b => StarPipeline.foldBatchBitemporal(batch(b), b, cfgB))
    StarPipeline.compactBitemporal(spark, cfg, horizonUs = 5000L, batchId = 6L)
    assert(StarPipeline.readState(spark, cfg, "bt_table").get.count() <
      StarPipeline.readState(spark, cfgB, "bt_table").get.count())
    assert(snap(StarPipeline.readBitemporal(spark, cfg).get) ==
      snap(StarPipeline.readBitemporal(spark, cfgB).get))

    val b5 = Seq(StarMsg(2L, 6000L, 777L, "post", 9.0)).toDF()
      .withColumn("stored_us", lit(5L))
    StarPipeline.foldBatchBitemporal(b5, 7L, cfg)
    StarPipeline.foldBatchBitemporal(b5, 7L, cfgB)
    assert(snap(StarPipeline.readBitemporal(spark, cfg).get) ==
      snap(StarPipeline.readBitemporal(spark, cfgB).get))

    // late arrival BELOW the horizon: folds without an explicit
    // lateSplit — its bucket un-compacts and the result still matches
    val late = Seq(StarMsg(3L, 1500L, 888L, "late", 1.5)).toDF()
      .withColumn("stored_us", lit(6L))
    StarPipeline.foldBatchBitemporal(late, 8L, cfg)
    StarPipeline.foldBatchBitemporal(late, 8L, cfgB)
    assert(snap(StarPipeline.readBitemporal(spark, cfg).get) ==
      snap(StarPipeline.readBitemporal(spark, cfgB).get))

    // stored-time travel over the PERSISTED table: belief at S=2 only
    // contains records stored at or before batch 2
    import graft.functions.GraftFunctions.storedAsOf
    val belief2 = StarPipeline.readBitemporal(spark, cfg).get
      .filter(storedAsOf(lit(2L), col("stored_from_us"),
        col("stored_until_us")))
    assert(belief2.count() > 0)
    assert(belief2.select(max(col("stored_from_us"))).as[Long].head() <= 2L)
  }

  test("end-to-end stream: raw HL7 wire → parse → bucketed star fold") {
    implicit val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def adt(trigger: String, id: Long, dtm: String, loc: String) = Seq(
      s"MSH|^~\\&|EPIC|UCLH|||$dtm||ADT^$trigger|M$id|P|2.4",
      "PID|1||40800000^^^MRN^MRN",
      (Seq("PV1", "1", "I", loc) ++ Seq.fill(15)("") :+ "V1").mkString("|")
    ).mkString("\r")

    val stateDir = Files.createTempDirectory("hl7_star").toString
    val ckpt = Files.createTempDirectory("hl7_ckpt").toString
    val cfg = StarPipeline.Config(stateDir, Seq("mrn"), "ts_us", "msg_id",
      Seq("patientClass", "location"), nBuckets = 4)

    val deadDir = Files.createTempDirectory("hl7_dead").toString
    val input = MemoryStream[String](spark)
    def start() = {
      val parsed = graft.sources.Hl7Wire.parseAdt(
        input.toDS().toDF("value"), "value")
      StarPipeline.startWithDeadLetter(parsed, DeadLetter.adtRules,
        clean => clean.select(col("mrn"),
          col("validFromUs").as("ts_us"),
          regexp_extract(col("sourceMessageId"), "^M(\\d+)$", 1).cast("long")
            .as("msg_id"),
          col("patientClass"), col("fullLocationString").as("location")),
        cfg, deadDir, ckpt,
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
    }

    val q = start()
    input.addData(Seq(adt("A01", 2, "20240101100000", "W1"),
      adt("A02", 3, "20240101110000", "W2"),
      "GARBAGE frame"))
    q.processAllAvailable(); q.stop()

    // late batch: an earlier-in-valid-time update lands after
    val q2 = start()
    input.addData(Seq(adt("A08", 1, "20240101090000", "W0")))
    q2.processAllAvailable(); q2.stop()

    val live = StarPipeline.readState(spark, cfg, "live").get
      .select("mrn", "location").as[(String, String)].collect().toSeq
    assert(live == Seq(("40800000", "W2"))) // newest valid-time wins
    val audit = StarPipeline.readState(spark, cfg, "audit").get
      .orderBy("ts_us").select("location", "valid_until_us")
      .as[(String, Long)].collect().toSeq
    // late 09:00 row retro-inserted and closed by the 10:00 admit
    assert(audit.map(_._1) == Seq("W0", "W1"))
    // the nacked frame is persisted with its reason, not dropped
    val dead = spark.read.parquet(s"$deadDir/batch=0")
      .select("value", "reason").as[(String, String)].collect().toSeq
    assert(dead == Seq(("GARBAGE frame", "unroutable")))
  }

  test("S7: effect log captures per-batch progress") {
    implicit val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val log = new EffectLog().attach(spark)
    val input = MemoryStream[StarMsg](spark)
    val q = input.toDS().writeStream.format("memory")
      .queryName("fx_out").outputMode("append").start()
    input.addData(Seq(StarMsg(1, 1, 1, "a", 1.0), StarMsg(2, 2, 2, "b", 2.0)))
    q.processAllAvailable(); q.stop()
    // listener events are async — wait briefly
    var tries = 0
    while (log.toDF(spark).count() == 0 && tries < 50) {
      Thread.sleep(100); tries += 1
    }
    val rows = log.toDF(spark)
    assert(rows.count() >= 1)
    assert(rows.agg(sum("numInputRows")).as[Long].head() >= 2L)
  }
}
