package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.kernel.BitemporalKernel

import scala.util.Random

/** The reference's crown-jewel property (SURVEY.md §5.3): processing the
  * same messages in ANY batch split / order converges to the same final
  * state and audit history (ref: core OrderPermutationBase,
  * LocationPermutationTestProducer.checkFinalState).
  */
case class KernelMsg(key: Long, ts_us: Long, msg_id: Long,
                     state: String, value: Double)

class KernelSpec extends SparkSpecBase {
  import spark.implicits._

  private type Msg = KernelMsg
  private def Msg(key: Long, ts_us: Long, msg_id: Long, state: String,
                  value: Double): KernelMsg =
    KernelMsg(key, ts_us, msg_id, state, value)

  private def msgs: Seq[Msg] = {
    val rnd = new Random(7)
    for {
      k <- 0L until 5L
      i <- 0 until 8
    } yield Msg(k, 1000L * (i + 1), k * 100 + i,
      s"s${rnd.nextInt(3)}", rnd.nextInt(5).toDouble)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Carry KernelResult.history between batches — the canonical-audit
    * mode of the kernel (see BitemporalKernel docs).
    */
  private def runBatches(batches: Seq[Seq[Msg]]): (Seq[String], Seq[String]) = {
    var history = spark.emptyDataset[Msg].toDF
    var result = BitemporalKernel.KernelResult(history, history, history)
    for (b <- batches) {
      result = BitemporalKernel.applyBatch(history, b.toDF(),
        Seq("key"), "ts_us", "msg_id", Seq("state", "value"))
      history = result.history.cache()
    }
    (canon(result.live), canon(result.audit.select("key", "ts_us", "msg_id",
      "state", "value", "valid_until_us")))
  }

  test("permutation + batch-split invariance") {
    val all = msgs
    val (refLive, refAudit) = runBatches(Seq(all))
    val rnd = new Random(13)
    for (trial <- 1 to 4) {
      val shuffled = rnd.shuffle(all)
      val nSplits = 1 + rnd.nextInt(4)
      val batches = shuffled.grouped(
        math.max(1, shuffled.size / nSplits)).toSeq
      val (live, audit) = runBatches(batches)
      assert(live == refLive, s"live state diverged on trial $trial")
      assert(audit == refAudit, s"audit diverged on trial $trial")
    }
  }

  test("F6: duplicate replay is a no-op") {
    val all = msgs
    val (refLive, refAudit) = runBatches(Seq(all))
    val (live, audit) = runBatches(Seq(all, all)) // replay everything
    assert(live == refLive)
    assert(audit == refAudit)
  }

  test("audit closes intervals with successor validFrom") {
    val m = Seq(
      Msg(1, 100, 1, "a", 1.0), Msg(1, 200, 2, "b", 2.0),
      Msg(1, 300, 3, "c", 3.0))
    val r = BitemporalKernel.applyBatch(spark.emptyDataset[Msg].toDF, m.toDF(),
      Seq("key"), "ts_us", "msg_id", Seq("state", "value"))
    val audit = r.audit.orderBy("ts_us")
      .select("ts_us", "valid_until_us").as[(Long, Long)].collect()
    assert(audit.toSeq == Seq((100L, 200L), (200L, 300L)))
    assert(r.live.select("ts_us").as[Long].collect().toSeq == Seq(300L))
  }

  // ---------------- stored-time axis (true bitemporality) ----------------

  private def foldStored(batches: Seq[(Long, Seq[Msg])]) = {
    val schema = spark.emptyDataset[Msg].toDF
      .withColumn("stored_us", lit(0L))
    batches.foldLeft(BitemporalKernel.emptyBitemporal(schema,
        Seq("key"), "ts_us", "msg_id", Seq("state", "value"))) {
      case (acc, (stamp, b)) =>
        val next = BitemporalKernel.applyBitemporal(acc,
          b.toDF().withColumn("stored_us", lit(stamp)),
          Seq("key"), "ts_us", "msg_id", "stored_us", Seq("state", "value"))
        // localCheckpoint (not cache): truncates the logical plan so N
        // chained folds don't compound into an exponential Catalyst tree.
        BitemporalKernel.BitemporalState(
          next.messages.localCheckpoint(), next.table.localCheckpoint())
    }
  }

  private def beliefAt(table: DataFrame, s: Long): Seq[String] =
    canon(table
      .filter(col("stored_from_us") <= s &&
        (col("stored_until_us").isNull || col("stored_until_us") > s))
      .select("key", "ts_us", "msg_id", "state", "value", "valid_until_us"))

  test("stored axis: late arrival rewrites valid-time, never stored-time") {
    val b1 = Seq(Msg(1, 100, 1, "a", 1.0), Msg(1, 300, 3, "c", 3.0))
    val lateB2 = Seq(Msg(1, 200, 2, "b", 2.0)) // valid-time middle, stored later
    val after1 = foldStored(Seq((10L, b1)))
    val after2 = foldStored(Seq((10L, b1), (20L, lateB2)))

    // Belief at stored=10 is IDENTICAL whether or not the late batch ran:
    // stored-time history is append/close-only.
    assert(beliefAt(after2.table, 10L) == beliefAt(after1.table, 10L))

    // Belief at stored=20 contains the repaired valid-time history.
    val now = after2.table
      .filter(col("stored_until_us").isNull)
      .orderBy("ts_us")
      .select("ts_us", "valid_until_us").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(now.toSeq == Seq((100L, 200L), (200L, 300L), (300L, -1L)))

    // The superseded record (100 → until 300) is stored-closed at 20.
    val closedRec = after2.table
      .filter(col("stored_until_us").isNotNull).collect()
    assert(closedRec.length == 1)
    val c = closedRec.head
    assert(c.getAs[Long]("ts_us") == 100L &&
      c.getAs[Long]("valid_until_us") == 300L &&
      c.getAs[Long]("stored_from_us") == 10L &&
      c.getAs[Long]("stored_until_us") == 20L)
  }

  test("stored axis: no-op update causes no stored churn") {
    val b1 = Seq(Msg(1, 100, 1, "a", 1.0))
    val replay = Seq(Msg(1, 100, 1, "a", 1.0))
    val st = foldStored(Seq((10L, b1), (20L, replay)))
    val rows = st.table.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("stored_from_us") == 10L)
    assert(rows.head.isNullAt(rows.head.fieldIndex("stored_until_us")))
  }

  test("stored axis: per-batch fold equals per-message fold") {
    // 12 messages, not all 40: each serial fold is an eager checkpoint
    // (several Spark jobs); the property is size-independent.
    val rnd = new Random(23)
    val shuffled = rnd.shuffle(msgs).take(12)
    // one batch per message (serial replay — reference granularity)
    val serial = foldStored(shuffled.zipWithIndex.map {
      case (m, i) => (100L + i, Seq(m))
    })
    // final belief must equal the all-in-one-batch fold's belief
    val bulk = foldStored(Seq((1000L, shuffled)))
    assert(beliefAt(serial.table, Long.MaxValue) ==
      beliefAt(bulk.table, Long.MaxValue))
  }

  test("O3 deleteIfNewer removes only strictly-newer-deleted keys") {
    val liveDf = Seq(Msg(1, 100, 1, "a", 1.0), Msg(2, 500, 2, "b", 2.0)).toDF
    val delDf = Seq((1L, 200L), (2L, 400L)).toDF("key", "ts_us")
    val r = BitemporalKernel.deleteIfNewer(liveDf, delDf, Seq("key"), "ts_us")
    assert(r.live.select("key").as[Long].collect().toSeq == Seq(2L))
    assert(r.audit.select("key", "valid_until_us").as[(Long, Long)]
      .collect().toSeq == Seq((1L, 200L)))
  }
}
