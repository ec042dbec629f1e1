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

  test("O3 deleteIfNewer removes only strictly-newer-deleted keys") {
    val liveDf = Seq(Msg(1, 100, 1, "a", 1.0), Msg(2, 500, 2, "b", 2.0)).toDF
    val delDf = Seq((1L, 200L), (2L, 400L)).toDF("key", "ts_us")
    val r = BitemporalKernel.deleteIfNewer(liveDf, delDf, Seq("key"), "ts_us")
    assert(r.live.select("key").as[Long].collect().toSeq == Seq(2L))
    assert(r.audit.select("key", "valid_until_us").as[(Long, Long)]
      .collect().toSeq == Seq((1L, 200L)))
  }
}
