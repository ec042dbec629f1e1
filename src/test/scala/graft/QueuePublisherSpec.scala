package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{ConfirmTransport, QueuePublisher}
import java.util.concurrent.CountDownLatch

/** S3 publisher-confirm semantics (ref Publisher.java): bounded
  * in-transit window, bounded waiting batches, duplicate-batch drop,
  * batch-complete callback, nack → halt + delayed resend + full-window
  * recovery.
  */
class QueuePublisherSpec extends AnyFunSuite {

  private class FakeTransport extends ConfirmTransport[String] {
    val sent = new java.util.concurrent.CopyOnWriteArrayList[(String, String)]()
    def send(frame: String, correlationData: String): Unit =
      sent.add((frame, correlationData))
  }

  private def awaitUntil(timeoutMs: Long = 5000)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(5)
    cond
  }

  test("in-transit window: at most maxInTransit unconfirmed frames") {
    val tr = new FakeTransport
    val pub = new QueuePublisher[String](tr, maxBatches = 2, maxInTransit = 3)
    val done = new CountDownLatch(1)
    val frames = (0 until 10).map(i => (s"f$i", s"c$i"))
    assert(pub.submit(frames, "b1", () => done.countDown()))

    assert(awaitUntil()(tr.sent.size == 3))
    Thread.sleep(50) // no further sends without acks
    assert(tr.sent.size == 3 && pub.inTransit == 3)

    // each ack admits exactly one more frame until the batch drains
    var acked = 0
    while (acked < 10) {
      val (_, corr) = tr.sent.get(acked)
      pub.ack(corr); acked += 1
      val expect = math.min(10, acked + 3)
      assert(awaitUntil()(tr.sent.size == expect),
        s"after $acked acks expected $expect sends, saw ${tr.sent.size}")
    }
    assert(done.await(5, java.util.concurrent.TimeUnit.SECONDS),
      "batch callback must fire after the last confirm")
    assert(tr.sent.asScala.map(_._1).toSeq == frames.map(_._1),
      "frames delivered exactly once, in order")
    pub.shutdown()
  }

  test("batch validation: empty batch and duplicate correlationIds throw") {
    val tr = new FakeTransport
    val pub = new QueuePublisher[String](tr, maxBatches = 2, maxInTransit = 1)
    // ref MessageBatch.java ctor: an empty batch would wedge its batchId
    // forever (no frame → no confirm → callback never fires)
    intercept[IllegalArgumentException] { pub.submit(Seq.empty, "empty") }
    // duplicate correlationIds overwrite in the waiting map, reopening
    // the in-transit window before every frame is confirmed
    intercept[IllegalArgumentException] {
      pub.submit(Seq(("a", "c1"), ("b", "c1")), "dup-corr")
    }
    // neither rejected submit may leave state behind: the ids stay usable
    assert(pub.submit(Seq(("x", "c1")), "empty"))
    assert(awaitUntil()(tr.sent.size == 1))
    pub.ack("c1:empty")
    pub.shutdown()
  }

  test("duplicate batchId in progress is dropped") {
    val tr = new FakeTransport
    val pub = new QueuePublisher[String](tr, maxBatches = 2, maxInTransit = 1)
    assert(pub.submit(Seq(("x", "c1")), "dup"))
    assert(awaitUntil()(tr.sent.size == 1))
    assert(!pub.submit(Seq(("x2", "c2")), "dup"), "in-progress batchId must drop")
    pub.ack("c1:dup")
    Thread.sleep(50)
    assert(tr.sent.size == 1)
    pub.shutdown()
  }

  test("nack halts new sends, resends after delay, recovery reopens window") {
    val tr = new FakeTransport
    val pub = new QueuePublisher[String](tr, maxBatches = 2, maxInTransit = 2,
      initialDelayMs = 20L)
    pub.submit((0 until 5).map(i => (s"f$i", s"c$i")), "b1")
    assert(awaitUntil()(tr.sent.size == 2))

    pub.nack("c0:b1") // broker refuses f0
    // resend of f0 arrives (delayed), but NO new frame (f2) is admitted
    assert(awaitUntil()(tr.sent.size == 3))
    assert(tr.sent.get(2) == (("f0", "c0:b1")), "third send must be the retry")
    Thread.sleep(60)
    assert(tr.sent.size == 3, "no new frames while a nack is outstanding")

    // confirm the in-transit frame; window stays shut until ALL drain
    pub.ack("c1:b1")
    Thread.sleep(60)
    assert(tr.sent.size == 3)

    // confirming the retry drains the waiting map → full window reopens
    pub.ack("c0:b1")
    assert(awaitUntil()(tr.sent.size == 5), "recovery must release the window")
    // drain the rest: ack every send as it arrives (f4 follows once f2/f3
    // confirm) until all 5 frames + 1 retry are through
    var ackedIdx = 3
    while (ackedIdx < 6) {
      assert(awaitUntil()(tr.sent.size > ackedIdx))
      pub.ack(tr.sent.get(ackedIdx)._2); ackedIdx += 1
    }
    assert(awaitUntil()(pub.inTransit == 0))
    pub.shutdown()
  }

  test("bounded waiting batches: submit blocks at maxBatches") {
    val tr = new FakeTransport
    val pub = new QueuePublisher[String](tr, maxBatches = 1, maxInTransit = 1)
    pub.submit(Seq(("a", "ca")), "b1") // sent; b1 unconfirmed
    assert(awaitUntil()(tr.sent.size == 1))
    // b2 is taken by the publisher thread (blocked on the in-transit
    // window), so the waiting queue is empty again; b3 fills it; b4 must
    // block in submit — maxBatches bounds batches QUEUED BEHIND the one
    // in the publisher's hands, exactly like the reference's
    // ArrayBlockingQueue(maxBatches).
    pub.submit(Seq(("b", "cb")), "b2")
    pub.submit(Seq(("c", "cc")), "b3")
    val submitted = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => { pub.submit(Seq(("d", "cd")), "b4"); submitted.set(true) })
    t.start()
    Thread.sleep(100)
    assert(!submitted.get, "fourth batch must block while the queue is full")
    pub.ack("ca:b1") // b2 sends → thread takes b3 → b4 fits in the queue
    assert(awaitUntil()(submitted.get))
    pub.ack("cb:b2")
    pub.ack("cc:b3")
    assert(awaitUntil()(tr.sent.size >= 4))
    pub.ack("cd:b4")
    pub.shutdown()
  }

  test("retry backoff doubles after a full window of nacks, capped, and " +
      "resets on recovery") {
    val sendTimes = new java.util.concurrent.CopyOnWriteArrayList[(String, Long)]()
    @volatile var pubRef: QueuePublisher[String] = null
    val refuse = new java.util.concurrent.atomic.AtomicInteger(0)
    // refuse the first 3 deliveries of f0, then accept everything
    val refuse9 = new java.util.concurrent.atomic.AtomicBoolean(true)
    val tr = new ConfirmTransport[String] {
      def send(frame: String, corr: String): Unit = {
        sendTimes.add((corr, System.nanoTime()))
        if (corr.startsWith("c0:") && refuse.getAndIncrement() < 3) pubRef.nack(corr)
        else if (corr.startsWith("c9:") && refuse9.getAndSet(false)) pubRef.nack(corr)
        else pubRef.ack(corr)
      }
    }
    // maxInTransit=1 → each nack completes "a full window at this
    // delay", so the delay doubles for SUBSEQUENT retries (reference
    // semantics: the schedule uses the pre-update delay): 40, 40, 80 ms
    val pub = new QueuePublisher[String](tr, maxBatches = 2, maxInTransit = 1,
      initialDelayMs = 60L, maximumDelayMs = 100000L)
    pubRef = pub
    val done = new CountDownLatch(1)
    pub.submit(Seq(("f0", "c0"), ("f1", "c1")), "b1", () => done.countDown())
    assert(done.await(10, java.util.concurrent.TimeUnit.SECONDS))

    val f0 = sendTimes.asScala.filter(_._1 == "c0:b1").map(_._2)
    assert(f0.size == 4, s"f0 must be sent 1 + 3 retries, saw ${f0.size}")
    val gaps = f0.sliding(2).map { case Seq(a, b) => (b - a) / 1000000L }.toSeq
    assert(gaps(0) >= 60 && gaps(1) >= 60 && gaps(2) >= 120,
      s"backoff must escalate 60/60/120: $gaps")
    // recovery reset: the successful ack of f0's last retry reset the
    // delay, so a FRESH failure (c9, nacked once) retries after the
    // INITIAL delay again, not the escalated one
    val done2 = new CountDownLatch(1)
    pub.submit(Seq(("f9", "c9")), "b2", () => done2.countDown())
    assert(done2.await(10, java.util.concurrent.TimeUnit.SECONDS))
    val f9 = sendTimes.asScala.filter(_._1 == "c9:b2").map(_._2)
    assert(f9.size == 2, s"f9 must be sent once + one retry, saw ${f9.size}")
    val gap9 = (f9(1) - f9(0)) / 1000000L
    // without the reset the next scheduled delay would be 240ms (the
    // escalation had reached 60→120→240); < 240 discriminates while
    // leaving 180ms of slack for a loaded scheduler firing the 60ms
    // retry late
    assert(gap9 >= 60 && gap9 < 240,
      s"delay must reset to the initial 60ms after recovery, saw ${gap9}ms")
    pub.shutdown()
  }

  test("shutdown rejects further submits") {
    val pub = new QueuePublisher[String](new FakeTransport)
    pub.shutdown()
    intercept[IllegalStateException] { pub.submit(Seq(("x", "c")), "b") }
  }

  private implicit class JListOps[A](l: java.util.concurrent.CopyOnWriteArrayList[A]) {
    def asScala: Seq[A] = {
      import scala.jdk.CollectionConverters._
      l.iterator().asScala.toSeq
    }
  }
}
