package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.sources.IncrementalPoller
import graft.streaming.{ConfirmTransport, QueuePublisher}
import java.util.concurrent.{CountDownLatch, TimeUnit}

/** The reference's source architecture end-to-end: poll the upstream
  * with a durable pointer (S1), publish each batch through the
  * confirm-bounded QueuePublisher (S3), commit progress from the
  * batch-complete callback — NOT from the poll loop — so a crash
  * before the last confirm re-polls the batch (at-least-once), and a
  * transient broker nack neither loses nor duplicates a frame.
  * (ref: hl7-reader IdsOperations.java polling + Publisher.java
  * confirm callback advancing the IDS progress row.)
  */
class PublisherPipelineSpec extends SparkSpecBase {

  test("poll → publish-with-confirms → consume: exactly-once delivery, " +
      "progress follows confirms, survives a mid-stream nack") {
    val dir = java.nio.file.Files.createTempDirectory("pubpoll").toString
    val upstream = spark.range(1, 101).select(col("id").as("unid"),
      pmod(col("id"), lit(7)).as("user_id"),
      (col("id") * 1000L).as("ts_us"), col("id").as("event_id"))
    val poller = new IncrementalPoller(s"$dir/progress", "unid")

    val consumed = new java.util.concurrent.CopyOnWriteArrayList[Row]()
    val nackOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    @volatile var pubRef: QueuePublisher[Row] = null
    // broker stand-in: confirms synchronously, except frame 42 which is
    // refused exactly once (its delayed resend must then succeed)
    val tr = new ConfirmTransport[Row] {
      def send(frame: Row, corr: String): Unit =
        if (corr.startsWith("c42:") && nackOnce.getAndSet(false)) pubRef.nack(corr)
        else { consumed.add(frame); pubRef.ack(corr) }
    }
    val pub = new QueuePublisher[Row](tr, maxBatches = 1, maxInTransit = 5,
      initialDelayMs = 10L)
    pubRef = pub

    var done = false
    while (!done) {
      val batch = poller.poll(upstream, 30).collect()
      if (batch.isEmpty) done = true
      else {
        val maxId = batch.map(_.getLong(0)).max
        val confirmed = new CountDownLatch(1)
        pub.submit(batch.toSeq.map(r => (r, "c" + r.getLong(0))),
          s"b$maxId",
          () => { poller.commit(maxId); confirmed.countDown() })
        assert(confirmed.await(10, TimeUnit.SECONDS),
          s"batch b$maxId never fully confirmed")
        if (batch.length < 30) done = true
      }
    }

    assert(!nackOnce.get, "the nack branch must have fired")
    import scala.jdk.CollectionConverters._
    val ids = consumed.iterator().asScala.map(_.getLong(0)).toSeq.sorted
    assert(ids == (1L to 100L), "every row exactly once despite the nack")
    assert(poller.lastProgress.contains(100L),
      "progress pointer must land on the last confirmed batch")
    // a fresh poll after full confirmation sees nothing
    assert(poller.poll(upstream, 30).count() == 0)
    pub.shutdown()
  }
}
