package graft.streaming

import java.util.concurrent.{ArrayBlockingQueue, ConcurrentHashMap, ScheduledThreadPoolExecutor, Semaphore, TimeUnit}
import scala.jdk.CollectionConverters._

/** Transport seam for [[QueuePublisher]]: an asynchronous, confirm-capable
  * message channel (the reference's RabbitTemplate with publisher confirms
  * enabled). The transport delivers `correlationData` back through
  * [[QueuePublisher.ack]] / [[QueuePublisher.nack]] when the broker
  * confirms or refuses the frame. In this engine the production analog is
  * the micro-batch boundary itself; this seam exists so the reference's
  * back-pressure contract is honestly modeled and testable.
  */
trait ConfirmTransport[T] {
  def send(frame: T, correlationData: String): Unit
}

/** S3: queue publication with publisher-confirm semantics — a faithful
  * model of the reference's AMQP publisher
  * (emap-interchange/.../messaging/Publisher.java):
  *
  *   - bounded WAITING batches: submits block once `maxBatches` batches
  *     are queued behind the publisher thread (Publisher.java:77 —
  *     ArrayBlockingQueue(maxBatches); :136 blocking put);
  *   - bounded IN-TRANSIT messages: at most `maxInTransit` unconfirmed
  *     frames, enforced by a fair semaphore acquired per send
  *     (Publisher.java:73,168-171);
  *   - duplicate-batch rejection: a batchId already waiting or in
  *     progress is dropped with an error, not resent (Publisher.java:
  *     127-133 — progress may not have advanced while the queue was
  *     full, so the same batch can be re-offered);
  *   - per-confirm release + batch callback: each ack frees one permit;
  *     the batch's callback (progress-pointer update, S6) runs — on a
  *     separate thread — when its last frame is confirmed
  *     (Publisher.java:206-239, finishedSending);
  *   - nack → halt + retry with exponential backoff: the first nack
  *     drains all permits so only retries flow; each failed frame is
  *     rescheduled after the current delay, which doubles once every
  *     in-transit frame has been nacked at that delay, capped at
  *     `maximumDelay` (Publisher.java:245-286, failedSending); when the
  *     retries drain the waiting map, the full window reopens and the
  *     delay resets (Publisher.java:215-222).
  *
  * Correlation ids and batch ids must not contain ':' (the composite
  * correlationData separator, Publisher.java:162,207-211).
  *
  * Frames are `T`, not bytes: the engine publishes typed interchange
  * rows; serialization belongs to the transport.
  */
final class QueuePublisher[T](
    transport: ConfirmTransport[T],
    maxBatches: Int = 1,
    maxInTransit: Int = 1,
    initialDelayMs: Long = 1000L,
    maximumDelayMs: Long = 600000L) {

  private final case class Batch(batchId: String, frames: Seq[(T, String)],
                                 onComplete: () => Unit)

  private val semaphore = new Semaphore(maxInTransit, true)
  private val queue = new ArrayBlockingQueue[Batch](maxBatches)
  private val waiting = new ConcurrentHashMap[String, T]()
  private val batchWaiting = new ConcurrentHashMap[String, (Int, () => Unit)]()
  private val executor = new ScheduledThreadPoolExecutor(2)
  @volatile private var failedSend = false
  @volatile private var finished = false
  // retry-backoff state, guarded by `this` (reference: single confirm
  // callback thread; here acks/nacks may arrive from any thread)
  private var currentDelayMs = initialDelayMs
  private var countAtCurrentDelay = 0

  private val mainThread = new Thread(() => runLoop(), "queue-publisher")
  mainThread.setDaemon(true)
  mainThread.start()

  /** Submit a batch for publication. Blocks while `maxBatches` batches
    * are already waiting; drops (with a false return) a batchId that is
    * still waiting or in progress; throws after [[shutdown]].
    */
  def submit(frames: Seq[(T, String)], batchId: String,
             onComplete: () => Unit = () => ()): Boolean = {
    require(!batchId.contains(":") && frames.forall(!_._2.contains(":")),
      "correlation/batch ids must not contain ':'")
    // MessageBatch validation (reference: MessageBatch.java ctor throws on
    // both). An empty batch would register (0, cb) in batchWaiting with no
    // frame ever sent — the callback never fires and the batchId wedges
    // forever. Duplicate correlationIds overwrite in `waiting`, so during
    // nack recovery waiting.isEmpty could go true while a frame is still
    // unconfirmed, reopening the in-transit window early.
    require(frames.nonEmpty, "batch must contain at least one frame")
    require(frames.map(_._2).distinct.size == frames.size,
      "correlationIds within a batch must be unique")
    if (finished) throw new IllegalStateException("publisher has been shut down")
    if (batchWaiting.containsKey(batchId) ||
        queue.asScala.exists(_.batchId == batchId)) return false
    queue.put(Batch(batchId, frames, onComplete))
    true
  }

  private def runLoop(): Unit =
    try while (!finished) {
      val b = queue.take()
      batchWaiting.put(b.batchId, (b.frames.size, b.onComplete))
      for ((frame, corrId) <- b.frames) {
        semaphore.acquire() // blocks at maxInTransit unconfirmed frames
        waiting.put(corrId, frame)
        transport.send(frame, corrId + ":" + b.batchId)
      }
    } catch { case _: InterruptedException => () }

  /** Broker confirm for `correlationData` (corrId:batchId). */
  def ack(correlationData: String): Unit = {
    val (corrId, batchId) = split(correlationData)
    waiting.synchronized {
      waiting.remove(corrId)
      if (failedSend) {
        // recovery path: delay resets; the window reopens only once
        // every outstanding frame has been confirmed
        synchronized { currentDelayMs = initialDelayMs }
        if (waiting.isEmpty) { failedSend = false; semaphore.release(maxInTransit) }
      } else semaphore.release()
    }
    batchWaiting.synchronized {
      batchWaiting.get(batchId) match {
        case null => // resend confirmed after its batch already completed
        case (n, cb) if n <= 1 =>
          batchWaiting.remove(batchId)
          executor.execute(() => cb()) // off the confirm thread
        case (n, cb) => batchWaiting.put(batchId, (n - 1, cb))
      }
    }
  }

  /** Broker refusal: stop new sends, schedule a delayed resend. */
  def nack(correlationData: String): Unit = {
    semaphore.drainPermits() // only retries may flow until recovery
    failedSend = true
    val (corrId, _) = split(correlationData)
    val frame = waiting.get(corrId)
    val delay = synchronized {
      val d = currentDelayMs
      if (currentDelayMs < maximumDelayMs && countAtCurrentDelay == maxInTransit) {
        currentDelayMs = math.min(currentDelayMs * 2, maximumDelayMs)
        countAtCurrentDelay = 1
      } else if (currentDelayMs < maximumDelayMs) countAtCurrentDelay += 1
      d
    }
    executor.schedule(new Runnable {
      def run(): Unit = transport.send(frame, correlationData)
    }, delay, TimeUnit.MILLISECONDS)
  }

  /** Unconfirmed frame count (bounded by maxInTransit by construction). */
  def inTransit: Int = waiting.size()

  def shutdown(): Unit = {
    finished = true
    executor.shutdownNow()
    mainThread.interrupt()
  }

  private def split(correlationData: String): (String, String) =
    correlationData.split(":") match {
      case Array(c, b) => (c, b)
      case _ => throw new IllegalStateException(
        s"malformed correlationData: $correlationData")
    }
}
