package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.collection.mutable.ArrayBuffer

/** S7: per-batch effect log (SURVEY.md §2.1; ref: core/.../repos/
  * IdsEffectLogging.java:24-41 — sourceId, type, start/end, duration,
  * error). The streaming analog: a StreamingQueryListener capturing each
  * micro-batch's progress into a queryable DataFrame (the A9 validation
  * throughput metric — rows processed per wall-clock — reads off this).
  */
object EffectLog {
  final case class Entry(queryId: String, batchId: Long, timestamp: String,
                         numInputRows: Long, processedRowsPerSecond: Double,
                         durationMs: Long, error: String)
}

class EffectLog extends StreamingQueryListener {
  import EffectLog.Entry

  private val entries = ArrayBuffer.empty[Entry]

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    entries.synchronized {
      val p = e.progress
      entries += Entry(p.id.toString, p.batchId, p.timestamp,
        p.numInputRows, p.processedRowsPerSecond,
        Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(-1L),
        null)
    }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    entries.synchronized {
      e.exception.foreach { err =>
        entries += Entry(e.id.toString, -1L, "", 0L, 0.0, -1L, err)
      }
    }

  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.synchronized { entries.toSeq }.toDF()
  }

  def attach(spark: SparkSession): EffectLog = {
    spark.streams.addListener(this); this
  }
}
