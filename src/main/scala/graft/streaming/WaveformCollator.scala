package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.functions._

/** Keyed waveform sessionization/collation (SURVEY.md §2.9 W4).
  *
  * Semantics studied from the reference's per-(location,stream) collator
  * (waveform-reader/.../WaveformCollator.java:40-298): buffer small
  * messages sorted by observation time; emit packed rows when a contiguous
  * run reaches `targetSamples` or the oldest buffered data exceeds the
  * wait limit; never concatenate across a gap larger than the rounding
  * tolerance; overlapping samples are a hard error (emitted on an error
  * channel here rather than an exception, so one bad stream can't kill
  * the query).
  *
  * Spark-first: `flatMapGroupsWithState` with processing-time timeout —
  * state is strictly the pending buffer of ONE (location, stream) key,
  * so memory is bounded by (streams × waitLimit × rate), independent of
  * total data volume.
  */
object WaveformCollator {

  final case class WaveMsg(locationId: String, streamId: String,
                           obsTimeUs: Long, samplingRate: Int,
                           unit: String, values: Seq[Double])

  final case class WaveChunk(locationId: String, streamId: String,
                             obsTimeUs: Long, samplingRate: Int, unit: String,
                             values: Seq[Double], isError: Boolean,
                             errorMsg: String)

  final case class CollatorState(pending: List[WaveMsg])

  final case class Config(targetSamples: Int = 3000,
                          waitLimitUs: Long = 10_000_000L,
                          toleranceFractionOfPeriod: Double = 0.5)

  /** Pure collation core: given the sorted pending buffer, cut packed
    * chunks; return (chunks, remaining buffer). `flushAll` forces out
    * everything (batch mode / stream shutdown); otherwise a trailing run
    * younger than the wait limit and shorter than target is retained.
    */
  def collate(buffer: List[WaveMsg], cfg: Config, nowUs: Long,
              flushAll: Boolean): (List[WaveChunk], List[WaveMsg]) = {
    if (buffer.isEmpty) return (Nil, Nil)
    val sorted = buffer.sortBy(m => (m.obsTimeUs, m.streamId))
    val chunks = List.newBuilder[WaveChunk]
    var remaining = List.empty[WaveMsg]

    // Split the sorted messages into contiguous runs.
    var runs = List.newBuilder[List[WaveMsg]]
    var run = List.newBuilder[WaveMsg]
    var prev: Option[WaveMsg] = None
    for (m <- sorted) {
      prev match {
        case Some(p) =>
          val periodUs = 1_000_000.0 / p.samplingRate
          val expected = p.obsTimeUs + math.round(p.values.size * periodUs)
          val tolUs = math.round(periodUs * cfg.toleranceFractionOfPeriod)
          val delta = m.obsTimeUs - expected
          if (delta < -tolUs) {
            // overlap — hard error on this stream position
            chunks += WaveChunk(m.locationId, m.streamId, m.obsTimeUs,
              m.samplingRate, m.unit, m.values, isError = true,
              errorMsg = s"overlap: starts ${-delta}us before end of previous")
          } else if (delta > tolUs || m.samplingRate != p.samplingRate) {
            runs += run.result(); run = List.newBuilder[WaveMsg]
            run += m; prev = Some(m)
          } else { run += m; prev = Some(m) }
        case None => run += m; prev = Some(m)
      }
    }
    runs += run.result()
    val allRuns = runs.result().filter(_.nonEmpty)

    // Cut one chunk of up to targetSamples off a run. targetSamples is a
    // HARD bound: an oversized first message is split, its remainder
    // re-entering the run with the correspondingly advanced obsTime (so
    // downstream gap audits still see a continuous stream).
    def cut(run: List[WaveMsg]): (WaveChunk, List[WaveMsg]) = {
      val first = run.head
      if (first.values.size > cfg.targetSamples) {
        val (head, tail) = first.values.splitAt(cfg.targetSamples)
        val restMsg = first.copy(values = tail,
          obsTimeUs = first.obsTimeUs +
            math.round(cfg.targetSamples * 1000000.0 / first.samplingRate))
        (WaveChunk(first.locationId, first.streamId, first.obsTimeUs,
          first.samplingRate, first.unit, head,
          isError = false, errorMsg = null), restMsg :: run.tail)
      } else {
        val take = List.newBuilder[WaveMsg]
        var n = 0
        var rest = run
        while (rest.nonEmpty &&
               n + rest.head.values.size <= cfg.targetSamples) {
          n += rest.head.values.size; take += rest.head; rest = rest.tail
        }
        val taken = take.result()
        (WaveChunk(first.locationId, first.streamId, first.obsTimeUs,
          first.samplingRate, first.unit, taken.flatMap(_.values),
          isError = false, errorMsg = null), rest)
      }
    }

    for (r <- allRuns) {
      var rest = r
      def total = rest.iterator.map(_.values.size).sum
      // full chunks while the run holds a target's worth of samples
      while (total >= cfg.targetSamples) {
        val (c, more) = cut(rest); chunks += c; rest = more
      }
      // aged (or force-flushed) partial tail goes out too
      val aged = rest.nonEmpty &&
        (flushAll || (nowUs - rest.head.obsTimeUs) >= cfg.waitLimitUs)
      if (aged) while (rest.nonEmpty) {
        val (c, more) = cut(rest); chunks += c; rest = more
      }
      remaining = remaining ++ rest
    }
    (chunks.result(), remaining)
  }

  /** Streaming collator: groupByKey((loc,stream)).flatMapGroupsWithState
    * with a processing-time timeout that flushes aged partial runs even
    * when a stream goes quiet.
    *
    * Note: with ProcessingTimeTimeout Spark schedules micro-batches
    * continuously (`shouldRunAnotherBatch` is unconditionally true for
    * this timeout mode) — that is what delivers the ≤waitLimit freshness
    * guarantee (BASELINE.md: 10-20 s). Pass NoTimeout for drive-by-data
    * tests where the busy trigger loop is unwanted; aged flushing then
    * happens whenever new data arrives for the key.
    */
  def collateStream(msgs: Dataset[WaveMsg], cfg: Config = Config(),
                    timeout: GroupStateTimeout =
                      GroupStateTimeout.ProcessingTimeTimeout)
                   (implicit spark: SparkSession): Dataset[WaveChunk] = {
    import spark.implicits._
    val useTimeout = timeout == GroupStateTimeout.ProcessingTimeTimeout
    msgs.groupByKey(m => (m.locationId, m.streamId))
      .flatMapGroupsWithState[CollatorState, WaveChunk](
        OutputMode.Append, timeout) {
        case (_, rows, state: GroupState[CollatorState]) =>
          val nowUs = state.getCurrentProcessingTimeMs() * 1000L
          val buf = state.getOption.map(_.pending).getOrElse(Nil) ++ rows.toList
          val (chunks, rest) = collate(buf, cfg, nowUs, flushAll = false)
          if (rest.isEmpty) state.remove()
          else {
            state.update(CollatorState(rest))
            if (useTimeout)
              state.setTimeoutDuration(math.max(1L, cfg.waitLimitUs / 1000L))
          }
          chunks.iterator
      }
  }

  /** Batch collator over a bounded Dataset — same core, full flush. */
  def collateBatch(msgs: Dataset[WaveMsg], cfg: Config = Config())
                  (implicit spark: SparkSession): Dataset[WaveChunk] = {
    import spark.implicits._
    msgs.groupByKey(m => (m.locationId, m.streamId))
      .flatMapGroups((_: (String, String), rows: Iterator[WaveMsg]) =>
        collate(rows.toList, cfg, nowUs = Long.MaxValue, flushAll = true)
          ._1.iterator)
  }
}
