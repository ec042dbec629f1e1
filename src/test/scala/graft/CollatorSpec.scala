package graft

import graft.streaming.WaveformCollator
import graft.streaming.WaveformCollator._

/** W4 semantics: pack ≤target samples, split at gaps, flag overlaps,
  * retain young tails until aged (SURVEY.md §2.9; quality oracle:
  * zero |gap| > 1ms between consecutive chunks, no sample loss).
  */
class CollatorSpec extends SparkSpecBase {
  import spark.implicits._

  private val cfg = Config(targetSamples = 3000, waitLimitUs = 10_000_000L)

  /** 300 Hz contiguous messages, `samplesPerMsg` each. */
  private def contiguous(n: Int, samplesPerMsg: Int = 40,
                         startUs: Long = 0L): List[WaveMsg] = {
    val periodUs = 1000000.0 / 300
    (0 until n).map { i =>
      WaveMsg("LOC1", "300hz",
        startUs + math.round(i.toLong * samplesPerMsg * periodUs), 300, "uV",
        Seq.tabulate(samplesPerMsg)(k =>
          999.0 * math.sin(2 * math.Pi * 5 * (i * samplesPerMsg + k) / 300.0)))
    }.toList
  }

  test("packs contiguous stream into target-sized gap-free chunks") {
    val msgs = contiguous(150) // 6000 samples
    val (chunks, rest) = collate(msgs, cfg, nowUs = Long.MaxValue,
      flushAll = true)
    assert(rest.isEmpty)
    assert(chunks.forall(!_.isError))
    assert(chunks.map(_.values.size).sum == 6000)
    assert(chunks.forall(_.values.size <= 3000))
    assert(chunks.map(_.values.size).take(2) == List(3000, 3000))
    // gap audit: next chunk starts where previous ends (±1ms)
    chunks.sliding(2).foreach {
      case List(a, b) =>
        val expectedEnd = a.obsTimeUs + math.round(
          a.values.size * 1000000.0 / a.samplingRate)
        assert(math.abs(b.obsTimeUs - expectedEnd) <= 1000)
      case _ =>
    }
    // sample values survive collation in order
    assert(chunks.head.values.take(3) ==
      contiguous(1).head.values.take(3))
  }

  test("young short tail is retained until aged") {
    val msgs = contiguous(10) // 400 samples, fresh
    val now = msgs.last.obsTimeUs + 1_000_000L // 1s later < waitLimit
    val (chunks, rest) = collate(msgs, cfg, now, flushAll = false)
    assert(chunks.isEmpty)
    assert(rest.size == 10)
    // …but an aged buffer flushes
    val (chunks2, rest2) = collate(msgs, cfg, now + 20_000_000L,
      flushAll = false)
    assert(chunks2.map(_.values.size).sum == 400)
    assert(rest2.isEmpty)
  }

  test("oversized message is split: targetSamples is a hard bound") {
    // one 7000-sample message against targetSamples=3000
    val periodUs = 1000000.0 / 300
    val big = List(WaveMsg("LOC1", "300hz", 0L, 300, "uV",
      Seq.tabulate(7000)(_.toDouble)))
    val (chunks, rest) = collate(big, cfg, nowUs = Long.MaxValue,
      flushAll = true)
    assert(rest.isEmpty)
    assert(chunks.map(_.values.size) == List(3000, 3000, 1000))
    assert(chunks.forall(!_.isError))
    // sample continuity: concatenation reproduces the original payload,
    // and each split chunk's obsTime advances by samples/rate
    assert(chunks.flatMap(_.values) == big.head.values)
    assert(chunks.map(_.obsTimeUs) ==
      List(0L, math.round(3000 * periodUs), math.round(3000 * periodUs) +
        math.round(3000 * periodUs)))
  }

  test("splits at gaps larger than tolerance") {
    val a = contiguous(10)                       // ends at ~1.333s
    val b = contiguous(10, startUs = 10_000_000L) // 10s: clear gap
    val (chunks, _) = collate(a ++ b, cfg, nowUs = Long.MaxValue,
      flushAll = true)
    assert(chunks.size == 2)
    assert(chunks.map(_.obsTimeUs) == List(0L, 10_000_000L))
  }

  test("overlap is flagged as error, not merged") {
    val a = contiguous(2)
    val overlap = WaveMsg("LOC1", "300hz", a.head.obsTimeUs + 1000, 300,
      "uV", Seq.fill(40)(1.0))
    val (chunks, _) = collate(a :+ overlap, cfg, nowUs = Long.MaxValue,
      flushAll = true)
    assert(chunks.count(_.isError) == 1)
    assert(chunks.filter(!_.isError).map(_.values.size).sum == 80)
  }

  test("batch collate over Dataset groups by (location, stream)") {
    implicit val s = spark
    val msgs = (contiguous(75) ++
      contiguous(75).map(m => m.copy(locationId = "LOC2"))).toDS()
    val out = WaveformCollator.collateBatch(msgs, cfg).collect()
    assert(out.map(_.locationId).distinct.sorted.toSeq == Seq("LOC1", "LOC2"))
    assert(out.map(_.values.size).sum == 6000)
  }

  test("streaming collate with processing-time flush (memory sink)") {
    implicit val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[WaveMsg](spark)
    // 150 msgs × 40 samples = exactly two 3000-sample chunks per batch —
    // emission is size-triggered, state drains fully (the timeout/aging
    // path is unit-tested on collate() directly).
    val q = WaveformCollator.collateStream(input.toDS(),
        Config(targetSamples = 3000, waitLimitUs = 60_000_000L),
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("wave_out")
      .outputMode("append").start()
    try {
      input.addData(contiguous(150))
      q.processAllAvailable()
      input.addData(contiguous(150, startUs = 100_000_000L))
      q.processAllAvailable()
      val n = spark.sql(
        "SELECT sum(size(`values`)) FROM wave_out").collect()(0).getLong(0)
      assert(n == 12000)
    } finally q.stop()
  }
}
