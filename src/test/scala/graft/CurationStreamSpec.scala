package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.streaming.CurationStream

case class CurDoc(doc_id: Long, lang: String, text: String)

/** Streaming front end of the incremental curation chain: micro-batch
  * boundaries must not change the selection.
  */
class CurationStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def mk() =
    java.nio.file.Files.createTempDirectory("curation_stream").toString

  test("streamed micro-batch folds equal the one-shot fold; batch " +
      "replay is idempotent (layer overwrite)") {
    val docs = ((1L to 30L).map(i => CurDoc(i, "en", s"alpha beta doc $i")) ++
      (31L to 45L).map(i => CurDoc(i, "fr", s"gamma delta doc $i")) ++
      Seq(CurDoc(46L, "en", "bench mark text one two"),
        CurDoc(47L, "en", "bench mark text one two three")))
      .toDF("doc_id", "lang", "text")
    val bench = docs.filter($"doc_id" === 46L) // doc 47 overlaps it
    val train = docs.filter($"doc_id" =!= 46L)

    val benchIdx = mk(); val dsirIdx = mk()
    TextAnalysis.buildBenchmarkIndex(bench, "text", shingleN = 5,
      indexDir = benchIdx)
    TextAnalysis.buildDsirIndex(docs, docs.filter($"lang" === "en"),
      "doc_id", "text", nBuckets = 65536, scale = 1000000L,
      indexDir = dsirIdx)
    def cfgFor(curIdx: String) = CurationStream.Config(
      benchIdx, dsirIdx, curIdx, "doc_id", "text", "lang",
      deconThreshold = 0.3, keepFrac10k = 6000L)
    val targets = Map("en" -> 7000L, "fr" -> 3000L)

    // one-shot: the whole training set in a single fold
    val oneIdx = mk()
    CurationStream.foldBatch(train, 0L, cfgFor(oneIdx))
    val oneShot = CurationStream.select(spark, cfgFor(oneIdx), targets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(oneShot.nonEmpty)
    // the contaminated doc (47 overlaps the benchmark) must be gone
    assert(!oneShot.exists(_._1 == 47L))

    // streamed: three micro-batches through the query
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[CurDoc](spark)
    val mixIdx = mk()
    val q = CurationStream.start(input.toDF(), cfgFor(mixIdx), mk())
    val rows = train.as[CurDoc].collect().sortBy(_.doc_id)
    rows.grouped(16).foreach { g =>
      input.addData(g.toSeq); q.processAllAvailable()
    }
    q.stop()
    val streamed = CurationStream.select(spark, cfgFor(mixIdx), targets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed == oneShot)

    // crash-replay idempotence: re-folding micro-batch 0's documents
    // under the SAME batch id overwrites its layer — selection unchanged
    CurationStream.foldBatch(rows.take(16).toSeq.toDF(), 0L,
      cfgFor(mixIdx))
    val replayed = CurationStream.select(spark, cfgFor(mixIdx), targets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(replayed == oneShot)
  }
}
