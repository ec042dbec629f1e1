package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Conversations
import graft.streaming.SftStream

case class SftTurn(conv_id: Long, turn_idx: Long, role: String,
                   text: String)

/** Streamed SFT vertical: micro-batch boundaries (and at-least-once
  * redelivery) must be invisible in the assembly artifacts.
  */
class SftStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def mk() =
    java.nio.file.Files.createTempDirectory("sft_stream").toString

  private val turns = Seq(
    SftTurn(1L, 0L, "user", "hi there friend"),
    SftTurn(1L, 1L, "assistant", "hello"),
    SftTurn(1L, 2L, "user", "more words here now"),
    SftTurn(1L, 3L, "assistant", "short"),
    SftTurn(2L, 0L, "system", "be brief"),
    SftTurn(2L, 1L, "assistant", "ok then fine"),
    SftTurn(2L, 2L, "user", "thanks a lot"),
    SftTurn(3L, 0L, "user", "solo question"),
    SftTurn(3L, 1L, "assistant", "solo answer"))

  private def streamIn(batches: Seq[Seq[SftTurn]]): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val cfg = SftStream.Config(mk())
    val ms = MemoryStream[SftTurn](spark)
    val q = SftStream.start(ms.toDF(), cfg, mk())
    batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()
    SftStream.turnsState(spark, cfg)
  }

  private def artifacts(t: DataFrame) = {
    def rows(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq
    (rows(Conversations.spans(t, "conv_id", "turn_idx", "role", "text")),
      rows(Conversations.render(t, "conv_id", "turn_idx", "role", "text")),
      rows(Conversations.truncate(t, "conv_id", "turn_idx", "role",
        "text", 8L)))
  }

  test("micro-batch boundaries are invisible: two different splits " +
      "of the turn stream (by turn parity, by conversation) yield " +
      "artifacts identical to the one-shot batch run") {
    val batch = artifacts(turns.toDF())
    // split A: every conversation's turns cut across two batches
    val a = artifacts(streamIn(Seq(
      turns.filter(_.turn_idx % 2 == 0), turns.filter(_.turn_idx % 2 == 1))))
    // split B: whole conversations per batch, different boundary
    val b = artifacts(streamIn(Seq(
      turns.filter(_.conv_id == 1L), turns.filter(_.conv_id != 1L))))
    assert(a == batch)
    assert(b == batch)
  }

  test("at-least-once redelivery collapses: a turn redelivered in a " +
      "LATER batch (and a whole replayed slice) changes nothing") {
    val batch = artifacts(turns.toDF())
    val redelivered = artifacts(streamIn(Seq(
      turns.filter(_.turn_idx % 2 == 0),
      turns.filter(_.turn_idx % 2 == 1) ++
        turns.filter(t => t.conv_id == 2L && t.turn_idx % 2 == 0),
      turns.filter(_.conv_id == 3L))))
    assert(redelivered == batch)
  }

  test("a CONFLICTING redelivery — same (conv_id, turn_idx), " +
      "different payload — raises loudly at READ time in turnsState, " +
      "protecting EVERY consumer (render included, which has no " +
      "duplicate-key guard of its own)") {
    val state = streamIn(Seq(turns,
      Seq(SftTurn(1L, 1L, "assistant", "DIFFERENT payload"))))
    def fullMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    // spans (previously covered by the Conversations guard)
    val e1 = intercept[Exception] {
      Conversations.spans(state, "conv_id", "turn_idx", "role", "text")
        .collect()
    }
    assert(fullMsg(e1).contains("conflicting redelivery"), fullMsg(e1))
    // render — the consumer the guard exists for: without it, both
    // payload versions would silently render as extra turns
    val e2 = intercept[Exception] {
      Conversations.render(state, "conv_id", "turn_idx", "role", "text")
        .collect()
    }
    assert(fullMsg(e2).contains("conflicting redelivery"), fullMsg(e2))
  }

  test("engine-level batch replay is idempotent: re-folding the same " +
      "batchId overwrites its own layer") {
    val cfg = SftStream.Config(mk())
    SftStream.foldBatch(turns.take(4).toDF(), 1L, cfg)
    SftStream.foldBatch(turns.drop(4).toDF(), 2L, cfg)
    SftStream.foldBatch(turns.take(4).toDF(), 1L, cfg) // crash replay
    assert(SftStream.turnsState(spark, cfg).count() == turns.size)
  }

  private def layerNames(cfg: SftStream.Config): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(s"${cfg.root}/turns")
    val fs = dir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).toSeq.sorted
  }

  test("compaction: layers collapse to one, artifacts identical " +
      "before/after, the crash window (merged + old coexisting) is " +
      "state-invisible, and a replay of a compacted-away batch " +
      "collapses") {
    val cfg = SftStream.Config(mk())
    SftStream.foldBatch(turns.filter(_.turn_idx % 2 == 0).toDF(), 1L, cfg)
    SftStream.foldBatch(turns.filter(_.turn_idx % 2 == 1).toDF(), 2L, cfg)
    val before = artifacts(SftStream.turnsState(spark, cfg))
    // simulate the crash window: write the merged layer WITHOUT
    // deleting the old ones — the read side must see identical state
    SftStream.turnsState(spark, cfg)
      .write.mode("overwrite").parquet(s"${cfg.root}/turns/batch=c2")
    assert(layerNames(cfg).size == 3)
    assert(artifacts(SftStream.turnsState(spark, cfg)) == before)
    // the real compaction (idempotent over the half-done state)
    SftStream.compactTurns(spark, cfg)
    assert(layerNames(cfg) == Seq("batch=c2"))
    assert(artifacts(SftStream.turnsState(spark, cfg)) == before)
    // engine replay of a compacted-away batchId re-creates its layer
    // with the same rows — duplicates, collapsed
    SftStream.foldBatch(turns.filter(_.turn_idx % 2 == 0).toDF(), 1L, cfg)
    assert(artifacts(SftStream.turnsState(spark, cfg)) == before)
    // and a SECOND compaction over {c2, 1} collapses again (max
    // numeric id now 2 → layer c2 rewritten)
    SftStream.compactTurns(spark, cfg)
    assert(layerNames(cfg) == Seq("batch=c2"))
    assert(artifacts(SftStream.turnsState(spark, cfg)) == before)
  }
}
