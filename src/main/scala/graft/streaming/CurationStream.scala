package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.TextAnalysis

/** Structured-Streaming front end for the incremental curation chain
  * (the q110 pipeline): each micro-batch of documents is gated by the
  * PERSISTED benchmark shingle index and frozen DSIR importance model,
  * and its survivors are appended to the persisted mixture index; the
  * current selection is [[TextAnalysis.mixSelectFromIndex]] at any
  * point. Per-doc gates are independent and the mixture selection is a
  * pure function of the index, so the streamed fold equals the
  * one-shot batch result regardless of micro-batch boundaries
  * (`CurationStreamSpec`; q110 proves the same equivalence against
  * the DuckDB oracle in two-batch form).
  *
  * `foreachBatch`, not a stateful operator, on purpose: the gates join
  * against at-rest parquet state and the fold WRITES parquet — the
  * same micro-batch-transaction idiom as [[StarPipeline.start]]. The
  * micro-batch id doubles as the mixture-index layer id, so Structured
  * Streaming's batch-replay-after-crash semantics make the fold
  * idempotent (a replayed batch overwrites its own layer).
  */
object CurationStream {

  /** Locations of the three persisted states + gate parameters. */
  case class Config(benchIdx: String, dsirIdx: String, mixIdx: String,
                    idCol: String, textCol: String, strataCol: String,
                    shingleN: Int = 3, deconThreshold: Double = 0.05,
                    nBuckets: Int = 65536, scale: Long = 1000000L,
                    dsirThreshold: Double = 0.45)

  /** Fold ONE micro-batch through the gates into the mixture index —
    * O(batch): both gates broadcast their persisted state, nothing
    * rescans earlier batches. Shared by the streaming front end and
    * the batch path (q110 calls this shape inline).
    */
  def foldBatch(batch: DataFrame, batchId: Long, cfg: Config): Unit = {
    val s = batch.sparkSession
    val clean = batch.join(
      TextAnalysis.decontaminateIncremental(s, cfg.benchIdx, batch,
          cfg.idCol, cfg.textCol, cfg.shingleN, cfg.deconThreshold)
        .filter(!col("contaminated")).select(col("doc_id").as(cfg.idCol)),
      cfg.idCol)
    val sel = clean.join(
      TextAnalysis.dsirScoreIncremental(s, cfg.dsirIdx, clean,
          cfg.idCol, cfg.textCol, cfg.nBuckets, cfg.scale,
          cfg.dsirThreshold)
        .filter(col("selected")).select(col("doc_id").as(cfg.idCol)),
      cfg.idCol)
    TextAnalysis.mixIndexAppend(sel, cfg.idCol, cfg.strataCol,
      cfg.mixIdx, batchId)
  }

  /** Start the streaming fold over a document stream. */
  def start(stream: DataFrame, cfg: Config,
            checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, cfg)
      }
      .start()
}
