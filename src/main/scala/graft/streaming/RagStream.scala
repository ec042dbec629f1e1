package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{Ann, Embed, TextAnalysis}

/** Structured-Streaming front end for the RAG ingestion vertical
  * (q164 batch-composed; q165 through the actual streaming engine):
  * each micro-batch of documents is chunked ([[TextAnalysis
  * .chunkWindows]]), hash-embedded per chunk ([[Embed.hashEmbed]]),
  * and appended to the persisted SQ8 code index ([[Ann
  * .sq8IndexAppend]]) as one layer per micro-batch id.
  *
  * Batching-independence by construction: chunking is per-DOC pure,
  * the embedding per-CHUNK pure, and int8 quantization per-VECTOR
  * (each scales against its own max|x|), so the streamed index answers
  * queries verbatim-equal to the one-shot build no matter how the
  * corpus split into micro-batches — and a replayed batch id
  * overwrites its OWN layer (the [[RetrievalStream]] /
  * [[LexicalStream]] idempotence contract).
  */
object RagStream {

  /** @param clusterMod coarse cluster = chunk_id % clusterMod — the
    *   modular assignment keeps the oracle replay exact; swap for a
    *   trained [[Ann.ivfCluster]] column when real centroids exist
    *   (freeze them at index creation, as [[RetrievalStream]] does).
    * @param baseBatchId Structured Streaming micro-batch ids are
    *   0-based, layer ids start at 1 — id 0 would trip the absorbed
    *   high-water guard (the [[RetrievalStream]] convention).
    */
  case class Config(indexDir: String, idCol: String, textCol: String,
                    windowTokens: Int = 16, strideTokens: Int = 12,
                    dim: Int = 32, chunkIdScale: Long = 100L,
                    clusterMod: Long = 4L, baseBatchId: Long = 1L)

  /** Chunk + embed one batch — the shared per-batch transform (also
    * the one-shot build path): (doc_id = chunk id, emb), zero-vector
    * chunks dropped (no direction to quantize).
    */
  def encodeBatch(batch: DataFrame, cfg: Config): DataFrame = {
    // loud per-row guard: chunk_id = doc_id·scale + idx is only
    // injective while idx < scale — a silent collision would merge
    // two unrelated chunks' features into one garbage embedding (and
    // break the batching-independence invariant when the colliding
    // docs land in different micro-batches)
    val chunks = TextAnalysis.chunkWindows(batch, cfg.idCol, cfg.textCol,
        cfg.windowTokens, cfg.strideTokens)
      .withColumn("chunk_id", expr(
        s"CASE WHEN chunk_idx >= ${cfg.chunkIdScale}L THEN " +
          "CAST(raise_error('RagStream: doc ' || doc_id || " +
          s"' has chunk_idx ' || chunk_idx || ' >= chunkIdScale " +
          s"${cfg.chunkIdScale} — chunk ids would collide across " +
          "docs; raise chunkIdScale') AS BIGINT) " +
          s"ELSE doc_id * ${cfg.chunkIdScale}L + chunk_idx END"))
    Embed.hashEmbed(chunks, "chunk_id", "chunk_text", cfg.dim)
      .filter(aggregate(col("emb"), lit(0.0), (a, x) => a + x * x) > 0)
  }

  /** Fold ONE micro-batch into the SQ8 index as layer
    * `baseBatchId + batchId` — O(batch), one layer.
    */
  def foldBatch(batch: DataFrame, batchId: Long, cfg: Config): Unit =
    Ann.sq8IndexAppend(encodeBatch(batch, cfg), "doc_id", "emb",
      pmod(col("doc_id"), lit(cfg.clusterMod)), cfg.indexDir,
      cfg.baseBatchId + batchId)

  /** Start the streaming ingest over a document stream. */
  def start(stream: DataFrame, cfg: Config,
            checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, cfg)
      }
      .start()
}
