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

  /** Locations of the three persisted states + gate parameters.
    * `keepFrac10k` is the DSIR resampling fraction in parts-per-10000:
    * the SELECTION keeps the top fraction by importance score — a
    * fixed absolute score threshold would not survive a corpus change
    * (the exact-int score's scale shifts with the feature
    * distributions; measured: one corpus's maximum below another's
    * minimum), while a top-fraction is what importance RESAMPLING
    * does in the first place (Xie et al. 2023 sample by rank, not by
    * absolute score).
    */
  case class Config(benchIdx: String, dsirIdx: String, curIdx: String,
                    idCol: String, textCol: String, strataCol: String,
                    shingleN: Int = 5, deconThreshold: Double = 0.05,
                    nBuckets: Int = 65536, scale: Long = 1000000L,
                    keepFrac10k: Long = 4000L)

  /** Fold ONE micro-batch into the curation index — O(batch): the
    * decontamination gate and the DSIR scoring broadcast their
    * persisted state, nothing rescans earlier batches. Per-doc work
    * (gating, scoring, the frozen sort hash) happens HERE; decisions
    * that need global context (the top-fraction importance cut, the
    * mixture caps) happen in [[select]] over the skinny index. Index
    * row: (doc_id, stratum, h, n_feats, contrib_sum).
    */
  def foldBatch(batch: DataFrame, batchId: Long, cfg: Config): Unit = {
    val s = batch.sparkSession
    val clean = batch.join(
      TextAnalysis.decontaminateIncremental(s, cfg.benchIdx, batch,
          cfg.idCol, cfg.textCol, cfg.shingleN, cfg.deconThreshold)
        .filter(!col("contaminated")).select(col("doc_id").as(cfg.idCol)),
      cfg.idCol)
    val scored = TextAnalysis.dsirScoreIncremental(s, cfg.dsirIdx,
      clean, cfg.idCol, cfg.textCol, cfg.nBuckets, cfg.scale)
    clean.select(col(cfg.idCol).as("doc_id"),
        col(cfg.strataCol).as("stratum"),
        graft.functions.GraftFunctions.charPolyHash(
          concat(col(cfg.idCol).cast("string"), lit("|"),
            col(cfg.strataCol))).as("h"))
      .join(scored.select(col("doc_id"), col("n_feats"),
        col("contrib_sum")), Seq("doc_id"))
      .write.mode("overwrite").parquet(s"${cfg.curIdx}/batch=$batchId")
  }

  /** Derive the current selection from the curation index alone —
    * never rescans the corpus: rank every surviving doc by importance
    * score (identical doubles in any engine: exact-int ÷ exact-int)
    * with doc_id tie-break, keep the top `keepFrac10k` fraction
    * (exact integer count), then the exact mixture over the kept set.
    * Returns (doc_id, `strataCol`, mix_rank).
    */
  def select(spark: org.apache.spark.sql.SparkSession, cfg: Config,
             targetShare10k: Map[String, Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idx = spark.read.parquet(cfg.curIdx)
      .select(col("doc_id"), col("stratum"), col("h"),
        (col("contrib_sum").cast("double") /
          (col("n_feats") * lit(cfg.scale)).cast("double"))
          .as("dsir_score"))
    val total = idx.count()
    val keep = total * cfg.keepFrac10k / 10000L
    // DISTRIBUTED global rank (range sort + zipWithIndex): a
    // row_number over an unpartitioned window would pull the whole
    // index through one task — the index is skinny but still
    // corpus-cardinality rows
    // materialize the kept set ONCE: two downstream actions consume it
    // (the strata-count collect and the returned selection), and each
    // would otherwise re-run the full range-partitioned total sort +
    // zipWithIndex over the corpus-cardinality index. localCheckpoint
    // (executor-block-stored) truncates the lineage at the ranked
    // sliver — keepFrac of the index, the smallest thing to pin.
    val kept = graft.operators.Ranking.globalRowNumber(idx,
        Seq(col("dsir_score").desc, col("doc_id")), "imp_rank")
      .filter(col("imp_rank") <= lit(keep))
      .localCheckpoint(true)
    val counts = kept.groupBy("stratum").agg(count(lit(1)).as("cs"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("cs")).toMap
    val caps = TextAnalysis.deriveCaps(counts, targetShare10k)
    import spark.implicits._
    val capsDf = caps.toSeq.sortBy(_._1).toDF("stratum", "k")
    val maxK = if (caps.isEmpty) 0L else caps.values.max
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("h"), col("doc_id"))
    kept.join(broadcast(capsDf), Seq("stratum"))
      .withColumn("mix_rank", row_number().over(w).cast("long"))
      .filter(col("mix_rank") <= lit(maxK) && col("mix_rank") <= col("k"))
      .select(col("doc_id"), col("stratum").as(cfg.strataCol),
        col("mix_rank"))
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
