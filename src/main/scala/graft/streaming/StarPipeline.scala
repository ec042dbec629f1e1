package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.kernel.BitemporalKernel

/** S8/W1: the streaming star-maintenance pipeline — every micro-batch of
  * messages is folded into the persisted bitemporal state via the kernel
  * (SURVEY.md §7 design stance: "the star tables ARE the state"; no
  * watermark can bound star state because lateness is unbounded, ref
  * Technical_overview_of_EMAP.md:180).
  *
  * foreachBatch = the reference's per-message ACID transaction at
  * micro-batch granularity: read current history, fold, atomically
  * replace. Parquet-swap here (single-writer, version directories +
  * _CURRENT pointer — atomic because the pointer write is one rename);
  * swap in Delta/Iceberg MERGE for multi-writer production.
  */
object StarPipeline {

  final case class Config(stateDir: String, keyCols: Seq[String],
                          validFromUsCol: String, tieCol: String,
                          payloadCols: Seq[String])

  private def currentVersion(spark: SparkSession, dir: String): Option[String] = {
    val f = new java.io.File(s"$dir/_CURRENT")
    if (f.exists) Some(new String(java.nio.file.Files.readAllBytes(f.toPath)).trim)
    else None
  }

  def readState(spark: SparkSession, cfg: Config, table: String): Option[DataFrame] =
    currentVersion(spark, s"${cfg.stateDir}/$table")
      .map(v => spark.read.parquet(s"${cfg.stateDir}/$table/$v"))

  private def writeState(df: DataFrame, cfg: Config, table: String,
                         batchId: Long): Unit = {
    val dir = s"${cfg.stateDir}/$table"
    val v = s"v$batchId"
    df.write.mode("overwrite").parquet(s"$dir/$v")
    val tmp = java.nio.file.Paths.get(dir, "_CURRENT.tmp")
    java.nio.file.Files.write(tmp, v.getBytes)
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, "_CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Fold one micro-batch into the persisted state. Idempotent on replay
    * (W2): re-folding the same batch produces the same history because
    * the kernel dedups on (key, validFrom, tie).
    */
  def foldBatch(batch: DataFrame, batchId: Long, cfg: Config): Unit = {
    val spark = batch.sparkSession
    val history = readState(spark, cfg, "history")
      .getOrElse(batch.limit(0))
    val r = BitemporalKernel.applyBatch(history, batch, cfg.keyCols,
      cfg.validFromUsCol, cfg.tieCol, cfg.payloadCols)
    // materialize history first; live/audit are derived views of it
    writeState(r.history, cfg, "history", batchId)
    writeState(r.live, cfg, "live", batchId)
    writeState(r.audit, cfg, "audit", batchId)
  }

  /** Start the maintenance query over a message stream. */
  def start(messages: DataFrame, cfg: Config,
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    messages.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, cfg))
      .start()
}
