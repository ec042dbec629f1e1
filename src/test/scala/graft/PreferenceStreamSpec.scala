package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Preference
import graft.streaming.PreferenceStream

case class PrefEnvelope(kind: String, query_id: Long, other_id: Long,
                        rank: Long, sim10k: Long, pos_sim10k: Long)

/** Streamed DPO vertical: micro-batch boundaries and at-least-once
  * redelivery must be invisible in the assembled preference pairs.
  */
class PreferenceStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def mk() =
    java.nio.file.Files.createTempDirectory("pref_stream").toString

  // 2-d corpus with exact cosines (the TrainingDataOpsSpec geometry):
  // ids 0-1 are the queries, 10+ the responses
  private val corpus = Seq(
    (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
    (10L, Seq(0.8f, 0.6f)), (11L, Seq(0.6f, 0.8f)),
    (12L, Seq(1.0f, 0.0f)), (13L, Seq(0.0f, 1.0f)),
    (14L, Seq(-1.0f, 0.0f)), (15L, Seq(0.0f, -1.0f)),
    (16L, Seq(0.6f, -0.8f)), (17L, Seq(-0.8f, 0.6f)))
    .toDF("vec_id", "embedding")

  private val pairs = Seq((0L, 10L), (0L, 12L), (1L, 11L), (1L, 13L))
    .toDF("query_id", "pos_id")

  private def negs: DataFrame =
    graft.operators.Ann.hardNegatives(pairs, corpus, "vec_id",
      "embedding", k = 3, margin10k = 9000L)

  private def envelope(p: DataFrame, n: DataFrame): Seq[PrefEnvelope] =
    p.select(col("query_id"), col("pos_id")).collect()
      .map(r => PrefEnvelope("pair", r.getLong(0), r.getLong(1),
        0L, 0L, 0L)).toSeq ++
      n.select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("sim") * 10000, 0).cast("long"),
          round(col("pos_sim") * 10000, 0).cast("long")).collect()
        .map(r => PrefEnvelope("neg", r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSeq

  private def streamIn(batches: Seq[Seq[PrefEnvelope]])
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val cfg = PreferenceStream.Config(mk())
    val ms = MemoryStream[PrefEnvelope](spark)
    val q = PreferenceStream.start(ms.toDF(), cfg, mk())
    batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()
    (PreferenceStream.pairsState(spark, cfg),
      PreferenceStream.negativesState(spark, cfg))
  }

  private def assembled(p: DataFrame, n: DataFrame): Seq[String] =
    Preference.assemble(p, n, corpus, "vec_id", "embedding",
        minGap10k = 50L, pairsPerPrompt = 2)
      .collect().map(_.toString).sorted.toSeq

  test("micro-batch boundaries are invisible: two different splits " +
      "of the envelope stream assemble identically to the one-shot " +
      "batch run (sims round-trip the s4 integer layers exactly)") {
    val batch = assembled(pairs, negs)
    assert(batch.nonEmpty)
    val env = envelope(pairs, negs)
    val a = streamIn(Seq(env.filter(_.query_id == 0L),
      env.filter(_.query_id != 0L)))
    val b = streamIn(Seq(env.filter(_.kind == "pair"),
      env.filter(_.kind == "neg")))
    assert(assembled(a._1, a._2) == batch)
    assert(assembled(b._1, b._2) == batch)
  }

  test("at-least-once redelivery collapses: rows redelivered in a " +
      "later batch (and a whole replayed slice) change nothing") {
    val batch = assembled(pairs, negs)
    val env = envelope(pairs, negs)
    val b1 = env.filter(_.query_id == 0L)
    val st = streamIn(Seq(b1,
      env.filter(_.query_id != 0L) ++ b1.take(3)))
    assert(assembled(st._1, st._2) == batch)
  }

  test("engine-level batch replay is idempotent: re-folding the same " +
      "batchId overwrites its own layer") {
    val cfg = PreferenceStream.Config(mk())
    val env = envelope(pairs, negs)
    val (b1, b2) = env.splitAt(env.size / 2)
    PreferenceStream.foldBatch(b1.toDF(), 1L, cfg)
    PreferenceStream.foldBatch(b2.toDF(), 2L, cfg)
    PreferenceStream.foldBatch(b1.toDF(), 1L, cfg) // crash replay
    val p = PreferenceStream.pairsState(spark, cfg)
    val n = PreferenceStream.negativesState(spark, cfg)
    assert(p.count() == pairs.count())
    assert(n.count() == negs.count())
    assert(assembled(p, n) == assembled(pairs, negs))
  }

  private def layerNames(cfg: PreferenceStream.Config,
                         store: String): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(s"${cfg.root}/$store")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).toSeq.sorted
  }

  test("compaction: both layer families collapse to one, the " +
      "assembled pairs are identical before/after, the crash window " +
      "(merged + old coexisting) is state-invisible, and a replay of " +
      "a compacted-away batch collapses") {
    val cfg = PreferenceStream.Config(mk())
    val env = envelope(pairs, negs)
    val b1 = env.filter(_.query_id == 0L)
    val b2 = env.filter(_.query_id != 0L)
    PreferenceStream.foldBatch(b1.toDF(), 1L, cfg)
    PreferenceStream.foldBatch(b2.toDF(), 2L, cfg)
    val before = assembled(PreferenceStream.pairsState(spark, cfg),
      PreferenceStream.negativesState(spark, cfg))
    // crash window: merged layer written, old layers NOT yet deleted
    // — pair/negative rows are facts, so the read side must see
    // identical state through the whole window
    PreferenceStream.pairsState(spark, cfg)
      .write.mode("overwrite").parquet(s"${cfg.root}/pairs/batch=c2")
    assert(layerNames(cfg, "pairs").size == 3)
    assert(assembled(PreferenceStream.pairsState(spark, cfg),
      PreferenceStream.negativesState(spark, cfg)) == before)
    // the real compaction (idempotent over the half-done state)
    PreferenceStream.compact(spark, cfg)
    assert(layerNames(cfg, "pairs") == Seq("batch=c2"))
    assert(layerNames(cfg, "negatives") == Seq("batch=c2"))
    assert(assembled(PreferenceStream.pairsState(spark, cfg),
      PreferenceStream.negativesState(spark, cfg)) == before)
    // engine replay of a compacted-away batchId re-creates its layer
    // with the same fact rows — duplicates, collapsed by the distinct
    PreferenceStream.foldBatch(b1.toDF(), 1L, cfg)
    assert(assembled(PreferenceStream.pairsState(spark, cfg),
      PreferenceStream.negativesState(spark, cfg)) == before)
    PreferenceStream.compact(spark, cfg)
    assert(layerNames(cfg, "pairs") == Seq("batch=c2"))
    assert(assembled(PreferenceStream.pairsState(spark, cfg),
      PreferenceStream.negativesState(spark, cfg)) == before)
  }
}
