package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.streaming.CurationStream

/** Round-17 stage probe for the q126_curation_full lane: times the
  * EXACT stages the lane pays — fixture state builds, the two folds,
  * then each select() component (span drop set, near-dup drop set
  * incl. the CC loop, gated rank, mixture) — so optimization effort
  * goes where the wall-clock is. Not part of the driver contract.
  */
object CurationLaneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.maxFields", "2000")
      .config("spark.sql.analyzer.singlePassResolver.dualRunWithLegacy", "false")
      .config("spark.sql.analyzer.singlePassResolver.enabled", "false")
      .config("spark.sql.codegen.useIdInClassName", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(
        f"[lane-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // untimed warmup (the Bench convention)
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.limit(64).count()

    val mk = () => graft.SparkEntry.tmpDir("lane_probe")
    val benchIdx = mk(); val dsirIdx = mk(); val mixIdx = mk()
    val bench = d.filter(pmod(col("doc_id"), lit(20)) === 0)
    time("bench index build") {
      TextAnalysis.buildBenchmarkIndex(bench, "text", 5, benchIdx)
    }
    time("dsir index build") {
      TextAnalysis.buildDsirIndex(d, d.filter(col("lang") === "en"),
        "doc_id", "text", 65536, 1000000L, dsirIdx)
    }
    val cfg = CurationStream.Config(
      benchIdx, dsirIdx, mixIdx, "doc_id", "text", "lang",
      keepFrac10k = 4000L,
      spanIdx = Some(mk()), nearDupIdx = Some(mk()))
    val train = d.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    time("fold batch 1") {
      CurationStream.foldBatch(
        train.filter(pmod(col("doc_id"), lit(2)) === 1), 1L, cfg)
    }
    time("fold batch 2") {
      CurationStream.foldBatch(
        train.filter(pmod(col("doc_id"), lit(2)) === 0), 2L, cfg)
    }
    // ---- select() stages ----
    val spanDrop = time("spanDropSet (count)") {
      val ds = CurationStream.spanDropSet(spark, cfg.spanIdx.get, cfg)
        .localCheckpoint(false)
      println(s"[lane-probe] span drops: ${ds.count()}"); ds
    }
    val ndDrop = time("nearDupDropSet (count)") {
      val ds = CurationStream.nearDupDropSet(spark, cfg.nearDupIdx.get,
        cfg).localCheckpoint(false)
      println(s"[lane-probe] neardup drops: ${ds.count()}"); ds
    }
    time("full select (count)") {
      val n = CurationStream.select(spark, cfg,
        Map("en" -> 8000L, "es" -> 1500L, "de" -> 500L)).count()
      println(s"[lane-probe] selected: $n")
    }
    spark.stop()
  }
}
