package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling harness (not part of the driver contract): stage-level
  * timing of the FULL curation recipe (the q126 lane) — which of
  * (state builds, folds, span gate, near-dup gate, final selection)
  * carries the cost at a given SF.
  *
  *   SPARK_GRAFT_SF_DIR=... runMain graft.tools.CurationProbe
  */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(
        f"[cur-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.operators.TextAnalysis
    import graft.streaming.CurationStream
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val mk = () => java.nio.file.Files
      .createTempDirectory("cur_probe").toString
    val benchIdx = mk(); val dsirIdx = mk(); val mixIdx = mk()
    time("state builds") {
      TextAnalysis.buildBenchmarkIndex(
        d.filter(pmod(col("doc_id"), lit(20)) === 0), "text", 5, benchIdx)
      TextAnalysis.buildDsirIndex(d, d.filter(col("lang") === "en"),
        "doc_id", "text", 65536, 1000000L, dsirIdx)
    }
    val train = d.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val cfg = CurationStream.Config(
      benchIdx, dsirIdx, mixIdx, "doc_id", "text", "lang",
      keepFrac10k = 4000L, spanIdx = Some(mk()), nearDupIdx = Some(mk()))
    time("fold batch 1")(CurationStream.foldBatch(
      train.filter(pmod(col("doc_id"), lit(2)) === 1), 1L, cfg))
    time("fold batch 2")(CurationStream.foldBatch(
      train.filter(pmod(col("doc_id"), lit(2)) === 0), 2L, cfg))
    val nSpan = time("span drop set")(
      CurationStream.spanDropSet(spark, cfg.spanIdx.get, cfg).count())
    val nNd = time("near-dup drop set")(
      CurationStream.nearDupDropSet(spark, cfg.nearDupIdx.get, cfg)
        .count())
    val nSel = time("select")(CurationStream.select(spark, cfg,
      Map("en" -> 8000L, "es" -> 1500L, "de" -> 500L)).count())
    System.err.println(
      s"[cur-probe] spanDrop=$nSpan nearDupDrop=$nNd selected=$nSel")
    spark.stop()
  }
}
