package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Stage-timing probe for CurationStream.foldBatch internals (round-16
  * optimization diagnosis: which fold consumer owns the wall-clock).
  * Mirrors foldBatch's stages on the CurationProbe fixture, timing
  * each consumer separately. Not part of the driver contract.
  */
object FoldProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.useIdInClassName", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(
        f"[fold-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.functions.GraftFunctions.{charPolyHash, shingles, tokens}
    // untimed JVM/codegen warmup (the Bench convention)
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.limit(64).select(explode(array_distinct(
        graft.functions.ShingleHash.shingleHashes(col("text"), 5))))
      .count()
    val mk = () => java.nio.file.Files
      .createTempDirectory("fold_probe").toString
    val benchIdx = mk(); val dsirIdx = mk()
    val bench = d.filter(pmod(col("doc_id"), lit(20)) === 0)
    time("bench index build") {
      TextAnalysis.buildBenchmarkIndex(bench, "text", 5, benchIdx)
    }
    time("dsir index build") {
      TextAnalysis.buildDsirIndex(d, d.filter(col("lang") === "en"),
        "doc_id", "text", 65536, 1000000L, dsirIdx)
    }
    val batch = d.filter(pmod(col("doc_id"), lit(20)) =!= 0)
      .filter(pmod(col("doc_id"), lit(2)) === 1)
    // ---- fold stages, separately ----
    val deconSurvivors = time("decon gate (count)") {
      val ds = TextAnalysis.decontaminateIncremental(spark, benchIdx,
          batch, "doc_id", "text", 5, 0.1)
        .filter(!col("contaminated"))
        .select(col("doc_id"))
      ds.count(); ds
    }
    val clean = time("clean join + checkpoint (count)") {
      val c = batch.join(deconSurvivors, "doc_id").localCheckpoint(false)
      c.count(); c
    }
    time("span layer write") {
      clean.select(col("doc_id"),
          explode_outer(shingles(tokens(col("text")), 8)).as("win"))
        .filter(col("win").isNotNull)
        .select(col("doc_id"), charPolyHash(col("win")).as("wh"))
        .write.mode("overwrite").parquet(mk() + "/batch=1")
    }
    time("sig layer write") {
      val sigs = graft.operators.Dedup.minhashSignatures(clean,
        "doc_id", "text", 3, 64, seed = 42L, portable = true)
      val sigArr = array((0 until 64).map(i => col(s"s$i")): _*)
      sigs.select(col("doc_id"), sigArr.as("sig"))
        .join(clean.select(col("doc_id"),
          size(array_distinct(tokens(col("text")))).cast("long")
            .as("n_distinct")), Seq("doc_id"))
        .write.mode("overwrite").parquet(mk() + "/batch=1")
    }
    time("bucket layer write") {
      val sigs = graft.operators.Dedup.minhashSignatures(clean,
        "doc_id", "text", 3, 64, seed = 42L, portable = true)
      graft.operators.Dedup.bandBuckets(sigs, 64, 16, portable = true)
        .write.mode("overwrite").parquet(mk() + "/batch=1")
    }
    time("dsir score + curIdx write") {
      val scored = TextAnalysis.dsirScoreIncremental(spark, dsirIdx,
        clean, "doc_id", "text", 65536, 1000000L)
      clean.select(col("doc_id"), col("lang").as("stratum"),
          charPolyHash(concat(col("doc_id").cast("string"), lit("|"),
            col("lang"))).as("h"))
        .join(scored.select(col("doc_id"), col("n_feats"),
          col("contrib_sum")), Seq("doc_id"))
        .write.mode("overwrite").parquet(mk() + "/batch=1")
    }
    spark.stop()
  }
}
