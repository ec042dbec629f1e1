package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Ann, TextAnalysis}
import graft.sources.LabFunnel
import graft.streaming.RagStream

/** Stage-timing probe for the q195 wire→RAG lane (diagnosis driver:
  * which stage owns the wall-clock at sf0.1).
  */
object WireRagProbe {
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
      .config("spark.sql.analyzer.singlePassResolver.dualRunWithLegacy",
        "false")
      .config("spark.sql.analyzer.singlePassResolver.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val id = col("doc_id").cast("string")
    val report = regexp_replace(coalesce(col("text"), lit("")),
      "[^A-Za-z0-9 ]", "")
    val raw = concat_ws("\r",
      concat(lit("MSH|^~\\&|Bridges|UCLH|||20240501120000||ORU^R01|CP"),
        id, lit("|P|2.4")),
      concat(lit("ORC|RE|UH"), id, lit("|UH"), id, lit("||CM")),
      concat(lit("OBR|1|UH"), id, lit("|UH"), id,
        lit("|H^Histology^CPEAP|||20240501100000"), lit("|" * 15),
        lit("20240501113000||CP|F")),
      concat(lit("OBX|1|TX|UH"), id, lit("^^CPEAP||"), report,
        lit("||||||F")))
    val parsed = LabFunnel.parseCoPath(docs.withColumn("raw", raw), "raw")
    val tx = get(filter(col("coPathResults"),
      r => r.getField("valueType") === "TX"), lit(0))
    var labDocs = parsed.select(
      regexp_extract(col("sourceMessageId"), "^CP(\\d+)_01$", 1)
        .cast("long").as("doc_id"),
      coalesce(tx.getField("stringValue"), lit("")).as("text"))
      .localCheckpoint(false)
    time("parse+checkpoint (count)") { labDocs.count() }
    val cfg = RagStream.Config(
      java.nio.file.Files.createTempDirectory("wire_rag_probe").toString,
      "doc_id", "text",
      funnel = Some(RagStream.Funnel(langs = Seq("en"),
        minTokens = 20L, maxStop10k = 1500L, minAvgLen10 = 39L)))
    time("fold batch 1") {
      RagStream.foldBatch(
        labDocs.filter(pmod(col("doc_id"), lit(2)) === 0), 1L, cfg)
    }
    time("fold batch 2") {
      RagStream.foldBatch(
        labDocs.filter(pmod(col("doc_id"), lit(2)) === 1), 2L, cfg)
    }
    println(s"[probe] labDocs partitions: ${labDocs.rdd.getNumPartitions}")
    val labDocs32 = labDocs.repartition(32).localCheckpoint(false)
    time("repartition(32) checkpoint count") { labDocs32.count() }
    time("filter(qualityKeep) over 32-part count") {
      labDocs32.filter(TextAnalysis.qualityKeep(col("text"), Seq("en"),
        20L, 100000L, 1500L, 39L, 100L)).count()
    }
    time("filter(qualityKeep) count") {
      labDocs.filter(TextAnalysis.qualityKeep(col("text"), Seq("en"),
        20L, 100000L, 1500L, 39L, 100L)).count()
    }
    time("qualityFunnel.filter(keep) count") {
      TextAnalysis.qualityFunnel(labDocs, "doc_id", "text",
          langs = Seq("en"), minTokens = 20L, maxStop10k = 1500L,
          minAvgLen10 = 39L)
        .filter(col("keep")).count()
    }
    time("withColumn(__keep).filter count") {
      labDocs.withColumn("__keep", TextAnalysis.qualityKeep(col("text"),
          Seq("en"), 20L, 100000L, 1500L, 39L, 100L))
        .filter(col("__keep")).count()
    }
    time("encodeBatch(labDocs) full corpus count") {
      RagStream.encodeBatch(labDocs, cfg).count()
    }
    val sanitized = docs.select(col("doc_id").cast("long").as("doc_id"),
      report.as("text"))
    time("encodeBatch(parquet sanitized) full corpus count") {
      RagStream.encodeBatch(sanitized, cfg).count()
    }
    val cfgNoFunnel = cfg.copy(funnel = None)
    time("encodeBatch(labDocs) NO funnel count") {
      RagStream.encodeBatch(labDocs, cfgNoFunnel).count()
    }
    val qs = RagStream.encodeBatch(labDocs, cfg)
      .filter(pmod(col("doc_id"), lit(2000L)) === 0)
      .withColumn("probes", array(pmod(col("doc_id"), lit(4L)),
        pmod(col("doc_id") + 1L, lit(4L))))
    time("query encode + index query") {
      Ann.sq8IndexQuery(spark, cfg.indexDir, qs, "doc_id", "emb",
        "probes", k = 3).count()
    }
    spark.stop()
  }
}
