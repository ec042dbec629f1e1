package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Dump the RAG ENCODE-stage plans (chunk → embed → zero-drop, and the
  * SQ8 quantize projection) — the round-17 kernel-swap evidence. The
  * bench lanes' FINAL plans start at a localCheckpoint boundary, so the
  * encode interior (where chunk_windows / int8_quantize / vec_dot live)
  * never appears in plans/r17/<lane>_{before,after}.txt; this dumps the
  * stage itself. Usage: runMain graft.tools.EncodePlanDump <outDir> <suffix>
  */
object EncodePlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.analyzer.singlePassResolver.dualRunWithLegacy", "false")
      .config("spark.sql.analyzer.singlePassResolver.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("doc_id", col("doc_id").cast("long"))
    val cfg = graft.streaming.RagStream.Config(
      Files.createTempDirectory("encode_plan").toString, "doc_id", "text")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        df.queryExecution.explainString(ExplainMode.fromString("formatted"))
          .getBytes(StandardCharsets.UTF_8))
      System.err.println(s"[encodeplan] wrote $name ($suffix)")
    }
    dump("rag_encode_stage", graft.streaming.RagStream.encodeBatch(d, cfg))
    dump("sq8_quantize_stage", graft.operators.Ann.quantizeInt8(
      graft.streaming.RagStream.encodeBatch(d, cfg), "doc_id", "emb"))
    spark.stop()
  }
}
