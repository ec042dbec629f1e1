package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.RagStream

/** Stage-timing probe for the RAG vertical (q164 shape): where does
  * the lane's wall-clock sit after the round-16 embed kernel swap —
  * chunk+embed, index folds, query encode, or the probed query?
  * Not part of the driver contract.
  */
object RagProbe {
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
        f"[rag-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.limit(64).count()
    val cfg = RagStream.Config(java.nio.file.Files
      .createTempDirectory("rag_probe").toString, "doc_id", "text")
    time("encodeBatch full corpus (noop)") {
      RagStream.encodeBatch(d, cfg).write.format("noop")
        .mode("overwrite").save()
    }
    time("encodeBatch again (noop)") {
      RagStream.encodeBatch(d, cfg).write.format("noop")
        .mode("overwrite").save()
    }
    time("fold batch 1 (half corpus)") {
      RagStream.foldBatch(
        d.filter(pmod(col("doc_id"), lit(2)) === 0), 1L, cfg)
    }
    time("fold batch 2") {
      RagStream.foldBatch(
        d.filter(pmod(col("doc_id"), lit(2)) === 1), 2L, cfg)
    }
    val qs = time("query encode (chunk filter, noop)") {
      val q = RagStream.encodeBatch(d, cfg)
        .filter(pmod(col("doc_id"), lit(200L)) === 0)
        .withColumn("probes", array(pmod(col("doc_id"), lit(4L)),
          pmod(col("doc_id") + 1L, lit(4L))))
      q.write.format("noop").mode("overwrite").save()
      q
    }
    time("sq8IndexQuery (count)") {
      graft.operators.Ann.sq8IndexQuery(spark, cfg.indexDir, qs,
        "doc_id", "emb", "probes", k = 3).count()
    }
    spark.stop()
  }
}
