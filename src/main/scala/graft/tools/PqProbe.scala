package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for the PQ/IVF-PQ lanes. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.analyzer.singlePassResolver.dualRunWithLegacy", "false")
      .config("spark.sql.analyzer.singlePassResolver.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet")
    em.count()
    var coarse: Seq[Seq[Double]] = null
    time("coarse train") {
      coarse = graft.operators.Ann.ivfPqTrainCoarse(em, "vec_id", "embedding", 4, 2)
    }
    var res: org.apache.spark.sql.DataFrame = null
    time("residuals checkpoint") {
      res = graft.operators.Ann.ivfPqResiduals(em, "vec_id", "embedding", coarse)
        .localCheckpoint(true)
    }
    var cbs: Seq[Seq[Seq[Double]]] = null
    time("sub trainings") {
      cbs = graft.operators.Ann.pqTrainCodebooks(res, "emb_id", "rv", 4, 8, 2)
    }
    time("encode+search") {
      val sub = cbs.head.head.length
      val codes = res.select(col("emb_id"), col("coarse"),
        array(cbs.zipWithIndex.map { case (cb, mi) =>
          graft.operators.Ann.pqCluster(slice(col("rv"), mi * sub + 1, sub), cb)
        }: _*).as("codes"))
      val n = graft.operators.Ann.ivfPqSearch(
        em.filter(pmod(col("vec_id"), lit(50)) === 0), codes,
        "vec_id", "embedding", coarse, cbs, 2, 5).count()
      System.err.println(s"[probe] rows $n")
    }
    spark.stop()
  }
}
