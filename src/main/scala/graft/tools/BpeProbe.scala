package graft.tools

import org.apache.spark.sql.SparkSession

/** Profiling harness (not part of the driver contract): time BPE
  * training at a REALISTIC merge count on a synthetic vocabulary —
  * the sf corpora have a ~31-word vocab that exhausts after ~80
  * merges, so the production-shaped measurement (tens of thousands of
  * distinct words, hundreds of merges) needs a synthetic corpus.
  *
  *   runMain graft.tools.BpeProbe [nWords] [numMerges]
  *
  * Default: 50k distinct 32-char hex words (md5 of the row id — a
  * 16-symbol alphabet with realistic pair-frequency skew), 1000
  * merges. This is the scale check for bpeTrain's driver-local loop:
  * one corpus pass, then the merge loop over the incrementally
  * maintained pair index.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val nWords = if (args.length > 0) args(0).toLong else 50000L
    val numMerges = if (args.length > 1) args(1).toInt else 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.range(nWords)
      .selectExpr("md5(cast(id as string)) as text")
    val t0 = System.nanoTime()
    val merges = graft.operators.TextAnalysis
      .bpeTrain(docs, "text", numMerges)
    val n = merges.count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[bpe-probe] $n merges over $nWords distinct words: $dt%.2f s")
    spark.stop()
  }
}
