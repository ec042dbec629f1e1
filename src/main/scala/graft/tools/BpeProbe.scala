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

    // ---- encode-transport probe: inline merge table vs broadcast ----
    // Production vocabularies are ~30-50k merges; the sf corpora can't
    // train that many, so pad the REAL trained table (applied per
    // word) with synthetic never-matching merges (realistic payload
    // bytes, identical applied work either way).
    val trained = merges.orderBy("step")
      .select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val target = 50000
    val padded = trained ++ (trained.size until target).map(i =>
      (f"§L$i%05d", f"§R$i%05d"))
    import org.apache.spark.sql.functions._
    def planBytes(c: org.apache.spark.sql.Column): Int = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c))
      oos.close(); bos.size()
    }
    val inlineCol = graft.functions.BpeOps.bpeApply(col("text"), padded)
    val bc = spark.sparkContext.broadcast(padded.toArray)
    val bcCol = graft.functions.BpeOps.bpeApplyBc(col("text"), bc)
    println(s"[bpe-probe] serialized expression: " +
      s"inline=${planBytes(inlineCol)} B, broadcast=${planBytes(bcCol)} B")
    def time(label: String, c: org.apache.spark.sql.Column): Long = {
      val t = System.nanoTime()
      val cnt = docs.select(explode(c)).count()
      println(f"[bpe-probe] $label encode: " +
        f"${(System.nanoTime() - t) / 1e9}%.2f s ($cnt symbols)")
      cnt
    }
    val a = time("inline   ", inlineCol)  // warm: first run pays startup
    val b = time("broadcast", bcCol)
    val a2 = time("inline   ", inlineCol)
    val b2 = time("broadcast", bcCol)
    require(a == b && a2 == b2, s"symbol counts diverged: $a vs $b")
    spark.stop()
  }
}
