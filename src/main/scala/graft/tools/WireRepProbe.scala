package graft.tools

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Rep-growth probe for q195_wire_rag (round-17 item 2: reps grew
  * 8.7 → 22 → 28 s within one 32-core JVM in BENCH_r16). Runs the lane
  * N times with Bench's exact session conf and drop-caches discipline,
  * logging per rep: wall, GC time delta, JIT compilation time delta,
  * loaded-class delta, heap after System.gc(), broadcast/persistent-RDD
  * counts — to separate codegen-cache churn vs GC pressure vs broadcast
  * accumulation.
  */
object WireRepProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 5
    val lane = if (args.length > 1) args(1) else "q195_wire_rag"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def jitMs: Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime
    def classes: Long = java.lang.management.ManagementFactory
      .getClassLoadingMXBean.getTotalLoadedClassCount
    def heapMb: Long = {
      val u = java.lang.management.ManagementFactory.getMemoryMXBean
        .getHeapMemoryUsage
      u.getUsed / (1024 * 1024)
    }

    // Bench's warmups
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    graft.SparkEntry.queries.get(lane).foreach { _ =>
      // wire prewarm exactly as Bench does
      graft.SparkEntry.wireRagChain(spark,
        spark.read.parquet(s"$sfDir/documents.parquet").limit(64),
        "probe_prewarm").count()
    }
    def dropCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    dropCaches()

    val fn = graft.SparkEntry.queries(lane)
    for (i <- 1 to reps) {
      val (g0, j0, c0) = (gcMs, jitMs, classes)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val (g1, j1, c1) = (gcMs, jitMs, classes)
      dropCaches()
      val nRdd = spark.sparkContext.getPersistentRDDs.size
      println(f"[rep$i] wall=$dt%.2f s gc=${g1 - g0} ms jit=${j1 - j0} ms " +
        f"classes=${c1 - c0} heapAfterGc=${heapMb} MB persistedRdds=$nRdd rows=$n")
    }
    spark.stop()
  }
}
