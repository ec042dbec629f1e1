package graft.tools

import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession
import org.apache.spark.metrics.source.CodegenMetrics

/** Compile-vs-execute attribution for the wire→RAG lanes (r14 VERDICT
  * task #1): runs q195 and q204 back-to-back, twice each, in ONE JVM
  * and prints per-run deltas of
  *   - wall-clock,
  *   - whole-stage-codegen compilations (count + approx ms, from
  *     [[CodegenMetrics]] — Janino compile of generated classes),
  *   - HotSpot JIT total compilation time (CompilationMXBean — the
  *     warm-up of the interpreted HOF eval paths the HL7 parse rides).
  *
  * Env knobs:
  *   - `PROBE_USE_ID=false` sets `spark.sql.codegen.useIdInClassName=
  *     false` (stable generated class names → Janino cache can hit
  *     across lanes whose stage SOURCE matches; the cache key is the
  *     source text with comments excluded, so stage-id comments don't
  *     break it — only the class name does).
  *   - `SPARK_GRAFT_SF_DIR` (default sf0.1), `SPARK_GRAFT_CPUS`.
  *
  * Reading the output: if q204-run1's wall excess over q204-run2
  * tracks its codegen/JIT deltas, the gate gap is per-JVM warm-up,
  * not plan cost; if `PROBE_USE_ID=false` shrinks q204-run1's compile
  * count, the two lanes' post-checkpoint stages share generated code.
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val useId = sys.env.getOrElse("PROBE_USE_ID", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.maxFields", "2000")
      .config("spark.sql.codegen.useIdInClassName", useId)
      .config("spark.sql.analyzer.singlePassResolver.dualRunWithLegacy",
        "false")
      .config("spark.sql.analyzer.singlePassResolver.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jitBean = ManagementFactory.getCompilationMXBean

    def compileMs(): Double = {
      val h = CodegenMetrics.METRIC_COMPILATION_TIME
      h.getCount * h.getSnapshot.getMean
    }
    def run(tag: String)(body: => Unit): Unit = {
      val c0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      val m0 = compileMs()
      val j0 = jitBean.getTotalCompilationTime
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      val dc = CodegenMetrics.METRIC_COMPILATION_TIME.getCount - c0
      val dm = compileMs() - m0
      val dj = jitBean.getTotalCompilationTime - j0
      println(f"[codegen-probe] $tag%-28s wall=$wall%7.2f s  " +
        f"codegen: $dc%4d classes ~${dm / 1000.0}%6.2f s  " +
        f"jit: ${dj / 1000.0}%6.2f s")
    }

    println(s"[codegen-probe] useIdInClassName=$useId sf=$sfDir")
    val q195 = graft.SparkEntry.queries("q195_wire_rag")
    val q204 = graft.SparkEntry.queries("q204_wire_pdf_rag")
    run("q195 run1 (cold)") { q195(spark, sfDir).count() }
    run("q195 run2 (warm)") { q195(spark, sfDir).count() }
    run("q204 run1 (after q195)") { q204(spark, sfDir).count() }
    run("q204 run2 (warm)") { q204(spark, sfDir).count() }
    run("q195 run3 (after q204)") { q195(spark, sfDir).count() }
    spark.stop()
  }
}
