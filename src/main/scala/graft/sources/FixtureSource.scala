package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import java.io.File
import scala.collection.mutable

/** S10: fixture corpus source (SURVEY.md §2.1/§5; semantics from the
  * reference's InterchangeMessageFactory + MonitoredFile,
  * docs/dev/onboarding.md:92-100).
  *
  * Fixtures are JSON files (one message object per line) under a corpus
  * root, mirroring the reference's yaml corpus layout
  * (AdtMessages/, LabOrders/winpath/, ...). The distinctive guarantee is
  * ported intact: file access is MONITORED, and a test run that leaves
  * any fixture unconsumed fails — dead fixtures can't silently rot.
  */
class FixtureSource(val root: File) {

  private val consumed = mutable.Set.empty[String]

  private def allFixtures: Seq[String] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".json") || f.getName.endsWith(".hl7"))
        Seq(f)
      else Nil
    walk(root).map(f => root.toPath.relativize(f.toPath).toString).sorted
  }

  /** Load one fixture file (relative path) with an explicit schema —
    * fixture schemas are code-defined contracts, never inferred.
    */
  def load(spark: SparkSession, relPath: String, schema: StructType): DataFrame = {
    val f = new File(root, relPath)
    require(f.exists, s"fixture not found: $relPath")
    consumed += relPath
    spark.read.schema(schema).json(f.getPath)
  }

  /** Load every fixture under a subdirectory as one DataFrame (the
    * permutation suites consume whole directories).
    */
  def loadDir(spark: SparkSession, relDir: String, schema: StructType): DataFrame = {
    val matching = allFixtures.filter(_.startsWith(relDir))
    require(matching.nonEmpty, s"no fixtures under: $relDir")
    matching.foreach(consumed += _)
    spark.read.schema(schema).json(
      matching.map(p => new File(root, p).getPath): _*)
  }

  /** Load raw HL7 wire fixtures (`.hl7`, one file = one message — the
    * reference's hl7-reader txt-corpus convention) under a subdirectory:
    * one row per file, column `raw`, ready for the Hl7Wire parsers.
    */
  def loadWireDir(spark: SparkSession, relDir: String): DataFrame = {
    val matching = allFixtures.filter(p =>
      p.startsWith(relDir) && p.endsWith(".hl7"))
    require(matching.nonEmpty, s"no wire fixtures under: $relDir")
    matching.foreach(consumed += _)
    spark.read.option("wholetext", "true")
      .text(matching.map(p => new File(root, p).getPath): _*)
      .withColumnRenamed("value", "raw")
  }

  /** The monitored-corpus guarantee: throws listing every fixture no
    * test consumed (ref MonitoredFile semantics).
    */
  def assertAllConsumed(): Unit = {
    val unused = allFixtures.filterNot(consumed)
    if (unused.nonEmpty)
      throw new IllegalStateException(
        s"unconsumed fixtures (every fixture must be exercised): " +
          unused.mkString(", "))
  }
}
