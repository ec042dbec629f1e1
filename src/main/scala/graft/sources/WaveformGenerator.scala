package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic waveform source (SURVEY.md §2.1 S11): per (location, stream)
  * sine wave `999 * sin(2π f k / rate)` with a persistent sample counter —
  * semantics from the reference's test-fixture generator
  * (waveform-generator/.../Hl7Generator.java:239-276).
  *
  * Built on `spark.range` (parallel, no data movement) — generating
  * N locations × rate × seconds samples is a single codegen'd projection.
  */
object WaveformGenerator {

  /** Flat samples: one row per (location, stream, k). */
  def samples(spark: SparkSession, nLocations: Int, rateHz: Int,
              seconds: Int, freqHz: Double = 5.0,
              startUs: Long = 0L): DataFrame = {
    val perLoc = rateHz.toLong * seconds
    spark.range(0, nLocations * perLoc, 1,
        spark.sparkContext.defaultParallelism)
      .select(
        concat(lit("LOC"), (col("id") / perLoc).cast("long")).as("location_id"),
        lit(s"${rateHz}hz").as("stream_id"),
        (col("id") % perLoc).as("k"),
        lit(rateHz).as("sampling_rate"),
        (lit(startUs) + (col("id") % perLoc) * lit(1000000L / rateHz)).as("ts_us"),
        (lit(999.0) * sin(lit(2.0 * math.Pi) * lit(freqHz) *
          (col("id") % perLoc).cast("double") / lit(rateHz.toDouble)))
          .as("sample"))
  }

  /** Pre-collation messages: samples packed `samplesPerMsg` per row (the
    * ≤40-samples/HL7-message shape the collator consumes). One row per
    * message built with `sequence`+`transform` — a pure projection over
    * `spark.range`, no shuffle (a groupBy/collect_list formulation
    * shuffled every individual sample and dominated the ingest benchmark).
    */
  def messages(spark: SparkSession, nLocations: Int, rateHz: Int,
               seconds: Int, samplesPerMsg: Int,
               freqHz: Double = 5.0, startUs: Long = 0L): DataFrame = {
    val totalPerLoc = rateHz.toLong * seconds
    val msgsPerLoc = (totalPerLoc + samplesPerMsg - 1) / samplesPerMsg
    spark.range(0, nLocations * msgsPerLoc, 1,
        spark.sparkContext.defaultParallelism)
      .select((col("id") / msgsPerLoc).cast("long").as("loc"),
        (col("id") % msgsPerLoc).as("msg_idx"))
      .select(
        concat(lit("LOC"), col("loc")).as("locationId"),
        lit(s"${rateHz}hz").as("streamId"),
        (lit(startUs) + col("msg_idx") * samplesPerMsg *
          lit(1000000L / rateHz)).as("obsTimeUs"),
        lit(rateHz).as("samplingRate"), lit("uV").as("unit"),
        transform(
          sequence(col("msg_idx") * samplesPerMsg,
            least((col("msg_idx") + 1) * samplesPerMsg, lit(totalPerLoc)) - 1),
          k => lit(999.0) * sin(lit(2.0 * math.Pi) * lit(freqHz) *
            k.cast("double") / lit(rateHz.toDouble))).as("values"))
  }
}
