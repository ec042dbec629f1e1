package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming-adjacent maintenance operators (SURVEY.md §2.1 S9, §2.9
  * W5/W6, §2.5 A4/A8 read-path audits).
  */
object Maintenance {

  /** S9: retention delete — drop rows older than `retentionUs` before the
    * newest observation (ref: core/.../WaveformProcessor.java:58-90,
    * WaveformController.java:84-87: cutoff is relative to the newest row,
    * not wall-clock). Emitted as a filter over the stored table: with the
    * table partitioned by date(obsTime) the predicate partition-prunes,
    * so the delete touches only expired partitions at any scale.
    */
  def retain(table: DataFrame, obsTimeUs: Column, retentionUs: Long): DataFrame = {
    // Resolve the cutoff to a SCALAR first and filter with a literal: a
    // literal predicate reaches the scan (PushedFilters) and partition-
    // prunes, whereas a runtime 1-row join forces two full scans. The
    // max() itself is a cheap column-pruned scan (min/max from parquet
    // footer stats at best).
    val row = table.agg(max(obsTimeUs).as("mx")).head()
    if (row.isNullAt(0)) table
    else table.filter(obsTimeUs >= lit(row.getLong(0) - retentionUs))
  }

  /** W5: priority union of a live stream and a backfill stream. Tags each
    * source and, inside a micro-batch fold, processes live rows first
    * (`priority` ascending) — the batch analog of the reference's queue
    * priority (application.properties:19). Rate caps belong on the
    * sources themselves (`maxOffsetsPerTrigger` / `maxFilesPerTrigger`).
    */
  def priorityUnion(live: DataFrame, backfill: DataFrame): DataFrame =
    live.withColumn("__priority", lit(0))
      .unionByName(backfill.withColumn("__priority", lit(1)))

  /** A4 (the reference's post-ingest gap audit,
    * monitoring/streamlit/validation.py:57-78): per (location, stream)
    * ordered by observation time, gap = this chunk's start minus the
    * previous chunk's end (obs + samples/rate). Returns rows violating
    * |gap| > toleranceUs — target: zero.
    */
  def waveformGapAudit(chunks: DataFrame, toleranceUs: Long = 1000L): DataFrame = {
    val w = Window.partitionBy(col("locationId"), col("streamId"))
      .orderBy(col("obsTimeUs"))
    chunks
      .withColumn("__prev_end",
        lag(col("obsTimeUs") +
          (size(col("values")).cast("long") * 1000000L)
            .cast("double").divide(col("samplingRate")).cast("long"),
          1).over(w))
      .withColumn("gap_us", col("obsTimeUs") - col("__prev_end"))
      .filter(col("__prev_end").isNotNull &&
        abs(col("gap_us")) > toleranceUs)
      .select(col("locationId"), col("streamId"), col("obsTimeUs"),
        col("gap_us"))
  }

  /** A8: orphan check — waveform rows with no attached visit
    * (validation.py:87-96). Target: zero after the periodic re-join.
    */
  def orphanAudit(chunks: DataFrame, visitFkCol: String): DataFrame =
    chunks.filter(col(visitFkCol).isNull)

  /** O15 orphan repair: re-attach orphan chunks to visits via the J5
    * point-in-time join (the "write orphan, re-join later" option the
    * reference documents but leaves unsolved,
    * docs/dev/features/waveform_hf_data.md:105-137).
    */
  def repairOrphans(chunks: DataFrame, visits: DataFrame): DataFrame = {
    val v = visits.select(col("location").as("v_loc"),
      col("visitId").as("v_visit"), col("admissionUs"), col("dischargeUs"))
    chunks.filter(col("visitId").isNull).drop("visitId")
      // half-open [admission, discharge): a chunk stamped exactly at a
      // handoff (prev discharge == next admission, same location) must
      // attach to exactly ONE visit — the incoming one — matching
      // occupancyAsOf's convention; an inclusive bound double-attached it
      .join(v, col("locationId") === col("v_loc") &&
        col("obsTimeUs") >= col("admissionUs") &&
        (col("dischargeUs").isNull || col("obsTimeUs") < col("dischargeUs")),
        "left")
      .withColumn("visitId", col("v_visit"))
      .drop("v_loc", "v_visit", "admissionUs", "dischargeUs")
      .unionByName(chunks.filter(col("visitId").isNotNull))
  }
}
