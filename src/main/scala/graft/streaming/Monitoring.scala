package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** §3.3 monitoring read path — the reference tracks ingest throughput
  * ("days of data processed per day", validation.md:51-53) and an
  * end-to-end freshness target (≤60 s standard, waveform 10-20 s,
  * waveform_hf_data.md:25-27). Here both are windowed aggregations over
  * the message stream's event time.
  *
  * Unlike the star folds (W1: unbounded lateness ⇒ no watermark may
  * bound STATE), monitoring tolerates approximation — so the streaming
  * form uses a real watermark + event-time window: state is bounded,
  * results emit on watermark passage (append mode), and a message later
  * than the allowed delay simply doesn't count toward its minute — the
  * correct trade for an operational dashboard, and exactly the shape
  * Spark's windowed-state eviction optimizes. At scale the window agg is
  * one shuffle on (window, dims) with map-side partial aggregation.
  */
object Monitoring {

  /** Per-bucket ingest rates (batch form; the oracle-checked path).
    * One row per (bucket, dims): message count + event-time span.
    */
  def ingestRates(df: DataFrame, tsUsCol: String, bucketSec: Long,
                  dims: Seq[String]): DataFrame = {
    val bucketUs = bucketSec * 1000000L
    val bucket = (col(tsUsCol).cast("long") / bucketUs).cast("long") * bucketUs
    df.groupBy((bucket.as("bucket_us") +: dims.map(col)): _*)
      .agg(count(lit(1)).as("n_messages"),
        min(col(tsUsCol)).as("first_us"),
        max(col(tsUsCol)).as("last_us"))
  }

  /** Streaming form: watermarked event-time window aggregation in
    * append mode. `delay` (e.g. "30 seconds") bounds both state and the
    * lateness a bucket waits for.
    */
  def ingestRatesStream(stream: DataFrame, tsUsCol: String,
                        bucketSec: Long, delay: String,
                        dims: Seq[String]): DataFrame = {
    val withTs = stream.withColumn("__event_time",
      timestamp_micros(col(tsUsCol)))
      .withWatermark("__event_time", delay)
    withTs
      .groupBy((window(col("__event_time"), s"$bucketSec seconds")
        .as("__w") +: dims.map(col)): _*)
      .agg(count(lit(1)).as("n_messages"),
        min(col(tsUsCol)).as("first_us"),
        max(col(tsUsCol)).as("last_us"))
      .select((unix_micros(col("__w.start")).as("bucket_us") +:
        dims.map(col)) ++
        Seq(col("n_messages"), col("first_us"), col("last_us")): _*)
  }

  /** Freshness probe: lag between the newest event seen and `nowUs` —
    * the reference's ≤60 s bar. One tiny aggregate row per family.
    */
  def freshnessLag(df: DataFrame, tsUsCol: String, nowUs: Long,
                   dims: Seq[String]): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(max(col(tsUsCol)).as("newest_us"))
      .withColumn("lag_us", lit(nowUs) - col("newest_us"))

  /** Throughput ratio: event-time span covered per wall-clock second of
    * processing — "days of data processed per day of validation run".
    */
  def throughputRatio(df: DataFrame, tsUsCol: String,
                      wallSeconds: Double): Column =
    (max(col(tsUsCol)) - min(col(tsUsCol))).cast("double") /
      lit(wallSeconds * 1e6)
}
