package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import graft.streaming.WaveformCollator
import graft.streaming.WaveformCollator.{Config, WaveChunk, WaveMsg}

/** S5: TCP waveform listener — the socket front door of the waveform
  * path (ref: waveform-reader's TCP ingest + emap-interchange
  * WaveformMessage shape; framing below is the project's own
  * line-delimited wire contract, not the proprietary device protocol).
  *
  * Wire format, one message per LF-terminated line:
  *
  *   locationId|streamId|obsTimeUs|samplingRate|unit|v1,v2,v3,...
  *
  * Spark's built-in `socket` source delivers the raw lines; framing is
  * a pure column projection (split + try_cast, codegen'd), so the
  * listener scales exactly like any other projection — and the same
  * parser serves batch replays of captured line files via
  * [[parseFrames]] on a static DataFrame.
  *
  * Malformed lines (wrong arity, unparseable numbers) become rows with
  * null required fields: [[malformed]] is the dead-letter filter,
  * [[wellFormed]] feeds the collator. Nothing throws on bad input —
  * a hostile byte on the socket must never kill the query.
  */
object WaveformListener {

  /** Parse framed lines (column `lineCol`) into WaveMsg-shaped rows. */
  def parseFrames(lines: DataFrame, lineCol: String): DataFrame =
    lines.select(split(col(lineCol), "\\|").as("f"))
      .selectExpr(
        "get(f, 0) AS locationId",
        "get(f, 1) AS streamId",
        "try_cast(get(f, 2) AS BIGINT) AS obsTimeUs",
        "try_cast(get(f, 3) AS INT) AS samplingRate",
        "get(f, 4) AS unit",
        "transform(split(get(f, 5), ','), v -> try_cast(v AS DOUBLE)) AS values")

  private def broken =
    col("locationId").isNull || col("streamId").isNull ||
      col("obsTimeUs").isNull || col("samplingRate").isNull ||
      col("values").isNull || exists(col("values"), v => v.isNull)

  def wellFormed(parsed: DataFrame): DataFrame = parsed.filter(!broken)

  /** Dead-letter channel: rows that failed framing. */
  def malformed(parsed: DataFrame): DataFrame = parsed.filter(broken)

  /** Open the TCP listener and return the collated chunk stream:
    * socket lines → frame parse → W4 gap-split collation.
    */
  def listen(spark: SparkSession, host: String, port: Int,
             cfg: Config = Config(),
             timeout: GroupStateTimeout =
               GroupStateTimeout.ProcessingTimeTimeout): Dataset[WaveChunk] = {
    import spark.implicits._
    val lines = spark.readStream.format("socket")
      .option("host", host).option("port", port).load()
    val msgs = wellFormed(parseFrames(lines, "value")).as[WaveMsg]
    WaveformCollator.collateStream(msgs, cfg, timeout)(spark)
  }
}
