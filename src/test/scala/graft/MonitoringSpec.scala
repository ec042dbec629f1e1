package graft

import org.apache.spark.sql.functions._
import graft.streaming.Monitoring

case class MonMsg(ts_us: Long, family: String)

class MonitoringSpec extends SparkSpecBase {
  import spark.implicits._

  test("batch ingest rates bucket counts and spans per family") {
    val m = 60L * 1000000L
    val df = Seq(
      MonMsg(10L * 1000000L, "adt"), MonMsg(20L * 1000000L, "adt"),
      MonMsg(30L * 1000000L, "labs"), MonMsg(70L * 1000000L, "adt")).toDF()
    val r = Monitoring.ingestRates(df, "ts_us", 60L, Seq("family"))
      .orderBy("bucket_us", "family")
      .select("bucket_us", "family", "n_messages", "first_us", "last_us")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (0L, "adt", 2L, 10000000L, 20000000L),
      (0L, "labs", 1L, 30000000L, 30000000L),
      (m, "adt", 1L, 70000000L, 70000000L)))
  }

  test("streaming rates: watermark emits closed windows, drops too-late rows") {
    implicit val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[MonMsg](spark)
    val q = Monitoring.ingestRatesStream(input.toDS().toDF(), "ts_us",
        bucketSec = 60L, delay = "10 seconds", dims = Seq("family"))
      .writeStream.format("memory").queryName("mon_out")
      .outputMode("append").start()
    try {
      // fill minute 0, then advance event time far past 0:60 + 10 s
      input.addData(Seq(MonMsg(10L * 1000000L, "adt"),
        MonMsg(20L * 1000000L, "adt")))
      q.processAllAvailable()
      input.addData(Seq(MonMsg(200L * 1000000L, "adt")))
      q.processAllAvailable()
      val emitted = spark.table("mon_out")
        .select("bucket_us", "family", "n_messages")
        .as[(Long, String, Long)].collect().toSeq
      // minute-0 window closed (watermark = 200 s − 10 s > 60 s)
      assert(emitted == Seq((0L, "adt", 2L)))

      // a straggler for minute 0 is beyond the watermark: dropped, the
      // closed window is never re-emitted or corrected (append mode)
      input.addData(Seq(MonMsg(30L * 1000000L, "adt")))
      q.processAllAvailable()
      assert(spark.table("mon_out").count() == 1)
    } finally q.stop()
  }

  test("freshness lag and throughput ratio") {
    val df = Seq(MonMsg(100L * 1000000L, "adt"),
      MonMsg(160L * 1000000L, "adt")).toDF()
    val lag = Monitoring.freshnessLag(df, "ts_us",
        nowUs = 200L * 1000000L, dims = Seq("family"))
      .select("family", "lag_us").as[(String, Long)].head()
    assert(lag == ("adt", 40L * 1000000L))
    // 60 s of event time in 30 s of wall clock = 2 days/day
    val ratio = df.agg(Monitoring.throughputRatio(df, "ts_us", 30.0))
      .as[Double].head()
    assert(math.abs(ratio - 2.0) < 1e-9)
  }
}
