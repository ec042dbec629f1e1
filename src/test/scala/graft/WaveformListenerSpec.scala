package graft

import org.apache.spark.sql.streaming.GroupStateTimeout
import graft.sources.WaveformListener
import graft.streaming.WaveformCollator.Config

import java.io.PrintWriter
import java.net.ServerSocket

/** S5: the TCP front door — a real localhost socket feeds framed lines
  * through the parse → collate path.
  */
class WaveformListenerSpec extends SparkSpecBase {
  import spark.implicits._

  private def frame(loc: String, stream: String, t0: Long, rate: Int,
                    n: Int): String = {
    val vals = (0 until n).map(i => (i % 7).toDouble).mkString(",")
    s"$loc|$stream|$t0|$rate|uV|$vals"
  }

  test("frame parse: well-formed rows parse, malformed go to dead letter") {
    val lines = Seq(
      frame("LOC1", "300hz", 1000000L, 300, 5),
      "garbage line with no pipes",
      "LOC1|300hz|notanumber|300|uV|1,2,3",
      "LOC1|300hz|2000000|300|uV|1,zzz,3").toDF("value")
    val parsed = WaveformListener.parseFrames(lines, "value")
    val ok = WaveformListener.wellFormed(parsed).collect()
    assert(ok.length == 1)
    assert(ok.head.getAs[String]("locationId") == "LOC1" &&
      ok.head.getSeq[Double](ok.head.fieldIndex("values")).size == 5)
    assert(WaveformListener.malformed(parsed).count() == 3)
  }

  test("TCP listener collates frames arriving over a real socket") {
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    @volatile var err: Throwable = null
    val writer = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new PrintWriter(sock.getOutputStream, true)
        // contiguous 300 Hz run: 3 messages x 40 samples
        val periodUs = 1000000.0 / 300
        for (i <- 0 until 3)
          out.println(frame("LOC9", "300hz",
            math.round(i * 40 * periodUs), 300, 40))
        out.flush()
        Thread.sleep(3000) // let the source drain before closing
        sock.close()
      } catch { case t: Throwable => err = t }
    })
    writer.start()

    val chunks = WaveformListener.listen(spark, "127.0.0.1", port,
      Config(targetSamples = 100, waitLimitUs = 0L),
      GroupStateTimeout.NoTimeout)
    val q = chunks.writeStream.format("memory").queryName("wv_out")
      .outputMode("append").start()
    try {
      var tries = 0
      while (spark.table("wv_out").count() == 0 && tries < 100) {
        q.processAllAvailable(); Thread.sleep(100); tries += 1
      }
      val rows = spark.table("wv_out")
        .select("locationId", "obsTimeUs", "values")
        .as[(String, Long, Seq[Double])].collect()
      assert(err == null, s"writer failed: $err")
      assert(rows.nonEmpty)
      // every sample arrives exactly once; targetSamples is a hard bound
      // (batch boundaries decide how many chunks carry them)
      assert(rows.map(_._3.size).sum == 120)
      assert(rows.map(_._3.size).max <= 100)
      assert(rows.forall(_._1 == "LOC9"))
    } finally {
      q.stop(); writer.join(5000); server.close()
    }
  }
}
