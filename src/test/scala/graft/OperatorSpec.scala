package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.{IValue, TriState}
import graft.operators.{IdentityMerge, Multimodal, Temporal}

class OperatorSpec extends SparkSpecBase {
  import spark.implicits._

  test("IValue.fromHl7 tri-state mapping") {
    assert(IValue.fromHl7(null) == IValue.ignore[String])
    assert(IValue.fromHl7("") == IValue.ignore[String])
    assert(IValue.fromHl7("\"\"") == IValue.delete[String])
    assert(IValue.fromHl7("x") == IValue.save("x"))
  }

  test("F5 tri-state column merge SAVE/DELETE/IGNORE") {
    val df = Seq(
      ("SAVE", Some("new"), Some("old")),
      ("DELETE", None: Option[String], Some("old")),
      ("IGNORE", None: Option[String], Some("old")))
      .toDF("status", "value", "current")
    val out = df.select(TriState.applyField(
      struct($"value", $"status"), $"current").as("merged"))
      .as[Option[String]].collect().toSeq
    assert(out == Seq(Some("new"), None, Some("old")))
  }

  test("as-of join (union-window impl) matches row_number reference impl") {
    val rnd = new scala.util.Random(3)
    val probe = (1 to 200).map(i =>
      (i.toLong % 7, rnd.nextInt(1000).toLong, 10000L + i))
      .toDF("k", "ts_us", "event_id")
    val build = (1 to 300).map(i =>
      (i.toLong % 7, rnd.nextInt(1000).toLong, 20000L + i))
      .toDF("k", "ts_us", "event_id")

    val got = Temporal.asOfJoinBackward(probe, build, Seq("k"), "ts_us",
        "event_id", Seq("event_id"))
      .select($"event_id".as("pid"), $"asof_event_id".as("bid"))

    val w = Window.partitionBy($"p.event_id")
      .orderBy($"b.ts_us".desc_nulls_last, $"b.event_id".desc_nulls_last)
    val ref = probe.as("p").join(build.as("b"),
        $"p.k" === $"b.k" && $"b.ts_us" <= $"p.ts_us", "left")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"p.event_id".as("pid"), $"b.event_id".as("bid"))

    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("interval join semantics: build strictly before probe within window") {
    val p = Seq((1L, 1000L, 1L)).toDF("k", "p_ts", "pid")
    val b = Seq((1L, 400L, 10L), (1L, 999L, 11L), (1L, 1000L, 12L),
      (1L, 399L, 13L)).toDF("k", "b_ts", "bid")
    val r = Temporal.intervalJoin(p, b, Seq("k"), col("p_ts"), col("b_ts"),
      windowUs = 600L)
    assert(r.select("bid").as[Long].collect().sorted.toSeq == Seq(10L, 11L))
  }

  test("multimodal stub decode: schema + determinism + frame sampling") {
    val rows = Seq(
      Multimodal.MediaRow(1, "image", "abcdef".getBytes, "image/fake"),
      Multimodal.MediaRow(2, "video", ("x" * 200).getBytes, "video/fake"))
      .toDS()
    val feats = Multimodal.decodeFeatures(rows, Multimodal.FakeCodec,
      parallelism = Some(2))
    val collected = feats.collect().sortBy(_.media_id)
    assert(collected.map(_.n_bytes).toSeq == Seq(6L, 200L))
    assert(collected.forall(_.feature.length == 8))
    assert(collected(1).n_frames == 1 + 200 % 30)
    // deterministic across runs
    val again = Multimodal.decodeFeatures(rows, Multimodal.FakeCodec)
      .collect().sortBy(_.media_id)
    assert(again.map(_.feature.toSeq).toSeq ==
      collected.map(_.feature.toSeq).toSeq)
    val frames = Multimodal.sampleFrames(feats.toDF(), stride = 3)
    assert(frames.filter($"media_id" === 2).count() ==
      (1 + 200 % 30 + 2) / 3)
  }

  test("multimodal REAL codec: PNG encode→imageio decode round-trips " +
    "dimensions and luminance histogram") {
    val rows = Seq(
      Multimodal.MediaRow(1, "image", Multimodal.encodePng(20, 10, 0),
        "image/png"),
      Multimodal.MediaRow(2, "image", Multimodal.encodePng(33, 7, 255),
        "image/png"),
      Multimodal.MediaRow(3, "image", Multimodal.encodePng(8, 8, 100),
        "image/png")).toDS()
    val feats = Multimodal
      .decodeFeatures(rows, Multimodal.ImageIoCodec, parallelism = Some(2))
      .collect().sortBy(_.media_id)
    assert(feats.map(f => (f.width, f.height)).toSeq ==
      Seq((20, 10), (33, 7), (8, 8)))
    // solid gray g lands every pixel in histogram bin g/32
    assert(feats.map(_.feature.indexWhere(_ == 1.0f)).toSeq ==
      Seq(0, 7, 3))
    // payload really is encoded PNG, not raw pixels
    assert(feats.forall(f => f.n_bytes > 0 &&
      f.n_bytes != f.width.toLong * f.height * 3))
  }

  test("GifCodec: multi-frame GIF encode→decode round-trips frame " +
    "count, dimensions, and the cross-frame luminance histogram") {
    val rows = Seq(
      // 3 frames at grays 32, 96, 96: bins 1, 3, 3 → dominant bin 3
      Multimodal.MediaRow(1, "video",
        Multimodal.encodeGif(12, 5, Seq(32, 96, 96)), "image/gif"),
      // single frame: degenerate sequence still decodes
      Multimodal.MediaRow(2, "video",
        Multimodal.encodeGif(7, 9, Seq(255)), "image/gif"),
      // 4 frames all one gray: histogram concentrates fully
      Multimodal.MediaRow(3, "video",
        Multimodal.encodeGif(6, 6, Seq(0, 0, 0, 0)), "image/gif"))
      .toDS()
    val feats = Multimodal
      .decodeFeatures(rows, Multimodal.GifCodec, parallelism = Some(2))
      .collect().sortBy(_.media_id)
    assert(feats.map(f => (f.width, f.height, f.n_frames)).toSeq ==
      Seq((12, 5, 3), (7, 9, 1), (6, 6, 4)))
    val f1 = feats(0).feature
    assert(math.abs(f1(1) - 1f / 3) < 1e-6 &&
      math.abs(f1(3) - 2f / 3) < 1e-6)
    assert(feats(1).feature(7) == 1.0f)
    assert(feats(2).feature(0) == 1.0f)
    // frame sampling composes over the REAL frame count
    val frames = Multimodal.sampleFrames(feats.toSeq.toDF(), stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(frames == Set((1L, 0), (1L, 2), (2L, 0), (3L, 0), (3L, 2)))
  }

  test("AviMjpegCodec: MJPEG-in-AVI encode→decode round-trips frame " +
    "count, dimensions, and (within JPEG loss) the luminance bins; " +
    "non-RIFF payloads fail loudly") {
    val rows = Seq(
      // 3 frames at mid-bin grays 48, 112, 112: bins 1, 3, 3
      Multimodal.MediaRow(1, "video",
        Multimodal.encodeAviMjpeg(12, 6, Seq(48, 112, 112)),
        "video/x-msvideo"),
      // single frame, odd dims (odd-length JPEG chunks exercise the
      // RIFF even-padding rule)
      Multimodal.MediaRow(2, "video",
        Multimodal.encodeAviMjpeg(7, 9, Seq(240)), "video/x-msvideo"),
      Multimodal.MediaRow(3, "video",
        Multimodal.encodeAviMjpeg(6, 6, Seq(16, 16, 16, 16)),
        "video/x-msvideo"))
      .toDS()
    val feats = Multimodal
      .decodeFeatures(rows, Multimodal.AviMjpegCodec,
        parallelism = Some(2))
      .collect().sortBy(_.media_id)
    assert(feats.map(f => (f.width, f.height, f.n_frames)).toSeq ==
      Seq((12, 6, 3), (7, 9, 1), (6, 6, 4)))
    val f1 = feats(0).feature
    assert(math.abs(f1(1) - 1f / 3) < 1e-6 &&
      math.abs(f1(3) - 2f / 3) < 1e-6, f1.mkString(","))
    assert(feats(1).feature(7) == 1.0f)
    assert(feats(2).feature(0) == 1.0f)
    val bad = Seq(Multimodal.MediaRow(9, "video",
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12),
      "video/x-msvideo")).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(bad, Multimodal.AviMjpegCodec).collect()
    }
    assert(e.getMessage.contains("RIFF") ||
      e.getCause != null && e.getCause.getMessage.contains("RIFF"))
  }

  test("PdfCodec: encode→extract round-trips multi-line text with " +
      "parens, backslashes, octal escapes, TJ arrays and hex strings; " +
      "empty blocks drop; plain (non-Flate) streams decode; " +
      "non-PDF payloads fail loudly") {
    // fixture generator round trip: lines join with \n exactly
    val lines = Seq("Plain line one", "with (parens) and \\back\\slash",
      "trailing ( unbalanced is escaped")
    val bytes = Multimodal.encodePdf(lines)
    assert(new String(bytes.take(5),
      java.nio.charset.StandardCharsets.ISO_8859_1) == "%PDF-")
    assert(Multimodal.PdfCodec.text(bytes, 1L) == lines.mkString("\n"))
    // empty lines drop from the join (empty BT blocks contribute
    // nothing) — the q203 oracle's CASE models exactly this
    assert(Multimodal.PdfCodec.text(
      Multimodal.encodePdf(Seq("a", "", "b")), 2L) == "a\nb")
    // hand-built uncompressed stream: TJ array with kerning numbers,
    // octal escape, line continuation, hex string, ' operator
    val content = "BT /F1 9 Tf (He) Tj ET\n" +
      "BT [(l) -120 (lo\\040w)] TJ ET\n" +
      "BT (or\\\nld) ' <21> Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj\n<< >>\nstream\n" + content +
      "\nendstream\nendobj\ntrailer\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(Multimodal.PdfCodec.text(pdf, 3L) == "He\nllo w\norld!")
    // MULTI-PAGE layout: two content-stream objects (one per page)
    // join exactly like blocks within a stream
    val pdf2 = ("%PDF-1.4\n1 0 obj\n<< >>\nstream\n" +
      "BT (page one) Tj ET\nendstream\nendobj\n" +
      "2 0 obj\n<< >>\nstream\nBT (page two) Tj ET\nendstream\n" +
      "endobj\ntrailer\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(Multimodal.PdfCodec.text(pdf2, 4L) == "page one\npage two")
    // batched dataset API on the mapPartitions seam
    val rows = Seq(
      Multimodal.MediaRow(1, "pdf", Multimodal.encodePdf(Seq("doc one")),
        "application/pdf"),
      Multimodal.MediaRow(2, "pdf", Multimodal.encodePdf(Seq("doc two")),
        "application/pdf")).toDS()
    val got = Multimodal.pdfTexts(rows, parallelism = Some(2))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "doc one", 2L -> "doc two"))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.pdfTexts(Seq(Multimodal.MediaRow(9, "pdf",
        Array[Byte](1, 2, 3), "application/pdf")).toDS()).collect()
    }
    assert(e.getMessage.contains("not a PDF") ||
      e.getCause != null && e.getCause.getMessage.contains("not a PDF"))
  }

  test("audioFingerprint: same envelope shape at different volumes and " +
      "sample rates hashes identically; a phase-shifted envelope " +
      "differs; silence is zero; sub-64-sample clips fail loudly") {
    def comb(phase: Int, vol: Short, n: Int = 640): Array[Short] =
      Array.tabulate[Short](n) { k =>
        if ((k * 64 / n + phase) % 4 == 0) vol else 0: Short
      }
    def fp(samples: Array[Short], rate: Int = 8000): Long = {
      val rows = Seq(Multimodal.MediaRow(1, "audio",
        Multimodal.encodeWav(rate, samples), "audio/wav")).toDS()
      Multimodal.audioFingerprints(rows).collect().head.dhash
    }
    val base = fp(comb(0, 1000))
    assert(base != 0L)
    assert(fp(comb(0, 37)) == base, "volume invariance")
    assert(fp(comb(0, 1000), rate = 44100) == base, "rate invariance")
    assert(fp(comb(0, 900, n = 1280)) == base,
      "duration-relative frames: same shape at 2x length")
    assert(fp(comb(1, 1000)) != base, "phase shift must differ")
    assert(fp(new Array[Short](640)) == 0L, "silence is zero")
    val e = intercept[org.apache.spark.SparkException] {
      fp(new Array[Short](63))
    }
    assert(e.getMessage.contains("64 samples") ||
      e.getCause != null && e.getCause.getMessage.contains("64 samples"))
  }

  test("frameDhashes: per-frame hashes survive the lossy MJPEG round " +
      "trip — re-encodes at different grays collapse to the same " +
      "frame-hash sequence, a changed frame separates") {
    def video(bits: Seq[Boolean], bright: Int, dark: Int) =
      Multimodal.encodeAviMjpegBanded(72, 16,
        bits.map(b => if (b) (bright, dark) else (dark, bright)))
    val rows = Seq(
      Multimodal.MediaRow(1, "video",
        video(Seq(true, false, true), 200, 40), "video/x-msvideo"),
      Multimodal.MediaRow(2, "video", // same sequence, other grays
        video(Seq(true, false, true), 230, 25), "video/x-msvideo"),
      Multimodal.MediaRow(3, "video", // frame 1 flipped
        video(Seq(true, true, true), 200, 40), "video/x-msvideo"))
      .toDS()
    val fh = Multimodal.frameDhashes(rows, parallelism = Some(2))
      .collect().groupBy(_.media_id)
      .map { case (id, fs) =>
        id -> fs.sortBy(_.frame_idx).map(_.dhash).toSeq }
    assert(fh(1L).length == 3 && fh(1L) == fh(2L))
    assert(fh(1L) != fh(3L) && fh(1L)(0) == fh(3L)(0) &&
      fh(1L)(2) == fh(3L)(2) && fh(1L)(1) != fh(3L)(1))
  }

  test("dHash: same pattern at different sizes and gray levels hashes " +
    "identically; opposite pattern differs; uniform is zero; " +
    "sub-grid images fail loudly") {
    def img(bytes: Array[Byte]) = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val a = Multimodal.dHash(img(Multimodal.encodeBandedPng(9, 8, 200, 50)))
    val b = Multimodal.dHash(img(Multimodal.encodeBandedPng(36, 21, 130, 90)))
    val c = Multimodal.dHash(img(Multimodal.encodeBandedPng(18, 8, 50, 200)))
    val u = Multimodal.dHash(img(Multimodal.encodeBandedPng(9, 8, 99, 99)))
    assert(a == b)            // size + brightness invariant
    assert(a != c)            // order flip changes the hash
    assert(u == 0L)           // no gradient anywhere
    // boundary bit: left-bright = bit at column 4->5 in every row
    assert(a == java.lang.Long.parseLong("0808080808080808", 16))
    intercept[IllegalArgumentException] {
      Multimodal.dHash(img(Multimodal.encodeBandedPng(9, 4, 1, 2)))
    }
    // the dataset seam groups them: a and b are one dup group
    val media = Seq(
      Multimodal.MediaRow(1, "image",
        Multimodal.encodeBandedPng(9, 8, 200, 50), "image/png"),
      Multimodal.MediaRow(2, "image",
        Multimodal.encodeBandedPng(36, 21, 130, 90), "image/png"),
      Multimodal.MediaRow(3, "image",
        Multimodal.encodeBandedPng(18, 8, 50, 200), "image/png")).toDS()
    val hs = Multimodal.dhashFeatures(media).collect()
      .map(h => h.media_id -> h.dhash).toMap
    assert(hs(1L) == hs(2L) && hs(1L) != hs(3L))
  }

  test("WavCodec: real javax.sound.sampled round-trip — header (rate, " +
      "channels) and frame parse (count, amplitude histogram) recovered " +
      "from encoded RIFF bytes") {
    val rows = Seq(
      // constant amplitudes land every sample in one predictable bin
      Multimodal.MediaRow(1, "audio",
        Multimodal.encodeWav(8000, Array.fill(100)(0.toShort)),
        "audio/wav"), // 0 + 32768 = 32768 → bin 4
      Multimodal.MediaRow(2, "audio",
        Multimodal.encodeWav(44100, Array.fill(7)(Short.MinValue)),
        "audio/wav"), // bin 0
      // mixed: 3 samples high, 2 low → top bin 7
      Multimodal.MediaRow(3, "audio",
        Multimodal.encodeWav(16000,
          Array[Short](32000, 32001, 32002, -5, -6)),
        "audio/wav")).toDS()
    val feats = Multimodal
      .decodeFeatures(rows, Multimodal.WavCodec, parallelism = Some(2))
      .collect().sortBy(_.media_id)
    assert(feats.map(f => (f.width, f.height, f.n_frames)).toSeq ==
      Seq((8000, 1, 100), (44100, 1, 7), (16000, 1, 5)))
    assert(feats.map(f =>
      f.feature.indexOf(f.feature.max)).toSeq == Seq(4, 0, 7))
    // -5/-6 sit just below the s=0 boundary → bin 3
    assert(feats(2).feature(7) == 0.6f && feats(2).feature(3) == 0.4f)
    // payload really is a RIFF container, not raw PCM
    assert(feats.forall(f => f.n_bytes > f.n_frames * 2))
  }

  test("WavCodec: payloads outside the 16-bit mono contract (stereo) " +
      "fail loudly instead of decoding garbage") {
    // (an odd PCM byte count is guarded too, but unreachable through
    // javax.sound: AudioInputStream frame-aligns its reads)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](40)), fmt, 10L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val e = intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decodeBatch(Iterator(
        Multimodal.MediaRow(9, "audio", bos.toByteArray, "audio/wav")))
        .toList
    }
    assert(e.getMessage.contains("expected 16-bit mono PCM"), e.getMessage)
  }

  test("O4 chained merges in one batch match serial replay") {
    val pointers = Seq(("A", "A"), ("B", "B"), ("C", "C"), ("D", "D"))
      .toDF("mrn", "live_mrn")
    val merges = Seq(("A", "B"), ("B", "C")).toDF("absorbed", "survivor")

    // one batch {A→B, B→C} must equal serial replay: everything at C
    val bulk = IdentityMerge.applyMerges(pointers, merges)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(bulk == Map("A" -> "C", "B" -> "C", "C" -> "C", "D" -> "D"))

    val serial = merges.collect().foldLeft(pointers) { (acc, m) =>
      IdentityMerge.applyMerges(acc,
        Seq((m.getString(0), m.getString(1))).toDF("absorbed", "survivor"))
    }.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(serial == bulk)

    // merge cycle degenerates safely (no hang, pointers stay in the set)
    val cyc = IdentityMerge.applyMerges(pointers,
      Seq(("A", "B"), ("B", "A")).toDF("absorbed", "survivor"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(cyc.keySet == Set("A", "B", "C", "D") &&
      cyc.values.forall(Set("A", "B", "C", "D")))
  }

  test("O5 change-identifiers: rename when new MRN unknown, merge when known") {
    val pointers = Seq(("A", "A"), ("B", "A"), ("C", "C"), ("D", "D"))
      .toDF("mrn", "live_mrn") // B already merged into A
    val changes = Seq(
      ("A", "Z"),  // Z unknown → in-place rename; B's pointer follows
      ("D", "C"))  // C exists → merge D into C
      .toDF("oldMrn", "newMrn")
    val out = IdentityMerge.changeIdentifiers(pointers, changes)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out == Map("Z" -> "Z", "B" -> "Z", "C" -> "C", "D" -> "C"))
  }

  test("sessionize assigns increasing session ids per gap") {
    val df = Seq((1L, 0L, 1L), (1L, 100L, 2L), (1L, 5000L, 3L),
      (1L, 5100L, 4L)).toDF("k", "ts_us", "id")
    val r = Temporal.sessionize(df, Seq("k"), "ts_us", "id", gapUs = 1000L)
    assert(r.select("session_id").as[Long].collect().toSeq ==
      Seq(1L, 1L, 2L, 2L))
  }

  test("X2: HL7 timestamp custom expression (codegen + SQL registration)") {
    import graft.functions.Hl7Timestamp
    Hl7Timestamp.register(spark)
    val df = Seq(
      "20240101123045",            // full seconds, UTC
      "20240101123045.123",        // millis
      "20240101123045.123456",     // micros
      "20240101123045.123+0100",   // zone offset
      "202401011230",              // minutes precision
      "20240101",                  // date only
      "garbage", "2024010x123045", // malformed
      null).toDF("s")
    val got = df.selectExpr("hl7_ts_us(s) AS us").as[Option[Long]]
      .collect().toSeq
    val base = java.time.Instant.parse("2024-01-01T12:30:45Z")
      .getEpochSecond * 1000000L
    assert(got == Seq(
      Some(base), Some(base + 123000L), Some(base + 123456L),
      Some(base + 123000L - 3600L * 1000000L),
      Some(base - 45L * 1000000L),
      Some(base - (12 * 3600 + 30 * 60 + 45) * 1000000L),
      None, None, None))
    // interpreted path agrees with codegen
    import org.apache.spark.unsafe.types.UTF8String
    assert(graft.functions.Hl7TimestampParser.parseUs(
      UTF8String.fromString("20240101123045")) == base)
    // calendar-aware day validation: Feb 30 / Apr 31 rejected, leap days ok
    val cal = Seq("20240230120000", "20240431120000", "20230229120000",
      "20240229120000", "20000229120000", "19000228120000")
      .toDF("s").selectExpr("hl7_ts_us(s) IS NOT NULL AS ok")
      .as[Boolean].collect().toSeq
    assert(cal == Seq(false, false, false, true, true, true))
  }

  test("poly_hash native expression matches the HOF formulation") {
    import graft.functions.GraftFunctions.charPolyHash
    val df = Seq("abc", "", "hello world", "héllo", "a b  c", "\"\"")
      .toDF("s")
    val hof = aggregate(filter(split($"s", ""), c => c =!= lit("")),
      lit(0L), (h, c) => pmod(h * lit(31L) + ascii(c), lit(2147483647L)))
    val rows = df.select(charPolyHash($"s").as("native"), hof.as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native ${r.getLong(0)} != hof ${r.getLong(1)}"))
    // known value, DuckDB-verified: list_reduce fold of 'abc' = 96354
    assert(df.filter($"s" === "abc").select(charPolyHash($"s"))
      .as[Long].head() == 96354L)
  }

  test("vec_dot native expression is bit-identical to the HOF fold") {
    import graft.functions.GraftFunctions.{dotProduct, l2Norm}
    val rnd = new scala.util.Random(9)
    val df = (1 to 50).map(_ =>
      (Seq.fill(64)(rnd.nextDouble() - 0.5), Seq.fill(64)(rnd.nextDouble() - 0.5)))
      .toDF("a", "b")
    val hofDot = aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val hofNorm = sqrt(aggregate($"a", lit(0.0), (acc, x) => acc + x * x))
    val rows = df.select(dotProduct($"a", $"b").as("n"), hofDot.as("h"),
      l2Norm($"a").as("nn"), hofNorm.as("hn")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
    // null semantics match zip_with/aggregate: length mismatch → null
    val bad = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    assert(bad.select(dotProduct($"a", $"b")).collect().head.isNullAt(0))
  }

  test("shingle_hashes fused expression matches tokens→shingles→polyHash") {
    import graft.functions.GraftFunctions.{charPolyHash, shingles, tokens}
    import graft.functions.ShingleHash.shingleHashes
    val df = Seq("a b c d", "  padded   whitespace\tand\ttabs  ",
      "single", "", "   ", "x y", "caffé con leche por favor")
      .toDF("s")
    for (n <- Seq(1, 2, 3)) {
      val rows = df.select(
        shingleHashes($"s", n).as("fused"),
        transform(shingles(tokens($"s"), n), sh => charPolyHash(sh))
          .as("hof")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"n=$n fused ${r.getSeq[Long](0)} != hof ${r.getSeq[Long](1)}")
      }
    }
  }

  test("lang id picks a language deterministically") {
    import graft.operators.TextAnalysis
    val df = Seq("the cat and the dog is in that house",
      "le chat et la maison est une belle", "xyzzy plugh")
      .toDF("text")
    val out = TextAnalysis.withLangId(df, "text")
      .select("lang_guess").as[String].collect().toSeq
    assert(out == Seq("en", "fr", "und"))
  }

  test("Gopher repetition signals: exact fractions on a known document") {
    import graft.operators.TextAnalysis
    val spam = "buy now\nbuy now\ngreat offer\n" +
      "click here click here click here"
    val clean = "a b c d e f g h i j k l m n o"
    val df = Seq((1L, spam), (2L, clean)).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_lines", "n_words", "dup_line_frac", "dup_line_char_frac",
        "top_2gram_char_frac", "dup_5gram_char_frac", "repetition_pass")
      .as[(Int, Int, Double, Double, Double, Double, Long)]
      .collect()
    // spam: 4 lines, 1 dup ("buy now") → 1/4; line chars 57, dup 7;
    // words = 12 totalling 49 chars; 2-gram counts: "click here"×3
    // (9 chars each), "buy now"×2, "here click"×2 → top covers 27/49
    val s = r(0)
    assert(s._1 == 4 && s._2 == 12)
    assert(s._3 == 1.0 / 4)
    assert(s._4 == 7.0 / 57)
    assert(s._5 == 27.0 / 49)
    assert(s._6 == 0.0) // all 5-grams distinct
    assert(s._7 == 0L) // fails the top-2-gram threshold
    // clean: single line, 15 distinct 1-char words → every 2-gram
    // unique, top covers 2/15 ≤ 0.20 → passes
    val c = r(1)
    assert(c._1 == 1 && c._2 == 15)
    assert(c._3 == 0.0 && c._4 == 0.0 && c._6 == 0.0)
    assert(c._5 == 2.0 / 15)
    assert(c._7 == 1L)
  }
}
