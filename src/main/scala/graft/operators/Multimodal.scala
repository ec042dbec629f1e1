package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns plus typed metadata; decode /
  * feature-extraction runs as batched per-partition transforms (the Scala
  * analog of `mapInPandas`): one task per partition, vectorized iteration,
  * decode library called per batch. The codec seam has two impls:
  * [[ImageIoCodec]] — a REAL pure-JVM image decode (`javax.imageio`
  * PNG/JPEG → pixel dimensions + an intensity-histogram feature) proving
  * the seam end-to-end on actual encoded bytes — and [[FakeCodec]], a
  * deterministic stand-in for modalities whose native libs (ffmpeg etc.)
  * aren't in this environment, keeping tests stable where no real decoder
  * exists.
  */
object Multimodal {

  /** Typed media row: payload + metadata, the storage schema for a media
    * lake table (partition by modality, then date in production).
    */
  final case class MediaRow(media_id: Long, modality: String,
                            payload: Array[Byte], mime: String)

  final case class MediaFeatures(media_id: Long, modality: String,
                                 n_bytes: Long, width: Int, height: Int,
                                 n_frames: Int, feature: Array[Float])

  /** The decode seam. A real deployment plugs libjpeg/ffmpeg etc. in
    * here; the fake is deterministic in the payload bytes so tests are
    * stable. Called once per batch (partition) — amortizes codec init.
    */
  trait Codec extends Serializable {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures]
  }

  object FakeCodec extends Codec {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val n = r.payload.length.toLong
        // Deterministic pseudo-decode: dimensions & features derived from
        // byte content — stands in for a real pixel/sample decode.
        val w = 16 + (n % 64).toInt
        val h = 16 + ((n / 64) % 64).toInt
        val frames = if (r.modality == "video") 1 + (n % 30).toInt else 1
        val feat = Array.tabulate(8) { i =>
          var acc = 0L
          var j = i
          while (j < r.payload.length) { acc += r.payload(j) & 0xff; j += 8 }
          (acc % 1000).toFloat / 1000f
        }
        MediaFeatures(r.media_id, r.modality, n, w, h, frames, feat)
      }
  }

  /** Real image decode via `javax.imageio` (pure JVM — PNG, JPEG, BMP,
    * GIF): actual pixel dimensions plus an 8-bin luminance histogram
    * (normalized to the pixel count) as the feature vector. Undecodable
    * payloads fail the task — route them through a dead-letter filter
    * upstream when the lake may hold corrupt blobs.
    */
  object ImageIoCodec extends Codec {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable image payload: media ${r.media_id}")
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Long](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff)
              + (rgb & 0xff)) / 3
            hist(lum >> 5) += 1
            x += 1
          }
          y += 1
        }
        val total = (w.toLong * h).toFloat
        MediaFeatures(r.media_id, r.modality, r.payload.length.toLong,
          w, h, 1, hist.map(_ / total))
      }
  }

  /** Real audio decode via `javax.sound.sampled` (pure JVM — WAV/PCM):
    * parses the RIFF header for the sample rate and channel count,
    * reads the PCM frames, and emits an 8-bin amplitude histogram
    * (normalized to the sample count) as the feature vector. Mapping
    * onto the shared schema: width = sample rate in Hz, height =
    * channels, n_frames = samples per channel. 16-bit mono PCM only
    * (the q123 fixture contract); undecodable payloads fail the task —
    * dead-letter upstream, as with [[ImageIoCodec]].
    */
  object WavCodec extends Codec {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"media ${r.media_id}: expected 16-bit mono PCM, got $fmt")
        val data = ais.readAllBytes()
        // defense-in-depth: AudioInputStream frame-aligns reads (frame
        // size 2), so an odd count should be unreachable — but the
        // decode loop below would silently drop a trailing byte if a
        // JDK ever surfaced one, violating the fail-loudly contract
        require(data.length % 2 == 0,
          s"media ${r.media_id}: odd PCM byte count (${data.length}) — " +
            "malformed 16-bit frame stream")
        val n = data.length / 2
        require(n > 0, s"media ${r.media_id}: empty WAV payload")
        val hist = new Array[Long](8)
        var i = 0
        while (i < n) {
          val s =
            if (fmt.isBigEndian)
              (data(2 * i) << 8) | (data(2 * i + 1) & 0xff)
            else
              (data(2 * i + 1) << 8) | (data(2 * i) & 0xff)
          hist((s + 32768) >> 13) += 1
          i += 1
        }
        MediaFeatures(r.media_id, r.modality, r.payload.length.toLong,
          math.round(fmt.getSampleRate), fmt.getChannels, n,
          hist.map(_ / n.toFloat))
      }
  }

  /** Real MULTI-FRAME image decode via `javax.imageio`'s GIF reader
    * (pure JVM) — the third real modality on the codec seam, retiring
    * [[FakeCodec]] for frame-indexed media: actual frame COUNT
    * (`reader.getNumImages`), first-frame pixel dimensions, and the
    * 8-bin luminance histogram aggregated across ALL frames
    * (normalized to the total pixel count) as the feature vector. The
    * Java GIF reader returns each sequence frame as written (our
    * fixtures write full frames, no inter-frame delta disposal), so
    * per-frame pixels are exact. Undecodable payloads fail the task —
    * dead-letter upstream, as with [[ImageIoCodec]].
    */
  object GifCodec extends Codec {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          require(readers.hasNext,
            s"undecodable payload: media ${r.media_id}")
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val nFrames = reader.getNumImages(true)
            require(nFrames > 0, s"media ${r.media_id}: zero frames")
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            val hist = new Array[Long](8)
            var total = 0L
            var f = 0
            while (f < nFrames) {
              val img = reader.read(f)
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff)
                    + (rgb & 0xff)) / 3
                  hist(lum >> 5) += 1
                  x += 1
                }
                y += 1
              }
              total += img.getWidth.toLong * img.getHeight
              f += 1
            }
            MediaFeatures(r.media_id, r.modality, r.payload.length.toLong,
              w, h, nFrames, hist.map(_ / total.toFloat))
          } finally reader.dispose()
        } finally iis.close()
      }
  }

  /** Deterministic multi-frame GIF bytes (pure-JVM encode via the
    * `javax.imageio` GIF writer's `writeToSequence`) — the fixture
    * generator for [[GifCodec]]: frame count, dimensions, and each
    * frame's solid gray are exact functions of the arguments, so an
    * oracle can predict the decode output without seeing the bytes.
    */
  /** Real VIDEO-CONTAINER decode: MJPEG-in-AVI on the same pure-JVM
    * seam — retires [[FakeCodec]] for the video modality the way
    * [[GifCodec]] retired it for frame sequences. The RIFF/AVI
    * container is walked chunk by chunk (`RIFF('AVI ' …
    * LIST('movi' '00dc'…))`), every `…dc` video chunk is one complete
    * JPEG frame (the MJPEG contract — no inter-frame state), decoded
    * through `javax.imageio`'s JPEG reader. Output matches the
    * [[GifCodec]] schema: first-frame dimensions, frame COUNT, and
    * the 8-bin cross-frame luminance histogram. JPEG is LOSSY —
    * fixtures must keep frame grays mid-bin (the [[encodeAviMjpeg]]
    * contract) so decode error (DC-quantization, ≤ ~4 at default
    * quality) cannot cross a bin boundary. Undecodable payloads fail
    * the task — dead-letter upstream.
    */
  object AviMjpegCodec extends Codec {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val frames = mjpegFrames(r.payload, r.media_id)
        require(frames.nonEmpty, s"media ${r.media_id}: no video frames")
        val hist = new Array[Long](8)
        var total = 0L
        var w = 0; var h = 0
        frames.foreach { jb =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(jb))
          require(img != null,
            s"media ${r.media_id}: undecodable MJPEG frame")
          if (w == 0) { w = img.getWidth; h = img.getHeight }
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff)
                + (rgb & 0xff)) / 3
              hist(lum >> 5) += 1
              x += 1
            }
            y += 1
          }
          total += img.getWidth.toLong * img.getHeight
        }
        MediaFeatures(r.media_id, r.modality, r.payload.length.toLong,
          w, h, frames.length, hist.map(_ / total.toFloat))
      }

    /** The raw JPEG bytes of each frame — [[frameDhashes]]'s entry to
      * the same walk the feature decode uses.
      */
    def framesOf(payload: Array[Byte], mediaId: Long): Seq[Array[Byte]] =
      mjpegFrames(payload, mediaId)

    /** Walk the RIFF tree and return each `..dc` chunk's bytes (one
      * JPEG per MJPEG frame). Only the `movi` LIST is descended —
      * headers and the optional idx1 are skipped by size.
      */
    private def mjpegFrames(payload: Array[Byte],
                            mediaId: Long): Seq[Array[Byte]] = {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def four(): String = {
        val b = new Array[Byte](4); bb.get(b)
        new String(b, java.nio.charset.StandardCharsets.US_ASCII)
      }
      require(four() == "RIFF", s"media $mediaId: not a RIFF container")
      bb.getInt // riff size
      require(four() == "AVI ", s"media $mediaId: not an AVI")
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(end: Int, inMovi: Boolean): Unit = {
        while (bb.position() + 8 <= end) {
          val id = four()
          val sz = bb.getInt
          val next = bb.position() + sz + (sz % 2) // chunks pad to even
          if (id == "LIST") {
            val typ = four()
            walk(bb.position() + sz - 4, inMovi || typ == "movi")
          } else if (inMovi && id.endsWith("dc")) {
            val b = new Array[Byte](sz); bb.get(b); frames += b
          }
          bb.position(next)
        }
      }
      walk(payload.length, inMovi = false)
      frames.toSeq
    }
  }

  /** Deterministic MJPEG-in-AVI bytes — the fixture generator for
    * [[AviMjpegCodec]]: a minimal RIFF AVI (`hdrl` with real
    * avih/strh/strf headers, `movi` with one `00dc` JPEG per frame).
    * Each frame is solid gray; callers MUST pass mid-bin grays
    * (16 + 32k) so the lossy JPEG round trip stays inside the
    * luminance bin and an oracle can predict the decode from the
    * arguments alone.
    */
  def encodeAviMjpeg(width: Int, height: Int,
                     grays: Seq[Int]): Array[Byte] = {
    require(grays.nonEmpty, "at least one frame")
    aviMjpegContainer(width, height, grays.map { g =>
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    })
  }

  /** MJPEG-in-AVI with BANDED frames — (leftGray, rightGray) per
    * frame, split at 5/9 of the width like [[encodeBandedPng]] — the
    * fixture for per-frame fingerprints ([[frameDhashes]]): each
    * frame's dHash is a pure function of WHICH side is brighter. The
    * lossy JPEG round trip stays inside the comparison margin when
    * `width` is a multiple of 72 (the 5/9 split lands on an 8-px JPEG
    * block boundary, so ringing never crosses a dHash grid cell) and
    * the two grays are far apart.
    */
  def encodeAviMjpegBanded(width: Int, height: Int,
                           frames: Seq[(Int, Int)]): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    require(width % 72 == 0,
      "width must be a multiple of 72 (9-col dHash grid × 8-px JPEG " +
        "blocks — the band boundary must land on both)")
    val split = width / 9 * 5
    aviMjpegContainer(width, height, frames.map { case (gl, gr) =>
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = if (x < split) gl else gr
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    })
  }

  private def aviMjpegContainer(width: Int, height: Int,
                                jpegs: Seq[Array[Byte]]): Array[Byte] = {
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      cc(id) ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(typ) ++ body)
    def words(vals: Seq[Int]): Array[Byte] = vals.flatMap(le32).toArray
    val avih = words(Seq(40000, 0, 0, 0, jpegs.length, 0, 1, 0,
      width, height, 0, 0, 0, 0))
    val strh = cc("vids") ++ cc("MJPG") ++ words(Seq(0, 0, 0,
      1, 25, 0, jpegs.length, 0, -1, 0, 0, 0))
    val strf = words(Seq(40, width, height, 1 | (24 << 16))) ++
      cc("MJPG") ++ words(Seq(width * height * 3, 0, 0, 0, 0))
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      jpegs.flatMap(jb => chunk("00dc", jb)).toArray)
    chunk("RIFF", cc("AVI ") ++ hdrl ++ movi)
  }

  def encodeGif(width: Int, height: Int, grays: Seq[Int]): Array[Byte] = {
    require(grays.nonEmpty, "at least one frame")
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no GIF writer in this JVM")
    val writer = writers.next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      grays.foreach { g =>
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (g << 16) | (g << 8) | g
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Deterministic 16-bit mono PCM WAV bytes (pure-JVM encode via
    * `javax.sound.sampled`) — the fixture generator for [[WavCodec]]:
    * sample rate, sample count, and the dominant histogram bin are
    * exact functions of the arguments, so an oracle can predict the
    * decode output without seeing the bytes.
    */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  final case class MediaHist(media_id: Long, hist: Array[Long])

  /** RAW 8-bin luminance histogram — exact integer pixel counts over
    * the [[ImageIoCodec]] decode seam. [[ImageIoCodec]] itself
    * normalizes the histogram to floats for the generic feature
    * schema; the cross-modal ALIGNMENT gate needs the integer form
    * (a cosine is scale-invariant, so raw counts carry the same
    * direction with exact arithmetic an oracle replays). Output:
    * (media_id, hist[8]).
    */
  def imageLumaHist(media: Dataset[MediaRow],
                    parallelism: Option[Int] = None)
      : Dataset[MediaHist] = {
    val spark = media.sparkSession
    import spark.implicits._
    val part = parallelism.map(media.repartition(_)).getOrElse(media)
    part.mapPartitions(_.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      require(img != null,
        s"undecodable image payload: media ${r.media_id}")
      val hist = new Array[Long](8)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff)
            + (rgb & 0xff)) / 3
          hist(lum >> 5) += 1
          x += 1
        }
        y += 1
      }
      MediaHist(r.media_id, hist)
    })
  }

  /** Grayscale strip PNG whose decoded 8-bin luminance histogram is
    * EXACTLY `binCounts`: `binCounts(b)` pixels of mid-bin gray
    * b·32+16 laid bin-ascending in one row — the fixture generator
    * for the alignment gate (a lossless round trip: PNG preserves the
    * gray values, `lum >> 5` maps mid-bin gray b·32+16 back to bin
    * b, so an oracle predicts the histogram from the counts that
    * built the image).
    */
  def encodeLumaStripPng(binCounts: Array[Int]): Array[Byte] = {
    require(binCounts.length == 8, "8 bins")
    val width = binCounts.sum
    require(width > 0, "at least one pixel")
    val img = new java.awt.image.BufferedImage(width, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    var b = 0
    while (b < 8) {
      val g = b * 32 + 16
      val rgb = (g << 16) | (g << 8) | g
      var i = 0
      while (i < binCounts(b)) { img.setRGB(x, 0, rgb); x += 1; i += 1 }
      b += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Cross-modal alignment score (the CLIP-style image-text curation
    * signal, exact-arithmetic form): s4 = round(cosine(emb, hist)·10⁴)
    * between a caption embedding ([[Embed.hashEmbed]] — exact integer
    * counts in doubles) and an image feature ([[imageLumaHist]] —
    * exact integer counts). NULL when either side has zero norm (no
    * direction to compare — such docs PASS an alignment gate, like
    * docs with no image at all).
    */
  def alignScore10k(emb: org.apache.spark.sql.Column,
                    hist: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import graft.functions.GraftFunctions.{cosineSimPre, l2Norm,
      toDoubleVec}
    val e = toDoubleVec(emb)
    val h = toDoubleVec(hist)
    val en = l2Norm(e)
    val hn = l2Norm(h)
    when(en > 0 && hn > 0,
      round(cosineSimPre(e, h, en, hn) * 10000, 0).cast("long"))
  }

  /** Deterministic solid-gray PNG bytes (pure-JVM encode) — the fixture
    * generator for [[ImageIoCodec]]: dimensions and the histogram bin
    * are exact functions of the arguments, so an oracle can predict the
    * decode output without seeing the bytes.
    */
  def encodePng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Difference-hash (dHash) of one decoded image — the perceptual
    * fingerprint image-dedup pipelines bucket on (LAION-style: two
    * crops/rescales/re-encodes of the same picture hash identically,
    * so EXACT grouping on the hash is NEAR-dup detection on pixels —
    * the visual analog of the text tier's MinHash). Deterministic by
    * construction:
    *
    *   - the image block-averages onto a 9×8 luminance grid (exact
    *     integer pixel sums over rectangular cells — no resampling
    *     library, no floating point);
    *   - bit (row, col) = cell(row, col) brighter than
    *     cell(row, col+1), compared as cross-multiplied integer sums
    *     (`sumA·nB > sumB·nA` — exact at any cell size);
    *   - 8 comparisons × 8 rows = one 64-bit Long, row-major, bit 63
    *     first.
    *
    * Size/brightness invariance is the point: the same pattern at a
    * different resolution or gray level produces the SAME hash (only
    * the luminance ORDER of adjacent cells matters).
    */
  def dHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    // below the grid size, some cells would hold ZERO pixels and the
    // hash would depend on WHICH rows/cols are empty — reject loudly
    // (production pipelines upscale thumbnails before hashing)
    require(w >= 9 && h >= 8,
      s"dHash needs at least 9x8 pixels, got ${w}x$h")
    // exact integer cell sums: pixel (x, y) belongs to cell
    // (x*9/w, y*8/h) — the standard integer grid partition
    val sums = Array.ofDim[Long](8, 9)
    val counts = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      val gy = (y.toLong * 8 / h).toInt
      var x = 0
      while (x < w) {
        val gx = (x.toLong * 9 / w).toInt
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff)
          + (rgb & 0xff)) / 3
        sums(gy)(gx) += lum
        counts(gy)(gx) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val brighter = sums(r)(c) * counts(r)(c + 1) >
          sums(r)(c + 1) * counts(r)(c)
        bits = (bits << 1) | (if (brighter) 1L else 0L)
        c += 1
      }
      r += 1
    }
    bits
  }

  final case class MediaHash(media_id: Long, dhash: Long)

  /** Per-payload dHash over the batched decode seam (any
    * `javax.imageio` format). Output: (media_id, dhash) — feed the
    * hash to the EXACT dedup tier ([[graft.operators.Dedup]] groupBy)
    * for duplicate groups; hamming-near hashes can ride the text
    * tier's banded LSH if byte-bucketing is wanted at scale.
    */
  def dhashFeatures(media: Dataset[MediaRow],
                    parallelism: Option[Int] = None): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    val part = parallelism.map(media.repartition(_)).getOrElse(media)
    part.mapPartitions(_.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      require(img != null,
        s"undecodable image payload: media ${r.media_id}")
      MediaHash(r.media_id, dHash(img))
    })
  }

  /** 64-bit AUDIO fingerprint — the dHash idea on the time-domain
    * energy envelope: the clip splits into 64 equal frames, frame
    * energies are EXACT integer sums of |sample|, and bit i compares
    * energy(i) > energy((i+1) mod 64). Like dHash's gray-level
    * invariance, the comparisons are invariant to VOLUME (scaling
    * every sample scales every energy) and — because frames are
    * duration-relative — to sample RATE; only the loudness SHAPE is
    * fingerprinted. Pure integer arithmetic on lossless PCM, so the
    * hash is bit-identical in any engine. Clips shorter than 64
    * samples fail loudly (empty frames would make the hash depend on
    * which frames are empty — the dHash sub-grid rule).
    */
  def audioFingerprint(samples: Array[Short], mediaId: Long): Long = {
    val n = samples.length
    require(n >= 64,
      s"media $mediaId: audioFingerprint needs >= 64 samples, got $n")
    val energy = new Array[Long](64)
    var i = 0
    while (i < n) {
      // frame of sample i: the integer grid partition (dHash's rule)
      energy((i.toLong * 64 / n).toInt) += math.abs(samples(i).toLong)
      i += 1
    }
    var bits = 0L
    var f = 0
    while (f < 64) {
      if (energy(f) > energy((f + 1) % 64)) bits |= (1L << f)
      f += 1
    }
    bits
  }

  /** Per-payload audio fingerprints over the batched WAV-decode seam
    * (16-bit mono PCM, the [[WavCodec]] contract). Output:
    * (media_id, dhash) — the SAME 64-bit fingerprint family as
    * [[dhashFeatures]], so audio near-dup rides the identical
    * machinery: exact grouping, [[graft.operators.Dedup
    * .hammingNearDup]] banding, the curation recipe's image gate.
    */
  def audioFingerprints(media: Dataset[MediaRow],
                        parallelism: Option[Int] = None)
      : Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    val part = parallelism.map(media.repartition(_)).getOrElse(media)
    part.mapPartitions(_.map { r =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"media ${r.media_id}: expected 16-bit mono PCM, got $fmt")
      val data = ais.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(data).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      val samples = new Array[Short](data.length / 2)
      var i = 0
      while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
      MediaHash(r.media_id, audioFingerprint(samples, r.media_id))
    })
  }

  final case class FrameHash(media_id: Long, frame_idx: Int, dhash: Long)

  /** Per-FRAME dHash over the batched MJPEG-AVI decode seam — the
    * video near-dup primitive: a video's identity for dedup is its
    * (ordered) frame-fingerprint sequence, so re-encodes that keep
    * the frames collapse together while an edit (inserted/changed
    * frame) separates. Output: (media_id, frame_idx, dhash); group on
    * the collected sequence for exact video dedup, or set-overlap the
    * frames for partial-match detection.
    */
  def frameDhashes(media: Dataset[MediaRow],
                   parallelism: Option[Int] = None): Dataset[FrameHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    val part = parallelism.map(media.repartition(_)).getOrElse(media)
    part.mapPartitions(_.flatMap { r =>
      val frames = AviMjpegCodec.framesOf(r.payload, r.media_id)
      require(frames.nonEmpty, s"media ${r.media_id}: no video frames")
      frames.zipWithIndex.map { case (jb, idx) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(jb))
        require(img != null,
          s"media ${r.media_id}: undecodable MJPEG frame $idx")
        FrameHash(r.media_id, idx, dHash(img))
      }
    })
  }

  /** Deterministic two-band PNG (grid-aligned: width a multiple of 9,
    * so the 9-column dHash grid never straddles the band boundary —
    * the first 5 grid columns are `leftGray`, the last 4 `rightGray`)
    * — the fixture generator for [[dhashFeatures]]: the HASH CLASS is
    * a pure function of sign(leftGray − rightGray), independent of
    * size and of the actual gray values.
    */
  def encodeBandedPng(width: Int, height: Int, leftGray: Int,
                      rightGray: Int): Array[Byte] = {
    require(width % 9 == 0, "width must be a multiple of 9")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val split = width / 9 * 5
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = if (x < split) leftGray else rightGray
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic row-pattern PNG (grid-aligned: width a multiple of
    * 9, height a multiple of 8): each of the 8 dHash grid rows is a
    * two-band row — `leftBright(r)` ? bright-left : bright-right.
    * A bright-left row contributes hash byte 0x08 (one bit at the
    * band boundary), a bright-right row 0x00 — so flipping one row
    * flips EXACTLY ONE hash bit, giving fixtures with a chosen
    * pairwise hamming distance (the [[dHash]] near-match fixture).
    */
  def encodeRowPatternPng(width: Int, height: Int, bright: Int,
                          dark: Int,
                          leftBright: Seq[Boolean]): Array[Byte] = {
    require(width % 9 == 0, "width must be a multiple of 9")
    require(height % 8 == 0, "height must be a multiple of 8")
    require(leftBright.length == 8, "8 row choices")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val split = width / 9 * 5
    var y = 0
    while (y < height) {
      val row = y * 8 / height
      val (gl, gr) = if (leftBright(row)) (bright, dark) else (dark, bright)
      var x = 0
      while (x < width) {
        val g = if (x < split) gl else gr
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Minimal pure-JVM PDF TEXT extractor on the codec seam — closes
    * the bytes dead-end where CoPath lab reports land as PDF
    * `byteValue` (the reference dispatches on the PDF mime and serves
    * the raw bytes to the UI, ref
    * `core/.../LabResultController.java:122-137`; a training/RAG
    * corpus needs the TEXT). Handles the standard subset report
    * generators emit: FlateDecode'd (or stored-plain) content
    * streams, `BT..ET` text blocks, `Tj` / `'` / `TJ` show operators,
    * PDF-string escapes (`\( \) \\ \n \r \t \b \f`, octal `\ddd`,
    * escaped line continuations) and hex strings — NOT a general
    * renderer (no CMap/encoding tables, no xref repair; undecodable
    * payloads fail the task, dead-letter upstream as with
    * [[ImageIoCodec]]).
    *
    * Line structure: each `BT..ET` block's shown strings concatenate
    * in content order; blocks join with `\n` — the inverse of
    * [[encodePdf]]'s one-block-per-line layout, so
    * `text(encodePdf(lines)) == lines.mkString("\n")` exactly.
    */
  object PdfCodec {

    def text(payload: Array[Byte], mediaId: Long): String =
      contentStreams(payload, mediaId)
        .map(extractText).filter(_.nonEmpty).mkString("\n")

    /** Every stream object's DECODED bytes, in file order. */
    private def contentStreams(payload: Array[Byte],
                               mediaId: Long): Seq[Array[Byte]] = {
      require(payload.length >= 5 &&
        new String(payload, 0, 5,
          java.nio.charset.StandardCharsets.ISO_8859_1) == "%PDF-",
        s"media $mediaId: not a PDF payload")
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      val kwStream = "stream".getBytes
      val kwEnd = "endstream".getBytes
      var from = 0
      var at = indexOfBytes(payload, kwStream, from)
      while (at >= 0) {
        // dict text between the enclosing "obj" (or buffer start) and
        // the stream keyword names the filter
        val dictStart = math.max(0, lastIndexOfBytes(payload, "obj".getBytes, at))
        val dict = new String(payload, dictStart, at - dictStart,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        var dataStart = at + kwStream.length
        if (dataStart < payload.length && payload(dataStart) == '\r')
          dataStart += 1
        if (dataStart < payload.length && payload(dataStart) == '\n')
          dataStart += 1
        // honor /Length when the dict carries it: compressed bytes can
        // contain the "endstream" byte sequence by chance, so scanning
        // for the keyword alone could truncate the stream
        val lenRe = "/Length\\s+(\\d+)".r
        val (dataEnd, endAt) = lenRe.findFirstMatchIn(dict) match {
          case Some(m) =>
            val de = dataStart + m.group(1).toInt
            require(de <= payload.length,
              s"media $mediaId: /Length past end of payload")
            val ea = indexOfBytes(payload, kwEnd, de)
            require(ea >= 0, s"media $mediaId: unterminated PDF stream")
            (de, ea)
          case None =>
            val ea = indexOfBytes(payload, kwEnd, dataStart)
            require(ea >= 0, s"media $mediaId: unterminated PDF stream")
            var de = ea
            if (de > dataStart && payload(de - 1) == '\n') de -= 1
            if (de > dataStart && payload(de - 1) == '\r') de -= 1
            (de, ea)
        }
        val raw = java.util.Arrays.copyOfRange(payload, dataStart, dataEnd)
        out += (if (dict.contains("/FlateDecode")) inflate(raw, mediaId)
                else raw)
        from = endAt + kwEnd.length
        at = indexOfBytes(payload, kwStream, from)
      }
      out.toSeq
    }

    private def inflate(data: Array[Byte],
                        mediaId: Long): Array[Byte] = {
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(data)
        val bos = new java.io.ByteArrayOutputStream(data.length * 4)
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          require(n > 0 || !inf.needsInput(),
            s"media $mediaId: truncated FlateDecode stream")
          bos.write(buf, 0, n)
        }
        bos.toByteArray
      } catch {
        case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(
            s"media $mediaId: corrupt FlateDecode stream", e)
      } finally inf.end()
    }

    /** Shown text of one decoded content stream: a token walk that
      * understands PDF strings (nested parens + escapes), hex
      * strings, and the three show operators; every other operator
      * just clears the pending operand strings.
      */
    private def extractText(content: Array[Byte]): String = {
      val s = new String(content,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val blocks = scala.collection.mutable.ArrayBuffer.empty[String]
      val block = new StringBuilder
      val pending = scala.collection.mutable.ArrayBuffer.empty[String]
      var inBT = false
      var i = 0
      def parseString(): String = {
        // i is at '(' — PDF strings nest unescaped parens
        val sb = new StringBuilder
        var depth = 1
        i += 1
        while (i < s.length && depth > 0) {
          s.charAt(i) match {
            case '\\' if i + 1 < s.length =>
              val c = s.charAt(i + 1)
              i += 2
              c match {
                case 'n' => sb += '\n'
                case 'r' => sb += '\r'
                case 't' => sb += '\t'
                case 'b' => sb += '\b'
                case 'f' => sb += '\f'
                case '\n' => // escaped EOL: line continuation
                case '\r' => if (i < s.length && s.charAt(i) == '\n') i += 1
                case d if d >= '0' && d <= '7' =>
                  var code = d - '0'
                  var k = 0
                  while (k < 2 && i < s.length &&
                      s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                    code = code * 8 + (s.charAt(i) - '0'); i += 1; k += 1
                  }
                  sb += code.toChar
                case other => sb += other // includes \( \) \\
              }
            case '(' => depth += 1; sb += '('; i += 1
            case ')' =>
              depth -= 1
              if (depth > 0) sb += ')'
              i += 1
            case c => sb += c; i += 1
          }
        }
        sb.toString
      }
      def parseHexString(): String = {
        val sb = new StringBuilder
        i += 1
        val hex = new StringBuilder
        while (i < s.length && s.charAt(i) != '>') {
          val c = s.charAt(i)
          if (!c.isWhitespace) hex += c
          i += 1
        }
        i += 1
        if (hex.length % 2 == 1) hex += '0' // spec: odd count pads 0
        var j = 0
        while (j + 2 <= hex.length) {
          sb += Integer.parseInt(hex.substring(j, j + 2), 16).toChar
          j += 2
        }
        sb.toString
      }
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '(') pending += parseString()
        else if (c == '<' && i + 1 < s.length && s.charAt(i + 1) != '<')
          pending += parseHexString()
        else if (c == '<') i += 2 // dict open <<
        else if (c.isLetter || c == '\'' || c == '"') {
          val start = i
          if (c == '\'' || c == '"') i += 1
          else while (i < s.length &&
              (s.charAt(i).isLetterOrDigit || s.charAt(i) == '*')) i += 1
          val op = s.substring(start, i)
          op match {
            case "BT" => inBT = true; block.clear(); pending.clear()
            case "ET" =>
              if (inBT) blocks += block.toString
              inBT = false; pending.clear()
            case "Tj" | "'" | "\"" =>
              if (inBT && pending.nonEmpty) block ++= pending.last
              pending.clear()
            case "TJ" =>
              if (inBT) pending.foreach(block ++= _)
              pending.clear()
            case _ => pending.clear()
          }
        } else i += 1
      }
      blocks.filter(_.nonEmpty).mkString("\n")
    }

    private def indexOfBytes(hay: Array[Byte], needle: Array[Byte],
                             from: Int): Int = {
      var i = math.max(0, from)
      val limit = hay.length - needle.length
      while (i <= limit) {
        var j = 0
        while (j < needle.length && hay(i + j) == needle(j)) j += 1
        if (j == needle.length) return i
        i += 1
      }
      -1
    }

    private def lastIndexOfBytes(hay: Array[Byte], needle: Array[Byte],
                                 before: Int): Int = {
      var i = math.min(before, hay.length) - needle.length
      while (i >= 0) {
        var j = 0
        while (j < needle.length && hay(i + j) == needle(j)) j += 1
        if (j == needle.length) return i + needle.length
        i -= 1
      }
      0
    }
  }

  /** Batched PDF→text extraction over partitions — the text-modality
    * twin of [[decodeFeatures]] (same seam: one task per partition,
    * pure-JVM decode amortized per batch). Output: (media_id, text).
    */
  def pdfTexts(media: Dataset[MediaRow],
               parallelism: Option[Int] = None): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val part = parallelism.map(media.repartition(_)).getOrElse(media)
    part.mapPartitions(rows =>
        rows.map(r => (r.media_id, PdfCodec.text(r.payload, r.media_id))))
      .toDF("media_id", "text")
  }

  /** Deterministic single-page PDF bytes — the fixture generator for
    * [[PdfCodec]] (the [[encodeAviMjpeg]] pattern: a real container a
    * real extractor decodes, oracle-predictable from the arguments).
    * One `BT..ET` text block per line, Helvetica, FlateDecode'd
    * content stream, correct xref offsets — `PdfCodec.text` returns
    * exactly `lines.mkString("\n")`.
    */
  def encodePdf(lines: Seq[String]): Array[Byte] = {
    def esc(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '('  => "\\("
      case ')'  => "\\)"
      case c    => c.toString
    }
    val content = lines.zipWithIndex.map { case (l, i) =>
      s"BT /F1 12 Tf 72 ${720 - 14 * i} Td (${esc(l)}) Tj ET"
    }.mkString("\n")
    val deflater = new java.util.zip.Deflater()
    val cb = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    deflater.setInput(cb); deflater.finish()
    val cbuf = new java.io.ByteArrayOutputStream(cb.length)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished())
      cbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val stream = cbuf.toByteArray
    val latin = java.nio.charset.StandardCharsets.ISO_8859_1
    val bos = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def w(s: String): Unit = bos.write(s.getBytes(latin))
    w("%PDF-1.4\n")
    def obj(body: String): Unit = {
      offsets += bos.size()
      w(s"${offsets.length} 0 obj\n$body\nendobj\n")
    }
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
    offsets += bos.size()
    w(s"4 0 obj\n<< /Length ${stream.length} /Filter /FlateDecode >>\n" +
      "stream\n")
    bos.write(stream)
    w("\nendstream\nendobj\n")
    obj("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val xref = bos.size()
    w(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n" +
      offsets.map(o => f"$o%010d 00000 n \n").mkString)
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xref\n%%EOF\n")
    bos.toByteArray
  }

  /** Batched decode over partitions. Repartitions to `parallelism` first
    * when the upstream has too few splits (binary blobs are often few,
    * large files).
    */
  def decodeFeatures(media: Dataset[MediaRow], codec: Codec,
                     parallelism: Option[Int] = None): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val part = parallelism.map(media.repartition(_)).getOrElse(media)
    part.mapPartitions(codec.decodeBatch)
  }

  /** Frame sampling plan for video: every `stride`-th frame index as rows
    * (the downstream decode fetches only those frames). Pure sequence
    * expression — demonstrates the explode-side plumbing.
    */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("media_id"), col("frame_idx"))
}
