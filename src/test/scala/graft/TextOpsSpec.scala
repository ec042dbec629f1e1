package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Round-7 training-data ops: decontamination, stratified sampling,
  * PII scrubbing, sequence packing.
  */
class TextOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("decontaminate: overlap fraction against a benchmark set") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // 4 trigrams, 2 shared
      (2L, "one two three four"),                  // disjoint from bench
      (3L, "xy zz")                                // too short: 0 shingles
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "gamma delta epsilon zeta eta")       // shares 2 trigrams w/ d1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(docs, bench, "doc_id", "text",
        "text", shingleN = 3, threshold = 0.4)
      .orderBy("doc_id")
      .collect()
    assert(out.length == 3)
    val d1 = out(0)
    assert(d1.getAs[Long]("n_shingles") == 4 &&
      d1.getAs[Long]("n_overlap") == 2 &&
      d1.getAs[Double]("overlap_frac") == 0.5 &&
      d1.getAs[Boolean]("contaminated"))
    val d2 = out(1)
    assert(d2.getAs[Long]("n_overlap") == 0 && !d2.getAs[Boolean]("contaminated"))
    val d3 = out(2)
    assert(d3.getAs[Long]("n_shingles") == 0 &&
      d3.getAs[Double]("overlap_frac") == 0.0 &&
      !d3.getAs[Boolean]("contaminated"))
  }

  test("incremental decontamination: persisted index, batch folds union " +
    "to the one-shot result") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four"),
      (3L, "xy zz"),
      (4L, "gamma delta epsilon zeta eta theta"),
      (5L, "five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "gamma delta epsilon zeta eta"),
      (101L, "seven eight nine ten eleven")
    ).toDF("doc_id", "text")

    val idx = java.nio.file.Files
      .createTempDirectory("bench_idx_spec").toString
    TextAnalysis.buildBenchmarkIndex(bench, "text", shingleN = 3,
      indexDir = idx)

    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_shingles", "n_overlap", "overlap_frac",
        "contaminated")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq.sorted

    // two folds over the index == one-shot decontaminate, row for row
    val oneShot = snap(TextAnalysis.decontaminate(docs, bench, "doc_id",
      "text", "text", shingleN = 3, threshold = 0.4))
    val folded = snap(
      TextAnalysis.decontaminateIncremental(spark, idx,
          docs.filter(col("doc_id") <= 2), "doc_id", "text",
          shingleN = 3, threshold = 0.4)
        .unionByName(TextAnalysis.decontaminateIncremental(spark, idx,
          docs.filter(col("doc_id") > 2), "doc_id", "text",
          shingleN = 3, threshold = 0.4)))
    assert(folded == oneShot && folded.size == 5)
    // the folds found real contamination (not vacuous equality):
    // d1 2/4 vs bench-100, d4 3/4 vs bench-100, d5 2/4 vs bench-101
    assert(folded.count(_._5) == 3)
  }

  test("stratifiedSample: deterministic, rate-monotone, boundary rates") {
    val docs = (0 until 1000).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val all = TextAnalysis.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 1.0))
    assert(all.count() == 1000, "rate 1.0 keeps everything")
    val none = TextAnalysis.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.0, "de" -> 0.0))
    assert(none.count() == 0, "rate 0.0 keeps nothing")

    val half = TextAnalysis.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.1))
    val c1 = half.groupBy("lang").count().as[(String, Long)].collect().toMap
    // hash-sampling tolerance: ±10 points of the target rate at n=500
    assert(math.abs(c1("en") - 250L) < 50, s"en kept ${c1("en")}")
    assert(math.abs(c1("de") - 50L) < 50, s"de kept ${c1("de")}")
    // determinism: the same call selects the same rows
    val again = TextAnalysis.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.1))
    assert(half.select("doc_id").except(again.select("doc_id")).count() == 0)
    // subset property: raising a rate only adds documents
    val more = TextAnalysis.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.8, "de" -> 0.1))
    assert(half.select("doc_id").except(more.select("doc_id")).count() == 0,
      "lower-rate selection must be a subset of the higher-rate one")
  }

  test("piiScrub: counts and redaction") {
    val docs = Seq(
      (1L, "mail a.user+x@dept.example.org and b@c.io from 192.168.0.1 call +442071234567"),
      (2L, "clean text with version 1.2 and price 3.4")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Int]("n_emails") == 2 && r1.getAs[Int]("n_ips") == 1 &&
      r1.getAs[Int]("n_phones") == 1)
    assert(r1.getAs[String]("redacted") ==
      "mail <EMAIL> and <EMAIL> from <IP> call <PHONE>")
    val r2 = out(1)
    assert(r2.getAs[Int]("n_emails") == 0 && r2.getAs[Int]("n_ips") == 0 &&
      r2.getAs[Int]("n_phones") == 0)
    assert(r2.getAs[String]("redacted") == "clean text with version 1.2 and price 3.4")
  }

  test("semDedup: kept set is tau-separated; every drop has an earlier witness") {
    import graft.operators.Dedup
    val tau = 0.9
    // cluster 0: three near-collinear vectors + one orthogonal;
    // cluster 1: an exact-duplicate pair
    val vecs = Seq(
      (1L, 0, Seq(1.0f, 0.0f, 0.0f)),
      (2L, 0, Seq(0.98f, 0.1f, 0.0f)),
      (3L, 0, Seq(0.95f, 0.2f, 0.0f)),
      (4L, 0, Seq(0.0f, 0.0f, 1.0f)),
      (5L, 1, Seq(0.5f, 0.5f, 0.5f)),
      (6L, 1, Seq(0.5f, 0.5f, 0.5f))
    ).toDF("vec_id", "label", "embedding")
    val out = Dedup.semDedup(vecs, "vec_id", "embedding", "label", tau)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cluster"),
        r.getAs[Double]("cent_sim"), r.getAs[Long]("n_earlier_dups"),
        r.getAs[Boolean]("kept"))).sortBy(_._1)
    assert(out.length == 6)

    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val raw = Seq(1L -> (0, Seq(1.0f, 0.0f, 0.0f)), 2L -> (0, Seq(0.98f, 0.1f, 0.0f)),
      3L -> (0, Seq(0.95f, 0.2f, 0.0f)), 4L -> (0, Seq(0.0f, 0.0f, 1.0f)),
      5L -> (1, Seq(0.5f, 0.5f, 0.5f)), 6L -> (1, Seq(0.5f, 0.5f, 0.5f))).toMap

    // kept vectors are pairwise tau-separated within each cluster
    val kept = out.filter(_._5)
    for (Seq(x, y) <- kept.toSeq.combinations(2) if x._2 == y._2)
      assert(cos(raw(x._1)._2, raw(y._1)._2) < tau,
        s"kept pair ${x._1},${y._1} violates tau separation")
    // every dropped vector has an earlier-ordered similar witness
    val order = out.map(r => r._1 -> (r._3, r._1)).toMap
    for (d <- out.filter(!_._5)) {
      val witnesses = out.filter(o => o._2 == d._2 && o._1 != d._1 &&
        (o._3 < d._3 || (o._3 == d._3 && o._1 < d._1)) &&
        cos(raw(o._1)._2, raw(d._1)._2) >= tau)
      assert(witnesses.nonEmpty, s"dropped ${d._1} has no earlier witness")
      assert(d._4 == witnesses.length.toLong)
    }
    // the orthogonal vector always survives
    assert(out.find(_._1 == 4L).get._5)
    // exact duplicates: exactly one of the pair survives
    assert(out.filter(r => r._1 == 5L || r._1 == 6L).count(_._5) == 1)
  }

  test("chunkWindows: exact chunk counts/offsets, full coverage, no " +
      "degenerate tails; short docs emit one chunk; empty docs none") {
    val docs = Seq(
      (1L, "a b c d e"),       // n=5, w=4, s=2 → chunks [0..3], [2..4]
      (2L, "a b c"),           // n=3 < w → ONE chunk
      (3L, "a b c d"),         // n=4 == w → ONE chunk (no tail junk)
      (4L, "  "),              // whitespace-only → nothing
      (5L, "a b c d e f g")    // n=7 → 1+ceil(3/2)=3: 0,2,4
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkWindows(docs, "doc_id", "text",
        windowTokens = 4, strideTokens = 2)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "start_tok", "n_toks", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 4L, "a b c d"), (1L, 1L, 2L, 3L, "c d e"),
      (2L, 0L, 0L, 3L, "a b c"),
      (3L, 0L, 0L, 4L, "a b c d"),
      (5L, 0L, 0L, 4L, "a b c d"), (5L, 1L, 2L, 4L, "c d e f"),
      (5L, 2L, 4L, 3L, "e f g")))
    // coverage property: every token position of every doc falls in
    // at least one [start, start + n_toks) span
    for ((id, n) <- Seq((1L, 5), (2L, 3), (3L, 4), (5L, 7));
         pos <- 0 until n)
      assert(got.exists(c => c._1 == id &&
        pos >= c._3 && pos < c._3 + c._4), s"doc $id pos $pos uncovered")
  }

  test("releaseDiff: every status on a hand case; corpus GROWTH under " +
      "assignSplit produces zero split_moved rows (the leakage audit)") {
    val oldM = Seq((1L, "train", 0L), (2L, "train", 1L), (3L, "val", -1L),
      (4L, "test", -1L)).toDF("doc_id", "split", "shard")
    val newM = Seq((1L, "train", 0L),  // unchanged
      (2L, "train", 2L),               // shard_moved
      (3L, "test", -1L),               // split_moved (a salt change!)
      (5L, "train", 1L))               // added; 4 removed
      .toDF("doc_id", "split", "shard")
    val got = TextAnalysis.releaseDiff(oldM, newM)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "shard_moved",
      3L -> "split_moved", 4L -> "removed", 5L -> "added"))
    // growth property: splits are hash-range functions of the id, so
    // a superset release can only ADD or move shards — never splits
    def manifest(docs: org.apache.spark.sql.DataFrame) = {
      val ws = TextAnalysis.assignSplit(docs, "doc_id",
        splits = Seq(("train", 8000L), ("val", 1000L), ("test", 1000L)))
      val sh = TextAnalysis.shardAssign(
        ws.filter(col("split") === "train"), "doc_id", numShards = 3)
      ws.join(sh.select(col("doc_id"), col("shard")), Seq("doc_id"),
          "left")
        .select(col("doc_id"), col("split"),
          coalesce(col("shard"), lit(-1L)).as("shard"))
    }
    val docs = (1L to 120L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val diff = TextAnalysis.releaseDiff(
        manifest(docs.filter(col("doc_id") <= 60)), manifest(docs))
      .groupBy("status").count()
      .as[(String, Long)].collect().toMap
    assert(!diff.contains("split_moved") && !diff.contains("removed"))
    assert(diff("added") == 60L)
  }

  test("chunkWindows with stride == window (no overlap): exact tiling, " +
      "single-token tail emitted once") {
    val docs = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h i"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkWindows(docs, "doc_id", "text",
        windowTokens = 4, strideTokens = 4)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "start_tok", "n_toks", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 4L, "a b c d"), (1L, 4L, 4L, "e f g h"),
      (2L, 0L, 4L, "a b c d"), (2L, 4L, 4L, "e f g h"),
      (2L, 8L, 1L, "i")))
  }

  test("packSequences: contiguous offsets, chunk spans, straddling docs") {
    val docs = Seq(
      (1L, "s", "a b c d"),        // 4 tokens: [0,4)   chunk 0
      (2L, "s", "e f g"),          // 3 tokens: [4,7)   chunks 0-1 (straddles 5)
      (3L, "s", "h i"),            // 2 tokens: [7,9)   chunk 1
      (10L, "t", "x y z w v u t")  // own stream: [0,7) chunks 0-1
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.packSequences(docs, "doc_id", "source", "text",
        chunkTokens = 5)
      .orderBy("stream", "doc_id")
      .select("stream", "doc_id", "n_tokens", "start_tok", "end_tok",
        "first_chunk", "last_chunk")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(out(0) == (("s", 1L, 4L, 0L, 4L, 0L, 0L)))
    assert(out(1) == (("s", 2L, 3L, 4L, 7L, 0L, 1L)))
    assert(out(2) == (("s", 3L, 2L, 7L, 9L, 1L, 1L)))
    assert(out(3) == (("t", 10L, 7L, 0L, 7L, 0L, 1L)))
    // offsets are gap-free per stream
    val s = out.filter(_._1 == "s")
    assert(s.sliding(2).forall(p => p(0)._5 == p(1)._4))
  }
  test("cleanLines: each rule fires independently; dup counts against " +
      "an earlier REMOVED line too; empty lines vanish; all-removed " +
      "docs keep an empty clean_text") {
    val docs = Seq(
      // keep, CAPS-removed, dup-of-kept, short, symbol-heavy, and a
      // dup of the REMOVED caps line (still a dup), plus blank lines
      (1L, "real body line here\n\nMENU BAR\nreal body line here\n" +
        "ok\n*** *** ***\nMENU BAR\nsecond body line kept"),
      (2L, "AAA BBB CCC"), // single all-caps line: everything removed
      (3L, "   \n  \n")  // only blank lines: zero lines
    ).toDF("doc_id", "text")
    val out = TextAnalysis.cleanLines(docs, "doc_id", "text",
        minLineTokens = 2L, maxSymbol10k = 1500L)
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_kept", "n_removed", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 7L, 2L, 5L,
      "real body line here\nsecond body line kept")))
    assert(out(1) == ((2L, 1L, 0L, 1L, "")))
    assert(out(2) == ((3L, 0L, 0L, 0L, "")))
    // the report counts rules independently and sums across docs
    val rep = TextAnalysis.cleanLinesReport(docs, "doc_id", "text",
        minLineTokens = 2L, maxSymbol10k = 1500L)
      .as[(String, Long)].collect().toMap
    // dups: line 4 (dup of kept) + line 7 (dup of removed MENU BAR)
    assert(rep("r_dup") == 2L)
    assert(rep("r_short") == 1L)   // "ok"
    assert(rep("r_caps") == 3L)    // MENU BAR x2 + AAA BBB CCC
    assert(rep("r_sym") == 1L)     // *** *** ***
    assert(rep("kept") == 2L)
  }

  test("tokenizerCoverage: merged pieces vs char fallback per stratum; " +
      "exact-integer ratio; empty stratum reports zeros") {
    // merge table ("a","b"): word "ab" encodes to ONE merged piece,
    // any other word falls back to single chars
    val docs = Seq(
      ("in", "ab ab cd"),   // pieces: ab, ab, c, d -> 4 pieces, 2 merged
      ("in", "ab"),         // 1 piece, 1 merged
      ("out", "cd ef"),     // c,d,e,f -> 4 pieces, 0 merged
      ("nil", " ")          // no tokens at all
    ).toDF("source", "text")
    val r = TextAnalysis.tokenizerCoverage(docs, "source", "text",
        Seq(("a", "b")))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r("in") == ((5L, 3L, 6000L)))   // 3*10000 div 5
    assert(r("out") == ((4L, 0L, 0L)))
    assert(r("nil") == ((0L, 0L, 0L)))
  }

  test("extractHtml: comments/script/style/title removed WITH content, " +
      "block tags become lines, inline tags rejoin seamlessly, " +
      "entities decode with &amp; last; empty/insane inputs survive") {
    val docs = Seq(
      (1L, "<html><head><title>skip</title>" +
        "<script>if (a<b && c>d) { x(); }</script>" +
        "<style>.x{}</style></head><body>" +
        "<!-- multi\nline comment -->" +
        "<h1>Title</h1><p>one <b>two</b> three</p>" +
        "<div>&amp;lt;literal &quot;q&quot; &#39;s&#39;&nbsp;&gt;</div>" +
        "</body></html>"),
      (2L, ""),                       // empty doc
      (3L, "no markup at all"),       // plain text passes through
      (4L, "<p></p><div>  </div>")    // tags around only whitespace
    ).toDF("doc_id", "html")
    val r = TextAnalysis.extractHtml(docs, "doc_id", "html")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(2), x.getString(3))).toMap
    assert(r(1L) == ((3L,
      "Title\none two three\n&lt;literal \"q\" 's' >")))
    assert(r(2L) == ((0L, "")))
    assert(r(3L) == ((1L, "no markup at all")))
    assert(r(4L) == ((0L, "")))
  }

  test("fuzzyDecontaminate: planted near-dup of a benchmark doc is " +
      "flagged, unrelated docs are not; incremental folds over the " +
      "persisted index union to the one-shot result") {
    // near-dup: one token changed out of 12 — bigram jaccard ~0.77,
    // every other doc disjoint from the benchmark
    val benchText = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu"
    val nearDup = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda nu"
    val docs = Seq(
      (1L, nearDup),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "x")                                   // shingle-less
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val oneShot = TextAnalysis.fuzzyDecontaminate(docs, bench,
        "doc_id", "text", "doc_id", "text", threshold = 0.5)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getBoolean(3))).toMap
    assert(oneShot(1L)._2 && oneShot(1L)._1 == 1L)
    assert(!oneShot(2L)._2 && !oneShot(3L)._2)
    val idx = java.nio.file.Files
      .createTempDirectory("fuzzy_idx_spec").toString
    TextAnalysis.buildFuzzyBenchmarkIndex(bench, "doc_id", "text",
      shingleN = 2, numPerm = 64, seed = 42L, indexDir = idx)
    val folded = Seq(docs.filter(col("doc_id") <= 1L),
        docs.filter(col("doc_id") > 1L))
      .map(b => TextAnalysis.fuzzyDecontaminateIncremental(spark, idx,
        b, "doc_id", "text", threshold = 0.5))
      .reduce(_ unionByName _)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getBoolean(3))).toMap
    assert(folded == oneShot)
  }

  test("byte-level BPE: a non-Latin word the training corpus never " +
      "saw still encodes (base bytes, zero OOV) and round-trips " +
      "exactly; merges compress the trained words; vocab base is all " +
      "256 bytes") {
    val train = Seq((1L, "abab abab cdcd")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrainBytes(train, "text", numMerges = 4)
      .orderBy(col("step")).collect()
      .map(r => r.getAs[String]("left") -> r.getAs[String]("right")).toSeq
    assert(merges.nonEmpty)
    // unseen scripts: Greek, CJK, 4-byte emoji — none in training
    val docs = Seq((1L, "abab"), (2L, "αβγ 汉字 🙂")).toDF("doc_id", "text")
    val enc = TextAnalysis.bpeEncodeBytes(docs, "doc_id", "text", merges)
    val byDoc = enc.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(2))).toMap
    // trained word compresses below its byte count (4 bytes -> fewer)
    assert(byDoc(1L).length < 4)
    // unseen text encodes to its raw byte symbols — nothing dropped:
    // "αβγ" = 6 bytes, "汉字" = 6 bytes, emoji = 4 bytes
    assert(byDoc(2L).length == 16)
    assert(byDoc(2L).forall(_.length == 2))
    val vocab = TextAnalysis.bpeVocabBytes(spark, merges)
    assert(vocab.filter(col("token_id") < 256).count() == 256L)
    val marked = docs.select(col("doc_id"),
      TextAnalysis.markWords(col("text")).as("text"))
    val ids = TextAnalysis.bpeEncodeIdsBytes(marked, "doc_id", "text",
      merges, vocab)
    val decoded = TextAnalysis.bpeDecodeBytes(ids, vocab)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(decoded(1L) == "abab")
    assert(decoded(2L) == "αβγ 汉字 🙂")
  }

  test("DeconStream.foldBatch: replaying the same batch id rewrites " +
      "the same rows (at-least-once safe); layer union equals the " +
      "one-shot run") {
    import graft.streaming.DeconStream
    val benchText = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu"
    val nearDup = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda nu"
    val docs = Seq(
      (1L, nearDup),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("dstream_idx").toString
    TextAnalysis.buildFuzzyBenchmarkIndex(bench, "doc_id", "text",
      shingleN = 2, numPerm = 64, seed = 42L, indexDir = idx)
    val out = java.nio.file.Files
      .createTempDirectory("dstream_out").toString
    DeconStream.foldBatch(docs.filter(col("doc_id") === 1L), 0L, idx,
      out, "doc_id", "text", threshold = 0.5)
    // at-least-once replay of batch 0: same layer rewritten, no dups
    DeconStream.foldBatch(docs.filter(col("doc_id") === 1L), 0L, idx,
      out, "doc_id", "text", threshold = 0.5)
    DeconStream.foldBatch(docs.filter(col("doc_id") === 2L), 1L, idx,
      out, "doc_id", "text", threshold = 0.5)
    val folded = spark.read.parquet(out)
      .select("doc_id", "n_matches", "contaminated")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2))).toMap
    assert(folded.size == 2)
    assert(folded(1L) == ((1L, true)) && folded(2L) == ((0L, false)))
  }

  test("fuzzyDeconEval: the planted pair is truth AND candidate on a " +
      "sample that contains it; prec/recall exact") {
    val benchText = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu"
    val nearDup = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda nu"
    val docs = Seq(
      (2L, nearDup),
      (4L, "one two three four five six seven eight nine ten"),
      (5L, nearDup)   // outside the %2 sample: must not count
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val r = TextAnalysis.fuzzyDeconEval(docs, bench, "doc_id", "text",
        "doc_id", "text", evalPred = id => pmod(id, lit(2)) === 0,
        shingleN = 2, numPerm = 64, bands = 8, threshold = 0.5,
        seed = 42L)
      .collect().head
    assert(r.getLong(0) == 1L && r.getLong(2) == 1L) // n_true, n_hit
    assert(r.getDouble(4) == 1.0)                    // recall
  }
}
