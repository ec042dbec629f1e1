package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Round-8 data-selection ops: DSIR importance weights, per-domain
  * caps, corpus-trained LM quality buckets, BPE pair counting.
  */
class SelectionOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("dsirWeights: exact-integer likelihood-ratio scores") {
    // 6 distinct feature strings, verified collision-free mod 65536.
    val docs = Seq(
      (1L, "aa bb"), // all features in target → every contrib 1.0
      (2L, "xx yy")  // disjoint from target → smoothing prior 0.5
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dsirWeights(docs,
        docs.filter(col("doc_id") === 1L), "doc_id", "text",
        nBuckets = 65536, threshold = 0.75)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    val d1 = out(0)
    // 3 features (aa, bb, "aa bb"); each: ((1+1)*1e6) div (1+1) = 1e6
    assert(d1.getAs[Long]("n_feats") == 3 &&
      d1.getAs[Long]("contrib_sum") == 3000000L &&
      d1.getAs[Double]("dsir_score") == 1.0 &&
      d1.getAs[Boolean]("selected"))
    val d2 = out(1)
    // each: ((0+1)*1e6) div (1+1) = 500000 — the add-1 smoothing prior
    assert(d2.getAs[Long]("contrib_sum") == 1500000L &&
      d2.getAs[Double]("dsir_score") == 0.5 &&
      !d2.getAs[Boolean]("selected"))
  }

  test("incremental DSIR: frozen index, batch folds union to the " +
      "one-shot result") {
    val docs = Seq((1L, "aa bb"), (2L, "xx yy"), (3L, "aa bb cc"),
      (4L, "zz ww")).toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") % 2 === 1)
    val oneShot = TextAnalysis.dsirWeights(docs, target, "doc_id",
        "text", nBuckets = 65536, threshold = 0.75)
      .orderBy("doc_id").collect()
    val idx = java.nio.file.Files
      .createTempDirectory("dsir_idx_spec").toString
    TextAnalysis.buildDsirIndex(docs, target, "doc_id", "text",
      nBuckets = 65536, scale = 1000000L, indexDir = idx)
    val fold = (p: org.apache.spark.sql.Column) =>
      TextAnalysis.dsirScoreIncremental(spark, idx,
        docs.filter(p), "doc_id", "text", nBuckets = 65536,
        threshold = 0.75)
    val folded = fold(col("doc_id") <= 2)
      .unionByName(fold(col("doc_id") > 2))
      .orderBy("doc_id").collect()
    assert(folded.toSeq == oneShot.toSeq)
  }

  test("domainCap: blocklist drops, cap holds, selection is " +
      "order-independent") {
    val docs = Seq(
      (1L, "d1"), (2L, "d1"), (3L, "d1"), (4L, "d1"),
      (5L, "d2"),
      (6L, "spam")
    ).toDF("doc_id", "source")
    val out = TextAnalysis.domainCap(docs, "doc_id", "source",
      maxPerDomain = 2, blocklist = Seq("spam"))
    val rows = out.orderBy("doc_id")
      .select("doc_id", "source", "keep_rank").collect()
    assert(!rows.exists(_.getAs[String]("source") == "spam"))
    assert(rows.count(_.getAs[String]("source") == "d1") == 2)
    val d2 = rows.filter(_.getAs[String]("source") == "d2")
    assert(d2.length == 1 && d2.head.getAs[Long]("keep_rank") == 1L)
    assert(rows.forall(_.getAs[Long]("keep_rank") <= 2L))
    // hash-ordered selection: reversing input order and repartitioning
    // must keep the SAME docs
    val shuffled = TextAnalysis.domainCap(
      docs.orderBy(col("doc_id").desc).repartition(7), "doc_id", "source",
      maxPerDomain = 2, blocklist = Seq("spam"))
      .orderBy("doc_id").select("doc_id", "source", "keep_rank").collect()
    assert(shuffled.toSeq == rows.toSeq)
  }

  test("lmQualityScore: exact mean relative frequency and buckets") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // freq: a=3, b=1, c=1; T=5
    // doc1: n=3, freq_sum=2*3+1=7,  mean=7/15 ≈ 0.4667 → head
    // doc2: n=2, freq_sum=3+1=4,    mean=4/10 = 0.4    → tail
    val out = TextAnalysis.lmQualityScore(docs, "doc_id", "text",
        headMin = 0.45, midMin = 0.41)
      .orderBy("doc_id").collect()
    val d1 = out(0)
    assert(d1.getAs[Long]("n_tokens") == 3 &&
      d1.getAs[Long]("freq_sum") == 7 &&
      d1.getAs[Double]("mean_rel_freq") == 7.0 / 15.0 &&
      d1.getAs[String]("lm_bucket") == "head")
    val d2 = out(1)
    assert(d2.getAs[Long]("freq_sum") == 4 &&
      d2.getAs[Double]("mean_rel_freq") == 0.4 &&
      d2.getAs[String]("lm_bucket") == "tail")
  }

  test("lmBigramScore: exact conditional-probability ratios; " +
      "single-token docs score 0 → tail") {
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "z"))
      .toDF("doc_id", "text")
    // bc: (a,b)=2 (b,a)=1 (a,c)=1; prefix counts: a=3, b=1
    // doc1: 2×((2·10⁴)div 3 = 6666) + (1·10⁴)div 1 = 23332 / 3·10⁴
    // doc2: (1·10⁴)div 3 = 3333 / 10⁴; doc3: no pairs
    val out = TextAnalysis.lmBigramScore(docs, "doc_id", "text",
        headMin = 0.7, midMin = 0.2)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("rsum") == 23332L &&
      out(0).getAs[Double]("bigram_score") == 23332.0 / 30000.0 &&
      out(0).getAs[String]("lm_bucket") == "head")
    assert(out(1).getAs[Long]("rsum") == 3333L &&
      out(1).getAs[String]("lm_bucket") == "middle")
    assert(out(2).getAs[Long]("n_pairs") == 0L &&
      out(2).getAs[Double]("bigram_score") == 0.0 &&
      out(2).getAs[String]("lm_bucket") == "tail")
  }

  test("bpePairCounts: frequency-weighted adjacent pairs; 1-char words " +
      "contribute nothing") {
    val docs = Seq((1L, "abab ab x"), (2L, "ab")).toDF("doc_id", "text")
    // words: abab×1 (pairs ab, ba, ab), ab×2 (pair ab), x×1 (none)
    val counts = TextAnalysis.bpePairCounts(docs, "text")
      .orderBy("pair").collect()
    assert(counts.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("ab", 4L), ("ba", 1L)))
    val best = TextAnalysis.bestMerge(
      TextAnalysis.bpePairCounts(docs, "text")).collect()
    assert(best.length == 1 && best.head.getString(0) == "ab" &&
      best.head.getLong(1) == 4L)
  }

  test("mixToTarget: exact integer caps hit the target mix; untargeted " +
      "strata drop; selection is order-independent") {
    // a×6, b×4, c×1; targets a=50% b=50% → N = min(12, 8) = 8 → 4+4
    val docs = ((1L to 6L).map((_, "a")) ++ (7L to 10L).map((_, "b")) :+
        (11L, "c"))
      .toDF("doc_id", "lang")
    val out = TextAnalysis.mixToTarget(docs, "doc_id", "lang",
      Map("a" -> 5000L, "b" -> 5000L))
    val rows = out.select("doc_id", "lang", "mix_rank")
      .orderBy("doc_id").collect()
    assert(rows.count(_.getAs[String]("lang") == "a") == 4)
    assert(rows.count(_.getAs[String]("lang") == "b") == 4)
    assert(!rows.exists(_.getAs[String]("lang") == "c"))
    assert(rows.forall(_.getAs[Long]("mix_rank") <= 4L))
    val shuffled = TextAnalysis.mixToTarget(
        docs.orderBy(col("doc_id").desc).repartition(5), "doc_id", "lang",
        Map("a" -> 5000L, "b" -> 5000L))
      .select("doc_id", "lang", "mix_rank").orderBy("doc_id").collect()
    assert(shuffled.toSeq == rows.toSeq)
  }

  test("temperatureMix: isqrt token weights upweight small sources; " +
      "caps are exact; selection is order-independent") {
    // A: 16 docs × 4 tokens = 64 → w=8; B: 4 docs × 4 tokens = 16 →
    // w=4. Σw=12, budget 6 → capA = 48 div 12 = 4, capB = 24 div 12 =
    // 2 (proportional-to-tokens would give B 1.2 docs — temperature
    // lifts the tail source's share from 20% to 33%).
    val docs = ((1L to 16L).map(i => (i, "A", s"w$i x$i y$i z$i")) ++
      (17L to 20L).map(i => (i, "B", s"w$i x$i y$i z$i")))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.temperatureMix(docs, "doc_id", "source",
        "text", budgetDocs = 6L)
      .select("doc_id", "source", "mix_rank").orderBy("doc_id").collect()
    assert(out.count(_.getAs[String]("source") == "A") == 4)
    assert(out.count(_.getAs[String]("source") == "B") == 2)
    val shuffled = TextAnalysis.temperatureMix(
        docs.orderBy(col("doc_id").desc).repartition(5), "doc_id",
        "source", "text", budgetDocs = 6L)
      .select("doc_id", "source", "mix_rank").orderBy("doc_id").collect()
    assert(shuffled.toSeq == out.toSeq)
    // a budget beyond the corpus selects everything (caps exceed sizes)
    assert(TextAnalysis.temperatureMix(docs, "doc_id", "source", "text",
      budgetDocs = 1000L).count() == 20L)
  }

  test("temperatureMixFromIndex: doc-disjoint folds + re-derived " +
      "caps equal the one-shot selection; a third fold re-balances " +
      "without touching earlier rows") {
    val docs = ((1L to 16L).map(i => (i, "A", s"w$i x$i y$i z$i")) ++
      (17L to 20L).map(i => (i, "B", s"w$i x$i y$i z$i")))
      .toDF("doc_id", "source", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("tmix_spec").toString
    TextAnalysis.tempMixIndexAppend(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "source", "text",
      idx, 1L)
    TextAnalysis.tempMixIndexAppend(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "source", "text",
      idx, 2L)
    val incr = TextAnalysis.temperatureMixFromIndex(spark, idx,
        "source", budgetDocs = 6L)
      .select("doc_id", "source", "mix_rank").orderBy("doc_id").collect()
    val oneShot = TextAnalysis.temperatureMix(docs, "doc_id", "source",
        "text", budgetDocs = 6L)
      .select("doc_id", "source", "mix_rank").orderBy("doc_id").collect()
    assert(incr.toSeq == oneShot.toSeq && incr.nonEmpty)
    // new ingest: 12 more B docs arrive — the union's caps re-derive
    // from the index alone and still equal the one-shot replay
    val more = (21L to 32L).map(i => (i, "B", s"w$i x$i y$i z$i"))
      .toDF("doc_id", "source", "text")
    TextAnalysis.tempMixIndexAppend(more, "doc_id", "source", "text",
      idx, 3L)
    val grown = TextAnalysis.temperatureMixFromIndex(spark, idx,
        "source", budgetDocs = 6L)
      .select("doc_id", "source", "mix_rank").orderBy("doc_id").collect()
    val grownOneShot = TextAnalysis.temperatureMix(docs.union(more),
        "doc_id", "source", "text", budgetDocs = 6L)
      .select("doc_id", "source", "mix_rank").orderBy("doc_id").collect()
    assert(grown.toSeq == grownOneShot.toSeq)
  }

  test("bpeDecode round-trips a markWords-marked encode: original " +
      "spacing restored (whitespace-normalized), multibyte intact") {
    val docs = Seq((1L, "  the cat   sat  "), (2L, "低 low lower"),
      (3L, "the the the")).toDF("doc_id", "text")
    val marked = docs.select(col("doc_id"),
      TextAnalysis.markWords(col("text")).as("text"))
    val merges = TextAnalysis.bpeTrain(marked, "text", numMerges = 10)
      .orderBy("step").collect()
      .map(r => r.getAs[String]("left") -> r.getAs[String]("right")).toSeq
    // the marker is absorbed into merge products (how real vocabs
    // learn word-initial tokens) — decode must still be exact
    assert(merges.exists { case (a, b) => (a + b).contains("▁") })
    val vocab = TextAnalysis.bpeVocab(marked, "text", merges)
    val enc = TextAnalysis.bpeEncodeIds(marked, "doc_id", "text",
      merges, vocab)
    val dec = TextAnalysis.bpeDecode(enc, vocab)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(dec == Seq((1L, "the cat sat"), (2L, "低 low lower"),
      (3L, "the the the")))
  }

  test("qualityFunnel: each rule fails independently on a crafted doc; " +
      "keep is the conjunction") {
    val enTail = "the cat is in that hat and it sat on to of a mat"
    val docs = Seq(
      (1L, enTail),                                    // passes all
      (2L, "the cat"),                                 // r_len (2 < 3 tokens)
      (3L, "b c d e f g h i j k " + enTail),           // r_avg_len (avg < 2.0)
      (4L, "the the the the of of to to " + enTail),   // r_stop (> 50%)
      (5L, ("is that " * 12) + enTail),                // r_rep (top 2-gram)
      (6L, "uno dos tres cuatro cinco seis"))          // r_lang ('und')
      .toDF("doc_id", "text")
    val out = TextAnalysis.qualityFunnel(docs, "doc_id", "text",
        langs = Seq("en"), minTokens = 3L, maxTokens = 100L,
        maxStop10k = 5000L, minAvgLen10 = 20L, maxAvgLen10 = 100L)
      .orderBy("doc_id")
      .select("r_len", "r_avg_len", "r_stop", "r_rep", "r_lang", "keep")
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().toSeq
    assert(out(0) == (true, true, true, true, true, true), out(0))
    assert(!out(1)._1 && !out(1)._6, out(1))   // too short
    assert(!out(2)._2 && !out(2)._6, out(2))   // avg token length too low
    assert(!out(3)._3 && !out(3)._6, out(3))   // stopword-saturated
    assert(!out(4)._4 && !out(4)._6, out(4))   // repetition-dominated
    assert(!out(5)._5 && !out(5)._6, out(5))   // not the allowed language
    // every rule passes somewhere and fails somewhere — discriminating
    for (i <- 0 until 5)
      assert(out.exists(_.productElement(i) == true) &&
        out.exists(_.productElement(i) == false), s"rule $i")
  }

  test("stratifiedQualityCut: per-stratum exact caps, (score DESC, id) " +
      "rank, order-independent; empty fraction selects nothing") {
    // A: 5 docs scores 50..10, keep 40% -> 2 (scores 50, 40);
    // B: 2 docs, keep 40% -> 0 (cap floor) — B disappears entirely
    val docs = (Seq((1L, "A", 50.0), (2L, "A", 40.0), (3L, "A", 30.0),
      (4L, "A", 20.0), (5L, "A", 10.0), (6L, "B", 9.0), (7L, "B", 8.0)))
      .toDF("doc_id", "src", "score")
    val out = TextAnalysis.stratifiedQualityCut(docs, "doc_id", "src",
        "score", keepFrac10k = 4000L)
      .select("doc_id", "q_rank").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L), (2L, 2L)))
    val shuffled = TextAnalysis.stratifiedQualityCut(
        docs.orderBy(col("doc_id").desc).repartition(5), "doc_id", "src",
        "score", keepFrac10k = 4000L)
      .select("doc_id", "q_rank").as[(Long, Long)].collect().toSet
    assert(shuffled == out)
    assert(TextAnalysis.stratifiedQualityCut(docs, "doc_id", "src",
      "score", keepFrac10k = 0L).count() == 0L)
  }

  test("tokenizer artifact: save → load round-trips the merge table " +
      "in training order; a loaded tokenizer encodes bit-identically") {
    val docs = Seq((1L, "abab abab ab low lower")).toDF("doc_id", "text")
    val trained = TextAnalysis.bpeTrain(docs, "text", numMerges = 6)
    val inMem = trained.orderBy("step").collect()
      .map(r => r.getAs[String]("left") -> r.getAs[String]("right")).toSeq
    val vocab = TextAnalysis.bpeVocab(docs, "text", inMem)
    val dir = java.nio.file.Files
      .createTempDirectory("tok_spec").toString
    TextAnalysis.saveTokenizer(trained, vocab, dir)
    val (loaded, loadedVocab) = TextAnalysis.loadTokenizer(spark, dir)
    assert(loaded == inMem && loaded.nonEmpty)
    def enc(m: Seq[(String, String)],
            v: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bpeEncodeIds(docs, "doc_id", "text", m, v)
        .orderBy("pos").select("pos", "token_id")
        .as[(Long, Long)].collect().toSeq
    assert(enc(loaded, loadedVocab) == enc(inMem, vocab))
  }

  test("releaseReport: exact per-(split, stratum) doc/token counts; " +
      "funnelReport matches the per-doc funnel's own booleans") {
    val manifest = Seq((1L, "train"), (2L, "train"), (3L, "val"))
      .toDF("doc_id", "split")
    val docs = Seq((1L, "A", "a b c"), (2L, "B", "d e"),
      (3L, "A", "f"), (4L, "A", "never released"))
      .toDF("doc_id", "src", "text")
    val rep = TextAnalysis.releaseReport(manifest, docs, "doc_id",
        "src", "text")
      .as[(String, String, Long, Long)].collect().toSet
    assert(rep == Set(("train", "A", 1L, 3L), ("train", "B", 1L, 2L),
      ("val", "A", 1L, 1L)))

    val enTail = "the cat is in that hat and it sat on to of a mat"
    val fdocs = Seq((1L, enTail), (2L, "x"), (3L, "uno dos tres"))
      .toDF("doc_id", "text")
    val fr = TextAnalysis.qualityFunnelReport(fdocs, "doc_id", "text",
        langs = Seq("en"), minTokens = 3L, minAvgLen10 = 10L)
      .as[(String, Long)].collect().toMap
    val f = TextAnalysis.qualityFunnel(fdocs, "doc_id", "text",
        langs = Seq("en"), minTokens = 3L, minAvgLen10 = 10L)
      .collect()
    for ((rule, i) <- Seq("r_len", "r_avg_len", "r_stop", "r_rep",
        "r_lang").zipWithIndex)
      assert(fr(rule) == f.count(!_.getBoolean(3 + i)), rule)
    assert(fr("kept") == f.count(_.getBoolean(8)))
  }

  test("qualityKeep ≡ qualityFunnel.keep on a mixed corpus — the " +
      "predicate and report forms can never drift") {
    val enTail = "the cat is in that hat and it sat on to of a mat"
    val docs = ((1L to 10L).map(i =>
      (i, s"w$i x$i y$i z$i p$i q$i " + enTail)) ++ Seq(
      (11L, "the cat"), (12L, "uno dos tres cuatro"),
      (13L, ("is that " * 12) + enTail),
      (14L, "b c d e f g h i j k " + enTail), (15L, "  ")))
      .toDF("doc_id", "text")
    val args = (Seq("en"), 3L, 100L, 5000L, 20L, 100L)
    val viaPredicate = docs.filter(TextAnalysis.qualityKeep(col("text"),
        args._1, args._2, args._3, args._4, args._5, args._6))
      .select("doc_id").as[Long].collect().toSet
    val viaFunnel = TextAnalysis.qualityFunnel(docs, "doc_id", "text",
        args._1, args._2, args._3, args._4, args._5, args._6)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(viaPredicate == viaFunnel && viaPredicate.nonEmpty)
  }

  test("bestMerge tie-break: equal counts resolve to the " +
      "lexicographically smallest pair") {
    val pairs = Seq(("ce", 5L), ("cd", 5L), ("aa", 3L))
      .toDF("pair", "pair_count")
    val best = TextAnalysis.bestMerge(pairs).collect()
    assert(best.head.getString(0) == "cd")
  }

  test("bpeTrain: greedy merge sequence on a hand-computed corpus; " +
      "stops when no pairs remain") {
    val docs = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    // words abab×2, ab×1 → (a,b)=2·2+1=5; then (ab,ab)=2; then done
    val m = TextAnalysis.bpeTrain(docs, "text", numMerges = 5)
      .orderBy("step").collect()
    assert(m.length == 2)
    assert((m(0).getAs[String]("left"), m(0).getAs[String]("right"),
      m(0).getAs[String]("merged"), m(0).getAs[Long]("pair_count")) ==
      ("a", "b", "ab", 5L))
    assert((m(1).getAs[String]("left"), m(1).getAs[String]("right"),
      m(1).getAs[String]("merged"), m(1).getAs[Long]("pair_count")) ==
      ("ab", "ab", "abab", 2L))
  }

  test("bpeTrain: multibyte (CJK) symbolization merges whole " +
      "characters, never bytes") {
    val docs = Seq((1L, "你好 你好 好")).toDF("doc_id", "text")
    // words 你好×2 (pair (你,好)), 好×1 (no pair)
    val m = TextAnalysis.bpeTrain(docs, "text", numMerges = 3)
      .orderBy("step").collect()
    assert(m.length == 1)
    assert((m(0).getAs[String]("left"), m(0).getAs[String]("right"),
      m(0).getAs[String]("merged"), m(0).getAs[Long]("pair_count")) ==
      ("你", "好", "你好", 2L))
  }

  test("bpeTrain: left-to-right non-overlapping application (aaaa " +
      "under (a,a) → [aa, aa])") {
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(docs, "text", numMerges = 5)
      .orderBy("step").collect()
    assert(m.map(r => (r.getAs[String]("merged"),
      r.getAs[Long]("pair_count"))).toSeq ==
      Seq(("aa", 3L), ("aaaa", 1L)))
  }

  test("bpeTrain: driver-local merge loop is bit-identical to the " +
      "distributed loop on a shared corpus, including exhaustion") {
    val docs = Seq((1L, "the cat sat on the mat"),
      (2L, "the bat and the cat"), (3L, "matter of that cat"),
      (4L, "aaaa abab 你好 banana bandana")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("step").collect().map(r => (r.getAs[Int]("step"),
        r.getAs[String]("left"), r.getAs[String]("right"),
        r.getAs[String]("merged"), r.getAs[Long]("pair_count"))).toSeq
    for (n <- Seq(1, 7, 500)) { // 500 exhausts every pair
      val local = rows(TextAnalysis.bpeTrain(docs, "text", numMerges = n))
      val dist = rows(TextAnalysis.bpeTrainDistributed(docs, "text",
        numMerges = n))
      assert(local == dist, s"numMerges=$n: local=$local dist=$dist")
    }
    // and the fallback dispatch itself: a limit-0 driver vocab forces
    // the distributed path through the public entry point
    val viaFallback = rows(TextAnalysis.bpeTrain(docs, "text",
      numMerges = 3, driverVocabLimit = 1L))
    assert(viaFallback ==
      rows(TextAnalysis.bpeTrainDistributed(docs, "text", numMerges = 3)))
  }

  test("bpeTrain PROPERTY: local == distributed on seeded random " +
      "corpora (mixed ASCII/CJK, repeats, 1-char words)") {
    val alphabet = "abcdefg你好世界xyz".toCharArray
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val words = Seq.fill(30)(
        Seq.fill(1 + rnd.nextInt(6))(
          alphabet(rnd.nextInt(alphabet.length))).mkString)
      // repeat some words so counts differ and ties arise
      val docs = (1L to 20L).map(i =>
        (i, Seq.fill(8)(words(rnd.nextInt(words.length))).mkString(" ")))
        .toDF("doc_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("step").collect().map(r => (r.getAs[Int]("step"),
          r.getAs[String]("left"), r.getAs[String]("right"),
          r.getAs[Long]("pair_count"))).toSeq
      val local = rows(TextAnalysis.bpeTrain(docs, "text", numMerges = 6))
      val dist = rows(TextAnalysis.bpeTrainDistributed(docs, "text",
        numMerges = 6))
      assert(local == dist, s"seed=$seed: local=$local dist=$dist")
      assert(local.nonEmpty)
    }
  }

  test("bpeEncode: sequential-in-order application — training-corpus " +
      "words reproduce the trained vocab state; unseen words encode " +
      "greedily left-to-right") {
    val docs = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", numMerges = 5)
      .orderBy("step").collect()
      .map(r => r.getAs[String]("left") -> r.getAs[String]("right")).toSeq
    assert(merges == Seq("a" -> "b", "ab" -> "ab"))
    // corpus doc: abab → [abab], ab → [ab]; global pos across words
    val enc = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[String]("token"))).toSeq
    assert(enc == Seq((0L, "abab"), (1L, "abab"), (2L, "ab")))
    // unseen word, odd repeat: ababab → (a,b)³ → [ab,ab,ab] →
    // (ab,ab) left-to-right non-overlap → [abab, ab]
    val unseen = Seq((9L, "ababab")).toDF("doc_id", "text")
    val enc2 = TextAnalysis.bpeEncode(unseen, "doc_id", "text", merges)
      .orderBy("pos").collect().map(_.getAs[String]("token")).toSeq
    assert(enc2 == Seq("abab", "ab"))
  }

  test("bpeEncode: merges apply in TRAINING order — a later merge " +
      "does not resurrect an earlier one (sequential semantics, not " +
      "rescan-from-scratch)") {
    // merge table [(a,bc), (b,c)] — step 1's pair only EXISTS after
    // step 2's rewrite. Sequential: (a,bc) absent at step 1, (b,c)
    // applies at step 2 → [a, bc]; a rescan-from-scratch encoder would
    // wrongly continue to [abc].
    val merges = Seq("a" -> "bc", "b" -> "c")
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val enc = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .orderBy("pos").collect().map(_.getAs[String]("token")).toSeq
    assert(enc == Seq("a", "bc"))
  }

  test("mixture index: batch folds + select-from-index equals the " +
      "one-shot mixToTarget selection") {
    val docs = (1L to 40L).map(i =>
      (i, if (i % 3 == 0) "fr" else "en", s"text $i"))
      .toDF("doc_id", "lang", "text")
    val targets = Map("en" -> 7000L, "fr" -> 3000L)
    val idx = java.nio.file.Files
      .createTempDirectory("mix_idx_spec").toString
    TextAnalysis.mixIndexAppend(docs.filter(col("doc_id") <= 25),
      "doc_id", "lang", idx, 1L)
    TextAnalysis.mixIndexAppend(docs.filter(col("doc_id") > 25),
      "doc_id", "lang", idx, 2L)
    val incr = TextAnalysis.mixSelectFromIndex(spark, idx, "lang", targets)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("lang"), r.getAs[Long]("mix_rank"))).toSet
    val oneShot = TextAnalysis.mixToTarget(docs, "doc_id", "lang", targets)
      .select("doc_id", "lang", "mix_rank")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("lang"), r.getAs[Long]("mix_rank"))).toSet
    assert(incr == oneShot && incr.nonEmpty)
  }

  test("clusterRepresentatives: best-quality member wins, id breaks " +
      "ties") {
    val members = Seq(
      (1L, 10L, 5), (2L, 10L, 9), (3L, 10L, 9), // cluster 10: 2 & 3 tie on 9
      (7L, 20L, 4)
    ).toDF("doc_id", "cluster_id", "n_distinct")
    val reps = graft.operators.Dedup.clusterRepresentatives(
        members, "doc_id", "cluster_id", "n_distinct")
      .orderBy("cluster_id").collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("keep_id"),
        r.getAs[Long]("n_members"))).toSeq
    assert(reps == Seq((10L, 2L, 3L), (20L, 7L, 1L)))
  }

  test("assignSplit: deterministic, corpus-growth-stable, remainder " +
      "falls to the last split") {
    val splits = Seq("train" -> 8000L, "val" -> 1000L, "test" -> 1000L)
    val small = (1L to 50L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val big = (1L to 500L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    def m(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.assignSplit(df, "doc_id", splits)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[String]("split")).toMap
    val a = m(small); val b = m(big)
    // a doc's split never changes as the corpus grows
    assert(a.forall { case (id, sp) => b(id) == sp })
    assert(b.values.toSet == Set("train", "val", "test"))
    // shares summing under 10000: remainder lands on the LAST split
    val c = TextAnalysis.assignSplit(big, "doc_id",
        Seq("train" -> 100L, "holdout" -> 100L))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c.getOrElse("holdout", 0L) > c.getOrElse("train", 0L))
    intercept[IllegalArgumentException] {
      TextAnalysis.assignSplit(big, "doc_id", Seq("a" -> 9000L, "b" -> 2000L))
    }
  }

  test("splitLeakageAudit: planted cross-split near-dups are counted " +
      "on their exact boundary; unrelated docs contribute nothing") {
    // long shared text → near-dup pair despite the appended tail;
    // doc ids chosen so the pair genuinely straddles (asserted, not
    // assumed — assignSplit hashes the id, we read what it gives)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = (1L to 30L).map(i => (i, s"unique doc $i with words " +
        s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g")) ++
      Seq((100L, base), (101L, base + " tail"))
    val df = docs.toDF("doc_id", "text")
    val splits = Seq("train" -> 8000L, "val" -> 1000L, "test" -> 1000L)
    val sp = TextAnalysis.assignSplit(df, "doc_id", splits)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("split")).toMap
    val out = TextAnalysis.splitLeakageAudit(df, "doc_id", "text",
        splits, shingleN = 2, numPerm = 64, bands = 32,
        threshold = 0.5, seed = 42L)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("n_pairs"))).toSeq
    val expected = (Seq(sp(100L), sp(101L)).min,
      Seq(sp(100L), sp(101L)).max, 1L)
    assert(out == Seq(expected), s"got $out, splits $sp")
  }

  test("lengthBucketedBatches: value buckets, batch caps, exact pad " +
      "arithmetic, deterministic, and narrower buckets never pad more") {
    val docs = (1L to 40L)
      .map(i => (i, Seq.fill((i % 13 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    import org.apache.spark.sql.functions.{size => asize}
    def run(bt: Long) = TextAnalysis.lengthBucketedBatches(docs,
      "doc_id", asize(split(col("text"), " ")), bt, batchSize = 3)
    val out = run(4L).collect().map(r => (r.getAs[Long]("bucket"),
      r.getAs[Long]("batch_idx"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("max_tokens"), r.getAs[Long]("sum_tokens"),
      r.getAs[Long]("pad_tokens"))).toSeq
    assert(out.map(_._3).sum == 40L)          // every doc batched once
    assert(out.forall(_._3 <= 3L))            // batch cap
    assert(out.forall(b => b._6 == b._3 * b._4 - b._5)) // pad exact
    // widths in a bucket stay inside the bucket's band
    assert(out.forall(b => b._4 / 4 == b._1))
    // deterministic across runs
    assert(run(4L).collect().map(_.toString).sorted.toSeq ==
      out.map(t => s"[${t.productIterator.mkString(",")}]").sorted)
    // the knob pays monotonically on this mixed-width fixture
    def pad(bt: Long) = run(bt).agg(sum("pad_tokens")).head.getLong(0)
    assert(pad(1000L) >= pad(8L) && pad(8L) >= pad(2L))
  }

  test("tokenCounts: trained-merge mode adds exact bpe_tokens") {
    val docs = Seq((1L, "abab abab ab"), (2L, "xy"), (3L, "ababab"))
      .toDF("doc_id", "text")
    val merges = Seq("a" -> "b", "ab" -> "ab")
    val out = TextAnalysis.tokenCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Int]("n_words"), r.getAs[Long]("bpe_tokens")))
      .toSeq
    // doc1: [abab][abab][ab] → 3; doc2: [x][y] → 2; doc3: [abab,ab] → 2
    assert(out == Seq((3, 3L), (1, 2L), (1, 2L)))
    // no-merges mode keeps the legacy 3-column schema
    assert(!TextAnalysis.tokenCounts(docs, "doc_id", "text")
      .columns.contains("bpe_tokens"))
  }

  test("bpeEncodeBc: broadcast-transport encode is bit-identical to " +
      "the inline-expression encode") {
    val docs = Seq((1L, "low lower lowest"), (2L, "newer newest new"),
      (3L, "wider wide widest low")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", numMerges = 12)
      .orderBy("step").select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(merges.nonEmpty)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    val inline = rows(TextAnalysis.bpeEncode(docs, "doc_id", "text", merges))
    val bc = spark.sparkContext.broadcast(merges.toArray)
    val viaBc = rows(TextAnalysis.bpeEncodeBc(docs, "doc_id", "text", bc))
    assert(viaBc == inline && inline.nonEmpty)
  }

  test("bpeVocab: two distinct merges composing the same symbol " +
      "string dedup to the FIRST merge's id — a duplicate token would " +
      "fan out every bpeEncodeIds join row") {
    val docs = Seq((1L, "abc abc")).toDF("doc_id", "text")
    // (a,b)→ab, (ab,c)→abc, (b,c)→bc, (a,bc)→abc: the 4th composes
    // the same string as the 2nd
    val merges = Seq(("a", "b"), ("ab", "c"), ("b", "c"), ("a", "bc"))
    val v = TextAnalysis.bpeVocab(docs, "text", merges)
      .collect().map(r => r.getAs[String]("token") ->
        r.getAs[Long]("token_id")).toSeq
    assert(v.map(_._1).distinct.length == v.length, v.toString)
    // base Σ = {a,b,c} → ids 0,1,2; merge step ids follow at 3+step-1,
    // with a GAP at the dropped duplicate (id 6 unused)
    assert(v.toMap == Map("a" -> 0L, "b" -> 1L, "c" -> 2L,
      "ab" -> 3L, "abc" -> 4L, "bc" -> 5L), v.toString)
  }

  test("emitPackedChunks: docs laid end-to-end per stream, chunk " +
      "boundary straddled mid-doc, zero-token docs occupy no width, " +
      "partial tail chunk emitted as-is") {
    // doc 1: ids 10,11,12 · doc 2: NO tokens · doc 3: ids 30,31 —
    // chunk size 4 → chunk 0 = [10,11,12,30], chunk 1 = [31]
    val enc = Seq((1L, 0L, 10L), (1L, 1L, 11L), (1L, 2L, 12L),
        (3L, 0L, 30L), (3L, 1L, 31L))
      .toDF("doc_id", "pos", "token_id")
    val streams = Seq((1L, "s"), (2L, "s"), (3L, "s"), (4L, "t"))
      .toDF("doc_id", "stream")
    val out = TextAnalysis.emitPackedChunks(enc, streams, chunkTokens = 4)
      .orderBy("stream", "chunk_idx")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    assert(out == Seq(("s", 0L, 4L, "10,11,12,30"), ("s", 1L, 1L, "31")))
  }

  test("shardAssign: a permutation (positions 1..n), round-robin " +
      "shards balanced within one, deterministic, and id-stable " +
      "ordering decoupled from insertion order") {
    val docs = (1L to 23L).map(i => Tuple1(i)).toDF("doc_id")
    val a = TextAnalysis.shardAssign(docs, "doc_id", numShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.map(_._2).sorted.toSeq == (1L to 23L))
    val sizes = a.groupBy(_._3).view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1 && sizes.sum == 23)
    // determinism incl. under a different input order
    val b = TextAnalysis.shardAssign(docs.orderBy($"doc_id".desc),
        "doc_id", numShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
  }

  test("bottomKSample: exactly K, sorted by tag; folded layers " +
      "min-union to the one-shot sample verbatim") {
    val docs = (0L until 60L).map(i => (i, s"doc $i"))
      .toDF("doc_id", "text")
    val one = TextAnalysis.bottomKSample(docs, "doc_id", 10)
      .orderBy($"h", $"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(one.length == 10)
    assert(one.map(_._2).toSeq == one.map(_._2).sorted.toSeq)
    val idx = java.nio.file.Files.createTempDirectory("bk_spec")
      .toString
    TextAnalysis.bottomKAppend(docs.filter($"doc_id" % 2 === 0),
      "doc_id", 10, idx, 1L)
    TextAnalysis.bottomKAppend(docs.filter($"doc_id" % 2 === 1),
      "doc_id", 10, idx, 2L)
    val folded = TextAnalysis.bottomKFromIndex(spark, idx, 10)
      .orderBy($"h", $"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(folded.toSeq == one.toSeq)
  }

  test("bottomKSample: ingest can only DISPLACE members (an old doc " +
      "never enters because others arrived); k > corpus keeps all") {
    val small = (0L until 40L).map(i => (i, "")).toDF("doc_id", "text")
    val grown = (0L until 80L).map(i => (i, "")).toDF("doc_id", "text")
    val sSmall = TextAnalysis.bottomKSample(small, "doc_id", 8)
      .collect().map(_.getLong(0)).toSet
    val sGrown = TextAnalysis.bottomKSample(grown, "doc_id", 8)
      .collect().map(_.getLong(0)).toSet
    // every grown-sample member from the ORIGINAL corpus was already
    // a member before growth
    assert(sGrown.filter(_ < 40L).subsetOf(sSmall))
    assert(TextAnalysis.bottomKSample(small, "doc_id", 100)
      .count() == 40L)
  }

  test("mixtureReport: the scarcest stratum binds the mix visibly; " +
      "a no-data target caps at 0 instead of zeroing everyone; " +
      "no-target strata surface excluded") {
    import graft.operators.TextAnalysis
    val docs = ((1L to 80L).map(i => (i, "en")) ++
      (81L to 90L).map(i => (i, "es")) ++
      (91L to 95L).map(i => (i, "de")))
      .toDF("doc_id", "lang")
    val r = TextAnalysis.mixtureReport(docs, "doc_id", "lang",
        Map("en" -> 8000L, "es" -> 1000L, "fr" -> 1000L))
      .orderBy("lang")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // es binds: nn = min(80*1e4/8000, 10*1e4/1000) = min(100, 100)
    //  = 100 → caps en 80, es 10; fr has a target but NO docs —
    // deriveCaps drops it from `present` (cap 0) instead of zeroing
    // the whole mixture; de has docs but no target → cap 0
    assert(r == Seq(
      ("de", 5L, 0L, 0L, 0L),
      ("en", 80L, 8000L, 80L, 8888L),
      ("es", 10L, 1000L, 10L, 1111L),
      ("fr", 0L, 1000L, 0L, 0L)), r)
  }
}
