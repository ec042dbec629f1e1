package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Conversations, Preference, TextAnalysis, Unigram, WordPiece}

/** Round-14 training-data additions: hard-negative mining (margin +
  * exclusions + dense re-rank), SFT conversation assembly (span
  * layout ↔ rendered document alignment), interleaved multimodal
  * packing (boundary-straddling widths), and the WordPiece tokenizer
  * (greedy longest-match, [UNK] paths, mining guarantees).
  */
class TrainingDataOpsSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- hard-negative mining ----------------------------------------

  test("hardNegatives: excludes self + positives, kills above-margin " +
      "near-positives, re-ranks densely") {
    // 2-d geometry with exact cosines: query 0 = (1,0); labeled
    // positive 1 = (4,3)/5 → 0.8; candidate 2 = (1,0) → 1.0 (above
    // the 95% margin of 0.8 → presumed false negative, killed);
    // 3 = (0.6,0.8) and 5 = (3,4)/5 → 0.6 ties broken by id;
    // 4 = (0,1) → 0.0
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.8f, 0.6f)),
      (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.6f, 0.8f)),
      (4L, Seq(0.0f, 1.0f)), (5L, Seq(0.6f, 0.8f))
    ).toDF("vec_id", "embedding")
    val pairs = Seq((0L, 1L)).toDF("query_id", "pos_id")
    val r = Ann.hardNegatives(pairs, corpus, "vec_id", "embedding",
        k = 2, margin10k = 9500L)
      .orderBy("rank")
      .select("neighbor_id", "rank", "sim", "pos_sim")
      .as[(Long, Long, Double, Double)].collect()
    // 2 (sim 1.0) killed by the margin (cutoff 0.76); 4 (sim 0.0)
    // pushed out by k=2; 3 and 5 tie at 0.6 → id order
    assert(r.toSeq == Seq((3L, 1L, 0.6, 0.8), (5L, 2L, 0.6, 0.8)))
  }

  test("hardNegatives: margin boundary is inclusive-below in s4 " +
      "integers; query without a labeled positive yields no rows") {
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.8f, 0.6f)),
      (2L, Seq(0.76f, 0.65f)), (9L, Seq(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val pairs = Seq((0L, 1L)).toDF("query_id", "pos_id")
    val r = Ann.hardNegatives(pairs, corpus, "vec_id", "embedding",
      k = 5, margin10k = 9500L)
    // margin cutoff: pos_s4 = 8000 → keep s4·10⁴ ≤ 8000·9500
    val kept = r.select("neighbor_id").as[Long].collect().toSet
    val sims = r.select("neighbor_id", "sim").as[(Long, Double)]
      .collect().toMap
    assert(!kept.contains(0L) && !kept.contains(1L))
    sims.values.foreach(sv => assert(sv <= 0.76))
    // a query id absent from pairs produces no output rows
    assert(r.filter($"query_id" === 9L).isEmpty)
  }

  test("hardNegativesFromIndex: the over-fetch horizon is the " +
      "contract — exclusions and margin kills surface as <k rows, " +
      "never refill from outside the horizon") {
    // one cluster: 2 ≈ the query (margin-killed), 1 = the labeled
    // positive (excluded), 3/4 admissible
    val em = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.8f, 0.6f), 0),
      (2L, Seq(1.0f, 0.01f), 0), (3L, Seq(0.6f, 0.8f), 0),
      (4L, Seq(0.0f, 1.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val idx = SparkEntry.tmpDir("hn_spec_idx")
    operators.Ann.sq8IndexAppend(em, "vec_id", "embedding",
      col("label"), idx, 1L)
    val qs = em.filter($"vec_id" === 0L)
      .withColumn("probes", array(lit(0L)))
    val pairs = Seq((0L, 1L)).toDF("query_id", "pos_id")
    // horizon 2 = {2: killed by margin, 1: excluded} → honest 0 rows
    val short = Ann.hardNegativesFromIndex(spark, idx, pairs, qs,
      "vec_id", "embedding", "probes", k = 2, overfetch = 2)
    assert(short.count() == 0)
    // horizon 4 reaches the admissible negatives
    val full = Ann.hardNegativesFromIndex(spark, idx, pairs, qs,
        "vec_id", "embedding", "probes", k = 2, overfetch = 4)
      .orderBy("rank").select("neighbor_id", "rank")
      .as[(Long, Long)].collect().toSeq
    assert(full == Seq((3L, 1L), (4L, 2L)))
    intercept[IllegalArgumentException] {
      Ann.hardNegativesFromIndex(spark, idx, pairs, qs, "vec_id",
        "embedding", "probes", k = 2, overfetch = 1)
    }
  }

  // ---- SFT conversation assembly -----------------------------------

  private val turns = Seq(
    (1L, 0L, "user", "hi there"),
    (1L, 1L, "assistant", "hello"),
    (2L, 0L, "system", "be brief"),
    (2L, 1L, "assistant", "ok then")
  ).toDF("conv_id", "turn_idx", "role", "text")

  test("Conversations.spans: exact offsets, assistant-only loss") {
    val r = Conversations.spans(turns, "conv_id", "turn_idx", "role",
        "text")
      .orderBy("conv_id", "turn_idx")
      .select("conv_id", "piece", "start_tok", "end_tok", "in_loss")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (1L, "<|user|> hi there", 0L, 3L, 0L),
      (1L, "<|assistant|> hello", 3L, 5L, 1L),
      (2L, "<|system|> be brief", 0L, 3L, 0L),
      (2L, "<|assistant|> ok then", 3L, 6L, 1L)))
  }

  test("Conversations.render aligns with spans token-for-token") {
    val rendered = Conversations.render(turns, "conv_id", "turn_idx",
        "role", "text")
      .orderBy("conv_id")
      .select("conv_id", "text", "n_tokens", "n_loss_tokens")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(rendered == Seq(
      (1L, "<|user|> hi there <|assistant|> hello", 5L, 2L),
      (2L, "<|system|> be brief <|assistant|> ok then", 6L, 3L)))
    // the loss-mask contract: slicing the rendered document's
    // whitespace tokens by an assistant span yields that turn's piece
    val doc1 = rendered.head._2.split("\\s+")
    assert(doc1.slice(3, 5).mkString(" ") == "<|assistant|> hello")
  }

  test("Conversations: arrival order never matters — shuffled turn " +
      "rows render, span and truncate identically (the permutation " +
      "discipline)") {
    val shuffled = turns.orderBy(rand(7L))
    def byConv(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("conv_id").collect().toSeq
    def byTurn(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("conv_id", "turn_idx").collect().toSeq
    assert(byConv(Conversations.render(shuffled, "conv_id",
        "turn_idx", "role", "text")) ==
      byConv(Conversations.render(turns, "conv_id", "turn_idx",
        "role", "text")))
    assert(byTurn(Conversations.spans(shuffled, "conv_id", "turn_idx",
        "role", "text")) ==
      byTurn(Conversations.spans(turns, "conv_id", "turn_idx",
        "role", "text")))
    assert(byTurn(Conversations.truncate(shuffled, "conv_id",
        "turn_idx", "role", "text", 4L)) ==
      byTurn(Conversations.truncate(turns, "conv_id", "turn_idx",
        "role", "text", 4L)))
  }

  test("Conversations: duplicate (conv_id, turn_idx) raises loudly " +
      "in spans and truncate — never tie-order-dependent offsets " +
      "(the key contract); render stays deterministic") {
    val dup = turns.unionByName(Seq((1L, 1L, "user", "again"))
      .toDF("conv_id", "turn_idx", "role", "text"))
    def fullMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val e1 = intercept[Exception] {
      Conversations.spans(dup, "conv_id", "turn_idx", "role", "text")
        .collect()
    }
    assert(fullMsg(e1).contains("duplicate (conv_id, turn_idx)"),
      fullMsg(e1))
    val e2 = intercept[Exception] {
      Conversations.truncate(dup, "conv_id", "turn_idx", "role",
        "text", 8L).collect()
    }
    assert(fullMsg(e2).contains("duplicate (conv_id, turn_idx)"),
      fullMsg(e2))
    // render needs no guard: the struct sort tie-breaks on the piece
    // string, so duplicate indexes render deterministically
    val r = Conversations.render(dup, "conv_id", "turn_idx", "role",
        "text")
      .filter(col("conv_id") === 1L)
      .select("text", "n_tokens").as[(String, Long)].head()
    assert(r == ("<|user|> hi there <|assistant|> hello " +
      "<|user|> again", 7L))
  }

  test("Conversations.truncate: first turn always kept, longest " +
      "fitting suffix, middles dropped whole-turn, spans recomputed") {
    val t4 = Seq(
      (1L, 0L, "system", "be brief"),      // width 3
      (1L, 1L, "user", "a b c"),           // width 4 (dropped middle)
      (1L, 2L, "assistant", "d e"),        // width 3
      (1L, 3L, "user", "f"),               // width 2
      (9L, 0L, "system", "way too long here no suffix fits x y")
    ).toDF("conv_id", "turn_idx", "role", "text")
    val r = Conversations.truncate(t4, "conv_id", "turn_idx", "role",
        "text", maxTokens = 8L)
      .orderBy("conv_id", "turn_idx")
      .select("conv_id", "turn_idx", "start_tok", "end_tok")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // conv 1: first (3) + suffix {2:3, 3:2} = 8 ≤ 8; adding turn 1
    // (4) would overflow → dropped; spans recomputed over kept turns.
    // conv 9: the over-budget first turn is kept alone, never an
    // emptied conversation.
    assert(r == Seq((1L, 0L, 0L, 3L), (1L, 2L, 3L, 6L),
      (1L, 3L, 6L, 8L), (9L, 0L, 0L, 10L)))
  }

  // ---- interleaved multimodal packing ------------------------------

  test("packInterleaved: boundary-straddling items report exact " +
      "in-chunk widths; image budget is fixed") {
    val items = Seq(
      (1L, 0L, "text", 100L), (2L, 0L, "image", 0L),
      (3L, 0L, "text", 200L)
    ).toDF("item_id", "stream", "kind", "n")
    val r = TextAnalysis.packInterleaved(items, "item_id", "stream",
        "kind", col("n"), imageTokens = 64, chunkTokens = 128)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_items", "n_text_tokens",
        "n_image_tokens", "items")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    // layout: text:1 [0,100) image:2 [100,164) text:3 [164,364)
    assert(r == Seq(
      (0L, 2L, 100L, 28L, "text:1 image:2"),
      (1L, 2L, 92L, 36L, "image:2 text:3"),
      (2L, 1L, 108L, 0L, "text:3")))
  }

  // ---- WordPiece ----------------------------------------------------

  test("WordPiece greedy longest-match picks the longest piece at " +
      "each cursor (the BERT 'unaffable' example)") {
    val vocab = Seq("un", "unaff", "##able", "##aff", "a", "u", "n",
      "##a", "##f", "##b", "##l", "##e")
    def enc(w: String): Seq[String] =
      Seq(w).toDF("w")
        .select(graft.functions.WordPieceOps
          .wordpieceApply(col("w"), vocab, 6, 16).as("p"))
        .as[Seq[String]].head()
    assert(enc("unaffable") == Seq("unaff", "##able"))
    // no match at a position ('x' has no continuation piece) → the
    // WHOLE word is [UNK], not a partial encoding
    assert(enc("unaffablx") == Seq("[UNK]"))
    // over max_input_chars_per_word → [UNK] without matching
    assert(enc("a" * 17) == Seq("[UNK]"))
  }

  test("WordPiece.mineVocab: all singles retained, multi-char cut by " +
      "(cnt DESC, piece ASC)") {
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val v = WordPiece.mineVocab(docs, "text", maxPieceLen = 6,
        topPieces = 1)
      .orderBy("piece").as[(String, Long)].collect().toSeq
    // candidates: a→2, ab→2, ##b→2, b→1; singles a/b/##b all kept,
    // top-1 multi = ab
    assert(v == Seq(("##b", 2L), ("a", 2L), ("ab", 2L), ("b", 1L)))
  }

  test("WordPiece.encode: stream shape matches bpeEncode; singles " +
      "guarantee no [UNK] within the mined alphabet") {
    val docs = Seq((1L, "ab b"), (2L, "ab ab")).toDF("doc_id", "text")
    val vocab = WordPiece.mineVocab(docs, "text", 6, 10)
    val r = WordPiece.encode(docs, "doc_id", "text", vocab,
        matchHorizon = 6, maxInputChars = 16)
      .orderBy("doc_id", "pos")
      .as[(Long, Long, String)].collect().toSeq
    assert(r == Seq((1L, 0L, "ab"), (1L, 1L, "b"),
      (2L, 0L, "ab"), (2L, 1L, "ab")))
  }

  test("WordPiece.decodeIds/detokenize: an id shard decodes to the " +
      "exact piece stream under the EXTENDED id table (old shards " +
      "keep decoding), words regroup with '##' stripped, [UNK] " +
      "surfaces whole, and a foreign id raises loudly") {
    val docs = Seq((1L, "ab b"), (2L, "ab ab " + "a" * 17))
      .toDF("doc_id", "text")
    val vocab = WordPiece.mineVocab(docs, "text", 6, 10)
    val baseIds = WordPiece.vocabIds(vocab)
    val shard = WordPiece.encodeIdsWith(docs, "doc_id", "text", vocab,
      baseIds, matchHorizon = 6, maxInputChars = 16)
    val pieces = WordPiece.encode(docs, "doc_id", "text", vocab, 6, 16)
      .orderBy("doc_id", "pos").as[(Long, Long, String)]
      .collect().toSeq
    // decode under the base table reproduces the encode's stream
    val decBase = WordPiece.decodeIds(shard, baseIds)
      .orderBy("doc_id", "pos").as[(Long, Long, String)]
      .collect().toSeq
    assert(decBase == pieces)
    // decode under an EXTENDED table is bit-identical — extendIds
    // keeps every base (piece, id) row stable, which is the whole
    // old-shards-keep-decoding contract (q262's oracle proves the
    // same thing end-to-end at corpus scale)
    val ext = graft.operators.TokenizerArtifact.extendIds(baseIds,
      Seq(("zz", 1L)).toDF("piece", "cnt"))
    val decExt = WordPiece.decodeIds(shard, ext)
      .orderBy("doc_id", "pos").as[(Long, Long, String)]
      .collect().toSeq
    assert(decExt == pieces)
    // detokenize regroups: the over-length word ([UNK], id -1)
    // surfaces as its own whole word
    val words = WordPiece.detokenize(WordPiece.decodeIds(shard, ext))
      .orderBy("doc_id", "word_idx").as[(Long, Long, String)]
      .collect().toSeq
    assert(words == Seq((1L, 0L, "ab"), (1L, 1L, "b"),
      (2L, 0L, "ab"), (2L, 1L, "ab"), (2L, 2L, "[UNK]")))
    // an id missing from the table (≠ -1) is a corrupted shard or
    // the wrong artifact — loud, never a silent placeholder
    val bad = Seq((9L, 0L, 999L)).toDF("doc_id", "pos", "piece_id")
    intercept[Exception] {
      WordPiece.decodeIds(bad, baseIds).collect()
    }
  }

  test("TextAnalysis.epochUpsample: floor copies for everyone, the " +
      "fractional extra copy is the frozen per-doc hash draw (stable " +
      "under corpus growth), unlisted strata drop, integer epochs " +
      "take no draw, and copy_idx is dense") {
    import graft.operators.TextAnalysis
    import graft.functions.GraftFunctions.charPolyHash
    val docs = (1L to 40L).map(i => (i, if (i <= 30) "en" else "fr"))
      .toDF("doc_id", "lang")
    val up = TextAnalysis.epochUpsample(docs, "doc_id", "lang",
      Seq("en" -> 23000L)) // 2.3 epochs; fr unlisted → dropped
    val counts = up.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(counts.keySet.forall(_ <= 30L))
    assert(counts.size == 30 &&
      counts.values.forall(c => c == 2L || c == 3L))
    // the draw is exactly the per-doc frozen hash — per-row pure
    val drawn = docs.filter(col("lang") === "en")
      .select(col("doc_id"), (pmod(charPolyHash(concat(
        col("doc_id").cast("string"), lit("|ep"))), lit(10000L))
        < 3000L).as("x")).as[(Long, Boolean)].collect().toMap
    assert(counts.forall { case (id, c) =>
      c == (if (drawn(id)) 3L else 2L) })
    // corpus growth never flips an existing doc's copy count
    val grown = TextAnalysis.epochUpsample(
        docs.unionByName((100L to 140L).map(i => (i, "en"))
          .toDF("doc_id", "lang")),
        "doc_id", "lang", Seq("en" -> 23000L))
      .filter(col("doc_id") <= 40L)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(grown == counts)
    // integer epochs: exact copy counts, no draw anywhere
    val exact = TextAnalysis.epochUpsample(docs, "doc_id", "lang",
        Seq("en" -> 20000L, "fr" -> 10000L))
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert((1L to 30L).forall(exact(_) == 2L) &&
      (31L to 40L).forall(exact(_) == 1L))
    // copy_idx dense 0..n-1 per doc
    val sparse = up.groupBy("doc_id")
      .agg(count(lit(1)).as("c"), (max(col("copy_idx")) + 1L).as("m"),
        countDistinct(col("copy_idx")).as("d"))
      .filter(col("c") =!= col("m") || col("c") =!= col("d"))
    assert(sparse.isEmpty)
  }

  test("TextAnalysis.epochMixtureReport reconciles exactly with the " +
      "exploded manifest (copies and token masses), and realized_e4 " +
      "is the exact integer ratio") {
    import graft.operators.TextAnalysis
    val docs = (1L to 20L).map(i =>
      (i, if (i <= 15) "en" else "fr", "w " * i.toInt))
      .toDF("doc_id", "lang", "text")
    import graft.functions.GraftFunctions.tokens
    val nTok = size(filter(tokens(col("text")), t => length(t) > 0))
      .cast("long")
    val eps = Seq("en" -> 17000L, "fr" -> 10000L)
    val rep = TextAnalysis.epochMixtureReport(docs, "doc_id", "lang",
        nTok, eps)
      .orderBy("stratum")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // reconcile against the manifest × widths
    val man = TextAnalysis.epochUpsample(docs, "doc_id", "lang", eps)
      .join(docs.select(col("doc_id"), nTok.as("tk")), Seq("doc_id"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_copies"), sum(col("tk")).as("ct"))
      .orderBy("stratum").as[(String, Long, Long)].collect().toSeq
    assert(rep.map(r => (r._1, r._4, r._7)) == man)
    rep.foreach { r =>
      assert(r._5 == r._4 * 10000L / r._3) // realized_e4 exact
      assert(r._2 == (if (r._1 == "en") 17000L else 10000L))
    }
    // fr at integer epochs: n_copies == n_docs, copy mass == corpus
    val fr = rep.find(_._1 == "fr").get
    assert(fr._4 == fr._3 && fr._7 == fr._6)
  }

  test("TextAnalysis.packWholeDocs: docs lay whole in doc_id order, " +
      "a non-fitting doc opens the next chunk, an oversize doc gets " +
      "a solo overflowing chunk (never split, never dropped)") {
    import graft.operators.TextAnalysis
    val widths = Seq(
      (0L, 1L, 6L), (0L, 2L, 3L), (0L, 3L, 2L), (0L, 4L, 9L),
      (1L, 5L, 13L), (1L, 6L, 10L)) // 13 > chunk 10 → solo overflow
      .toDF("stream", "doc_id", "n")
    val r = TextAnalysis.packWholeDocs(widths, "doc_id", "stream",
        col("n"), chunkTokens = 10)
      .orderBy("stream", "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      // stream 0: 6 fits c0, 3 fits c0 (9), 2 opens c1, 9 opens c2
      (0L, 1L, 6L, 0L, 6L), (0L, 2L, 3L, 0L, 9L),
      (0L, 3L, 2L, 1L, 2L), (0L, 4L, 9L, 2L, 9L),
      // stream 1: 13 is oversize → solo chunk 0 overflowing;
      // 10 exactly fills chunk 1
      (1L, 5L, 13L, 0L, 13L), (1L, 6L, 10L, 1L, 10L)), r)
  }

  test("TextAnalysis.resumeBatches: the cursor filter partitions the " +
      "manifest exactly (resumed ∪ completed = everything, disjoint)") {
    import graft.operators.TextAnalysis
    val docs = (1L to 60L).map(i => (i, "w " * (i % 40 + 1).toInt))
      .toDF("doc_id", "text")
    import graft.functions.GraftFunctions.tokens
    val m = TextAnalysis.lengthBucketedBatches(docs, "doc_id",
      size(filter(tokens(col("text")), t => length(t) > 0)),
      bucketTokens = 8L, batchSize = 4)
    val resumed = TextAnalysis.resumeBatches(m, 2L, 1L)
    val completed = m.exceptAll(resumed)
    assert(resumed.count() + completed.count() == m.count())
    assert(resumed.intersect(completed).isEmpty)
    // every completed row strictly precedes the cursor
    assert(completed.filter(col("bucket") > 2L ||
      (col("bucket") === 2L && col("batch_idx") >= 1L)).isEmpty)
    assert(resumed.filter(col("bucket") < 2L ||
      (col("bucket") === 2L && col("batch_idx") < 1L)).isEmpty)
  }

  test("TextAnalysis.fimTransform: segment widths always sum to the " +
      "doc width, PSM segments reassemble to the original tokens, " +
      "rate endpoints behave, and the draw is the frozen doc hash") {
    import graft.operators.TextAnalysis
    val docs = (1L to 40L).map(i =>
      (i, (1 to (i % 7).toInt).map(k => s"w$k").mkString(" ")))
      .toDF("doc_id", "text") // includes empty docs (i % 7 == 0)
    val r = TextAnalysis.fimTransform(docs, "doc_id", "text", 9000L)
    // widths always partition the doc
    import graft.functions.GraftFunctions.tokens
    val n = docs.select(col("doc_id"),
      size(filter(tokens(col("text")), t => length(t) > 0))
        .cast("long").as("n"))
    assert(r.join(n, Seq("doc_id"))
      .filter(col("n_prefix") + col("n_middle") + col("n_suffix")
        =!= col("n")).isEmpty)
    // PSM reassembly: prefix ++ middle ++ suffix == original tokens
    val reassembled = r.filter(col("fim") === 1L)
      .select(col("doc_id"),
        expr("substring_index(substring_index(text, ' <SUF> ', 1), " +
          "'<PRE> ', -1)").as("p"),
        expr("substring_index(text, ' <MID> ', -1)").as("m"),
        expr("substring_index(substring_index(text, ' <MID> ', 1), " +
          "' <SUF> ', -1)").as("s"))
      .select(col("doc_id"),
        filter(tokens(concat_ws(" ", col("p"), col("m"), col("s"))),
          t => length(t) > 0).as("re"))
    val orig = docs.select(col("doc_id"),
      filter(tokens(col("text")), t => length(t) > 0).as("o"))
    assert(reassembled.join(orig, Seq("doc_id"))
      .filter(col("re") =!= col("o")).isEmpty)
    // empty docs never flag
    assert(r.join(n, Seq("doc_id"))
      .filter(col("n") === 0L && col("fim") === 1L).isEmpty)
    // rate endpoints
    assert(TextAnalysis.fimTransform(docs, "doc_id", "text", 0L)
      .filter(col("fim") === 1L).isEmpty)
    assert(TextAnalysis.fimTransform(docs, "doc_id", "text", 10000L)
      .join(n, Seq("doc_id"))
      .filter(col("n") > 0L && col("fim") === 0L).isEmpty)
  }

  test("TextAnalysis.annealPhases equals the naive global-order rule " +
      "(score DESC, hash, id — whole docs while they start within " +
      "the budget), and budget endpoints behave") {
    import graft.operators.TextAnalysis
    import graft.functions.GraftFunctions.charPolyHash
    val docs = (1L to 30L).map(i => (i, i % 5 + 1, (i % 4 + 1) * 2))
      .toDF("doc_id", "score", "n")
    def phases(budget: Long) =
      TextAnalysis.annealPhases(docs, "doc_id", col("n"), col("score"),
        budget).orderBy("doc_id")
        .as[(Long, Long, Long, Long)].collect().toSeq
    // naive reference: one global window
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc,
        charPolyHash(concat(col("doc_id").cast("string"), lit("|an"))),
        col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val ref = docs.select(col("doc_id"), col("score").cast("long"),
        col("n").cast("long").as("n"),
        (sum(col("n").cast("long")).over(w) - col("n")).as("start"))
      .select(col("doc_id"), col("score"), col("n"),
        when(col("start") < 37L, 1L).otherwise(0L).as("phase"))
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(phases(37L) == ref)
    assert(phases(0L).forall(_._4 == 0L))
    assert(phases(1000L).forall(_._4 == 1L))
  }

  test("WordPiece.fertilityReport: exact hand-computed counts — " +
      "n_words from the unmarked openers ([UNK] included), content " +
      "chars exclude '##' markers and [UNK] placeholders") {
    val docs = Seq((1L, "ab b"), (2L, "ab ab " + "a" * 17))
      .toDF("doc_id", "text")
    val vocab = Seq(("a", 4L), ("b", 2L), ("##b", 3L))
      .toDF("piece", "cnt")
    // encodes: ab→(a,##b) ×3, b→(b), the 17-char word→[UNK]
    val r = WordPiece.fertilityReport(
        WordPiece.encode(docs, "doc_id", "text", vocab,
          matchHorizon = 6, maxInputChars = 16))
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((5L, 8L, 1L, 16000L, 2000L, 7L, 8750L)), r)
  }

  test("Conversations.packedLossManifest: exact per-chunk token and " +
      "loss widths; totals reconcile with the render") {
    import graft.operators.TextAnalysis
    val rendered = Conversations.render(turns, "conv_id", "turn_idx",
        "role", "text")
      .withColumn("stream", pmod(col("conv_id"), lit(2)))
    val packed = TextAnalysis.packSequencesByCount(rendered,
      "conv_id", "stream", col("n_tokens"), chunkTokens = 4)
    val m = Conversations.packedLossManifest(
        Conversations.spans(turns, "conv_id", "turn_idx", "role",
          "text"),
        packed, chunkTokens = 4)
      .orderBy("stream", "chunk_idx")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // conv 1 (stream 1, width 5, assistant [3,5)): chunk 0 = 4 toks /
    // 1 loss, chunk 1 = 1 tok / 1 loss; conv 2 (stream 0, width 6,
    // assistant [3,6)): chunk 0 = 4/1, chunk 1 = 2/2
    assert(m == Seq((0L, 0L, 4L, 1L), (0L, 1L, 2L, 2L),
      (1L, 0L, 4L, 1L), (1L, 1L, 1L, 1L)), m)
    // reconciliation: per stream, token totals = the packed widths
    // and loss totals = the render's assistant mass
    val totals = m.groupBy(_._1).view.mapValues(rows =>
      (rows.map(_._3).sum, rows.map(_._4).sum)).toMap
    assert(totals == Map(0L -> ((6L, 3L)), 1L -> ((5L, 2L))))
  }

  test("TextAnalysis.tokenMixture: docs taken WHOLE while they start " +
      "within the token budget (boundary doc kept), no-budget strata " +
      "drop, arrival order never matters") {
    val docs = ((1L to 5L).map(i => (i, "en",
      (1 to 10).map(k => s"w$k").mkString(" "))) ++
      Seq((6L, "fr", "un deux trois")))
      .toDF("doc_id", "lang", "text")
    import graft.functions.GraftFunctions.tokens
    val nTok = size(filter(tokens(col("text")), t => length(t) > 0))
      .cast("long")
    def run(budget: Long, d: org.apache.spark.sql.DataFrame =
        docs) =
      TextAnalysis.tokenMixture(d, "doc_id", "lang", nTok,
          Map("en" -> budget))
        .orderBy("tok_rank")
        .as[(Long, String, Long, Long)].collect().toSeq
    // budget 25 over 10-token docs: starts 0/10/20 < 25 → 3 docs kept
    // whole (the third overshoots to 30 — indivisible), rest cut
    val r = run(25L)
    assert(r.size == 3 && r.map(_._4) == Seq(10L, 20L, 30L), r)
    assert(r.forall(_._2 == "en")) // fr has no budget → dropped
    // budget 1: only the frozen-hash-first doc (starts at 0)
    assert(run(1L).size == 1)
    // permutation discipline
    assert(run(25L, docs.orderBy(rand(3L))) == r)
  }

  // ---- preference-pair (DPO) assembly ------------------------------

  test("Preference.assemble: chosen = argmax labeled positive " +
      "(s4 DESC, pos_id ASC), gap filter in s4 integers, top-N " +
      "hardest rejected, dense pair_rank") {
    // corpus on axes: q0 at e0; positives 10 (cos 1.0) and 11
    // (cos 0.6·ish via mix); candidates 20 (0.8 — inside the gap,
    // killed), 21 (0.5 — admitted), 22 (0.2 — admitted)
    val corpus = Seq(
      (0L, Array(1f, 0f)), (10L, Array(1f, 0f)),
      (11L, Array(1f, 1f)), (20L, Array(0.9998f, 0.02f)),
      (21L, Array(1f, 1.7f)), (22L, Array(0.2f, 1f)))
      .toDF("vec_id", "embedding")
    val pairs = Seq((0L, 10L), (0L, 11L)).toDF("query_id", "pos_id")
    val negs = Ann.hardNegatives(pairs, corpus, "vec_id", "embedding",
      k = 5, margin10k = 10000L)
    val r = Preference.assemble(pairs, negs, corpus, "vec_id",
        "embedding", minGap10k = 500L, pairsPerPrompt = 2)
      .orderBy("pair_rank")
      .select("prompt_id", "chosen_id", "rejected_id", "pair_rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // chosen = 10 (cos 1.0 beats 11's 0.7071); rejected ranked by
    // sim: 20 (0.9998 — gap 2 < 500, killed), 21 (0.5071, kept),
    // 22 (0.1961, kept)
    assert(r == Seq((0L, 10L, 21L, 1L), (0L, 10L, 22L, 2L)), r)
  }

  test("Preference.assemble: chosen tie breaks on pos_id; " +
      "pairsPerPrompt caps the output") {
    val corpus = Seq(
      (0L, Array(1f, 0f)), (10L, Array(1f, 0f)), (11L, Array(2f, 0f)),
      (20L, Array(0.1f, 1f)), (21L, Array(0.2f, 1f)),
      (22L, Array(0.3f, 1f)))
      .toDF("vec_id", "embedding")
    val pairs = Seq((0L, 10L), (0L, 11L)).toDF("query_id", "pos_id")
    val negs = Ann.hardNegatives(pairs, corpus, "vec_id", "embedding",
      k = 5, margin10k = 10000L)
    val r = Preference.assemble(pairs, negs, corpus, "vec_id",
        "embedding", minGap10k = 0L, pairsPerPrompt = 1)
      .select("chosen_id", "rejected_id")
      .as[(Long, Long)].collect().toSeq
    // 10 and 11 both score cos 1.0 → lower pos_id wins; one pair only
    assert(r == Seq((10L, 22L)), r)
  }

  // ---- unigram (SentencePiece-family) tokenizer ---------------------

  test("Unigram Viterbi picks the GLOBAL max-product segmentation — " +
      "not the greedy longest match (the case that separates the " +
      "square's fourth tokenizer from WordPiece)") {
    import org.apache.spark.sql.functions.col
    val table = Array(("a", 2L), ("ab", 3L), ("bc", 100L), ("c", 2L),
      ("b", 1L))
    val bc = spark.sparkContext.broadcast(table)
    def enc(w: String): Seq[String] =
      Seq(w).toDF("w")
        .select(graft.functions.UnigramOps
          .unigramApplyBc(col("w"), bc, 6, 16).as("p"))
        .as[Seq[String]].head()
    // greedy longest-first would take "ab" then "c" (3·2 = 6);
    // Viterbi finds "a" + "bc" (2·100 = 200; equal piece counts, so
    // the normalization cancels)
    assert(enc("abc") == Seq("a", "bc"))
    // product tie at equal piece count → lexicographic rendering:
    // "a ba" < "ab a" — needs ba=6, ab=6, a=4, b=1:
    // a|ba = 24 = ab|a; a|b|a = 16
    val bc2 = spark.sparkContext.broadcast(
      Array(("a", 4L), ("b", 1L), ("ab", 6L), ("ba", 6L)))
    val r2 = Seq("aba").toDF("w")
      .select(graft.functions.UnigramOps
        .unigramApplyBc(col("w"), bc2, 6, 16).as("p"))
      .as[Seq[String]].head()
    assert(r2 == Seq("a", "ba"), r2)
    // fewer pieces beat an equal NORMALIZED product: with every
    // score = 10⁴ the true probability is 1 per piece either way
    // ("ab" key 10⁴·10⁴^15 = "a b" key 10⁸·10⁴^14) → n tie-break
    val bc3 = spark.sparkContext.broadcast(
      Array(("a", 10000L), ("b", 10000L), ("ab", 10000L)))
    val r3 = Seq("ab").toDF("w")
      .select(graft.functions.UnigramOps
        .unigramApplyBc(col("w"), bc3, 6, 16).as("p"))
      .as[Seq[String]].head()
    assert(r3 == Seq("ab"), r3)
    // no segmentation / over max_input_chars → whole-word [UNK]
    assert(enc("xyz") == Seq("[UNK]"))
    assert(enc("a" * 17) == Seq("[UNK]"))
  }

  test("Unigram.mineVocab + scores: positionless substrings, singles " +
      "kept, s10k = cnt·10⁴ div total + 1 over the selected mass") {
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val v = Unigram.scores(Unigram.mineVocab(docs, "text",
        maxPieceLen = 6, topPieces = 1))
      .orderBy("piece").as[(String, Long, Long)].collect().toSeq
    // candidates: a→2, ab→2, b→3 (2 from ab's positions + 1 solo);
    // singles a/b kept, top-1 multi = ab; total = 2+3+2 = 7
    assert(v == Seq(
      ("a", 2L, 2L * 10000L / 7L + 1L),
      ("ab", 2L, 2L * 10000L / 7L + 1L),
      ("b", 3L, 3L * 10000L / 7L + 1L)), v)
  }

  test("Unigram.encode: stream shape; artifact round trip " +
      "bit-identical") {
    val docs = Seq((1L, "ab b"), (2L, "abab")).toDF("doc_id", "text")
    val vocab = Unigram.mineVocab(docs, "text", 6, 10)
    def run(v: org.apache.spark.sql.DataFrame) =
      Unigram.encode(docs, "doc_id", "text", v, matchHorizon = 6,
          maxInputChars = 9)
        .orderBy("doc_id", "pos")
        .as[(Long, Long, String)].collect().toSeq
    val direct = run(vocab)
    assert(direct.map(_._3).forall(_ != "[UNK]"))
    val dir = java.nio.file.Files
      .createTempDirectory("ug_art").toString
    Unigram.saveVocab(vocab, dir, maxPieceLen = 6, maxInputChars = 9)
    assert(run(Unigram.loadVocab(spark, dir)) == direct)
    // the artifact carries its own encode contract: encodeArtifact
    // consumes the persisted horizon/guard, bit-identical to the
    // explicitly-parameterized encode above
    assert(Unigram.encodeArtifact(spark, dir, docs, "doc_id", "text")
      .orderBy("doc_id", "pos")
      .as[(Long, Long, String)].collect().toSeq == direct)
    val meta = graft.operators.TokenizerArtifact.loadMeta(spark, dir)
    assert(meta.maxPieceLen == 6 && meta.maxInputChars == 9)
  }

  test("Unigram n-best: rank 1 equals the argmax encode; the list is " +
      "strictly ordered; sampled encode is deterministic per seed " +
      "and varies across seeds") {
    val docs = Seq((1L, "abab ab b abab ba")).toDF("doc_id", "text")
    val vocab = Unigram.mineVocab(docs, "text", 4, 20)
    val nb = Unigram.nBest(docs, "text", vocab, matchHorizon = 4,
        maxInputChars = 9, nBest = 3)
      .as[(String, Long, String)].collect()
      .groupBy(_._1).map { case (t, rs) =>
        t -> rs.sortBy(_._2).map(_._3).toSeq }
    // rank-1 per word = the argmax stream's segmentation
    val arg = Unigram.encode(docs, "doc_id", "text", vocab,
        matchHorizon = 4, maxInputChars = 9)
      .orderBy("pos").as[(Long, Long, String)].collect().map(_._3)
    val words = "abab ab b abab ba".split(' ')
    val rebuilt = words.flatMap(w => nb(w).head.split(' '))
    assert(rebuilt.toSeq == arg.toSeq)
    // a 4-char word over {a, b, ab, ba, ...} has > 1 segmentation
    assert(nb("abab").length > 1)
    assert(nb("abab").distinct.length == nb("abab").length)
    // sampling: bit-stable per seed, varies across seeds somewhere
    def sample(seed: Long) = Unigram.encodeSampled(docs, "doc_id",
        "text", vocab, matchHorizon = 4, maxInputChars = 9,
        nBestN = 3, seed = seed)
      .orderBy("pos").as[(Long, Long, String)].collect().toSeq
    assert(sample(42L) == sample(42L))
    val variants = (0L to 9L).map(sample).distinct
    assert(variants.length > 1,
      "ten seeds produced one identical encoding — the draw is dead")
  }

  // ---- append-only vocabulary id allocation ------------------------

  test("TokenizerArtifact.extendIds: empty prior reproduces the " +
      "frozen layout; extension keeps old ids bit-stable (retired " +
      "pieces included), numbers new pieces after the max, and is " +
      "idempotent") {
    import graft.operators.TokenizerArtifact
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("piece", "piece_id").as[(String, Long)]
        .collect().toMap
    val empty = Seq.empty[(String, Long)].toDF("piece", "piece_id")
    val v1 = Seq(("b", 5L), ("a", 3L), ("c", 1L)).toDF("piece", "cnt")
    val ids1 = TokenizerArtifact.extendIds(empty, v1)
    // degenerate case = the frozen (piece ASC) rank layout
    assert(rows(ids1) == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    // v2 retires b, keeps a/c, adds d and aa (aa sorts before every
    // existing piece alphabetically — a RANK layout would give it id
    // 1 and renumber b/c/d; the allocator must append it instead)
    val v2 = Seq(("a", 9L), ("c", 2L), ("d", 4L), ("aa", 7L))
      .toDF("piece", "cnt")
    val ids2 = TokenizerArtifact.extendIds(ids1, v2)
    assert(rows(ids2) == Map("a" -> 0L, "b" -> 1L, "c" -> 2L,
      "aa" -> 3L, "d" -> 4L))
    // idempotent: extending with the same vocab allocates nothing
    assert(rows(TokenizerArtifact.extendIds(ids2, v2)) == rows(ids2))
    // composes: a third corpus extends the extended allocation
    val v3 = Seq(("a", 1L), ("e", 1L)).toDF("piece", "cnt")
    assert(rows(TokenizerArtifact.extendIds(ids2, v3))("e") == 5L)
  }

  test("extended-vocabulary encode: a doc untouched by any new piece " +
      "keeps byte-identical token ids (the shard-stability contract)") {
    import graft.operators.TokenizerArtifact
    val baseDocs = Seq((1L, "ab ab ba")).toDF("doc_id", "text")
    val allDocs = Seq((1L, "ab ab ba"), (2L, "xy yx"))
      .toDF("doc_id", "text")
    // topPieces large enough that every substring of both corpora is
    // kept — doc 1's greedy matches are identical under both vocabs
    val base = WordPiece.mineVocab(baseDocs, "text", 4, 50)
    val baseIds = WordPiece.vocabIds(base)
    val ext = WordPiece.mineVocab(allDocs, "text", 4, 50)
    val extIds = TokenizerArtifact.extendIds(baseIds, ext)
    // the extension really adds pieces BEFORE doc 1's alphabetically
    // (##x/##y/x/y sort after, but xy's substrings include none
    // before 'a' — so force the check the other way: the frozen rank
    // layout over ext must DISAGREE with extIds somewhere)
    val frozen = WordPiece.vocabIds(ext).as[(String, Long)]
      .collect().toMap
    val appended = extIds.as[(String, Long)].collect().toMap
    assert(frozen != appended, "extension fixture added no pieces")
    def enc(ids: org.apache.spark.sql.DataFrame,
            vocab: org.apache.spark.sql.DataFrame) =
      WordPiece.encodeIdsWith(baseDocs, "doc_id", "text", vocab, ids,
          matchHorizon = 4, maxInputChars = 16)
        .orderBy("pos").as[(Long, Long, Long)].collect().toSeq
    assert(enc(extIds, ext) == enc(baseIds, base))
  }
}
