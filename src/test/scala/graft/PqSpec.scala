package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Product quantization: sub-quantizer training, encoding, ADC search. */
class PqSpec extends SparkSpecBase {
  import spark.implicits._

  // ids alternate groups so the k-lowest-id init covers both
  private def corpus = Seq(
    (0L, Seq(0f, 0f, 10f, 10f)), (1L, Seq(5f, 5f, 0f, 0f)),
    (2L, Seq(0f, 0f, 10f, 10f)), (3L, Seq(5f, 5f, 0f, 0f)),
    (4L, Seq(0f, 0f, 10f, 10f)), (5L, Seq(5f, 5f, 0f, 0f)),
    (6L, Seq(0f, 0f, 10f, 10f)), (7L, Seq(5f, 5f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("PQ: codebooks separate the groups; same-group vectors share codes") {
    val cbs = Ann.pqTrainCodebooks(corpus, "vec_id", "embedding",
      m = 2, k = 2, iters = 2)
    assert(cbs.length == 2 && cbs.forall(_.length == 2))
    assert(cbs.forall(_.forall(_.length == 2))) // 4 dims / 2 subspaces
    val codes = Ann.pqEncode(corpus, "vec_id", "embedding", cbs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(0L) == codes(2L) && codes(2L) == codes(4L))
    assert(codes(1L) == codes(3L) && codes(3L) == codes(5L))
    assert(codes(0L) != codes(1L))
  }

  test("PQ ADC search: same-group neighbors rank first, id tie-break") {
    val cbs = Ann.pqTrainCodebooks(corpus, "vec_id", "embedding",
      m = 2, k = 2, iters = 2)
    val codes = Ann.pqEncode(corpus, "vec_id", "embedding", cbs)
    val res = Ann.pqSearch(corpus.filter(col("vec_id") === 0L), codes,
        "vec_id", "embedding", cbs, k = 4)
      .orderBy("rank").collect()
    // group A (ids 2,4,6) at zero approximate distance before any B
    assert(res.map(_.getAs[Long]("neighbor_id")).take(3).toSeq ==
      Seq(2L, 4L, 6L))
    assert(res.take(3).forall(_.getAs[Double]("adist") == 0.0))
    assert(res(3).getAs[Double]("adist") > 0.0)
  }

  test("IVF-PQ: coarse lists separate groups, residual codes agree, " +
      "multi-probe never double-counts") {
    val (coarse, cbs, codes) = Ann.ivfPqBuild(corpus, "vec_id",
      "embedding", kc = 2, m = 2, k = 2, iters = 2)
    assert(coarse.length == 2)
    val idx = codes.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2))).toMap
    // group members share a coarse list; the two groups differ
    assert(idx(0L)._1 == idx(2L)._1 && idx(1L)._1 == idx(3L)._1)
    assert(idx(0L)._1 != idx(1L)._1)
    val res = Ann.ivfPqSearch(corpus.filter(col("vec_id") === 0L), codes,
        "vec_id", "embedding", coarse, cbs, nProbe = 2, k = 7)
      .orderBy("rank").collect()
    // probing both lists sees every other vector exactly once
    assert(res.map(_.getAs[Long]("neighbor_id")).distinct.length == 7)
    // same-group neighbors (zero residual distance to the query's own
    // list) rank before any cross-list candidate
    assert(res.take(3).map(_.getAs[Long]("neighbor_id")).toSeq ==
      Seq(2L, 4L, 6L))
  }

  test("persisted IVF-PQ index: probes partition-prune the code scan; " +
      "appends compose to the in-memory result") {
    import org.apache.spark.sql.functions._
    val (coarse, cbs, codes) = Ann.ivfPqBuild(corpus, "vec_id",
      "embedding", kc = 2, m = 2, k = 2, iters = 2)
    val mem = Ann.ivfPqSearch(corpus.filter(col("vec_id") === 0L), codes,
        "vec_id", "embedding", coarse, cbs, nProbe = 1, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val idx = java.nio.file.Files
      .createTempDirectory("ivfpq_idx_spec").toString
    Ann.ivfPqIndexAppend(codes.filter(col("emb_id") < 4), idx, 1L)
    Ann.ivfPqIndexAppend(codes.filter(col("emb_id") >= 4), idx, 2L)
    val q = corpus.filter(col("vec_id") === 0L)
    val persisted = Ann.ivfPqIndexQuery(spark, idx, q, "vec_id",
        "embedding", coarse, cbs, nProbe = 1, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(persisted == mem && mem.nonEmpty)
    // the probe set reaches the scan as a partition filter
    val p = Ann.ivfPqIndexQuery(spark, idx, q, "vec_id", "embedding",
      coarse, cbs, nProbe = 1, k = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("coarse"), p)
    assert(!p.contains("PartitionFilters: []"), p)
  }

  test("recall@k: perfect on separable data; hand-counted hits; " +
      "queries with zero approximate results score 0") {
    import org.apache.spark.sql.functions._
    val (coarse, cbs, codes) = Ann.ivfPqBuild(corpus, "vec_id",
      "embedding", kc = 2, m = 2, k = 2, iters = 2)
    val q = corpus.filter(col("vec_id") < 2)
    val approx = Ann.ivfPqSearch(q, codes, "vec_id", "embedding",
      coarse, cbs, nProbe = 1, k = 3)
    val exact = Ann.bruteForceTopKL2(q, corpus, "vec_id", "embedding", 3)
    val rec = Ann.recallAtK(approx, exact, k = 3).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("recall")).toMap
    // two well-separated groups: the probed list IS the true group
    assert(rec == Map(0L -> 1.0, 1L -> 1.0))
    // hand case incl. a query the approx side missed entirely
    val a = Seq((1L, 10L), (1L, 11L), (2L, 30L)).toDF("query_id", "neighbor_id")
    val x = Seq((1L, 10L), (1L, 99L), (2L, 31L), (3L, 50L))
      .toDF("query_id", "neighbor_id")
    val r2 = Ann.recallAtK(a, x, k = 2).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_hit"),
        r.getAs[Double]("recall"))).toSet
    assert(r2 == Set((1L, 1L, 0.5), (2L, 0L, 0.0), (3L, 0L, 0.0)))
  }

  test("index compaction: query equality before/after, one live layer, " +
      "bounded file count, pruning preserved") {
    import org.apache.spark.sql.functions._
    val (coarse, cbs, codes) = Ann.ivfPqBuild(corpus, "vec_id",
      "embedding", kc = 2, m = 2, k = 2, iters = 2)
    val idx = java.nio.file.Files
      .createTempDirectory("ivfpq_idx_compact").toString
    Ann.ivfPqIndexAppend(codes.filter(col("emb_id") < 3), idx, 1L)
    Ann.ivfPqIndexAppend(
      codes.filter(col("emb_id") >= 3 && col("emb_id") < 6), idx, 2L)
    Ann.ivfPqIndexAppend(codes.filter(col("emb_id") >= 6), idx, 3L)
    val q = corpus.filter(col("vec_id") === 0L)
    def run() = Ann.ivfPqIndexQuery(spark, idx, q, "vec_id", "embedding",
        coarse, cbs, nProbe = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val before = run()
    Ann.compactVectorIndex(spark, idx, partitionCol = "coarse")
    val after = run()
    assert(after == before && before.nonEmpty)
    // exactly one live layer dir remains on disk (superseded layers
    // GC'd) — in the compact= namespace, DISJOINT from append ids, so
    // a later monotonic batch= append can never overwrite it
    val dirs = new java.io.File(idx).listFiles
      .filter(f => f.isDirectory && (f.getName.startsWith("batch=") ||
        f.getName.startsWith("compact="))).toSeq
    assert(dirs.map(_.getName) == Seq("compact=1"), dirs.mkString(","))
    // partition pruning survives compaction
    val p = Ann.ivfPqIndexQuery(spark, idx, q, "vec_id", "embedding",
      coarse, cbs, nProbe = 1, k = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("coarse"), p)
    assert(!p.contains("PartitionFilters: []"), p)
    // compacting a single-layer index is a no-op
    Ann.compactVectorIndex(spark, idx, partitionCol = "coarse")
    assert(run() == before)
  }

  test("manifest loss: single-namespace dirs fall back to a directory " +
      "scan (query unchanged); MIXED batch=/compact= dirs without a " +
      "manifest fail LOUDLY — a compact= layer may already contain the " +
      "batch= rows, and a silent union would double-count them") {
    import org.apache.spark.sql.functions._
    val (coarse, cbs, codes) = Ann.ivfPqBuild(corpus, "vec_id",
      "embedding", kc = 2, m = 2, k = 2, iters = 2)
    val idx = java.nio.file.Files
      .createTempDirectory("ivfpq_idx_manifest_loss").toString
    Ann.ivfPqIndexAppend(codes.filter(col("emb_id") < 3), idx, 1L)
    Ann.ivfPqIndexAppend(
      codes.filter(col("emb_id") >= 3 && col("emb_id") < 6), idx, 2L)
    val q = corpus.filter(col("vec_id") === 0L)
    def run() = Ann.ivfPqIndexQuery(spark, idx, q, "vec_id", "embedding",
        coarse, cbs, nProbe = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // single-namespace (batch= only): manifest loss falls back to the
    // directory scan, query unchanged
    val batchOnly = run()
    java.nio.file.Files.delete(java.nio.file.Paths.get(idx, "_LAYERS"))
    assert(run() == batchOnly && batchOnly.nonEmpty)
    // restore via compaction, then a fresh append: batch= and compact=
    // dirs coexist (legitimately, under the manifest)
    Ann.compactVectorIndex(spark, idx, partitionCol = "coarse")
    Ann.ivfPqIndexAppend(codes.filter(col("emb_id") >= 6), idx, 4L)
    assert(run().nonEmpty)
    // manifest lost over the MIXED namespaces: no local evidence can
    // tell this fresh batch=4 from an orphan a crashed compaction
    // already absorbed — the reader must refuse, not guess
    java.nio.file.Files.delete(java.nio.file.Paths.get(idx, "_LAYERS"))
    val e = intercept[IllegalArgumentException] { run() }
    assert(e.getMessage.contains("BOTH batch= and compact="))
  }

  test("persisted SQ8 index: doc-disjoint code folds + compaction " +
      "answer verbatim-equal to the in-memory quantized search; " +
      "probes partition-prune the scan") {
    import org.apache.spark.sql.functions._
    val vecs = (0L to 40L).map(i =>
      (i, Array.fill(4)((i % 5).toFloat + 1f), (i % 5).toInt))
      .toDF("vec_id", "embedding", "label")
    val idx = java.nio.file.Files
      .createTempDirectory("sq8_idx_spec").toString
    Ann.sq8IndexAppend(vecs.filter(col("vec_id") < 20), "vec_id",
      "embedding", col("label"), idx, 1L)
    Ann.sq8IndexAppend(vecs.filter(col("vec_id") >= 20), "vec_id",
      "embedding", col("label"), idx, 2L)
    val qs = vecs.filter(col("vec_id") < 3)
      .withColumn("probes", array(col("label").cast("long")))
    def res() = Ann.sq8IndexQuery(spark, idx, qs, "vec_id", "embedding",
        "probes", k = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val inMem = Ann.ivfQuantizedTopK(qs, vecs, "vec_id", "embedding",
        "label", "probes", k = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(res() == inMem && inMem.nonEmpty)
    // compaction preserves the answer; pruning survives
    Ann.compactVectorIndex(spark, idx, partitionCol = "cluster")
    assert(res() == inMem)
    val p = Ann.sq8IndexQuery(spark, idx, qs, "vec_id", "embedding",
      "probes", k = 2).queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cluster"), p)
    assert(!p.contains("PartitionFilters: []"), p)
  }

  test("RagStream: doc-split folds answer identically to the one-shot " +
      "build; re-folding a batch id overwrites its own layer") {
    import org.apache.spark.sql.functions._
    val docs = (1L to 12L).map(i =>
      (i, (1 to 20).map(j => s"tok${(i * 7 + j) % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    def build(splits: Seq[org.apache.spark.sql.DataFrame]) = {
      val cfg = graft.streaming.RagStream.Config(java.nio.file.Files
        .createTempDirectory("rag_spec").toString, "doc_id", "text",
        windowTokens = 8, strideTokens = 6)
      splits.zipWithIndex.foreach { case (b, i) =>
        graft.streaming.RagStream.foldBatch(b, i.toLong, cfg) }
      cfg
    }
    def res(cfg: graft.streaming.RagStream.Config) = {
      val qs = graft.streaming.RagStream.encodeBatch(docs, cfg)
        .filter(col("doc_id") === 100L) // doc 1's first chunk
        .withColumn("probes", array(pmod(col("doc_id"), lit(4L)),
          pmod(col("doc_id") + 1L, lit(4L))))
      Ann.sq8IndexQuery(spark, cfg.indexDir, qs, "doc_id", "emb",
          "probes", k = 5)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Long)].collect().toSet
    }
    val oneShot = res(build(Seq(docs)))
    assert(oneShot.nonEmpty)
    val split = build(Seq(docs.filter(col("doc_id") <= 6),
      docs.filter(col("doc_id") > 6)))
    assert(res(split) == oneShot)
    // crash replay: batch 1 re-folds under the same id — idempotent
    graft.streaming.RagStream.foldBatch(
      docs.filter(col("doc_id") > 6), 1L, split)
    assert(res(split) == oneShot)
  }

  test("RagStream trained centroids + funnel gate: doc-split folds " +
      "equal the one-shot build; gated docs never reach the index; " +
      "trained probes retrieve same-topic chunks; chain recall is " +
      "perfect on separable data") {
    import org.apache.spark.sql.functions._
    import graft.streaming.RagStream
    // two disjoint-vocabulary topics (separable hash embeddings),
    // rotated per doc so same-topic chunks are similar but not equal;
    // doc 90 is junk (2-char tokens -> fails the avg-len rule)
    def doc(i: Long, words: Seq[String]) = {
      val rot = words.drop((i % 3).toInt) ++ words.take((i % 3).toInt)
      (i, ("the" +: rot).mkString(" "))
    }
    val wordsA = (1 to 24).map(j => s"alpha$j")
    val wordsB = (1 to 24).map(j => s"bravo$j")
    val docs = ((1L to 6L).map(doc(_, wordsA)) ++
      (7L to 12L).map(doc(_, wordsB)) :+
      (90L, (1 to 24).map(j => s"x$j".take(2)).mkString(" ")))
      .toDF("doc_id", "text")
    val gate = Some(RagStream.Funnel(langs = Seq("en")))
    val proto = RagStream.Config("", "doc_id", "text",
      windowTokens = 8, strideTokens = 6, funnel = gate)
    // centroids trained ONCE on batch 1 (odd ids - both topics), frozen
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    val b2 = docs.filter(col("doc_id") % 2 === 0)
    val cents = Ann.ivfTrainPortable(
      RagStream.encodeBatch(b1, proto), "doc_id", "emb", k = 2, iters = 2)
    def build(splits: Seq[org.apache.spark.sql.DataFrame]) = {
      val cfg = proto.copy(indexDir = java.nio.file.Files
        .createTempDirectory("rag_trained_spec").toString,
        centroids = Some(cents))
      splits.zipWithIndex.foreach { case (b, i) =>
        RagStream.foldBatch(b, i.toLong, cfg) }
      cfg
    }
    def res(cfg: RagStream.Config) = {
      val qs = RagStream.encodeBatch(docs, cfg)
        .filter(col("doc_id") === 100L) // doc 1's first chunk
        .withColumn("probes", RagStream.probesOf(cfg, nProbe = 1))
      Ann.sq8IndexQuery(spark, cfg.indexDir, qs, "doc_id", "emb",
          "probes", k = 4)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Long)].collect().toSet
    }
    val one = build(Seq(docs))
    val oneShot = res(one)
    assert(oneShot.nonEmpty)
    // the funnel gate held: no chunk of doc 90 anywhere in the index
    val indexed = spark.read.parquet(one.indexDir)
      .select("emb_id").as[Long].collect()
    assert(indexed.nonEmpty && !indexed.exists(id => id / 100L == 90L))
    // batching-independence extends to the gated, trained fold
    assert(res(build(Seq(b1, b2))) == oneShot)
    // geometric locality: probing doc 1's OWN trained cluster returns
    // exclusively topic-A chunks (docs 1-6)
    assert(oneShot.forall { case (_, n, _) => (1L to 6L).contains(n / 100L) })
    // chain-level recall vs exact float cosine over the same chunks:
    // perfect on separable data with both clusters probed
    val chunks = RagStream.encodeBatch(docs, one)
    val qs = chunks.filter(col("doc_id") % 100L === 0L)
      .withColumn("probes", RagStream.probesOf(one, nProbe = 2))
    val approx = Ann.sq8IndexQuery(spark, one.indexDir, qs, "doc_id",
      "emb", "probes", k = 3)
    val exact = Ann.bruteForceTopK(qs.drop("probes"), chunks,
      "doc_id", "emb", k = 3)
    val rec = Ann.recallAtK(approx, exact, k = 3)
      .select("recall").as[Double].collect()
    assert(rec.length == 12 && rec.forall(_ == 1.0), rec.mkString(","))
  }

  test("RetrievalStream: batch folds equal the one-shot encode; " +
      "re-folding a micro-batch id overwrites its own layer " +
      "(crash-replay idempotent)") {
    import org.apache.spark.sql.functions._
    val (coarse, cbs, codes) = Ann.ivfPqBuild(corpus, "vec_id",
      "embedding", kc = 2, m = 2, k = 2, iters = 2)
    val idx = java.nio.file.Files
      .createTempDirectory("retr_stream_spec").toString
    val cfg = graft.streaming.RetrievalStream.Config(idx, "vec_id",
      "embedding", coarse, cbs)
    val b0 = corpus.filter(col("vec_id") < 4)
    val b1 = corpus.filter(col("vec_id") >= 4)
    graft.streaming.RetrievalStream.foldBatch(b0, 0L, cfg)
    graft.streaming.RetrievalStream.foldBatch(b1, 1L, cfg)
    val q = corpus.filter(col("vec_id") === 0L)
    def run() = Ann.ivfPqIndexQuery(spark, idx, q, "vec_id",
        "embedding", coarse, cbs, nProbe = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val streamed = run()
    val oneShot = Ann.ivfPqSearch(q, codes, "vec_id", "embedding",
        coarse, cbs, nProbe = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == oneShot && oneShot.nonEmpty)
    // crash replay: micro-batch 1 re-folds under the same id
    graft.streaming.RetrievalStream.foldBatch(b1, 1L, cfg)
    assert(run() == oneShot)
  }

  test("sampled training: trainMod=1 is bit-identical to the full " +
      "build; trainMod=2 trains on the half-sample and still searches " +
      "separable data perfectly") {
    import org.apache.spark.sql.functions._
    val (c1, b1, k1) = Ann.ivfPqBuild(corpus, "vec_id", "embedding",
      kc = 2, m = 2, k = 2, iters = 2)
    val (c2, b2, k2) = Ann.ivfPqBuildSampled(corpus, "vec_id",
      "embedding", kc = 2, m = 2, k = 2, iters = 2, trainMod = 1L)
    assert(c1 == c2 && b1 == b2)
    assert(k1.collect().map(_.toString).sorted.toSeq ==
      k2.collect().map(_.toString).sorted.toSeq)
    // trainMod=3 samples {0,3,6} — both groups represented (the
    // even-id sample would be all of group A: degenerate quantizers,
    // which is the documented representativeness caveat of sampled
    // training, not a code path to lock)
    val (cs, bs, ks) = Ann.ivfPqBuildSampled(corpus, "vec_id",
      "embedding", kc = 2, m = 2, k = 2, iters = 2, trainMod = 3L)
    val q = corpus.filter(col("vec_id") < 2)
    val exact = Ann.bruteForceTopKL2(q, corpus, "vec_id", "embedding", 3)
    val rec = Ann.recallAtK(Ann.ivfPqSearch(q, ks, "vec_id", "embedding",
        cs, bs, nProbe = 1, k = 3), exact, k = 3)
      .agg(avg("recall")).head().getDouble(0)
    assert(rec == 1.0, rec.toString)
  }

  test("refinement: exact re-rank of the ADC top-R — recall at least " +
      "the plain ADC search's, perfect on separable data") {
    import org.apache.spark.sql.functions._
    val (coarse, cbs, codes) = Ann.ivfPqBuild(corpus, "vec_id",
      "embedding", kc = 2, m = 2, k = 2, iters = 2)
    val q = corpus.filter(col("vec_id") < 2)
    val exact = Ann.bruteForceTopKL2(q, corpus, "vec_id", "embedding", 3)
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      Ann.recallAtK(approx, exact, k = 3)
        .agg(avg("recall")).head().getDouble(0)
    val plain = recall(Ann.ivfPqSearch(q, codes, "vec_id", "embedding",
      coarse, cbs, nProbe = 1, k = 3))
    val refined = recall(Ann.ivfPqSearchRefined(q, codes, corpus,
      "vec_id", "embedding", coarse, cbs, nProbe = 1, rerank = 6, k = 3))
    assert(refined >= plain && refined == 1.0, s"$plain -> $refined")
    // rerank horizon must cover k
    intercept[IllegalArgumentException] {
      Ann.ivfPqSearchRefined(q, codes, corpus, "vec_id", "embedding",
        coarse, cbs, nProbe = 1, rerank = 2, k = 3)
    }
  }

  test("append after compact: the monotonic next batch id lands beside " +
      "the compacted layer (no overwrite), absorbed ids are refused, " +
      "own-layer replay stays idempotent") {
    import org.apache.spark.sql.functions._
    val (coarse, cbs, codes) = Ann.ivfPqBuild(corpus, "vec_id",
      "embedding", kc = 2, m = 2, k = 2, iters = 2)
    val idx = java.nio.file.Files
      .createTempDirectory("ivfpq_idx_appcompact").toString
    Ann.ivfPqIndexAppend(codes.filter(col("emb_id") < 3), idx, 1L)
    Ann.ivfPqIndexAppend(
      codes.filter(col("emb_id") >= 3 && col("emb_id") < 6), idx, 2L)
    Ann.compactVectorIndex(spark, idx, partitionCol = "coarse")
    // the round-8 data-loss path: a monotonically-numbered appender's
    // NEXT id (3) previously collided with the compacted layer
    // (batch=3 = max live + 1) and replaced the whole index
    Ann.ivfPqIndexAppend(codes.filter(col("emb_id") >= 6), idx, 3L)
    val q = corpus.filter(col("vec_id") === 0L)
    def run() = Ann.ivfPqIndexQuery(spark, idx, q, "vec_id", "embedding",
        coarse, cbs, nProbe = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val inMem = Ann.ivfPqSearch(q, codes, "vec_id", "embedding",
        coarse, cbs, nProbe = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(run() == inMem && inMem.nonEmpty)
    // replaying an absorbed batch id would duplicate its rows: refused
    val e = intercept[IllegalArgumentException] {
      Ann.ivfPqIndexAppend(codes.filter(col("emb_id") < 3), idx, 2L)
    }
    assert(e.getMessage.contains("high-water"))
    // replaying a still-LIVE layer overwrites itself — idempotent
    Ann.ivfPqIndexAppend(codes.filter(col("emb_id") >= 6), idx, 3L)
    assert(run() == inMem)
    // MIXED-namespace scan (compact=1 live beside batch=3): partition
    // pruning must hold on BOTH layer groups — no scan may read all
    // coarse lists
    val pMixed = Ann.ivfPqIndexQuery(spark, idx, q, "vec_id",
        "embedding", coarse, cbs, nProbe = 1, k = 3)
      .queryExecution.executedPlan.toString
    assert(pMixed.contains("PartitionFilters") &&
      !pMixed.contains("PartitionFilters: []"), pMixed)
    // second compaction folds (compact=1, batch=3) into compact=2
    Ann.compactVectorIndex(spark, idx, partitionCol = "coarse")
    assert(run() == inMem)
    val dirs = new java.io.File(idx).listFiles.filter(_.isDirectory)
      .map(_.getName).toSeq
    assert(dirs == Seq("compact=2"), dirs.mkString(","))
  }

  test("knnClassify: separable clusters classify perfectly; vote " +
      "ties break on the smaller label") {
    import graft.operators.Ann
    // two clusters around (0,0) and (10,10), labels 0 / 1; the 0.25
    // steps are binary-exact and MIRRORED so a (5,5) probe sits at
    // exactly equal distance from the i-th member of each cluster
    val pts = ((0 until 6).map(i =>
        (i.toLong, Array(0f - i * 0.25f, 0f), 0)) ++
      (0 until 6).map(i =>
        (100L + i, Array(10f + i * 0.25f, 10f), 1)))
      .toDF("vec_id", "embedding", "label")
    val queries = pts.filter($"vec_id".isin(0L, 100L))
    val cands = pts.filter(!$"vec_id".isin(0L, 100L))
    val out = Ann.knnClassify(queries, cands, "vec_id", "embedding",
        "label", k = 3)
      .orderBy($"query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq((0L, 0L, 0L, 3L, true),
      (100L, 1L, 1L, 3L, true)))
    // 2-2 vote tie at k=4 for a mid-point query: label 0 wins the
    // (votes DESC, label ASC) tie-break
    val mid = Seq((500L, Array(5f, 5f), 1)).toDF("vec_id", "embedding",
      "label")
    val tied = Ann.knnClassify(mid, cands, "vec_id", "embedding",
        "label", k = 4)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(tied.toSeq == Seq((0L, 2L, false)))
  }

  test("tombstone delete: deleted ids stop being retrievable; a later " +
      "re-add survives the old tombstone; a later delete kills it; " +
      "pruning survives; ids the index never held are harmless") {
    import org.apache.spark.sql.functions._
    val vecs = (0L to 40L).map(i =>
      (i, Array.fill(4)((i % 5).toFloat + 1f), (i % 5).toInt))
      .toDF("vec_id", "embedding", "label")
    val idx = java.nio.file.Files
      .createTempDirectory("sq8_tomb_spec").toString
    Ann.sq8IndexAppend(vecs.filter(col("vec_id") < 20), "vec_id",
      "embedding", col("label"), idx, 1L)
    val qs = vecs.filter(col("vec_id") === 0L)
      .withColumn("probes", array(col("label").cast("long")))
    def hits() = Ann.sq8IndexQuery(spark, idx, qs, "vec_id",
        "embedding", "probes", k = 10)
      .select("neighbor_id").as[Long].collect().toSet
    assert(hits().contains(5L) && hits().contains(10L))
    // 99 was never in the index — deleting it is a harmless no-op row
    Ann.deleteFromVectorIndex(spark, idx,
      Seq(5L, 10L, 99L).toDF("vec_id"), "vec_id")
    assert(!hits().contains(5L) && !hits().contains(10L))
    assert(hits().contains(15L))
    // batch 2 re-adds 5: effective id 2 > tombstone upto 1 — survives
    Ann.sq8IndexAppend(vecs.filter(col("vec_id") === 5L ||
        col("vec_id") >= 20), "vec_id", "embedding", col("label"),
      idx, 2L)
    assert(hits().contains(5L) && !hits().contains(10L))
    // a SECOND delete (upto 2) reaches the re-added incarnation
    Ann.deleteFromVectorIndex(spark, idx, Seq(5L).toDF("vec_id"),
      "vec_id")
    assert(!hits().contains(5L))
    // the DATA scan still partition-prunes to the probed clusters;
    // the tombstone scan is a skinny unpartitioned sliver (its empty
    // PartitionFilters are expected)
    val p = Ann.sq8IndexQuery(spark, idx, qs, "vec_id", "embedding",
      "probes", k = 10).queryExecution.executedPlan.toString
    val dataScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("cluster"))
      .toSeq
    assert(dataScans.nonEmpty, p)
    assert(dataScans.forall(l => l.contains("PartitionFilters: [") &&
      !l.contains("PartitionFilters: []")), dataScans.mkString("\n"))
  }

  test("tombstone delete: compaction is PHYSICAL erasure — deleted " +
      "ids absent from every surviving parquet byte, tombstone dirs " +
      "GC'd; answers unchanged; the id is free to return afterwards") {
    import org.apache.spark.sql.functions._
    val vecs = (0L to 19L).map(i =>
      (i, Array.fill(4)((i % 5).toFloat + 1f), (i % 5).toInt))
      .toDF("vec_id", "embedding", "label")
    val idx = java.nio.file.Files
      .createTempDirectory("sq8_tomb_gdpr").toString
    Ann.sq8IndexAppend(vecs.filter(col("vec_id") < 10), "vec_id",
      "embedding", col("label"), idx, 1L)
    Ann.sq8IndexAppend(vecs.filter(col("vec_id") >= 10), "vec_id",
      "embedding", col("label"), idx, 2L)
    Ann.deleteFromVectorIndex(spark, idx, Seq(3L, 14L).toDF("vec_id"),
      "vec_id")
    val qs = vecs.filter(col("vec_id") < 2)
      .withColumn("probes", array(col("label").cast("long"),
        pmod(col("label") + 3, lit(5)).cast("long")))
    def res() = Ann.sq8IndexQuery(spark, idx, qs, "vec_id", "embedding",
        "probes", k = 8)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val before = res()
    Ann.compactVectorIndex(spark, idx, partitionCol = "cluster")
    assert(res() == before)
    // physical: the only live layer holds NO deleted id anywhere
    val dirs = new java.io.File(idx).listFiles.filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("compact=1"), dirs.toString)
    val onDisk = spark.read.parquet(s"$idx/compact=1")
      .select("emb_id").as[Long].collect().toSet
    assert(!onDisk.contains(3L) && !onDisk.contains(14L))
    assert(onDisk.size == 18)
    // post-erasure the id can live again under a fresh batch id
    Ann.sq8IndexAppend(vecs.filter(col("vec_id") === 3L), "vec_id",
      "embedding", col("label"), idx, 3L)
    val back = Ann.sq8IndexQuery(spark, idx,
        vecs.filter(col("vec_id") === 8L)
          .withColumn("probes", array(col("label").cast("long"))),
        "vec_id", "embedding", "probes", k = 10)
      .select("neighbor_id").as[Long].collect().toSet
    assert(back.contains(3L))
  }

  test("tombstone delete: works on the float IVF index through the " +
      "same layer seam; empty index and manifest loss fail loudly") {
    import org.apache.spark.sql.functions._
    val vecs = (0L to 19L).map(i =>
      (i, Array.fill(4)((i % 2).toFloat * 10f + 1f), (i % 2).toInt))
      .toDF("vec_id", "embedding", "label")
    val idx = java.nio.file.Files
      .createTempDirectory("ivf_tomb_spec").toString
    intercept[IllegalArgumentException] {
      Ann.deleteFromVectorIndex(spark, idx, Seq(1L).toDF("vec_id"),
        "vec_id")
    }
    Ann.ivfIndexAppend(vecs, "vec_id", "embedding", col("label"), idx, 1L)
    Ann.deleteFromVectorIndex(spark, idx, Seq(2L, 4L).toDF("vec_id"),
      "vec_id")
    val qs = vecs.filter(col("vec_id") === 0L)
      .withColumn("probes", array(col("label").cast("long")))
    val got = Ann.ivfIndexQuery(spark, idx, qs, "vec_id", "embedding",
        "probes", k = 12)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!got.contains(2L) && !got.contains(4L) && got.contains(6L))
    // tombstones are meaningless without the manifest that scoped them
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(idx, "_LAYERS"))
    val e = intercept[IllegalArgumentException] {
      Ann.ivfIndexQuery(spark, idx, qs, "vec_id", "embedding",
        "probes", k = 3).collect()
    }
    assert(e.getMessage.contains("tombstone"))
  }

  test("tombstone delete: a backfill append at or below a tombstone's " +
      "frozen upto fails loudly (its rows would be silently swallowed); " +
      "ids strictly above it pass") {
    val vecs = (0L to 9L).map(i =>
      (i, Array.fill(4)((i % 2).toFloat + 1f), (i % 2).toInt))
      .toDF("vec_id", "embedding", "label")
    val idx = java.nio.file.Files
      .createTempDirectory("sq8_tomb_backfill").toString
    Ann.sq8IndexAppend(vecs.filter(col("vec_id") < 5), "vec_id",
      "embedding", col("label"), idx, 5L)
    Ann.deleteFromVectorIndex(spark, idx, Seq(1L).toDF("vec_id"),
      "vec_id")  // freezes upto = 5
    // backfill id 3 <= tombstone upto 5: the anti-join would eat it
    val e = intercept[IllegalArgumentException] {
      Ann.sq8IndexAppend(vecs.filter(col("vec_id") >= 5), "vec_id",
        "embedding", col("label"), idx, 3L)
    }
    assert(e.getMessage.contains("tombstone"), e.getMessage)
    // strictly above passes, and its rows are retrievable
    Ann.sq8IndexAppend(vecs.filter(col("vec_id") >= 5), "vec_id",
      "embedding", col("label"), idx, 6L)
    val got = Ann.sq8IndexQuery(spark, idx,
        vecs.filter(col("vec_id") === 0L)
          .withColumn("probes", array(col("label").cast("long"))),
        "vec_id", "embedding", "probes", k = 10)
      .select("neighbor_id").as[Long].collect().toSet
    assert(got.contains(6L) && !got.contains(1L))
  }

  test("retrain lifecycle: the old epoch answers until the atomic " +
      "swap; after it the root serves the rebuilt index, superseded " +
      "stores are GC'd by the NEXT retrain (one-retrain deferral — " +
      "in-flight readers of the old store finish), and " +
      "appends/deletes land in the new epoch") {
    val vecs = (0L to 19L).map(i =>
      (i, Array.fill(4)((i % 2).toFloat * 10f + 1f), (i % 2).toInt))
      .toDF("vec_id", "embedding", "label")
    val idx = java.nio.file.Files
      .createTempDirectory("epoch_spec").toString
    Ann.sq8IndexAppend(vecs.filter(col("vec_id") < 10), "vec_id",
      "embedding", col("label"), idx, 1L)
    val qs = vecs.filter(col("vec_id") === 0L)
      .withColumn("probes", array(col("label").cast("long")))
    def hits() = Ann.sq8IndexQuery(spark, idx, qs, "vec_id",
        "embedding", "probes", k = 20)
      .select("neighbor_id").as[Long].collect().toSet
    val before = hits()
    assert(before.contains(2L) && !before.contains(12L))
    var during: Set[Long] = null
    Ann.retrainVectorIndex(idx) { epochDir =>
      // rebuild with ALL vectors under a re-labeled assignment
      Ann.sq8IndexAppend(vecs, "vec_id", "embedding", col("label"),
        epochDir, 1L)
      during = hits() // root still resolves to the OLD store here
    }
    assert(during == before)
    val after = hits()
    assert(after.contains(12L) && after.contains(2L))
    // _EPOCH pointer present; the just-superseded root-level layers
    // are NOT GC'd yet (one-retrain deferral: a reader that resolved
    // the root store just before the swap is still answering from it)
    val names = new java.io.File(idx).listFiles.map(_.getName).toSet
    assert(names.contains("_EPOCH") && names.contains("epoch=1"))
    assert(names.exists(_.startsWith("batch=")), names.toString)
    // maintenance APIs keep working through the root: append + delete
    Ann.sq8IndexAppend(vecs.filter(col("vec_id") === 0L)
        .withColumn("vec_id", lit(99L)), "vec_id", "embedding",
      col("label"), idx, 2L)
    assert(hits().contains(99L))
    Ann.deleteFromVectorIndex(spark, idx, Seq(99L).toDF("vec_id"),
      "vec_id")
    assert(!hits().contains(99L))
    // a SECOND retrain GCs the pre-epoch root layers (dead since the
    // first swap — including the crash window where a first retrain
    // swapped but died before its own GC) AND any orphan a crashed
    // build left behind (epoch=5 here, never swapped in), while
    // epoch=1 — the store THIS swap retires — defers to the third
    val orphan = java.nio.file.Paths.get(idx, "epoch=5")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("junk"),
      Array[Byte](1, 2, 3))
    Ann.retrainVectorIndex(idx) { epochDir =>
      Ann.sq8IndexAppend(vecs.filter(col("vec_id") < 4), "vec_id",
        "embedding", col("label"), epochDir, 1L)
    }
    val names2 = new java.io.File(idx).listFiles.map(_.getName).toSet
    assert(names2.contains("epoch=6") && names2.contains("epoch=1") &&
      !names2.contains("epoch=5") &&
      !names2.exists(_.startsWith("batch=")), names2.toString)
    assert(hits() == Set(2L))
    // the THIRD retrain finally drops epoch=1 (now two swaps old)
    Ann.retrainVectorIndex(idx) { epochDir =>
      Ann.sq8IndexAppend(vecs.filter(col("vec_id") < 4), "vec_id",
        "embedding", col("label"), epochDir, 1L)
    }
    val names3 = new java.io.File(idx).listFiles.map(_.getName).toSet
    assert(names3.contains("epoch=7") && names3.contains("epoch=6") &&
      !names3.contains("epoch=1"), names3.toString)
  }

  test("vectorIndexDriftReport: moved-distribution layers show higher " +
      "mean angular residual than the layer the centroids were " +
      "trained on") {
    val base = (0L to 29L).map { i =>
      val ang = (i % 3).toInt // three tight direction groups
      val v = Array.tabulate(4)(d =>
        if (d == ang) 10f else 0.1f * ((i % 5) + 1))
      (i, v)
    }.toDF("vec_id", "embedding")
    val cents = Ann.ivfTrainPortable(base, "vec_id", "embedding", k = 3)
    val idx = java.nio.file.Files
      .createTempDirectory("drift_spec").toString
    def cl = Ann.cosineCluster(col("embedding").cast("array<double>"),
      cents)
    Ann.sq8IndexAppend(base, "vec_id", "embedding", cl, idx, 1L)
    // drifted batch: same ids + 100, directions rotated off-axis
    val moved = base.withColumn("vec_id", col("vec_id") + 100L)
      .withColumn("embedding", reverse(col("embedding")))
    Ann.sq8IndexAppend(moved, "vec_id", "embedding", cl, idx, 2L)
    val rep = Ann.vectorIndexDriftReport(spark, idx, cents)
      .groupBy("layer_batch")
      .agg((sum(col("mean_res_10k") * col("n")) / sum(col("n")))
        .as("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rep(2L) > rep(1L),
      s"drifted layer should show higher residual: $rep")
    // wrong-dimensionality centroids fail loudly, not null-ly
    val e = intercept[Exception] {
      Ann.vectorIndexDriftReport(spark, idx,
        Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 1.0))).collect()
    }
    assert(e.getMessage.contains("dimensionality"), e.getMessage)
  }

  test("tombstone delete: compacting an index whose tombstones delete " +
      "EVERY row leaves a readable empty index that accepts appends") {
    val vecs = (0L to 7L).map(i =>
      (i, Array.fill(4)((i % 2).toFloat + 1f), (i % 2).toInt))
      .toDF("vec_id", "embedding", "label")
    val idx = java.nio.file.Files
      .createTempDirectory("sq8_tomb_all_deleted").toString
    Ann.sq8IndexAppend(vecs, "vec_id", "embedding", col("label"), idx, 1L)
    Ann.deleteFromVectorIndex(spark, idx,
      vecs.select("vec_id"), "vec_id")
    Ann.compactVectorIndex(spark, idx, partitionCol = "cluster")
    val qs = vecs.filter(col("vec_id") === 0L)
      .withColumn("probes", array(col("label").cast("long")))
    def hits() = Ann.sq8IndexQuery(spark, idx, qs, "vec_id",
        "embedding", "probes", k = 10)
      .select("neighbor_id").as[Long].collect().toSet
    assert(hits().isEmpty)          // readable, empty — not a crash
    Ann.sq8IndexAppend(vecs.filter(col("vec_id") < 4), "vec_id",
      "embedding", col("label"), idx, 2L)
    assert(hits().contains(2L))     // fresh rows land and are served
  }
}
