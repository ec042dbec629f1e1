package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Dedup}

class DedupAnnSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
  private lazy val em = spark.read.parquet(s"$Sf0001/embeddings.parquet")

  test("exact dedup finds injected duplicates") {
    val withDups = docs.select("doc_id", "text")
      .union(docs.filter($"doc_id" < 5).select($"doc_id" + 10000, $"text"))
    val r = Dedup.exact(withDups, "doc_id", "text")
    assert(r.filter($"n_dups" === 2).count() == 5)
    assert(r.filter($"n_dups" === 2).agg(max("keep_id")).as[Long].head() < 500)
  }

  test("persisted exact-dedup index: cross-batch duplicates merge to " +
      "the one-shot dedup table (min composes, counts add)") {
    val withDups = docs.select("doc_id", "text")
      .union(docs.filter($"doc_id" < 5).select($"doc_id" + 10000, $"text"))
    val idx = java.nio.file.Files.createTempDirectory("exact_idx").toString
    // the duplicate pairs land in DIFFERENT layers (originals < 5,
    // copies >= 10000) — the merge must still find them
    Dedup.exactIndexAppend(withDups.filter($"doc_id" < 5000),
      "doc_id", "text", idx, 1L)
    Dedup.exactIndexAppend(withDups.filter($"doc_id" >= 5000),
      "doc_id", "text", idx, 2L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("keep_id", "n_dups").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(Dedup.exactFromIndex(spark, idx)) ==
      rows(Dedup.exact(withDups, "doc_id", "text")))
  }

  test("minhash estimate tracks exact jaccard for near-identical docs") {
    // doc + itself with one token changed → jaccard ≈ high
    val base = docs.filter($"doc_id" < 30).select($"doc_id", $"text")
    val mutated = base.select(($"doc_id" + 1000).as("doc_id"),
      concat($"text", lit(" zzz")).as("text"))
    val r = Dedup.minhashLsh(base.union(mutated), "doc_id", "text",
      shingleN = 2, numPerm = 64, bands = 16)
    val found = r.filter($"doc_a" === $"doc_b" - 1000 && $"est_jaccard" > 0.5)
    assert(found.count() >= 25, "LSH should recover most mutated pairs")
  }

  test("incremental minhash fold equals the full-corpus run") {
    val all = docs.limit(200).select($"doc_id", $"text")
    val b0 = all.filter($"doc_id" % 2 === 0)
    val b1 = all.filter($"doc_id" % 2 === 1)

    val full = Dedup.minhashLsh(all, "doc_id", "text",
        shingleN = 2, numPerm = 64, bands = 16)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

    val s0 = Dedup.emptyMinhashState(all, "doc_id", "text",
      shingleN = 2, numPerm = 64, bands = 16)
    val (p0, s1) = Dedup.incrementalMinhash(s0, b0, "doc_id", "text",
      shingleN = 2, numPerm = 64, bands = 16)
    val st1 = Dedup.MinhashState(
      s1.signatures.localCheckpoint(), s1.buckets.localCheckpoint())
    val (p1, _) = Dedup.incrementalMinhash(st1, b1, "doc_id", "text",
      shingleN = 2, numPerm = 64, bands = 16)

    val fold0 = p0.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val fold1 = p1.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // each pair surfaces exactly once, in the fold seeing its 2nd member
    assert(fold0.intersect(fold1).isEmpty)
    assert(fold0.union(fold1) == full)
    // batch-1-internal pairs all stayed in fold 0
    assert(fold0.forall { case (a, b) => a % 2 == 0 && b % 2 == 0 })
  }

  test("simhash: identical docs distance 0, mutated docs close") {
    val sigs = Dedup.simhashSigs(docs.limit(50), "doc_id", "text")
    val self = sigs.as("a").join(sigs.as("b"),
      col("a.doc_id") === col("b.doc_id"))
    import graft.functions.GraftFunctions.hamming64
    assert(self.filter(
      hamming64(col("a.simhash"), col("b.simhash")) =!= 0).count() == 0)
  }

  test("IVF results are a subset of brute-force rankings restricted to label") {
    val queries = em.filter($"vec_id" < 5)
    val ivf = Ann.ivfTopK(queries, em, "vec_id", "embedding", "label", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // every ivf neighbor must share the query's label
    val labels = em.select($"vec_id", $"label").as[(Long, Int)]
      .collect().toMap
    assert(ivf.forall { case (q, n) => labels(q) == labels(n) })
    // brute force on the same label subset must agree
    for (q <- queries.select("vec_id").as[Long].collect()) {
      val subset = em.filter($"label" === labels(q))
      val bf = Ann.bruteForceTopK(em.filter($"vec_id" === q), subset,
        "vec_id", "embedding", k = 3)
        .select("neighbor_id").as[Long].collect().toSet
      val got = ivf.filter(_._1 == q).map(_._2)
      assert(got == bf, s"query $q: ivf=$got bf=$bf")
    }
  }

  test("trained IVF: Lloyd's improves inertia; top-k matches brute force within cluster") {
    def inertia(cents: Seq[Seq[Double]]): Double = {
      import graft.functions.GraftFunctions.toDoubleVec
      val cl = Ann.ivfCluster(toDoubleVec($"embedding"), cents)
      val dist = cents.zipWithIndex.map { case (c, i) =>
        when(cl === i, aggregate(
          zip_with(toDoubleVec($"embedding"), typedLit(c),
            (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x))
      }.reduce((a, b) => coalesce(a, b))
      em.select(sum(dist)).as[Double].head()
    }
    val init = Ann.ivfTrainCentroids(em, "vec_id", "embedding", k = 4, iters = 0)
    val trained = Ann.ivfTrainCentroids(em, "vec_id", "embedding", k = 4, iters = 4)
    assert(inertia(trained) <= inertia(init))

    // per query: trained-IVF top-k == brute force restricted to the
    // query's trained cluster
    val q = em.filter($"vec_id" < 3)
    val got = Ann.ivfTopKTrained(q, em, "vec_id", "embedding", 3, trained)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    import graft.functions.GraftFunctions.toDoubleVec
    val withCl = em.withColumn("cl",
      Ann.ivfCluster(toDoubleVec($"embedding"), trained))
    val exp = Ann.ivfTopK(withCl.filter($"vec_id" < 3), withCl,
        "vec_id", "embedding", "cl", 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == exp && got.nonEmpty)
  }

  test("LSH ANN returns same-bucket true neighbors with high sim first") {
    val r = Ann.lshBucketTopK(em.filter($"vec_id" < 5), em,
      "vec_id", "embedding", dim = 64, nPlanes = 6, k = 5)
    val perQ = r.groupBy("query_id").agg(min("sim").as("mn"), max("sim").as("mx"))
      .filter($"mx" < $"mn").count()
    assert(perQ == 0)
  }

  test("dup clusters: label propagation equals transitive closure") {
    // chain 1-2-3-4 (needs >1 round), pair {10,11}, triangle {20,21,22}
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("SemDeDup over TRAINED clusters equals the label-supplied path " +
    "on a separable corpus") {
    import graft.operators.Ann
    import graft.functions.GraftFunctions.toDoubleVec
    // three well-separated direction groups in R^4 (group = id % 3, so
    // the lowest-id init picks one seed per group and spherical Lloyd's
    // converges to the label partition); small within-group jitter
    // creates real near-dups for the prune to find
    val vecs = (0L until 18L).map { id =>
      val g = (id % 3).toInt
      val base = Array.fill(4)(0.05)
      base(g) = 1.0
      base((g + 1) % 3) += 0.001 * (id / 3) // jitter breaks exact ties
      (id, base.toSeq, g)
    }.toDF("vec_id", "embedding", "label")

    val cents = Ann.ivfTrainPortable(vecs, "vec_id", "embedding",
      k = 3, iters = 2)
    val assigned = vecs.withColumn("cluster",
      Ann.cosineCluster(toDoubleVec(col("embedding")), cents).cast("long"))

    // the trained assignment IS the label partition (init seeds 0,1,2
    // land one per group, so cluster ids equal labels here)
    assert(assigned.filter(col("cluster") =!= col("label")).count() == 0)

    // and the prune over trained clusters == the prune over labels,
    // row for row (same keep/drop decisions, same ordering keys)
    def prune(clusterCol: String) =
      Dedup.semDedup(assigned, "vec_id", "embedding", clusterCol,
          tau = 0.995)
        .select("vec_id", "cent_sim", "n_earlier_dups", "kept")
        .as[(Long, Double, Long, Boolean)].collect().toSeq.sorted
    val trained = prune("cluster")
    assert(trained == prune("label"))
    // the tight jitter makes real victims: something was pruned, and
    // per group the farthest-from-centroid member survived
    assert(trained.exists(!_._4) && trained.count(_._4) >= 3)
  }

  test("dup spans: only cross-document windows flag, at the right offsets") {
    val boiler = "terms of use apply to this site" // 7 tokens
    val docs = Seq(
      (1L, s"alpha beta $boiler gamma"),       // boiler at win_idx 2
      (2L, s"$boiler delta epsilon zeta eta"), // boiler at win_idx 0
      (3L, "totally unrelated text with no shared windows here at all"),
      // repeats the boiler twice; both offsets flag (the hash is cross-
      // doc via docs 1/2), and n_docs counts DISTINCT docs
      (4L, s"x y z w $boiler q r s t $boiler"))
      .toDF("doc_id", "text")
    val got = Dedup.dupSpans(docs, "doc_id", "text", windowTokens = 7)
      .select("doc_id", "win_idx", "n_docs")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L), (2L, 0L, 3L), (4L, 4L, 3L),
      (4L, 15L, 3L)))
  }

  test("boilerplate: only windows above the df bar flag; the cut " +
      "removes them; doc-disjoint persisted folds equal the one-shot") {
    val bp = "click here now" // 3 tokens, in 6 docs (df 6 > 5)
    val low = "terms of use"  // 3 tokens, in 3 docs (df 3 — under the bar)
    val docs = ((1L to 6L).map(i => (i, s"alpha$i beta$i $bp tail$i")) ++
      Seq((7L, s"$low solo seven"), (8L, s"$low eight"),
        (9L, s"$low nine"), (10L, "nothing shared at all")))
      .toDF("doc_id", "text")
    val spans = Dedup.boilerplateSpans(docs, "doc_id", "text",
        windowTokens = 3, minDf = 5L)
      .select("doc_id", "win_idx", "n_docs")
      .as[(Long, Long, Long)].collect().toSet
    assert(spans == (1L to 6L).map(i => (i, 2L, 6L)).toSet)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_removed"), r.getAs[String]("clean_text")))
        .toSeq
    val oneShot = rows(Dedup.cutBoilerplate(docs, "doc_id", "text",
      windowTokens = 3, minDf = 5L))
    assert(oneShot.take(2) == Seq(
      (1L, 6L, 3L, "alpha1 beta1 tail1"),
      (2L, 6L, 3L, "alpha2 beta2 tail2")))
    // below-bar spans and unshared docs pass through verbatim
    assert(oneShot.drop(6) == Seq(
      (7L, 5L, 0L, "terms of use solo seven"),
      (8L, 4L, 0L, "terms of use eight"),
      (9L, 4L, 0L, "terms of use nine"),
      (10L, 4L, 0L, "nothing shared at all")))
    // persisted frequency index: per-batch DISTINCT dfs add across
    // doc-disjoint folds, so the cut from the index is the one-shot cut
    val idx = java.nio.file.Files
      .createTempDirectory("bp_idx_spec").toString
    Dedup.boilerplateIndexAppend(docs.filter(col("doc_id") <= 4L),
      "doc_id", "text", windowTokens = 3, idx, 1L)
    Dedup.boilerplateIndexAppend(docs.filter(col("doc_id") > 4L),
      "doc_id", "text", windowTokens = 3, idx, 2L)
    assert(rows(Dedup.cutBoilerplateFromIndex(spark, idx, docs,
      "doc_id", "text", windowTokens = 3, minDf = 5L)) == oneShot)
  }

  test("int8 pack/dot: exact hand values; length mismatch → null; " +
      "out-of-range value fails loudly") {
    import graft.functions.Int8Ops._
    val d = Seq((Seq(1L, -2L, 127L), Seq(-128L, 3L, 2L)))
      .toDF("a", "b")
    val dot = d.select(int8Dot(int8Pack(col("a")), int8Pack(col("b"))))
      .collect().head.getLong(0)
    assert(dot == 1L * -128 + -2L * 3 + 127L * 2) // 120
    val mm = Seq((Seq(1L, 2L), Seq(1L, 2L, 3L))).toDF("a", "b")
      .select(int8Dot(int8Pack(col("a")), int8Pack(col("b"))))
      .collect().head
    assert(mm.isNullAt(0))
    val e = intercept[Exception] {
      Seq(Seq(128L)).toDF("a").select(int8Pack(col("a"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("quantizeInt8: extreme elements map to ±127 exactly; packed " +
      "values never leave int8 range") {
    import graft.functions.Int8Ops
    val vecs = Seq((1L, Seq(3.0f, -3.0f, 0.0f)),
      (2L, Seq(1e-30f, -1e-30f)), (3L, Seq(-2.0f)))
      .toDF("vec_id", "embedding")
    val q = Ann.quantizeInt8(vecs, "vec_id", "embedding")
      .select(col("emb_id"), col("qvec")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(q(1L).toSeq == Seq[Byte](127, -127, 0))
    assert(q(3L).toSeq == Seq[Byte](-127))
    // denormal-magnitude elements still land in-range (the pack
    // expression would throw loudly otherwise)
    assert(q(2L).forall(b => b >= -128 && b <= 127))
  }

  test("quantizedTopK: hand-computed quantized cosine, q23 ranking " +
      "convention, zero vectors dropped") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),   // q: quantizes to [127, 0]
      (1L, Seq(0.5f, 0.5f)),   // [127, 127] — sim to q = 0.7071
      (2L, Seq(-1.0f, 0.0f)),  // [-127, 0]  — sim to q = -1.0
      (3L, Seq(0.0f, 2.0f)),   // [0, 127]   — sim to q = 0.0
      (4L, Seq(0.0f, 0.0f)))   // zero vector: dropped entirely
      .toDF("vec_id", "embedding")
    val got = Ann.quantizedTopK(vecs.filter(col("vec_id") === 0L), vecs,
        "vec_id", "embedding", k = 4)
      .select("query_id", "neighbor_id", "rank", "sim")
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._3)
    assert(got == Seq((0L, 1L, 1L, 0.7071), (0L, 3L, 2L, 0.0),
      (0L, 2L, 3L, -1.0)))
  }

  test("ivfQuantizedTopK: probes prune candidates to the listed " +
      "clusters; within a probed cluster ranking equals the " +
      "unpruned quantized scan") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.1f), 0),
      (1L, Seq(0.9f, 0.2f), 0),
      (2L, Seq(0.8f, 0.3f), 0),
      (3L, Seq(-1.0f, 0.1f), 1),
      (4L, Seq(-0.9f, 0.2f), 1),
      (5L, Seq(0.1f, 1.0f), 2)) // cluster 2: NOT probed below
      .toDF("vec_id", "embedding", "label")
    val qs = vecs.filter(col("vec_id") === 0L)
      .withColumn("probes", array(lit(0L), lit(1L)))
    val got = Ann.ivfQuantizedTopK(qs, vecs, "vec_id", "embedding",
        "label", "probes", k = 10)
      .select("neighbor_id", "rank")
      .as[(Long, Long)].collect().toMap
    // cluster-2 member never appears; probed members all rank
    assert(!got.contains(5L) && got.keySet == Set(1L, 2L, 3L, 4L))
    // the probed subset ranks exactly as the unpruned quantized scan
    val brute = Ann.quantizedTopK(qs, vecs.filter(col("label") < 2),
        "vec_id", "embedding", k = 10)
      .select("neighbor_id", "rank").as[(Long, Long)].collect().toMap
    assert(got == brute)
    // duplicate probe ids must not double-count neighbors (a
    // wrap-around probe convention can collide on a small label space)
    val dup = Ann.ivfQuantizedTopK(
        vecs.filter(col("vec_id") === 0L)
          .withColumn("probes", array(lit(0L), lit(0L), lit(1L))),
        vecs, "vec_id", "embedding", "label", "probes", k = 10)
      .select("neighbor_id", "rank").as[(Long, Long)].collect().toMap
    assert(dup == got)
  }

  test("cutDupSpans removes exactly the covered tokens and rejoins " +
      "the rest; untouched docs pass through verbatim") {
    val boiler = "terms of use apply to this site" // 7 tokens
    val docs = Seq(
      (1L, s"alpha beta $boiler gamma"),
      (2L, s"$boiler delta epsilon zeta eta"),
      (3L, "totally unrelated text with no shared windows here at all"))
      .toDF("doc_id", "text")
    val got = Dedup.cutDupSpans(docs, "doc_id", "text", windowTokens = 7)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_removed"), r.getAs[String]("clean_text")))
      .toSeq
    assert(got == Seq(
      (1L, 10L, 7L, "alpha beta gamma"),
      (2L, 11L, 7L, "delta epsilon zeta eta"),
      (3L, 10L, 0L,
        "totally unrelated text with no shared windows here at all")))
  }

  test("lshEval: perfect precision/recall on exact duplicates; a " +
      "starved bucket cap loses recall and the metric reports it; " +
      "pairs outside the eval subset are excluded") {
    // three identical pairs + two singletons, 20 tokens each with a
    // DISJOINT vocabulary per seed (a shared small alphabet saturates
    // the bigram sets and makes every doc a true dup of every other)
    def page(seed: Long) =
      (1 to 20).map(j => s"p${seed}w$j").mkString(" ")
    val base = Seq(
      (1L, page(1)), (2L, page(1)),
      (3L, page(2)), (4L, page(2)),
      (5L, page(3)), (6L, page(3)),
      (7L, page(7)), (8L, page(8))
    ).toDF("doc_id", "text")
    val r = Dedup.lshEval(base, "doc_id", "text", evalPred = _ <= 8L,
        shingleN = 2, numPerm = 64, bands = 8, threshold = 0.9,
        maxBucketSize = 100)
      .collect().head
    // identical docs: est = exact = 1.0 >= 0.9 — all three pairs on
    // both sides (page(7)/page(8) differ and stay below threshold)
    assert(r.getAs[Long]("n_true") == 3 && r.getAs[Long]("n_cand") == 3)
    assert(r.getAs[Long]("n_hit") == 3)
    assert(r.getAs[Double]("prec") == 1.0 && r.getAs[Double]("recall") == 1.0)
    // cap of 1 starves every bucket that holds a duplicate pair:
    // candidates vanish, truth does not — recall collapses to 0
    val starved = Dedup.lshEval(base, "doc_id", "text",
        evalPred = _ <= 8L, shingleN = 2, numPerm = 64, bands = 8,
        threshold = 0.9, maxBucketSize = 1)
      .collect().head
    assert(starved.getAs[Long]("n_true") == 3)
    assert(starved.getAs[Long]("n_cand") == 0)
    assert(starved.getAs[Double]("recall") == 0.0 &&
      starved.getAs[Double]("prec") == 0.0)
    // eval subset excludes doc 6: pair (5,6) leaves BOTH sides
    val sub = Dedup.lshEval(base, "doc_id", "text", evalPred = _ <= 5L,
        shingleN = 2, numPerm = 64, bands = 8, threshold = 0.9,
        maxBucketSize = 100)
      .collect().head
    assert(sub.getAs[Long]("n_true") == 2 && sub.getAs[Long]("n_cand") == 2)
  }

  test("hammingNearDup: every pair within maxDist found (pigeonhole " +
      "holds across band boundaries), none beyond it; exact distances; " +
      "insufficient bands fail loudly") {
    import spark.implicits._
    val hashes = Seq(
      (1L, 0x0808080808080808L),            // base
      (2L, 0x0808080808080809L),            // dist 1 (low band)
      (3L, 0x0808080808080808L ^ (1L << 63)), // dist 1 (high band)
      (4L, 0x0808080808080809L ^ (1L << 63)), // dist 2 from base
      (5L, 0L)                               // far from everything
    ).toDF("id", "h")
    val got = graft.operators.Dedup
      .hammingNearDup(hashes, "id", "h", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (1L, 4L) -> 2L,
      (2L, 3L) -> 2L, (2L, 4L) -> 1L, (3L, 4L) -> 1L))
    // maxDist >= bands would break the pigeonhole guarantee
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dedup.hammingNearDup(hashes, "id", "h",
        maxDist = 4, bands = 4)
    }
    assert(e.getMessage.contains("pigeonhole"))
  }

  test("hammingNearDup: bands auto-widen with the radius — a radius-8 " +
      "pair whose differing bits straddle every 16-bit band is still " +
      "found (16 4-bit bands), with the exact distance") {
    import spark.implicits._
    // 8 flipped bits, two per 16-bit quarter: the old fixed 4-band
    // split has NO intact band; 4-bit bands leave plenty intact
    val flips = Seq(0, 5, 16, 21, 32, 37, 48, 53)
      .map(1L << _).reduce(_ | _)
    val hashes = Seq(
      (1L, 0x0F0F0F0F0F0F0F0L),
      (2L, 0x0F0F0F0F0F0F0F0L ^ flips),
      (3L, 0x7000000000000000L) // far away
    ).toDF("id", "h")
    val got = graft.operators.Dedup
      .hammingNearDup(hashes, "id", "h", maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map((1L, 2L) -> 8L))
  }

  test("hammingNearDup: the hot-bucket cap drops a degenerate dist-0 " +
      "duplicate group (quadratic in group size) and hammingEval " +
      "reports the recall it cost — measured, not assumed") {
    import spark.implicits._
    // 50 identical hashes (one pathological exact-dup cluster: every
    // band cell hot) + 4 near-dup pairs in distinct small groups
    val hot = (1L to 50L).map(i => (i, 0x00000000000FF000L))
    val pairs = (0 until 4).map { g =>
      val base = (0x1L << (g * 8)) | (0x3FL << 40) | (1L << (56 + g))
      Seq((100L + g * 2, base), (101L + g * 2, base ^ 1L))
    }.flatten
    val df = (hot ++ pairs).toDF("id", "h")
    val uncapped = graft.operators.Dedup
      .hammingNearDup(df, "id", "h", maxDist = 1)
    assert(uncapped.count() == 50L * 49 / 2 + 4)
    val capped = graft.operators.Dedup
      .hammingNearDup(df, "id", "h", maxDist = 1, maxBucketSize = 10)
    val got = capped.select("id_a").as[Long].collect()
    assert(got.length == 4 && got.forall(_ >= 100L),
      "the hot cluster's pairs must be capped away, the small groups kept")
    val ev = graft.operators.Dedup
      .hammingEval(df, "id", "h", evalPred = _ => lit(true),
        maxDist = 1, maxBucketSize = 10)
      .collect().head
    assert(ev.getAs[Long]("n_true") == 50L * 49 / 2 + 4)
    assert(ev.getAs[Long]("n_cand") == 4 &&
      ev.getAs[Double]("prec") == 1.0)
    val rec = ev.getAs[Double]("recall")
    assert(rec > 0.0 && rec < 0.01, s"recall should expose the cap: $rec")
  }

  test("exact-dedup 128-bit hash index: hash-only folded layers equal " +
      "the one-shot exact dedup, and layers carry no text column") {
    import spark.implicits._
    val docs = ((1L to 40L).map(i => (i, s"text ${i % 7}")) ++
      Seq((41L, "text 1"))).toDF("doc_id", "text")
    val oneShot = graft.operators.Dedup.exact(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = java.nio.file.Files
      .createTempDirectory("hash_idx_spec").toString
    graft.operators.Dedup.exactHashedIndexAppend(
      docs.filter($"doc_id" <= 20), "doc_id", "text", idx, 1L)
    graft.operators.Dedup.exactHashedIndexAppend(
      docs.filter($"doc_id" > 20), "doc_id", "text", idx, 2L)
    val folded = graft.operators.Dedup.exactFromHashedIndex(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(folded == oneShot)
    val cols = spark.read.parquet(idx).columns.toSet
    assert(!cols.contains("text") && cols.contains("h128"), cols)
  }
}
