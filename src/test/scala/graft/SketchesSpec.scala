package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Count-min and KMV sketches: estimator invariants, batch-merge
  * equivalence, scale-shape locks.
  */
class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a", "the cat sat on the mat"),
    (2L, "a", "the bat and the cat flew"),
    (3L, "b", "entirely different words here now"),
    (4L, "b", "words repeat words repeat words")
  ).toDF("doc_id", "src", "text")

  test("count-min: estimate is an upper bound that equals the true " +
      "count when no bucket collides") {
    val sk = Sketches.countMinSketch(corpus, "text", depth = 4, width = 256)
    val truth = corpus.select(explode(split(trim($"text"), "\\s+"))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("true_cnt"))
    val est = Sketches.cmEstimate(sk, truth, "token", depth = 4, width = 256)
      .join(truth, $"item" === $"token")
      .select($"token", $"true_cnt", $"est_cnt").collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("true_cnt"),
        r.toString) }
    // 17 distinct tokens into 4×256 counters: no collisions expected
    assert(est.forall(r =>
      r.getAs[Long]("est_cnt") == r.getAs[Long]("true_cnt")))
  }

  test("count-min: sketches of disjoint batches merge to the one-shot " +
      "sketch (counters add)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Int]("row"),
        r.getAs[Long]("bucket"), r.getAs[Long]("cnt"))).toSet
    val one = rows(Sketches.countMinSketch(corpus, "text", 4, 64))
    val merged = rows(Sketches.cmMerge(
      Sketches.countMinSketch(corpus.filter($"doc_id" <= 2), "text", 4, 64),
      Sketches.countMinSketch(corpus.filter($"doc_id" > 2), "text", 4, 64)))
    assert(merged == one && one.nonEmpty)
  }

  test("bloom: no false negatives; a saturated filter shows false " +
      "positives but never drops a member") {
    val members = (0 until 40).map(i => s"member_$i").toDF("item")
    val probes = ((0 until 40).map(i => s"member_$i") ++
      (0 until 200).map(i => s"absent_$i")).toDF("item")
    // roomy filter: members all hit, absent items essentially never
    val roomy = Sketches.bloomBuild(members, "item", kHashes = 3,
      mBits = 65536)
    val rm = Sketches.bloomMightContain(roomy, probes, "item", 3, 65536)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert((0 until 40).forall(i => rm(s"member_$i")))
    // tiny filter (64 bits, 40×3 insertions): saturation forces false
    // positives — but membership still never misses
    val tiny = Sketches.bloomBuild(members, "item", kHashes = 3,
      mBits = 64)
    val tm = Sketches.bloomMightContain(tiny, probes, "item", 3, 64)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert((0 until 40).forall(i => tm(s"member_$i")))
    assert((0 until 200).exists(i => tm(s"absent_$i")))
  }

  test("bloom: merging disjoint batches ORs to the one-shot bit set; " +
      "persisted layers fold to the same positions") {
    def pos(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    val items = (0 until 60).map(i => s"it_$i").toDF("item")
    val one = pos(Sketches.bloomBuild(items, "item", 4, 1024))
    val merged = pos(Sketches.bloomMerge(
      Sketches.bloomBuild(items.filter(length($"item") === 4), "item", 4, 1024),
      Sketches.bloomBuild(items.filter(length($"item") =!= 4), "item", 4, 1024)))
    assert(merged == one && one.nonEmpty)
    val idx = java.nio.file.Files.createTempDirectory("bloom_spec").toString
    Sketches.bloomAppend(items.filter(length($"item") === 4), "item",
      4, 1024, idx, 1L)
    Sketches.bloomAppend(items.filter(length($"item") =!= 4), "item",
      4, 1024, idx, 2L)
    assert(pos(Sketches.bloomFromIndex(spark, idx)) == one)
  }

  test("bloom decontamination: per-doc hits dominate the exact check " +
      "(flag_bloom superset of flag_exact), empty docs score zero") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),          // = benchmark doc: full hit
      (2L, "w1 w2 w3 x1 x2 x3 x4"),       // partial overlap
      (3L, "y1 y2 y3 y4 y5"),             // clean
      (4L, "z1 z2")                       // too short: zero shingles
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "w1 w2 w3 w4 w5 w6")).toDF("doc_id", "text")
    val bl = TextAnalysis.bloomDecontaminate(docs, bench, "doc_id",
        "text", "text", shingleN = 3, kHashes = 3, mBits = 65536,
        threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_bloom"), r.getAs[Boolean]("flagged"))).toMap
    val exact = TextAnalysis.decontaminate(docs, bench, "doc_id",
        "text", "text", shingleN = 3, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_overlap"),
        r.getAs[Boolean]("contaminated"))).toMap
    // no false negatives: bloom hit count >= exact overlap, doc-wise
    docs.collect().map(_.getLong(0)).foreach { id =>
      assert(bl(id)._2 >= exact(id)._1, s"doc $id")
      assert(!exact(id)._2 || bl(id)._3, s"doc $id flag")
    }
    assert(bl(1L) == ((4L, 4L, true)))
    assert(bl(4L) == ((0L, 0L, false)))
    assert(bl(3L)._2 == 0L) // roomy filter: clean doc stays clean
  }

  test("heavy hitters: skewed stream recovers the true top-k; " +
      "estimates never undercount") {
    // zipf-ish: hot_0 x 64, hot_1 x 32, ..., plus a 40-token tail
    val docs = ((0 until 4).flatMap(i =>
      Seq.fill(64 >> i)(s"hot_$i")) ++
      (0 until 40).map(i => s"tail_$i"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val hh = Sketches.heavyHitters(docs, "text", c = 8, k = 4,
        depth = 4, width = 4096)
      .orderBy($"rank").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    // roomy sketch: the four hot tokens in true order
    assert(hh.map(_._1).toSeq ==
      Seq("hot_0", "hot_1", "hot_2", "hot_3"))
    val truth = Map("hot_0" -> 64L, "hot_1" -> 32L, "hot_2" -> 16L,
      "hot_3" -> 8L)
    hh.foreach { case (t, est) => assert(est >= truth(t), t) }
  }

  test("heavy hitters: a batch-local heavy item survives the fold " +
      "(candidate union), and roomy C makes folded == one-shot") {
    // batch 1 (even ids): 'burst' dominates; batch 2 (odd ids): noise
    // crowds it out of ANY global-per-batch count — but it was top-C
    // of batch 1, so it stays a candidate in the folded index
    val docs = (Seq.fill(10)("burst") ++ (0 until 6).map(i => s"a_$i"))
      .zipWithIndex.map { case (t, i) => (i * 2L, t) } ++
      (0 until 30).map(i => (i * 2 + 1L, s"noise_${i % 10}"))
    val df = docs.toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("hh_spec")
      .toString
    Sketches.heavyHittersAppend(df.filter($"doc_id" % 2 === 0), "text",
      c = 4, depth = 4, width = 4096, idx, 1L)
    Sketches.heavyHittersAppend(df.filter($"doc_id" % 2 === 1), "text",
      c = 4, depth = 4, width = 4096, idx, 2L)
    val folded = Sketches.heavyHittersFromIndex(spark, idx, k = 3,
        depth = 4, width = 4096)
      .orderBy($"rank").collect().map(r => r.getString(1))
    assert(folded.head == "burst", folded.toSeq)
    // roomy C (>= vocab of each batch): folded == one-shot verbatim
    val idx2 = java.nio.file.Files.createTempDirectory("hh_spec2")
      .toString
    Sketches.heavyHittersAppend(df.filter($"doc_id" % 2 === 0), "text",
      c = 64, depth = 4, width = 4096, idx2, 1L)
    Sketches.heavyHittersAppend(df.filter($"doc_id" % 2 === 1), "text",
      c = 64, depth = 4, width = 4096, idx2, 2L)
    val a = Sketches.heavyHittersFromIndex(spark, idx2, k = 5,
      depth = 4, width = 4096).orderBy($"rank").collect().toSeq
    val b = Sketches.heavyHitters(df, "text", c = 64, k = 5,
      depth = 4, width = 4096).orderBy($"rank").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("contrastiveTriples: near-dup positives, ring negatives never " +
      "equal anchor or positive, fully deterministic") {
    import graft.operators.Embed
    // docs 1/2 are identical — signatures equal, every band collides,
    // so the positive pair survives ANY seed; 3-6 are distinct filler
    // so the ring has room
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four"),
      (4L, "five six seven eight"),
      (5L, "nine ten eleven twelve"),
      (6L, "thirteen fourteen fifteen sixteen")
    ).toDF("doc_id", "text")
    def run() = Embed.contrastiveTriples(docs, "doc_id", "text",
        shingleN = 2, numPerm = 64, bands = 8, estThreshold = 0.25,
        maxBucketSize = 100)
      .orderBy($"anchor", $"positive").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val out = run()
    assert(out.nonEmpty)
    assert(out.exists(t => t._1 == 1L && t._2 == 2L))
    out.foreach { case (a, p, n) =>
      assert(n != a && n != p, s"($a, $p, $n)")
    }
    assert(run().toSeq == out.toSeq) // no RNG anywhere
    // degenerate 2-doc corpus: the only possible negative IS the
    // anchor — such triples are dropped, not emitted
    val two = docs.filter($"doc_id" <= 2L)
    assert(Embed.contrastiveTriples(two, "doc_id", "text",
      shingleN = 2, numPerm = 64, bands = 8, estThreshold = 0.25,
      maxBucketSize = 100).count() == 0L)
  }

  test("profile: per-column nulls/min/max exact, distinct exact below " +
      "KMV saturation") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"),
      (3L, null), (3L, "b")).toDF("id", "s")
    val p = graft.operators.Profile.profile(df, Seq("id", "s"), kmvK = 16)
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_null"), r.getAs[String]("min_v"),
        r.getAs[String]("max_v"), r.getAs[Long]("est_distinct"))).toMap
    assert(p("id") == ((4L, 0L, "1", "3", 3L)))
    assert(p("s") == ((4L, 1L, "a", "b", 2L)))
  }

  test("hashEmbed: bag-of-words cosine geometry — similar docs close, " +
      "disjoint docs near-orthogonal; deterministic across runs") {
    import graft.functions.GraftFunctions.cosineSim
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat today"), // near-dup of 1
      (3L, "völlig andere wörter überall hier")) // disjoint vocab
      .toDF("doc_id", "text")
    val e = graft.operators.Embed.hashEmbed(docs, "doc_id", "text", 64)
    assert(e.select(size($"emb")).distinct().head().getInt(0) == 64)
    val vecs = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (vecs(a), vecs(b))
      val dot = x.zip(y).map { case (p, q) => p * q }.sum
      dot / (math.sqrt(x.map(p => p * p).sum) *
        math.sqrt(y.map(p => p * p).sum))
    }
    assert(cos(1L, 2L) > 0.8, cos(1L, 2L).toString)
    assert(math.abs(cos(1L, 3L)) < 0.5, cos(1L, 3L).toString)
    // deterministic: a second invocation is bit-identical
    val e2 = graft.operators.Embed.hashEmbed(docs, "doc_id", "text", 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(e2 == vecs)
  }

  test("saltedJoin: result multiset identical to the plain join, at " +
      "every salt count incl. 1") {
    val big = Seq((1L, 10), (1L, 11), (1L, 12), (2L, 20), (3L, 30))
      .toDF("k", "payload")
    val small = Seq((1L, "a"), (1L, "b"), (2L, "c"))
      .toDF("k", "dim") // key 1 has TWO small rows; key 3 no match
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "dim").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val plain = rows(big.join(small, Seq("k")))
    for (salts <- Seq(1, 4, 16)) {
      val salted = rows(graft.operators.SkewJoin.saltedJoin(
        big, small, "k", col("payload"), salts))
      assert(salted == plain && plain.nonEmpty, s"salts=$salts")
    }
  }

  test("persisted sketch index: two-batch folds estimate EXACTLY like " +
      "the one-shot sketch (CM counters add; KMV minima min-union)") {
    val docs = Seq((1L, "s1", "a b c a"), (2L, "s1", "b d e f g"),
        (3L, "s2", "x y z"), (4L, "s2", "x q r s t u v w"))
      .toDF("doc_id", "src", "text")
    val b1 = docs.filter($"doc_id" % 2 === 0)
    val b2 = docs.filter($"doc_id" % 2 === 1)
    // CM: fold two layers, estimate == one-shot
    val cmIdx = java.nio.file.Files.createTempDirectory("cm_idx").toString
    Sketches.cmSketchAppend(b1, "text", 3, 16, cmIdx, 1L)
    Sketches.cmSketchAppend(b2, "text", 3, 16, cmIdx, 2L)
    val items = docs.select(explode(split(trim($"text"), "\\s+"))
      .as("token")).distinct()
    def est(sk: org.apache.spark.sql.DataFrame) =
      Sketches.cmEstimate(sk, items, "token", 3, 16)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = est(Sketches.countMinSketch(docs, "text", 3, 16))
    assert(est(Sketches.cmFromIndex(spark, cmIdx)) == oneShot)
    // an item in BOTH batches is counted additively
    assert(oneShot("x") >= 2L)
    // KMV: min-union of per-batch minima == one-shot (k small enough
    // to saturate on s2, exercising the estimate branch too)
    val toks = docs.select($"src", explode(split(trim($"text"), "\\s+"))
      .as("token"))
    val kmvIdx = java.nio.file.Files.createTempDirectory("kmv_idx").toString
    Sketches.kmvAppend(toks.filter($"src" === "s1"), "src", "token", 4,
      kmvIdx, 1L)
    // s2 tokens split across layers, with overlap ("x" in both)
    Sketches.kmvAppend(toks.filter($"src" === "s2" && $"doc_id" === 3),
      "src", "token", 4, kmvIdx, 2L)
    Sketches.kmvAppend(toks.filter($"src" === "s2" && $"doc_id" === 4),
      "src", "token", 4, kmvIdx, 3L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(rows(Sketches.kmvFromIndex(spark, kmvIdx, 4)) ==
      rows(Sketches.kmvDistinct(toks, "src", "token", 4)))
  }

  test("persisted profile index: folded layers equal the one-shot " +
      "profile, including a batch where a column is all-null") {
    val docs = Seq((1L, Some("en"), "w1"), (2L, None, "w2"),
        (3L, Some("fr"), "w1"), (4L, None, "w3"))
      .toDF("id", "lang", "src")
    val idx = java.nio.file.Files.createTempDirectory("prof_idx").toString
    // batch 2 has only null langs — its kmv layer has no lang rows
    graft.operators.Profile.profileAppend(
      docs.filter($"id" <= 2), Seq("id", "lang", "src"), 64, idx, 1L)
    graft.operators.Profile.profileAppend(
      docs.filter($"id" > 2), Seq("id", "lang", "src"), 64, idx, 2L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getLong(5))).toSet
    val oneShot = rows(graft.operators.Profile.profile(
      docs, Seq("id", "lang", "src"), 64))
    assert(rows(graft.operators.Profile.profileFromIndex(spark, idx, 64))
      == oneShot)
    val byCol = oneShot.map(t => t._1 -> t).toMap
    assert(byCol("lang")._3 == 2L && byCol("lang")._6 == 2L)
    assert(byCol("src")._6 == 3L) // w1 deduped across batches
  }

  test("lmScoreIncremental: folded model + batched scoring equal the " +
      "one-shot self-trained lmQualityScore; unseen tokens score 0 " +
      "but count against a frozen model") {
    val docs = Seq((1L, "the the cat"), (2L, "the dog"), (3L, "rare"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("lm_idx").toString
    graft.operators.TextAnalysis.lmIndexAppend(docs.filter($"doc_id" <= 2), "text", idx, 1L)
    graft.operators.TextAnalysis.lmIndexAppend(docs.filter($"doc_id" > 2), "text", idx, 2L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4))).toSet
    val oneShot = rows(graft.operators.TextAnalysis.lmQualityScore(
      docs, "doc_id", "text", 0.2, 0.1))
    val folded = rows(
      graft.operators.TextAnalysis.lmScoreIncremental(spark, idx,
          docs.filter($"doc_id" % 2 === 1), "doc_id", "text", 0.2, 0.1)
        .unionByName(graft.operators.TextAnalysis.lmScoreIncremental(spark, idx,
          docs.filter($"doc_id" % 2 === 0), "doc_id", "text", 0.2, 0.1)))
    assert(folded == oneShot && oneShot.nonEmpty)
    // frozen-model path: a doc with a token the model never saw
    val unseen = graft.operators.TextAnalysis.lmScoreIncremental(spark, idx,
        Seq((9L, "the martian")).toDF("doc_id", "text"),
        "doc_id", "text", 0.2, 0.1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    // n_tokens counts both words; freq_sum only the seen one (the=3)
    assert(unseen == ((2L, 3L)))
  }

  test("persisted histogram index: folded quantiles equal the one-shot " +
      "groupQuantiles, with tied values split across batches") {
    // value 2 appears in BOTH batches — the histogram must merge its
    // counts before the rank arithmetic
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 2L, 1L),
        ("a", 3L, 2L), ("a", 9L, 1L), ("b", 5L, 1L))
      .toDF("g", "v", "batch")
    val idx = java.nio.file.Files.createTempDirectory("hist_idx").toString
    graft.operators.Profile.histAppend(
      df.filter($"batch" === 1), "g", "v", idx, 1L)
    graft.operators.Profile.histAppend(
      df.filter($"batch" === 2), "g", "v", idx, 2L)
    val qs = Seq(2000L, 5000L, 10000L)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getAs[Long]("q10k"),
        r.getAs[Long]("value"))).toSet
    assert(rows(graft.operators.Profile.groupQuantilesFromIndex(
        spark, idx, qs)) ==
      rows(graft.operators.Profile.groupQuantiles(df, "g", "v", qs)))
  }

  test("groupQuantiles: nearest-rank values on a hand corpus") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 10L)).toDF("g", "v")
    val q = graft.operators.Profile.groupQuantiles(df, "g", "v",
        q10k = Seq(5000L, 10000L))
      .collect().map(r => (r.getString(0), r.getAs[Long]("q10k"),
        r.getAs[Long]("value"))).toSet
    // a: n=4 → ceil(0.5·4)=2 → 2; ceil(1.0·4)=4 → 4; b singleton → 10
    assert(q == Set(("a", 5000L, 2L), ("a", 10000L, 4L),
      ("b", 5000L, 10L), ("b", 10000L, 10L)))
  }

  test("groupQuantiles: null values are excluded — never returned as " +
      "quantile 'values', never shifting real values' ranks") {
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(2L)),
        ("a", None), ("a", Some(3L)), ("a", Some(4L)), ("b", None))
      .toDF("g", "v")
    val q = graft.operators.Profile.groupQuantiles(df, "g", "v",
        q10k = Seq(2500L, 10000L))
      .collect().map(r => (r.getString(0), r.getAs[Long]("q10k"),
        r.getAs[Long]("value"))).toSet
    // a: non-null multiset {1,2,3,4} → ceil(.25·4)=1 → 1; max → 4.
    // nulls-counted-in-n would give n=6 → ceil(.25·6)=2 → 2 and a
    // null max; all-null group b vanishes rather than emitting nulls
    assert(q == Set(("a", 2500L, 1L), ("a", 10000L, 4L)))
  }

  test("hashEmbed: null-text / tokenless docs come back as ZERO " +
      "vectors, not silently dropped") {
    val docs = Seq((1L, "the cat"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val e = graft.operators.Embed.hashEmbed(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(e.keySet == Set(1L, 2L))
    assert(e(2L) == Seq.fill(8)(0.0))
    assert(e(1L).map(math.abs).sum > 0)
  }

  test("KMV: exact below saturation; plausible at saturation; hot " +
      "groups rank through WindowGroupLimit") {
    val toks = corpus.select($"src",
      explode(split(trim($"text"), "\\s+")).as("token"))
    // k larger than any group's distinct count → exact
    val exact = Sketches.kmvDistinct(toks, "src", "token", k = 64)
      .collect().map(r => r.getAs[String]("grp") ->
        r.getAs[Long]("est_distinct")).toMap
    val truth = toks.distinct().groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact == truth)
    // saturated: a 1000-distinct synthetic group, k=32 → within 30%
    val big = spark.range(1000)
      .select(lit("g").as("src"), concat(lit("tok"), $"id").as("token"))
    val est = Sketches.kmvDistinct(big, "src", "token", k = 32)
      .head().getAs[Long]("est_distinct")
    assert(est > 700 && est < 1300, s"est=$est")
    // scale lock: the k-minima come from a pushed-down partial top-k
    val p = Sketches.kmvDistinct(toks, "src", "token", k = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }
}
