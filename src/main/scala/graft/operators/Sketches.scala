package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Deterministic mergeable sketches for corpus statistics at 100 TB —
  * the summaries a training-data pipeline consults without paying a
  * full-vocabulary aggregation (frequent n-grams, approximate distinct
  * counts per domain).
  *
  * Everything here is built from the portable char poly-hash, so every
  * sketch (and every estimate read off it) is bit-replayable by the
  * ANSI-SQL oracle — unlike `approx_count_distinct`/datasketches
  * whose binary registers are engine-specific.
  *
  * Scale shape: a sketch IS a pre-reduced aggregate — the exploded
  * stream collapses map-side onto the sketch's fixed-size key space
  * (depth×width or k rows), so the one exchange carries bounded rows
  * per task no matter the corpus size. Sketches of disjoint batches
  * merge by addition (CM) / min-union (KMV), which is what makes them
  * streamable.
  */
object Sketches {

  /** Per-row polynomial multipliers. A row-SALT (hashing "i|t") would
    * NOT give independent rows: for same-length tokens the prefix
    * contributes the same additive term in every row, so two tokens
    * colliding in one row collide in all of them. Distinct polynomial
    * bases give genuinely different hash functions from the same
    * portable family, each replayable in SQL.
    */
  private[operators] val RowMults =
    Seq(31L, 37L, 41L, 43L, 47L, 53L, 59L, 61L)

  /** Row bucket hash: h_i(t) = polyhash_{mult_i}(t) mod width. */
  private[operators] def bucketOf(t: Column, row: Int, width: Int): Column =
    pmod(charPolyHash(t, RowMults(row)), lit(width.toLong))

  /** Count-min sketch (Cormode & Muthukrishnan 2005) over the corpus
    * token stream: d hash rows × w counters; every token occurrence
    * increments one counter per row. Returns the sketch TABLE
    * (row, bucket, cnt) — at most d·w rows, the at-rest artifact.
    * Estimates are upper bounds: est(t) = min_i cnt[i][h_i(t)] ≥
    * true(t), with overestimate ≤ εN at the usual (ε, δ) for
    * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
    */
  def countMinSketch(docs: DataFrame, textCol: String, depth: Int,
                     width: Int): DataFrame = {
    require(depth <= RowMults.length, s"depth <= ${RowMults.length}")
    docs.select(explode(tokens(col(textCol))).as("t"))
      .select(posexplode(array((0 until depth)
        .map(i => bucketOf(col("t"), i, width)): _*))
        .as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate a set of items against a CM sketch: each item
    * probes its d counters (missing counter = 0) and takes the min.
    * The sketch side broadcasts (≤ d·w rows by construction); the
    * items side can be any size. Output: (item, est_cnt).
    */
  def cmEstimate(sketch: DataFrame, items: DataFrame, itemCol: String,
                 depth: Int, width: Int): DataFrame = {
    require(depth <= RowMults.length, s"depth <= ${RowMults.length}")
    items.select(col(itemCol).as("item"),
        posexplode(array((0 until depth)
          .map(i => bucketOf(col(itemCol), i, width)): _*))
          .as(Seq("row", "bucket")))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Merge CM sketches of disjoint batches: counters add. This is
    * what makes the sketch streamable — per-batch sketches fold into
    * the running one without revisiting any batch.
    */
  def cmMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row", "bucket")
      .agg(sum("cnt").as("cnt"))

  // ------------------------------------------------ persisted sketch index

  /** Append one batch's CM sketch as a layer of a PERSISTED sketch
    * index — the corpus-stats state a continuous-ingest pipeline holds
    * (the [[graft.operators.TextAnalysis.buildBenchmarkIndex]] /
    * mixIndexAppend pattern, for sketches): each fold costs O(batch)
    * and writes ≤ depth·width skinny rows; nothing rescans earlier
    * batches, and the at-rest index is bounded by layers × depth ×
    * width regardless of corpus size. Because counters add
    * ([[cmMerge]]), estimating from the folded layers equals the
    * one-shot sketch of the union — q124 proves it against q108's
    * verbatim oracle.
    */
  def cmSketchAppend(batch: DataFrame, textCol: String, depth: Int,
                     width: Int, indexDir: String, batchId: Long): Unit =
    countMinSketch(batch, textCol, depth, width)
      .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")

  /** The merged at-rest sketch: layer counters summed per (row,
    * bucket) — ≤ depth·width result rows, broadcastable to
    * [[cmEstimate]] like the one-shot sketch.
    */
  def cmFromIndex(spark: org.apache.spark.sql.SparkSession,
                  indexDir: String): DataFrame =
    spark.read.parquet(indexDir).groupBy("row", "bucket")
      .agg(sum("cnt").as("cnt"))

  /** Append one batch's per-group KMV minima as a layer: the k
    * smallest distinct item hashes per group THIS batch contributes.
    * KMV merges by min-union (re-rank the unioned minima, keep k):
    * every global k-minimum is a distinct hash in some batch where it
    * ranks at most its global rank ≤ k, so the union of per-batch
    * minima CONTAINS the global minima and [[kmvFromIndex]] recovers
    * the one-shot [[kmvDistinct]] result exactly — q125 proves it
    * against q109's verbatim oracle. Layer size is bounded by
    * groups × k rows.
    */
  def kmvAppend(batch: DataFrame, groupCol: String, itemCol: String,
                k: Int, indexDir: String, batchId: Long): Unit =
    kmvMinima(batch, groupCol, itemCol, k)
      .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")

  /** Estimate from the persisted minima layers: distinct the unioned
    * (grp, h) minima (the same item in two batches contributes one
    * hash), re-rank, keep k, estimate — identical arithmetic to the
    * one-shot path.
    */
  def kmvFromIndex(spark: org.apache.spark.sql.SparkSession,
                   indexDir: String, k: Int): DataFrame =
    kmvEstimate(spark.read.parquet(indexDir).select("grp", "h"), k)

  // --------------------------------------------------- Bloom membership

  /** Bloom filter (Bloom 1970) over a set of items: k independent
    * poly-hash rows each set one of m bit positions per item; a probe
    * is "maybe present" iff ALL k of its positions are set — no false
    * negatives, false positives at ~(1-e^{-kn/m})^k. Completes the
    * sketch family: CM answers "how often", KMV "how many distinct",
    * Bloom "have we seen it" — the membership gate a 100 TB
    * decontamination / revisit check consults in O(1) per probe with
    * state BOUNDED BY m regardless of how many items were inserted
    * (unlike the exact hash index, which grows with the benchmark).
    *
    * Representation: the SET of set-bit positions as a skinny
    * (pos: long) table, ≤ m rows — the relational form of the bit
    * array. It broadcasts to probes, merges with other blooms by plain
    * union-distinct (bitwise OR), and is bit-replayable by the ANSI
    * oracle; a deployment squeezing the last bytes would pack it into
    * long words, but at m = 64k the table IS ≤ 64k skinny rows.
    *
    * Scale shape: one explode → fixed-size distinct. The k hash rows
    * reuse [[RowMults]] (genuinely independent functions, same
    * portable family as CM — see the RowMults note).
    */
  def bloomBuild(items: DataFrame, itemCol: String, kHashes: Int,
                 mBits: Int): DataFrame = {
    require(kHashes <= RowMults.length, s"kHashes <= ${RowMults.length}")
    items.select(explode(array((0 until kHashes)
        .map(i => bucketOf(col(itemCol), i, mBits)): _*)).as("pos"))
      .distinct()
  }

  /** Probe items against a bloom: (item, might_contain) — true iff all
    * k positions are set. The bloom side broadcasts (≤ m rows by
    * construction); the probe side can be any size and never shuffles
    * except the final per-item regroup (pre-reduced, k rows/item).
    */
  def bloomMightContain(bloom: DataFrame, items: DataFrame,
                        itemCol: String, kHashes: Int,
                        mBits: Int): DataFrame = {
    require(kHashes <= RowMults.length, s"kHashes <= ${RowMults.length}")
    items.select(col(itemCol).as("item"),
        explode(array((0 until kHashes)
          .map(i => bucketOf(col(itemCol), i, mBits)): _*)).as("pos"))
      .join(broadcast(bloom.withColumn("__set", lit(1))), Seq("pos"), "left")
      .groupBy("item")
      .agg((count(col("__set")) === kHashes).as("might_contain"))
  }

  /** Merge blooms built with the same (k, m): set-bit union — exactly
    * the bit array's OR, so folding disjoint batches equals the
    * one-shot build (no approximation in the merge itself).
    */
  def bloomMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  /** Append one batch's bloom as a layer of a persisted membership
    * index (the [[cmSketchAppend]] pattern): O(batch) per fold, layer
    * ≤ m skinny rows, nothing rescans earlier batches.
    */
  def bloomAppend(batch: DataFrame, itemCol: String, kHashes: Int,
                  mBits: Int, indexDir: String, batchId: Long): Unit =
    bloomBuild(batch, itemCol, kHashes, mBits)
      .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")

  /** The merged at-rest bloom: distinct positions across layers — the
    * OR of the per-batch bit arrays, ≤ m rows, broadcastable to
    * [[bloomMightContain]] like a one-shot build.
    */
  def bloomFromIndex(spark: org.apache.spark.sql.SparkSession,
                     indexDir: String): DataFrame =
    spark.read.parquet(indexDir).select("pos").distinct()

  // ------------------------------------------- heavy hitters (frequent items)

  /** Top-k most frequent tokens with BOUNDED state — the mergeable
    * candidate-tracking pattern behind SpaceSaving / Misra-Gries
    * (Metwally et al. 2005; Misra & Gries 1982), cast onto the CM
    * sketch: per batch, keep the EXACT top-C tokens of that batch
    * (the candidates) and fold the batch's counts into the CM index;
    * at read time, probe the merged sketch for every candidate ever
    * seen and keep the top-k by estimated count. State per layer is
    * C candidate rows + d·w counters — never vocabulary-sized, which
    * is the point: the exact global top-k needs a vocabulary-scale
    * aggregation + ranking every time it's asked, this answers from
    * bounded at-rest state under continuous ingest.
    *
    * Recall guarantee (the standard one): an item is a candidate iff
    * it ranks top-C in AT LEAST ONE batch, and an item with global
    * share > 1/C must have share > 1/C in some batch (pigeonhole), so
    * true heavy hitters always make the candidate set. CM estimates
    * are upper bounds (overestimate ≤ εN w.h.p.), so collisions can
    * inflate a candidate's rank but never hide it.
    *
    * Scale shape: the per-batch top-C is orderBy+limit ⇒
    * TakeOrderedAndProject — per-partition partial top-C, a C-row
    * sliver merged on the driver, never a single-task full sort of
    * the vocabulary; estimation broadcasts the ≤ d·w sketch.
    */
  def topCandidates(batch: DataFrame, textCol: String,
                    c: Int): DataFrame =
    batch.select(explode(tokens(col(textCol))).as("item"))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item")).limit(c)
      .select("item")

  /** One-shot heavy hitters: candidates and sketch from the same
    * stream. Output (rank, item, est_cnt); ties break on item.
    */
  def heavyHitters(docs: DataFrame, textCol: String, c: Int, k: Int,
                   depth: Int, width: Int): DataFrame =
    hhTopK(cmEstimate(countMinSketch(docs, textCol, depth, width),
      topCandidates(docs, textCol, c), "item", depth, width), k)

  /** Append one batch's heavy-hitter state (candidate layer + CM
    * layer) — O(batch) per fold, the [[cmSketchAppend]] pattern.
    */
  def heavyHittersAppend(batch: DataFrame, textCol: String, c: Int,
                         depth: Int, width: Int, indexDir: String,
                         batchId: Long): Unit = {
    cmSketchAppend(batch, textCol, depth, width, s"$indexDir/cm",
      batchId)
    topCandidates(batch, textCol, c)
      .write.mode("overwrite").parquet(s"$indexDir/cand/batch=$batchId")
  }

  /** Heavy hitters from the at-rest index: the union of per-batch
    * candidates probed against the layer-summed sketch (which equals
    * the one-shot sketch of the union — counters add). With C at
    * least the batch vocabulary this is EXACTLY the one-shot result;
    * in general the candidate set is the union of per-batch top-Cs
    * (the recall guarantee above).
    */
  def heavyHittersFromIndex(spark: org.apache.spark.sql.SparkSession,
                            indexDir: String, k: Int, depth: Int,
                            width: Int): DataFrame =
    hhTopK(cmEstimate(cmFromIndex(spark, s"$indexDir/cm"),
      spark.read.parquet(s"$indexDir/cand").select("item").distinct(),
      "item", depth, width), k)

  /** Rank the estimated candidates down to k: TakeOrdered the ≤
    * |candidates| estimate rows, then number the k survivors.
    */
  private def hhTopK(est: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("est_cnt").desc, col("item"))
    est.orderBy(col("est_cnt").desc, col("item")).limit(k)
      .withColumn("rank", row_number().over(w))
      .select(col("rank").cast("long").as("rank"), col("item"),
        col("est_cnt"))
  }

  /** KMV (k-minimum-values) distinct-count sketch per group: keep the
    * k smallest hash values of the group's distinct items; estimate
    * |distinct| as (k-1)·M div h_(k) when the sketch saturates
    * (M = hash-space size, h_(k) = k-th minimum), else the exact kept
    * count (Bar-Yossef et al. 2002). Output:
    * (group, n_kept, kth_min, est_distinct) — exact integer
    * arithmetic, oracle-replayable; the polyhash's modulus is the
    * hash space (M = 2147483647).
    *
    * Scale shape: distinct pre-reduces map-side onto (group, hash);
    * the per-group k-minima come from a LITERAL-bounded rank window —
    * WindowGroupLimit pushes the partial top-k before the exchange,
    * so a hot group never full-sorts its distinct stream in one task.
    * Never an unbounded per-group collect. Sketches of disjoint
    * batches merge by min-union (re-rank the unioned minima).
    */
  def kmvDistinct(df: DataFrame, groupCol: String, itemCol: String,
                  k: Int): DataFrame =
    // the one-shot minima are exactly the k smallest distinct hashes
    // already — finalize with a plain aggregate, no second rank window
    kmvFinalize(kmvMinima(df, groupCol, itemCol, k), k)

  /** The k smallest distinct item hashes per group — the sketch's
    * mergeable state: (grp, h) rows, ≤ k per group.
    */
  private[operators] def kmvMinima(df: DataFrame, groupCol: String,
                                   itemCol: String, k: Int): DataFrame = {
    require(k >= 2, "kmvDistinct needs k >= 2") // also: k-th smallest
    // distinct non-negative hash is then >= 1, so the division below
    // cannot hit zero
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("h"))
    // salt suffix lengthens the hashed string so the poly-hash wraps
    // the modulus: the raw hash of a short token is bounded by
    // 31^len — far from uniform over [0, M), which would inflate the
    // estimate by orders of magnitude (measured: 4794 for a true 31)
    df.select(col(groupCol).as("grp"),
        charPolyHash(concat(col(itemCol), lit("|kmv-salt"))).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("grp", "h")
  }

  /** Re-rank unioned multi-layer minima (possibly > k per group,
    * possibly duplicated across layers) back down to the k smallest,
    * then finalize — estimates identically to single-shot minima.
    */
  private[operators] def kmvEstimate(minima: DataFrame,
                                     k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("h"))
    kmvFinalize(minima.select(col("grp"), col("h")).distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("grp", "h"), k)
  }

  /** (grp, n_kept, kth_min, est_distinct) from EXACT minima rows
    * (≤ k distinct per group): one plain aggregate.
    */
  private def kmvFinalize(minima: DataFrame, k: Int): DataFrame = {
    val M = 2147483647L
    minima.groupBy("grp")
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_min"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"((${k - 1}L * ${M}L) div kth_min)")))
  }
}
