package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.tokens
import graft.functions.UnigramOps

/** Unigram-LM tokenizer (the SentencePiece family — Kudo 2018),
  * completing the repo's tokenizer square next to char BPE, byte BPE
  * and WordPiece: the vocabulary is a SCORED piece table and encoding
  * is the Viterbi decode — the segmentation maximizing the product of
  * piece PROBABILITIES (integer scores compared under a common-length
  * normalization, [[graft.functions.UnigramApply]]) — not a greedy or
  * merge-order replay.
  *
  * Training compromise (the [[WordPiece]] discipline, documented the
  * same way): the original trains piece scores by EM over corpus
  * likelihood — floats end to end. This repo's oracle discipline is
  * exact arithmetic, so the table is FREQUENCY-mined (all substrings
  * of corpus words, every single char kept for coverage, top-N
  * multi-char by exact count) and each piece's score is the
  * 10⁴-scaled integer probability `s10k = cnt·10⁴ div total + 1`
  * (total = the selected vocabulary's count mass; the +1 floor is a
  * documented smoothing keeping products positive). The ENCODE
  * semantics — max-product Viterbi with exact tie-breaks — are the
  * real algorithm, replayed by an oracle that enumerates every
  * segmentation (bounded by maxInputChars) in HUGEINT arithmetic.
  */
object Unigram {

  /** Mine the piece table: every substring of every word (length ≤
    * `maxPieceLen`, NO positional marking — unigram pieces are
    * position-free, unlike WordPiece's '##') weighted by word count;
    * all single-char pieces kept (coverage: every word over the
    * corpus alphabet segments without `[UNK]`) plus the top
    * `topPieces` multi-char by (cnt DESC, piece ASC). The literal
    * `[UNK]` is filtered — reserved, the [[WordPiece.mineVocab]]
    * contract. Output: (piece, cnt).
    *
    * Scale shape: ONE corpus scan (explode → pre-reduced word-count
    * aggregate); candidate generation runs over the vocab-sized word
    * table × O(len · maxPieceLen) pieces — the [[WordPiece.mineVocab]]
    * split; the top-N cut is one distributed sort-limit.
    */
  def mineVocab(docs: DataFrame, textCol: String, maxPieceLen: Int,
                topPieces: Int): DataFrame = {
    // round 16 (guide §2.3): word occurrences pre-reduce INSIDE the
    // row (TokenTf) — the WordPiece.mineVocab change, same exact sums
    val words = docs.select(
        explode(graft.functions.TokenTf.tokenTf(col(textCol))).as("p"))
      .filter(length(col("p.token")) > 0)
      .groupBy(col("p.token").as("tok"))
      .agg(sum(col("p.tf")).as("wc"))
    val pieces = words
      .select(col("tok"), col("wc"),
        explode(sequence(lit(0), length(col("tok")) - 1)).as("p"))
      .select(col("tok"), col("wc"), col("p"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("tok")) - col("p"))))
          .as("l"))
      .select(expr("substring(tok, p + 1, l)").as("piece"), col("wc"))
      .groupBy("piece").agg(sum(col("wc")).as("cnt"))
    val singles = pieces.filter(length(col("piece")) === 1)
    val multi = pieces.filter(length(col("piece")) > 1 &&
        col("piece") =!= graft.functions.UnigramApply.Unk)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(topPieces)
    singles.unionByName(multi)
  }

  /** Attach the 10⁴-scaled integer scores: s10k = cnt·10⁴ div
    * total + 1 over the SELECTED vocabulary's count mass — the score
    * is vocabulary-intrinsic, so a persisted (piece, cnt) artifact
    * re-derives identical scores ([[saveVocab]]/[[loadVocab]] round
    * trip is bit-exact). The total rides a broadcast 1-row aggregate.
    */
  def scores(vocab: DataFrame): DataFrame =
    vocab.crossJoin(
        broadcast(vocab.agg(sum(col("cnt")).as("__tot"))))
      .select(col("piece"), col("cnt"),
        expr("cnt * 10000 div __tot + 1").as("s10k"))

  /** Encode documents with a mined table: max-product Viterbi per
    * word via the native [[graft.functions.UnigramApplyBroadcast]].
    * `matchHorizon` MUST be the table's mining maxPieceLen (the
    * [[WordPiece.encode]] contract); words longer than
    * `maxInputChars` become `[UNK]` whole — and `maxInputChars`
    * also bounds the oracle's segmentation enumeration AND the
    * integer product (10001^n), so keep it ≤ 9 where a HUGEINT
    * replay is required.
    *
    * Output: (doc_id, pos, piece) — the tokenizer stream shape.
    */
  private def broadcastScores(docs: DataFrame, vocab: DataFrame,
      driverVocabLimit: Long)
      : org.apache.spark.broadcast.Broadcast[Array[(String, Long)]] = {
    val head = scores(vocab).select(col("piece"), col("s10k"))
      .limit(math.min(driverVocabLimit + 1, Int.MaxValue.toLong).toInt)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(head.length <= driverVocabLimit,
      s"piece table exceeds driverVocabLimit=$driverVocabLimit — a " +
        "unigram vocab is a tokenizer artifact, not corpus-sized; " +
        "mine with a smaller topPieces")
    docs.sparkSession.sparkContext.broadcast(head.sortBy(_._1))
  }

  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame, matchHorizon: Int, maxInputChars: Int,
             driverVocabLimit: Long = 4000000L): DataFrame = {
    val bc = broadcastScores(docs, vocab, driverVocabLimit)
    docs.select(col(idCol).as("doc_id"),
        posexplode(flatten(transform(
          filter(tokens(col(textCol)), t => length(t) > 0),
          w => UnigramOps.unigramApplyBc(w, bc, matchHorizon,
            maxInputChars)))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("piece"))
  }

  /** The ranked top-`nBest` segmentations per DISTINCT corpus word —
    * the listing form of subword regularization (Kudo 2018 §4):
    * training-time sampling draws from exactly this list, so the list
    * itself is the auditable artifact. Output: (tok, nbest_rank,
    * seq) — rank 1 is [[encode]]'s argmax by construction (same DP,
    * same total order); over-length words list the single `[UNK]`.
    *
    * Scale shape: one corpus scan to the distinct-word table (vocab-
    * sized), then a zero-Exchange per-word native expression —
    * per-position truncation keeps the DP O(len·horizon·nBest).
    */
  def nBest(docs: DataFrame, textCol: String, vocab: DataFrame,
            matchHorizon: Int, maxInputChars: Int, nBest: Int,
            driverVocabLimit: Long = 4000000L): DataFrame = {
    val bc = broadcastScores(docs, vocab, driverVocabLimit)
    docs.select(explode(filter(tokens(col(textCol)),
        t => length(t) > 0)).as("tok"))
      .distinct()
      .select(col("tok"), posexplode(UnigramOps.unigramNBestBc(
        col("tok"), bc, matchHorizon, maxInputChars, nBest)))
      .select(col("tok"), (col("pos") + 1).cast("long")
        .as("nbest_rank"), col("col").as("seq"))
  }

  /** SUBWORD-REGULARIZATION sampling encode: [[encode]]'s stream
    * shape, but each word takes a seeded draw among its top-`nBest`
    * segmentations instead of the argmax
    * ([[graft.functions.UnigramSampleBroadcast]] — deterministic per
    * (word, seed), different across seeds: the property the
    * regularizer needs, in oracle-replayable integers).
    */
  def encodeSampled(docs: DataFrame, idCol: String, textCol: String,
                    vocab: DataFrame, matchHorizon: Int,
                    maxInputChars: Int, nBestN: Int, seed: Long,
                    driverVocabLimit: Long = 4000000L): DataFrame = {
    val bc = broadcastScores(docs, vocab, driverVocabLimit)
    docs.select(col(idCol).as("doc_id"),
        posexplode(flatten(transform(
          filter(tokens(col(textCol)), t => length(t) > 0),
          w => UnigramOps.unigramSampleBc(w, bc, matchHorizon,
            maxInputChars, nBestN, seed)))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("piece"))
  }

  /** Stable piece→id mapping — (piece ASC) rank, vocabulary-intrinsic
    * (the [[WordPiece.vocabIds]] layout): ids never shift when the
    * same artifact encodes a different corpus — while the piece set is
    * FROZEN. Extending the vocabulary must go through
    * [[TokenizerArtifact.extendIds]] (this layout is its empty-prior
    * degenerate case): recomputing the rank after an insert renumbers
    * every later id and invalidates previously tokenized shards.
    * Vocabulary-sized single-partition window by construction.
    */
  def vocabIds(vocab: DataFrame): DataFrame =
    vocab.select(col("piece"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("piece"))) - 1).cast("long").as("piece_id"))

  /** [[encode]] to ids. `[UNK]` is never a mined piece (reserved in
    * [[mineVocab]]): it surfaces as id -1 via the left join — never
    * a silently dropped row (the [[WordPiece.encodeIds]] contract).
    */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                vocab: DataFrame, matchHorizon: Int,
                maxInputChars: Int): DataFrame =
    encodeIdsWith(docs, idCol, textCol, vocab, vocabIds(vocab),
      matchHorizon, maxInputChars)

  /** [[encodeIds]] with an EXPLICIT id table (an
    * [[TokenizerArtifact.extendIds]] allocation, or a loaded
    * artifact's ids) instead of the frozen rank layout — the encode
    * path of an extended vocabulary. Pieces in `ids` but not in
    * `vocab` (retired from the mining but id-retained) are harmless
    * to the left join; `[UNK]` is never in `ids` → reserved -1.
    */
  def encodeIdsWith(docs: DataFrame, idCol: String, textCol: String,
                    vocab: DataFrame, ids: DataFrame,
                    matchHorizon: Int, maxInputChars: Int): DataFrame =
    encode(docs, idCol, textCol, vocab, matchHorizon, maxInputChars)
      .join(broadcast(ids.select(col("piece"), col("piece_id"))),
        Seq("piece"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("piece_id"), lit(-1L)).as("piece_id"))

  /** Encode to ids from a PERSISTED artifact: pieces + meta + the
    * append-only id table all come from the artifact directory — the
    * full extended-vocabulary round trip.
    */
  def encodeIdsArtifact(spark: org.apache.spark.sql.SparkSession,
                        dir: String, docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val m = TokenizerArtifact.loadMeta(spark, dir)
    encodeIdsWith(docs, idCol, textCol, loadVocab(spark, dir),
      TokenizerArtifact.loadIds(spark, dir),
      matchHorizon = m.maxPieceLen, maxInputChars = m.maxInputChars)
  }

  /** Persist the mined table + its encode contract: the (piece, cnt)
    * parquet (scores are intrinsic — see [[scores]] — so no floats at
    * rest) PLUS the [[TokenizerArtifact.Meta]] row carrying the mining
    * maxPieceLen and maxInputChars, so a loaded artifact can never be
    * silently encoded with a different horizon than it was mined with.
    */
  def saveVocab(vocab: DataFrame, dir: String, maxPieceLen: Int,
                maxInputChars: Int): Unit =
    TokenizerArtifact.save(vocab, dir,
      TokenizerArtifact.Meta(maxPieceLen, maxInputChars))

  def loadVocab(spark: org.apache.spark.sql.SparkSession,
                dir: String): DataFrame =
    TokenizerArtifact.loadPieces(spark, dir)

  /** Encode with a PERSISTED artifact — matchHorizon/maxInputChars
    * come from the artifact's own meta row, never from the caller
    * (re-supplying them by convention is the silent-drift footgun the
    * meta table exists to close).
    */
  def encodeArtifact(spark: org.apache.spark.sql.SparkSession,
                     dir: String, docs: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val m = TokenizerArtifact.loadMeta(spark, dir)
    encode(docs, idCol, textCol, loadVocab(spark, dir),
      matchHorizon = m.maxPieceLen, maxInputChars = m.maxInputChars)
  }
}
