package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.tokens
import graft.functions.WordPieceOps

/** WordPiece tokenizer (the BERT family — Devlin et al. 2019; Wu et
  * al. 2016 §4.1): completes the repo's tokenizer triangle next to
  * character-level BPE ([[TextAnalysis.bpeTrain]]) and byte-level BPE
  * ([[TextAnalysis.bpeTrainBytes]]). WordPiece differs from BPE in
  * both directions: the vocabulary is a SET (no merge order), and
  * encoding is greedy longest-match-first with '##' continuation
  * marking — no training-order replay, so the vocabulary here is
  * mined directly as the highest-frequency substrings (counts are
  * exact integers; the likelihood-driven selection of the original
  * paper needs corpus log-probs — floats — which this repo's
  * oracle discipline deliberately avoids; frequency mining is the
  * standard exact-arithmetic stand-in and produces the same greedy
  * encode semantics downstream).
  *
  * Caveat shared with BERT itself: a corpus word that literally
  * starts with '#' is ambiguous against the continuation marker; the
  * mining and the encoder are consistent with each other (both treat
  * '##'+s as a continuation), which is all the greedy rule needs —
  * and the match horizon is the mining `maxPieceLen` passed
  * EXPLICITLY on both sides, so the candidate enumeration is
  * byte-identical even on '#'-leading words (see
  * [[graft.functions.WordPieceApply]]).
  */
object WordPiece {

  private def isSingle(piece: Column): Column =
    (piece.startsWith("##") && length(piece) === 3) ||
      (!piece.startsWith("##") && length(piece) === 1)

  /** Mine the vocabulary from corpus word frequencies: every
    * substring of every word (word-initial pieces unmarked,
    * later-position pieces '##'-marked, length ≤ `maxPieceLen`)
    * weighted by word count; the vocabulary keeps ALL single-char
    * pieces (so every word over the corpus alphabet encodes without
    * `[UNK]` — SentencePiece's character-coverage discipline) plus
    * the top `topPieces` multi-char pieces by (count DESC, piece ASC).
    *
    * Output: (piece, cnt), one row per vocabulary entry.
    *
    * Scale shape: ONE corpus scan (explode → pre-reduced word-count
    * aggregate); candidate generation then runs over the VOCAB-sized
    * word table (≤ millions of rows at any corpus size) × O(len ·
    * maxPieceLen) pieces per word — the same
    * corpus-once/vocab-quadratic split as [[TextAnalysis.bpeTrain]].
    * The top-N cut is one distributed sort-limit.
    */
  def mineVocab(docs: DataFrame, textCol: String, maxPieceLen: Int,
                topPieces: Int): DataFrame = {
    // round 16 (guide §2.3): word occurrences pre-reduce INSIDE the
    // row (TokenTf), so the corpus shuffles distinct-tokens-per-doc
    // pairs instead of the raw token stream; Σ within-doc counts ≡
    // the occurrence count
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
      .select(concat(
          when(col("p") === 0, lit("")).otherwise(lit("##")),
          expr("substring(tok, p + 1, l)")).as("piece"),
        col("wc"))
      .groupBy("piece").agg(sum(col("wc")).as("cnt"))
    val singles = pieces.filter(isSingle(col("piece")))
    // the literal '[UNK]' is RESERVED: [[encodeIds]] maps it to id -1
    // via the left join, so a corpus word containing that substring
    // must never mine it as a real piece (failed words would silently
    // get the mined piece's id instead of the reserved slot)
    val multi = pieces.filter(!isSingle(col("piece")) &&
        col("piece") =!= graft.functions.WordPieceApply.Unk)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(topPieces)
    singles.unionByName(multi)
  }

  /** Encode documents with a mined vocabulary: greedy longest-match
    * per word via the native [[graft.functions.WordPieceApplyExpr]]
    * (broadcast transport when `bc` is preferred — see
    * [[encodeBc]]). Words longer than `maxInputChars` become `[UNK]`
    * whole (BERT's max_input_chars_per_word guard). `matchHorizon`
    * MUST be the vocabulary's mining `maxPieceLen` — the horizon is
    * part of the tokenizer contract, carried alongside the artifact
    * exactly like maxInputChars (see [[graft.functions.WordPieceApply]]
    * for why deriving it from piece lengths diverges on '#'-leading
    * words).
    *
    * Output: (doc_id, pos, piece) — the [[TextAnalysis.bpeEncode]]
    * stream shape, so packing/coverage/id-mapping downstream is
    * shared.
    *
    * Scale shape: the vocab is vocabulary-sized by construction
    * (collected under `driverVocabLimit`, the bpeTrain guard); the
    * encode itself is a zero-Exchange per-row projection — the token
    * stream materializes only at the posexplode the caller asked for.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame, matchHorizon: Int, maxInputChars: Int,
             driverVocabLimit: Long = 4000000L): DataFrame = {
    val head = vocab.select(col("piece"))
      .limit(math.min(driverVocabLimit + 1, Int.MaxValue.toLong).toInt)
      .collect().map(_.getString(0))
    require(head.length <= driverVocabLimit,
      s"vocabulary exceeds driverVocabLimit=$driverVocabLimit — a " +
        "WordPiece vocab is a tokenizer artifact, not corpus-sized; " +
        "mine with a smaller topPieces")
    val bc = docs.sparkSession.sparkContext.broadcast(head.sorted)
    docs.select(col(idCol).as("doc_id"),
        posexplode(flatten(transform(
          filter(tokens(col(textCol)), t => length(t) > 0),
          w => WordPieceOps.wordpieceApplyBc(w, bc, matchHorizon,
            maxInputChars)))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("piece"))
  }

  /** Persist the mined vocabulary + its encode contract
    * ([[TokenizerArtifact]]: the (piece, cnt) parquet plus a meta row
    * carrying maxPieceLen/maxInputChars). Encoding with a loaded
    * artifact is bit-identical to encoding with the in-memory table
    * (q220 proves it against q217's oracle verbatim — the freeze
    * contract, the q161/q198 discipline) — and [[encodeArtifact]]
    * consumes the persisted horizon, so the artifact can never be
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
    * from the artifact's own meta row, never caller convention.
    */
  def encodeArtifact(spark: org.apache.spark.sql.SparkSession,
                     dir: String, docs: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val m = TokenizerArtifact.loadMeta(spark, dir)
    encode(docs, idCol, textCol, loadVocab(spark, dir),
      matchHorizon = m.maxPieceLen, maxInputChars = m.maxInputChars)
  }

  /** Stable piece→id mapping: id = the piece's rank in (piece ASC)
    * order — vocabulary-intrinsic, so ids never shift when the same
    * artifact encodes a different corpus — while the piece set is
    * FROZEN. Extending the vocabulary must go through
    * [[TokenizerArtifact.extendIds]] (this layout is its empty-prior
    * degenerate case). The single-partition ranking window is
    * vocabulary-sized by construction (the [[TextAnalysis.bpeVocab]]
    * shape), never corpus-sized.
    */
  def vocabIds(vocab: DataFrame): DataFrame =
    vocab.select(col("piece"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("piece"))) - 1).cast("long").as("piece_id"))

  /** [[encode]] to ids. `[UNK]` is not a mined piece: it surfaces as
    * id -1 (the caller's reserved slot) via the left join — never a
    * silently dropped row.
    */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                vocab: DataFrame, matchHorizon: Int,
                maxInputChars: Int): DataFrame =
    encodeIdsWith(docs, idCol, textCol, vocab, vocabIds(vocab),
      matchHorizon, maxInputChars)

  /** [[encodeIds]] with an EXPLICIT id table (an
    * [[TokenizerArtifact.extendIds]] allocation) — the encode path of
    * an extended vocabulary (the [[Unigram.encodeIdsWith]] contract).
    */
  def encodeIdsWith(docs: DataFrame, idCol: String, textCol: String,
                    vocab: DataFrame, ids: DataFrame,
                    matchHorizon: Int, maxInputChars: Int): DataFrame =
    encode(docs, idCol, textCol, vocab, matchHorizon, maxInputChars)
      .join(broadcast(ids.select(col("piece"), col("piece_id"))),
        Seq("piece"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("piece_id"), lit(-1L)).as("piece_id"))

  /** DECODE an id shard back to pieces — the inverse of
    * [[encodeIdsWith]] and the operation the append-only allocator's
    * "old shards keep decoding" guarantee exists FOR: because
    * [[TokenizerArtifact.extendIds]] keeps every prior (piece, id) row
    * bit-stable (retired pieces included), decoding a shard with the
    * EXTENDED id table is bit-identical to decoding it with the table
    * it was encoded under (q262 hash-proves exactly that: engine
    * decodes with the extension, the oracle with the base).
    *
    * The reserved id -1 decodes to `[UNK]` (the [[encodeIds]]
    * contract). Any OTHER id missing from the table is a corrupted
    * shard or the wrong artifact — impossible under the append-only
    * contract — and raises loudly instead of decoding to a silent
    * placeholder.
    *
    * Scale shape: one broadcast join (the id table is
    * vocabulary-sized), zero Exchange on the shard.
    */
  def decodeIds(shard: DataFrame, ids: DataFrame): DataFrame =
    shard.select(col("doc_id"), col("pos"),
        col("piece_id").cast("long").as("piece_id"))
      .join(broadcast(ids.select(col("piece_id").cast("long")
        .as("piece_id"), col("piece"))), Seq("piece_id"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("piece_id") === -1L,
            lit(graft.functions.WordPieceApply.Unk))
          .when(col("piece").isNull, raise_error(concat(
            lit("decodeIds: id "), col("piece_id").cast("string"),
            lit(" not in the id table — shard/artifact mismatch " +
              "(the append-only contract makes this unreachable " +
              "for shards encoded under any prior of this table)"))))
          .otherwise(col("piece")).as("piece"))

  /** TOKENIZER FERTILITY / COMPRESSION report — the standard
    * tokenizer-selection numbers (pieces per word, content chars per
    * piece, [UNK] rate), computed from an [[encode]] piece stream
    * alone: every word contributes exactly one unmarked piece (its
    * opener — `[UNK]` included), so n_words is the unmarked-piece
    * count and no join back to the corpus is needed. Exact integers,
    * ratios in parts-per-10⁴ (the repo's s4 convention).
    *
    * Output (one row): (n_words, n_pieces, n_unk, fertility_10k =
    * pieces·10⁴ div words, unk_10k, content_chars, chars_per_piece_10k
    * — '##' markers and `[UNK]` placeholders excluded from content).
    *
    * Scale shape: one global aggregate over the stream (partial-agg
    * friendly, 1-row result).
    */
  def fertilityReport(encoded: DataFrame): DataFrame = {
    val unk = graft.functions.WordPieceApply.Unk
    encoded.agg(
        sum(when(col("piece").startsWith("##"), 0L).otherwise(1L))
          .as("n_words"),
        count(lit(1)).as("n_pieces"),
        sum(when(col("piece") === unk, 1L).otherwise(0L)).as("n_unk"),
        sum(when(col("piece") === unk, 0L)
          .when(col("piece").startsWith("##"),
            length(col("piece")) - 2L)
          .otherwise(length(col("piece")).cast("long")))
          .as("content_chars"))
      .select(col("n_words"), col("n_pieces"), col("n_unk"),
        expr("n_pieces * 10000L div n_words").as("fertility_10k"),
        expr("n_unk * 10000L div n_words").as("unk_10k"),
        col("content_chars"),
        expr("content_chars * 10000L div n_pieces")
          .as("chars_per_piece_10k"))
  }

  /** DETOKENIZE a decoded piece stream back to words: a piece without
    * the '##' continuation marker opens a word, '##'-pieces append
    * (markers stripped). `[UNK]` is never '##'-marked, so it surfaces
    * as its own word. Shares BERT's own ambiguity on corpus words that
    * literally start with '##' (see the class scaladoc) — the
    * detokenizer is consistent with the encoder's marking, which is
    * the whole contract.
    *
    * Output: (doc_id, word_idx, word) — word_idx 0-based in stream
    * order.
    *
    * Scale shape: ONE Exchange on doc_id — the word-boundary running
    * count partitions by doc_id and the (doc_id, word_idx) aggregation
    * reuses that partitioning (doc_id is a prefix of the grouping
    * key), so the window and the groupBy share the shuffle.
    */
  def detokenize(decoded: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    decoded
      .withColumn("__widx",
        sum(when(col("piece").startsWith("##"), 0L).otherwise(1L))
          .over(w))
      .groupBy(col("doc_id"), (col("__widx") - 1L).as("word_idx"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("piece")))),
        s => when(s.getField("piece").startsWith("##"),
            s.getField("piece").substr(lit(3),
              length(s.getField("piece"))))
          .otherwise(s.getField("piece"))), "").as("word"))
  }
}
