package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unigram-LM tokenizer application (the SentencePiece family —
  * Kudo 2018): encode one word into the segmentation that MAXIMIZES
  * the product of its pieces' scores over a trained piece table — the
  * Viterbi decode of the unigram language model.
  *
  * Exact-arithmetic discipline: piece scores are 10⁴-scaled integer
  * probabilities (`s10k = cnt·10⁴ div total + 1` — the +1 floor keeps
  * every score strictly positive, a documented smoothing), and the
  * Viterbi objective is the TRUE probability product Π(s10k_i/10⁴),
  * compared exactly by normalizing every segmentation to a common
  * length: key = (Π s10k_i) · 10⁴^(maxInputChars − n). Comparing the
  * RAW products would be wrong — scores exceed 1, so a raw product
  * always grows with more pieces and the decode would degenerate to
  * all-singles; the normalization makes the integer comparison
  * agree with the real Π p_i order. The key is bounded by
  * 10001^maxInputChars (each s10k ≤ 10001 and 10⁴ < 10001), which is
  * why `maxInputChars` doubles as the replay-tractability guard: an
  * oracle enumerating all 2^(n-1) compositions needs n small, and
  * HUGEINT holds the key for n ≤ 9. Ties break exactly: larger key,
  * then FEWER pieces, then the lexicographically smaller space-joined
  * piece sequence (binary UTF-8 order) — a total order any replay
  * can evaluate.
  *
  * The tie-break is DP-compatible: two prefixes reaching the same
  * cursor cover the same characters, so neither rendered sequence is
  * a strict prefix of the other — their comparison is decided at the
  * first differing position and survives appending a common suffix,
  * which is what lets the left-to-right DP commit per-position
  * winners and still return the global argmax.
  *
  * Words longer than `maxInputChars`, or with no segmentation over
  * the table (impossible under the mining's single-char coverage,
  * kept for the contract), encode as whole-word `[UNK]` — the
  * [[WordPieceApply]] guard.
  *
  * `CodegenFallback` for the [[BpeApply]]/[[WordPieceApply]] reason:
  * the per-word DP loop is imperative, and a fallback expression
  * still beats a Scala UDF (no Row conversion, no closure
  * serialization).
  */
/** Per-task memo for deterministic per-word encode results (round 16):
  * every tokenizer apply is a pure function of (word, frozen vocab
  * params), and natural-language corpora repeat words heavily — the
  * memo turns the per-OCCURRENCE DP into a per-DISTINCT-WORD DP per
  * task. Expressions are deserialized per task (the same assumption
  * the `@transient lazy val` vocab rebuilds already rely on), so the
  * map is single-threaded. Results are immutable (`GenericArrayData`
  * over `UTF8String`s), so returning a shared instance is safe. The
  * cap bounds memory against adversarial all-unique token streams;
  * NOT cross-run state — it lives and dies with the task.
  */
private[functions] final class WordMemo(cap: Int = 1 << 16) {
  // ConcurrentHashMap (round 17): the per-task-deserialization
  // assumption above holds today, but a future driver-side interpreted
  // eval of a reused plan would share one instance across threads — a
  // plain HashMap could then corrupt internally. CHM costs nothing at
  // this granularity and removes the execution-model dependency.
  private val m = new java.util.concurrent.ConcurrentHashMap[String, AnyRef](1024)
  def getOrCompute(w: String)(f: => AnyRef): AnyRef = {
    val hit = m.get(w)
    if (hit != null) hit
    else {
      val r = f
      if (m.size < cap) m.put(w, r)
      r
    }
  }
}

object UnigramApply {
  val Unk = "[UNK]"

  private def unkArray: GenericArrayData =
    new GenericArrayData(Array[Any](UTF8String.fromString(Unk)))

  private[functions] def toScores(pieces: Array[(String, Long)])
      : java.util.HashMap[String, Long] = {
    val m = new java.util.HashMap[String, Long](pieces.length * 2)
    pieces.foreach { case (p, s) => m.put(p, s) }
    m
  }

  /** One DP cell: best product, piece count, rendered sequence and the
    * PRECOMPUTED normalized comparison key (prod · 10⁴^(maxInputChars
    * − n)) of the best segmentation of word[0, pos) — the key is built
    * once at construction, never recomputed per comparison.
    */
  private final class Cell(val prod: java.math.BigInteger, val n: Int,
                           val seq: String,
                           val key: java.math.BigInteger)

  private val E4 = java.math.BigInteger.valueOf(10000L)

  /** Normalization power table 10⁴^0 .. 10⁴^maxInputChars — depends
    * only on maxInputChars, so callers build it ONCE per expression
    * instance ([[UnigramApplyBroadcast]] hoists it into a transient
    * lazy val), not once per word in the corpus-scan hot path.
    */
  private[functions] def normPows(
      maxInputChars: Int): Array[java.math.BigInteger] = {
    val pows = new Array[java.math.BigInteger](maxInputChars + 1)
    pows(0) = java.math.BigInteger.ONE
    var pi = 1
    while (pi <= maxInputChars) {
      pows(pi) = pows(pi - 1).multiply(E4); pi += 1
    }
    pows
  }

  private[functions] def encodeWord(word: String,
      scores: java.util.HashMap[String, Long], maxPieceLen: Int,
      maxInputChars: Int,
      pows: Array[java.math.BigInteger]): GenericArrayData = {
    val n = word.length
    if (n > maxInputChars) return unkArray
    val best = new Array[Cell](n + 1)
    best(0) = new Cell(java.math.BigInteger.ONE, 0, "",
      pows(maxInputChars))
    var end = 1
    while (end <= n) {
      var start = math.max(0, end - maxPieceLen)
      var cell: Cell = null
      while (start < end) {
        if (best(start) != null) {
          val s = scores.get(word.substring(start, end))
          if (s != 0L) { // scores are ≥ 1; 0 = absent
            val prev = best(start)
            val prod = prev.prod.multiply(
              java.math.BigInteger.valueOf(s))
            val seq = if (prev.seq.isEmpty) word.substring(start, end)
              else prev.seq + " " + word.substring(start, end)
            val cand = new Cell(prod, prev.n + 1, seq,
              prod.multiply(pows(maxInputChars - prev.n - 1)))
            // seq ties compare in binary UTF-8 order (UTF8String),
            // matching the replay's DuckDB string comparison — Java's
            // UTF-16 code-unit order diverges on supplementary chars
            val better = cell == null || {
              val c = cand.key.compareTo(cell.key)
              c > 0 || (c == 0 && (cand.n < cell.n ||
                (cand.n == cell.n &&
                  UTF8String.fromString(cand.seq).compareTo(
                    UTF8String.fromString(cell.seq)) < 0)))
            }
            if (better) cell = cand
          }
        }
        start += 1
      }
      best(end) = cell
      end += 1
    }
    if (best(n) == null) unkArray
    else new GenericArrayData(
      best(n).seq.split(' ').map(p => UTF8String.fromString(p))
        .asInstanceOf[Array[Any]])
  }

  /** The cells' total order — key DESC, then FEWER pieces, then the
    * lexicographically smaller rendered sequence in binary UTF-8
    * (the [[encodeWord]] comparison, reified for the n-best lists).
    */
  private val cellOrd: Ordering[Cell] = new Ordering[Cell] {
    def compare(a: Cell, b: Cell): Int = {
      val c = b.key.compareTo(a.key)
      if (c != 0) c
      else if (a.n != b.n) a.n - b.n
      else UTF8String.fromString(a.seq)
        .compareTo(UTF8String.fromString(b.seq))
    }
  }

  /** N-BEST Viterbi (the subword-regularization prerequisite — Kudo
    * 2018 §4): the top-`nBest` segmentations of one word under the
    * SAME total order as [[encodeWord]]'s argmax. Per-position
    * truncation to nBest is exact: key(prefix·s) = key(prefix)·s/10⁴
    * (monotone in key(prefix)), the piece-count tie adds 1 to both
    * sides, and the seq tie is decided at the first differing
    * position and survives a common suffix — so a prefix outside its
    * position's top-n can never re-enter the word's top-n (the
    * standard n-best DP argument). Words over `maxInputChars` (or
    * with no segmentation) return the single-entry `[UNK]` list.
    */
  private[functions] def nBestSegmentations(word: String,
      scores: java.util.HashMap[String, Long], maxPieceLen: Int,
      maxInputChars: Int, pows: Array[java.math.BigInteger],
      nBest: Int): Array[String] = {
    val n = word.length
    if (n > maxInputChars) return Array(Unk)
    val best = new Array[List[Cell]](n + 1)
    best(0) = List(new Cell(java.math.BigInteger.ONE, 0, "",
      pows(maxInputChars)))
    var end = 1
    while (end <= n) {
      val cands = scala.collection.mutable.ArrayBuffer.empty[Cell]
      var start = math.max(0, end - maxPieceLen)
      while (start < end) {
        if (best(start) != null) {
          val s = scores.get(word.substring(start, end))
          if (s != 0L) {
            val piece = word.substring(start, end)
            best(start).foreach { prev =>
              val prod = prev.prod.multiply(
                java.math.BigInteger.valueOf(s))
              val seq = if (prev.seq.isEmpty) piece
                else prev.seq + " " + piece
              cands += new Cell(prod, prev.n + 1, seq,
                prod.multiply(pows(maxInputChars - prev.n - 1)))
            }
          }
        }
        start += 1
      }
      best(end) =
        if (cands.isEmpty) null
        else cands.sorted(cellOrd).take(nBest).toList
      end += 1
    }
    if (best(n) == null) Array(Unk)
    else best(n).map(_.seq).toArray
  }
}

/** Piece table behind a `Broadcast` handle — one TorrentBroadcast per
  * executor, tasks share the deserialized map (the production
  * transport; the [[WordPieceApplyBroadcast]] split).
  */
case class UnigramApplyBroadcast(child: Expression,
    bc: Broadcast[Array[(String, Long)]], matchHorizon: Int,
    maxInputChars: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unigram_apply_bc"

  @transient private lazy val scores = UnigramApply.toScores(bc.value)
  @transient private lazy val pows = UnigramApply.normPows(maxInputChars)
  @transient private lazy val memo = new WordMemo()

  protected override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    memo.getOrCompute(w) {
      UnigramApply.encodeWord(w, scores, matchHorizon, maxInputChars,
        pows)
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramApplyBroadcast =
    copy(child = newChild)
}

/** The ranked n-best segmentation LIST of one word — each entry a
  * space-joined piece sequence, index = rank. The listing form of the
  * subword-regularization machinery ([[UnigramSampleBroadcast]] is
  * the sampling form).
  */
case class UnigramNBestBroadcast(child: Expression,
    bc: Broadcast[Array[(String, Long)]], matchHorizon: Int,
    maxInputChars: Int, nBest: Int)
    extends UnaryExpression with CodegenFallback {
  require(nBest >= 1, "nBest >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unigram_nbest_bc"

  @transient private lazy val scores = UnigramApply.toScores(bc.value)
  @transient private lazy val pows = UnigramApply.normPows(maxInputChars)
  @transient private lazy val memo = new WordMemo()

  protected override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    memo.getOrCompute(w) {
      new GenericArrayData(UnigramApply.nBestSegmentations(
        w, scores, matchHorizon, maxInputChars, pows, nBest)
        .map(s => UTF8String.fromString(s)).asInstanceOf[Array[Any]])
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramNBestBroadcast =
    copy(child = newChild)
}

/** SUBWORD-REGULARIZATION sampling encode (Kudo 2018 §4, the
  * exact-arithmetic stand-in): instead of the argmax, pick ONE of the
  * word's top-`nBest` segmentations — index = polyHash(word ∥ "|ugs"
  * ∥ seed) mod |available| (the oracle-portable [[PolyHashImpl]]
  * fold, mult 31), so the draw is seeded, deterministic per word, and
  * replayable in ANSI SQL (the true algorithm samples ∝ pᵅ per
  * occurrence with an RNG — unreplayable by an exact oracle; a seeded
  * uniform over the n-best keeps the property that matters for the
  * regularizer: the SAME word tokenizes differently under different
  * seeds, never differently under the same seed). Words over
  * `maxInputChars` stay whole-word `[UNK]`.
  */
case class UnigramSampleBroadcast(child: Expression,
    bc: Broadcast[Array[(String, Long)]], matchHorizon: Int,
    maxInputChars: Int, nBest: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(nBest >= 1, "nBest >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unigram_sample_bc"

  @transient private lazy val scores = UnigramApply.toScores(bc.value)
  @transient private lazy val pows = UnigramApply.normPows(maxInputChars)
  @transient private lazy val memo = new WordMemo()

  protected override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    memo.getOrCompute(word) {
      val list = UnigramApply.nBestSegmentations(word, scores,
        matchHorizon, maxInputChars, pows, nBest)
      val idx = (PolyHashImpl.hash(
        UTF8String.fromString(word + "|ugs" + seed), 31L)
        % list.length).toInt
      new GenericArrayData(list(idx).split(' ')
        .map(p => UTF8String.fromString(p)).asInstanceOf[Array[Any]])
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramSampleBroadcast =
    copy(child = newChild)
}

object UnigramOps {
  /** Column API: max-product Viterbi over one word; `matchHorizon` =
    * the table's mining maxPieceLen (the [[WordPieceOps]] contract).
    */
  def unigramApplyBc(word: Column, bc: Broadcast[Array[(String, Long)]],
                     matchHorizon: Int, maxInputChars: Int): Column =
    ColumnBridge.column(UnigramApplyBroadcast(
      ColumnBridge.expression(word), bc, matchHorizon, maxInputChars))

  /** Column API: the ranked top-`nBest` segmentation list. */
  def unigramNBestBc(word: Column, bc: Broadcast[Array[(String, Long)]],
                     matchHorizon: Int, maxInputChars: Int,
                     nBest: Int): Column =
    ColumnBridge.column(UnigramNBestBroadcast(
      ColumnBridge.expression(word), bc, matchHorizon, maxInputChars,
      nBest))

  /** Column API: the seeded sampled segmentation. */
  def unigramSampleBc(word: Column,
                      bc: Broadcast[Array[(String, Long)]],
                      matchHorizon: Int, maxInputChars: Int,
                      nBest: Int, seed: Long): Column =
    ColumnBridge.column(UnigramSampleBroadcast(
      ColumnBridge.expression(word), bc, matchHorizon, maxInputChars,
      nBest, seed))
}
