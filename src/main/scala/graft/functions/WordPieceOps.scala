package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native WordPiece application: encode one word into subword pieces
  * by GREEDY LONGEST-MATCH-FIRST against a trained vocabulary — the
  * BERT tokenizer rule (Devlin et al. 2019 §A; Wu et al. 2016 §4.1):
  * at each position take the longest vocab piece matching the
  * remaining word ('##'-prefixed when not word-initial) and advance;
  * no match at any position → the WHOLE word is `[UNK]`, as is any
  * word longer than `maxInputChars` (BERT's max_input_chars_per_word
  * guard — which also bounds an oracle's stage unroll: a surviving
  * word consumes ≥ 1 char per match, so ≤ maxInputChars matches).
  *
  * Unlike BPE there is no merge order to replay: the vocabulary is a
  * set, and the greedy rule is the whole algorithm — `matchHorizon`
  * (the maximum word chars one match may consume) is passed in
  * EXPLICITLY as the mining `maxPieceLen`, so the expression and any
  * replay enumerate byte-identical candidate sets. Deriving the
  * horizon from vocabulary piece lengths diverges in BOTH directions
  * on '#'-leading corpus words: an UNMARKED mined piece literally
  * starting with '##' consumes its full raw length (len−2 would
  * under-count it and miss a longest match the replay finds), while a
  * MARKED continuation piece of raw length > maxPieceLen could match
  * literally at position 0 (raw length would over-count and find a
  * match the replay's maxPieceLen-bounded unroll cannot). One
  * documented consequence: a marked piece with raw length in
  * (maxPieceLen, maxPieceLen+2] matches only as a continuation, never
  * literally at position 0 — identical on both sides by construction.
  *
  * `CodegenFallback` for the same reason as [[BpeApply]]: the
  * per-word match loop is imperative, and a fallback expression still
  * beats a Scala UDF (no Row conversion, no closure serialization).
  * One call per word is the intended shape.
  */
object WordPieceApply {
  val Unk = "[UNK]"

  private def unkArray: GenericArrayData =
    new GenericArrayData(Array[Any](UTF8String.fromString(Unk)))

  private[functions] def toSet(pieces: Array[String])
      : java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.length * 2)
    pieces.foreach(s.add)
    s
  }

  private[functions] def encodeWord(word: String,
      vocab: java.util.HashSet[String], matchHorizon: Int,
      maxInputChars: Int): GenericArrayData = {
    val n = word.length
    if (n > maxInputChars) return unkArray
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < n) {
      var l = math.min(matchHorizon, n - pos)
      var found = -1
      while (l >= 1 && found < 0) {
        val cand = (if (pos == 0) "" else "##") +
          word.substring(pos, pos + l)
        if (vocab.contains(cand)) found = l else l -= 1
      }
      if (found < 0) return unkArray
      out += UTF8String.fromString(
        (if (pos == 0) "" else "##") + word.substring(pos, pos + found))
      pos += found
    }
    new GenericArrayData(out.toArray)
  }
}

/** Vocabulary shipped inside the serialized expression — fine at test
  * scale; prefer [[WordPieceApplyBroadcast]] for production vocabs
  * (the [[BpeApply]]/[[BpeApplyBroadcast]] transport split).
  */
case class WordPieceApplyExpr(child: Expression, pieces: Seq[String],
                              matchHorizon: Int, maxInputChars: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "wordpiece_apply"

  @transient private lazy val vocab =
    WordPieceApply.toSet(pieces.toArray)

  protected override def nullSafeEval(input: Any): Any =
    WordPieceApply.encodeWord(input.asInstanceOf[UTF8String].toString,
      vocab, matchHorizon, maxInputChars)

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceApplyExpr = copy(child = newChild)
}

/** Vocabulary behind a `Broadcast` handle — one TorrentBroadcast per
  * executor, tasks share the deserialized set (the production
  * transport).
  */
case class WordPieceApplyBroadcast(child: Expression,
    bc: Broadcast[Array[String]], matchHorizon: Int, maxInputChars: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "wordpiece_apply_bc"

  @transient private lazy val vocab = WordPieceApply.toSet(bc.value)
  @transient private lazy val memo = new WordMemo()

  protected override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    memo.getOrCompute(w) {
      WordPieceApply.encodeWord(w, vocab, matchHorizon, maxInputChars)
        .asInstanceOf[AnyRef]
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceApplyBroadcast =
    copy(child = newChild)
}

object WordPieceOps {
  /** Column API: greedy longest-match WordPiece over one word.
    * `matchHorizon` = the vocabulary's mining maxPieceLen.
    */
  def wordpieceApply(word: Column, pieces: Seq[String],
                     matchHorizon: Int, maxInputChars: Int): Column =
    ColumnBridge.column(WordPieceApplyExpr(
      ColumnBridge.expression(word), pieces, matchHorizon,
      maxInputChars))

  /** [[wordpieceApply]] with the vocabulary behind a broadcast. */
  def wordpieceApplyBc(word: Column, bc: Broadcast[Array[String]],
                       matchHorizon: Int, maxInputChars: Int): Column =
    ColumnBridge.column(WordPieceApplyBroadcast(
      ColumnBridge.expression(word), bc, matchHorizon, maxInputChars))
}
