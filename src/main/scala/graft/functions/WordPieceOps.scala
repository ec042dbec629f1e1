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
  * set, and the greedy rule is the whole algorithm — `maxPieceLen` is
  * derived from the vocabulary itself so the expression and any
  * replay agree on the match horizon by construction.
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

  /** Effective match length of a piece: '##'-continuations match
    * len-2 word chars.
    */
  private[functions] def effLen(p: String): Int =
    if (p.startsWith("##")) p.length - 2 else p.length

  private[functions] def toSet(pieces: Array[String])
      : java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.length * 2)
    pieces.foreach(s.add)
    s
  }

  private[functions] def encodeWord(word: String,
      vocab: java.util.HashSet[String], maxPieceLen: Int,
      maxInputChars: Int): GenericArrayData = {
    val n = word.length
    if (n > maxInputChars) return unkArray
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < n) {
      var l = math.min(maxPieceLen, n - pos)
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
                              maxInputChars: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "wordpiece_apply"

  @transient private lazy val vocab =
    WordPieceApply.toSet(pieces.toArray)
  @transient private lazy val maxLen =
    if (pieces.isEmpty) 1
    else pieces.iterator.map(WordPieceApply.effLen).max

  protected override def nullSafeEval(input: Any): Any =
    WordPieceApply.encodeWord(input.asInstanceOf[UTF8String].toString,
      vocab, maxLen, maxInputChars)

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceApplyExpr = copy(child = newChild)
}

/** Vocabulary behind a `Broadcast` handle — one TorrentBroadcast per
  * executor, tasks share the deserialized set (the production
  * transport).
  */
case class WordPieceApplyBroadcast(child: Expression,
    bc: Broadcast[Array[String]], maxInputChars: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "wordpiece_apply_bc"

  @transient private lazy val vocab = WordPieceApply.toSet(bc.value)
  @transient private lazy val maxLen =
    if (bc.value.isEmpty) 1
    else bc.value.iterator.map(WordPieceApply.effLen).max

  protected override def nullSafeEval(input: Any): Any =
    WordPieceApply.encodeWord(input.asInstanceOf[UTF8String].toString,
      vocab, maxLen, maxInputChars)

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceApplyBroadcast =
    copy(child = newChild)
}

object WordPieceOps {
  /** Column API: greedy longest-match WordPiece over one word. */
  def wordpieceApply(word: Column, pieces: Seq[String],
                     maxInputChars: Int): Column =
    ColumnBridge.column(WordPieceApplyExpr(
      ColumnBridge.expression(word), pieces, maxInputChars))

  /** [[wordpieceApply]] with the vocabulary behind a broadcast. */
  def wordpieceApplyBc(word: Column, bc: Broadcast[Array[String]],
                       maxInputChars: Int): Column =
    ColumnBridge.column(WordPieceApplyBroadcast(
      ColumnBridge.expression(word), bc, maxInputChars))
}
