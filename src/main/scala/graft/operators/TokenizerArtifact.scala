package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared persistence layout for tokenizer artifacts ([[WordPiece]] /
  * [[Unigram]]): the piece table alone is NOT the whole contract —
  * `matchHorizon` (the mining maxPieceLen) and `maxInputChars` are
  * caller-supplied convention on both the mining and encode sides, and
  * loading an artifact then encoding with a DIFFERENT horizon than the
  * mining maxPieceLen silently changes tokenization with no error.
  * The artifact therefore carries its own contract: a one-row `meta`
  * table (max_piece_len, max_input_chars) beside the `pieces` table,
  * and the encode-from-artifact entry points consume it instead of
  * trusting the caller to re-supply the same numbers.
  *
  * Layout: `dir/pieces` (the (piece, cnt) parquet) + `dir/meta`
  * (one row, two ints). Both plain parquet — the artifact stays a
  * directory any engine can read, no floats at rest.
  */
object TokenizerArtifact {

  /** The encode-side contract persisted beside the piece table:
    * `maxPieceLen` is the mining horizon (and therefore the encode
    * matchHorizon — the [[WordPiece.encode]] contract), `maxInputChars`
    * the whole-word `[UNK]` guard both sides must share.
    */
  final case class Meta(maxPieceLen: Int, maxInputChars: Int)

  def save(vocab: DataFrame, dir: String, meta: Meta): Unit = {
    val spark = vocab.sparkSession
    vocab.write.mode("overwrite").parquet(s"$dir/pieces")
    import spark.implicits._
    Seq((meta.maxPieceLen, meta.maxInputChars))
      .toDF("max_piece_len", "max_input_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def loadPieces(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/pieces")

  def loadMeta(spark: SparkSession, dir: String): Meta = {
    val r = spark.read.parquet(s"$dir/meta").head()
    Meta(r.getAs[Int]("max_piece_len"), r.getAs[Int]("max_input_chars"))
  }

  /** APPEND-ONLY id allocation — the continued-pretraining contract.
    *
    * The frozen-artifact layouts ([[WordPiece.vocabIds]] /
    * [[Unigram.vocabIds]] / the BPE id table) derive ids as the
    * (piece ASC) rank, which is stable only while the piece SET is
    * frozen: inserting one piece renumbers every id after it and
    * silently invalidates every previously tokenized shard — the
    * standard domain-adaptation move (extend the vocab with new-domain
    * pieces, continue pretraining) must never do that. This allocator
    * extends instead of recomputing:
    *
    *   - every (piece, id) row of `priorIds` survives BIT-STABLE —
    *     including pieces the new vocabulary no longer mines (an id,
    *     once assigned, is never reassigned or retired: old shards
    *     keep decoding);
    *   - pieces of `vocab` NOT in `priorIds` take ids
    *     `max(prior id) + rank(piece ASC)` — dense, deterministic,
    *     strictly after every existing id;
    *   - allocating from an EMPTY prior reproduces the frozen
    *     (piece ASC) layout exactly, so `vocabIds` is the degenerate
    *     first allocation and `extendIds` composes: extend(extend(∅,
    *     v1), v2) is a valid prior for v3.
    *
    * Scale shape: one left-anti join (vocab-sized), one
    * vocabulary-sized single-partition ranking window (the
    * [[WordPiece.vocabIds]] shape — never corpus-sized), one broadcast
    * 1-row max. Output: (pieceCol, idCol) over prior ∪ new.
    */
  def extendIds(priorIds: DataFrame, vocab: DataFrame,
                pieceCol: String = "piece",
                idCol: String = "piece_id"): DataFrame = {
    val prior = priorIds.select(col(pieceCol), col(idCol))
    val mx = broadcast(prior.agg(
      coalesce(max(col(idCol)), lit(-1L)).as("__mx")))
    val fresh = vocab.select(col(pieceCol)).distinct()
      .join(prior.select(col(pieceCol)), Seq(pieceCol), "left_anti")
    fresh
      .select(col(pieceCol),
        row_number().over(Window.orderBy(col(pieceCol)))
          .cast("long").as("__rk"))
      .crossJoin(mx)
      .select(col(pieceCol), (col("__mx") + col("__rk")).as(idCol))
      .unionByName(prior)
  }

  /** Persist / load the id table beside the piece table — the third
    * member of the artifact directory (`dir/ids`), so an extended
    * vocabulary ships with its append-only ids and an encode from the
    * artifact can never fall back to a rank recomputation.
    */
  def saveIds(ids: DataFrame, dir: String): Unit =
    ids.write.mode("overwrite").parquet(s"$dir/ids")

  def loadIds(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/ids")
}
