package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
