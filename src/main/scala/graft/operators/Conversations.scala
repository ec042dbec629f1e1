package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.tokens

/** SFT (instruction-tuning) conversation assembly: chat-turn rows →
  * rendered training conversations plus the per-turn token spans a
  * supervised fine-tune needs to mask the loss to assistant turns
  * only (the standard SFT recipe: every token is attended, but the
  * loss reads assistant spans alone — user/system turns are context).
  *
  * The span layout IS the contract: a trainer tokenizes the rendered
  * document and slices the loss mask from [start_tok, end_tok) per
  * assistant turn, so both sides must come from the same arithmetic —
  * [[spans]] and [[render]] share the piece template and the
  * whitespace-token widths, and an oracle replays both exactly
  * (strings + one integer cumsum; no floats anywhere).
  */
object Conversations {

  private def pieceCol(roleCol: String, textCol: String) =
    concat(lit("<|"), col(roleCol), lit("|> "), col(textCol))

  /** The marker is one whitespace token; a turn's token width is
    * 1 + |tokens(text)| (empty-token-filtered, the chunker's rule).
    */
  private def widthCol(textCol: String) =
    (size(filter(tokens(col(textCol)), t => length(t) > 0)) + 1)
      .cast("long")

  /** KEY CONTRACT: (conv_id, turn_idx) must be unique — two turns
    * cannot share a position, and a per-row cumsum over colliding
    * indexes would be tie-order-dependent (silently different offsets
    * run to run). The guard is a lag over the SAME window spec the
    * cumsum uses (same partition, same order — no extra Exchange):
    * adjacent equal indexes raise loudly instead of emitting
    * nondeterministic spans. Fires only on the true-duplicate branch
    * (CaseWhen branch laziness), costs one offset frame otherwise.
    */
  private def dupGuard(over: org.apache.spark.sql.expressions
      .WindowSpec): Column =
    when(lag(col("turn_idx"), 1).over(over) <=> col("turn_idx"),
      raise_error(concat(
        lit("Conversations: duplicate (conv_id, turn_idx) = ("),
        col("conv_id"), lit(", "), col("turn_idx"),
        lit(") — turn positions must be unique"))).cast("long"))

  /** Per-turn rendered pieces with token offsets and the loss flag.
    *
    * Offsets are ONE exact-integer cumsum window per conversation
    * ordered by the turn index (ROWS frame pinned — the
    * packSequencesByCount discipline: RANGE would merge duplicate
    * turn indexes); `in_loss` = 1 marks assistant turns. Duplicate
    * (conv_id, turn_idx) input raises loudly (see [[dupGuard]]).
    *
    * Output: (conv_id, turn_idx, role, piece, start_tok, end_tok,
    * in_loss).
    *
    * Scale shape: the rendering and widths are a zero-Exchange
    * projection; the only shuffle is the conv_id window, and
    * conversations are bounded (thousands of turns at the pathological
    * worst) so there is no hot key. At 100 TB this partitions by
    * conversation exactly the way the downstream packer wants it.
    */
  def spans(turns: DataFrame, convCol: String, turnCol: String,
            roleCol: String, textCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col("conv_id"))
      .orderBy(col("turn_idx"))
    val w = wOrd
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns.select(col(convCol).cast("long").as("conv_id"),
        col(turnCol).cast("long").as("turn_idx"),
        col(roleCol).as("role"),
        pieceCol(roleCol, textCol).as("piece"),
        widthCol(textCol).as("n_tokens"))
      .withColumn("end_tok",
        coalesce(dupGuard(wOrd), sum(col("n_tokens")).over(w)))
      .withColumn("start_tok", col("end_tok") - col("n_tokens"))
      .withColumn("in_loss",
        when(col("role") === "assistant", 1L).otherwise(0L))
      .select(col("conv_id"), col("turn_idx"), col("role"),
        col("piece"), col("start_tok"), col("end_tok"), col("in_loss"))
  }

  /** CONTEXT-WINDOW TRUNCATION — the chat-trainer rule for
    * conversations longer than the model's sequence budget: keep the
    * FIRST turn (the system prompt's slot) plus the longest SUFFIX of
    * later turns whose combined width fits `maxTokens`, dropping
    * middle history whole-turn (a partial turn is useless to a chat
    * loss; recency beats middles). The first turn is kept even if it
    * alone exceeds the budget — the honest outcome a trainer should
    * fail loudly on, never a silently emptied conversation.
    *
    * Output: [[spans]]' exact shape over the truncated conversation —
    * original `turn_idx` values survive (the drop is visible), the
    * offsets are recomputed over what remains.
    *
    * Scale shape: three windows, all partitioned on conv_id — one
    * Exchange total (the suffix cumsum runs turn-DESC, the span
    * cumsum turn-ASC; sorts re-run, the shuffle does not).
    */
  def truncate(turns: DataFrame, convCol: String, turnCol: String,
               roleCol: String, textCol: String,
               maxTokens: Long): DataFrame = {
    val wAll = Window.partitionBy(col("conv_id"))
    val wDescOrd = Window.partitionBy(col("conv_id"))
      .orderBy(col("turn_idx").desc)
    val wDesc = wDescOrd
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.partitionBy(col("conv_id"))
      .orderBy(col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns.select(col(convCol).cast("long").as("conv_id"),
        col(turnCol).cast("long").as("turn_idx"),
        col(roleCol).as("role"),
        pieceCol(roleCol, textCol).as("piece"),
        widthCol(textCol).as("n_tokens"))
      .withColumn("first_idx", min(col("turn_idx")).over(wAll))
      .withColumn("w_first",
        max(when(col("turn_idx") === col("first_idx"),
          col("n_tokens"))).over(wAll))
      .withColumn("rsum", coalesce(dupGuard(wDescOrd),
        sum(when(col("turn_idx") =!= col("first_idx"), col("n_tokens"))
          .otherwise(0L)).over(wDesc)))
      .filter(col("turn_idx") === col("first_idx") ||
        col("rsum") + col("w_first") <= maxTokens)
      .withColumn("end_tok", sum(col("n_tokens")).over(wAsc))
      .withColumn("start_tok", col("end_tok") - col("n_tokens"))
      .withColumn("in_loss",
        when(col("role") === "assistant", 1L).otherwise(0L))
      .select(col("conv_id"), col("turn_idx"), col("role"),
        col("piece"), col("start_tok"), col("end_tok"), col("in_loss"))
  }

  /** PACKED LOSS-MASK MANIFEST — the artifact a packed-SFT trainer
    * actually consumes: after conversations lay end-to-end in fixed
    * `chunkTokens` chunks (the q87/q219 packing), the loss mask must
    * be sliced PER CHUNK — each chunk needs to know how many of its
    * positions are loss-bearing (assistant tokens) and how many are
    * conversation tokens at all (the last chunk of a stream is
    * partial).
    *
    *   - `spans`: [[spans]]' output (conv-local [start_tok, end_tok)
    *     + in_loss);
    *   - `packed`: the packer's per-conversation layout — (doc_id =
    *     conv_id, stream, start_tok = the conversation's global
    *     offset in its stream), i.e.
    *     [[TextAnalysis.packSequencesByCount]] over [[render]].
    *
    * Globalizes each turn span by its conversation's offset, explodes
    * it over the chunks it touches (÷-arithmetic bounds — exact at
    * any offset, the packInterleaved shape) and aggregates per
    * (stream, chunk): (n_tokens, n_loss_tokens) — both exact-integer
    * overlap widths.
    *
    * Scale shape: one conv_id equi-join (spans and layout both hash
    * by conversation), the explode multiplies rows only by
    * chunks-per-turn (bounded by turn width / chunkTokens), one
    * (stream, chunk) aggregation — no other shuffle.
    */
  def packedLossManifest(spans: DataFrame, packed: DataFrame,
                         chunkTokens: Int): DataFrame = {
    val layout = packed.select(col("doc_id").as("conv_id"),
      col("stream"), col("start_tok").as("__conv_off"))
    val b = s"${chunkTokens}L"
    spans.join(layout, Seq("conv_id"))
      .select(col("stream"), col("in_loss"),
        (col("__conv_off") + col("start_tok")).as("gs"),
        (col("__conv_off") + col("end_tok")).as("ge"))
      // zero-width spans (ge == gs) are unreachable via spans/truncate
      // (every turn is ≥ 1 token) but the operator is public: on a
      // chunk boundary `sequence(gs div b, (ge-1) div b)` would have
      // start > stop and emit a DESCENDING 2-element sequence —
      // phantom chunks with n_tokens = 0 (the packInterleaved
      // precedent: filter before the explode)
      .filter(col("ge") > col("gs"))
      .withColumn("chunk_idx", explode(sequence(
        expr(s"gs div $b"), expr(s"(ge - 1L) div $b"))))
      .withColumn("w",
        least(col("ge"), (col("chunk_idx") + 1L) * chunkTokens) -
          greatest(col("gs"), col("chunk_idx") * chunkTokens))
      .groupBy(col("stream"), col("chunk_idx"))
      .agg(sum(col("w")).as("n_tokens"),
        sum(when(col("in_loss") === 1L, col("w")).otherwise(0L))
          .as("n_loss_tokens"))
  }

  /** The rendered conversation document — one row per conversation:
    * pieces joined by a single space in turn order (so the document's
    * whitespace tokenization lines up with [[spans]]' offsets
    * token-for-token), total token width, and the number of
    * loss-bearing (assistant) tokens.
    *
    * Scale shape: one groupBy(conv_id) with order-independent
    * aggregates (collect_list sorted AFTER collection by the struct's
    * leading turn_idx — arrival order never matters), partial-agg
    * friendly. Unlike [[spans]]/[[truncate]], duplicate turn indexes
    * need no guard here: the struct sort tie-breaks on the piece
    * string, so the rendering is deterministic regardless.
    */
  def render(turns: DataFrame, convCol: String, turnCol: String,
             roleCol: String, textCol: String): DataFrame =
    turns.select(col(convCol).cast("long").as("conv_id"),
        col(turnCol).cast("long").as("turn_idx"),
        col(roleCol).as("role"),
        pieceCol(roleCol, textCol).as("piece"),
        widthCol(textCol).as("n_tokens"))
      .groupBy(col("conv_id"))
      .agg(
        array_join(transform(array_sort(collect_list(
            struct(col("turn_idx"), col("piece")))),
          s => s.getField("piece")), " ").as("text"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("role") === "assistant", col("n_tokens"))
          .otherwise(0L)).as("n_loss_tokens"))
}
