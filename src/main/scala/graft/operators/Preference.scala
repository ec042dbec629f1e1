package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{cosineSimPre, l2Norm, toDoubleVec}

/** Preference-pair (DPO / RLHF reward-model) data assembly: after SFT,
  * the next artifact a post-training pipeline ships is
  * (prompt, chosen, rejected) triples — the chosen response is the
  * best LABELED positive for the prompt, the rejected side comes from
  * hard-negative mining, and a minimum preference GAP keeps the pair
  * informative (a rejected response nearly as good as the chosen one
  * teaches the loss nothing and risks preference noise — the margin
  * discipline of the DPO recipe, Rafailov et al. 2023, and the
  * hard-negative curation of Robinson et al. 2021).
  *
  * Determinism: every similarity compares as the s4 = round(sim·10⁴)
  * integer ([[Ann.hardNegatives]]' convention), the chosen pick
  * tie-breaks (s4 DESC, pos_id ASC), the pair rank (s4 DESC,
  * neighbor_id ASC) — pure integer arithmetic an oracle replays
  * exactly.
  */
object Preference {

  private def s4(sim: Column): Column =
    round(sim * 10000, 0).cast("long")

  /** Assemble (prompt, chosen, rejected) pairs.
    *
    *   - `pairs`: (query_id, pos_id) — the labeled positive responses
    *     per prompt (tiny next to the corpus; broadcast).
    *   - `negatives`: [[Ann.hardNegatives]] /
    *     [[Ann.hardNegativesFromIndex]] output (query_id, neighbor_id,
    *     rank, sim, pos_sim) — the rejected-side candidates, already
    *     exclusion- and margin-disciplined.
    *   - `corpus`: (idCol, vecCol) — scores the labeled positives so
    *     the CHOSEN response is the argmax-similarity positive
    *     (s4 DESC, pos_id ASC tie-break).
    *   - `minGap10k`: admit a pair only when
    *     chosen_s4 − rejected_s4 ≥ minGap10k (the preference-gap
    *     filter, exact integers).
    *   - `pairsPerPrompt`: keep the top-N HARDEST admissible rejected
    *     per prompt (highest s4 below the gap — the informative ones).
    *
    * Output: (prompt_id, chosen_id, rejected_id, pair_rank,
    * chosen_sim, rejected_sim) — pair_rank dense 1..≤N per prompt.
    *
    * Scale shape: `pairs` broadcasts against ONE streamed corpus scan
    * to score the labeled positives (the [[Ann.hardNegatives]] posSim
    * shape, pos_id kept); everything downstream operates on
    * pairs-cardinality rows (windows over |pairs| and |negatives| —
    * tiny). The corpus-scan-heavy half lives in the negatives miner,
    * whose 100 TB path is the persisted-index variant; this assembly
    * adds no corpus pass of its own.
    */
  def assemble(pairs: DataFrame, negatives: DataFrame,
               corpus: DataFrame, idCol: String, vecCol: String,
               minGap10k: Long, pairsPerPrompt: Int): DataFrame = {
    require(pairsPerPrompt >= 1, "pairsPerPrompt >= 1")
    val p = broadcast(pairs.select(col("query_id"), col("pos_id")))
    val c = corpus.select(col(idCol).as("pos_id"),
        toDoubleVec(col(vecCol)).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val qv = corpus.join(
        broadcast(p.select(col("query_id")).distinct()),
        col(idCol) === col("query_id"))
      .select(col("query_id"), toDoubleVec(col(vecCol)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    // labeled positives scored in ONE corpus scan (pos_id kept — the
    // chosen response id is the point, unlike hardNegatives' max)
    val posScored = p.join(c, Seq("pos_id"))
      .join(qv.hint("broadcast"), Seq("query_id"))
      .select(col("query_id"), col("pos_id"),
        s4(cosineSimPre(col("qv"), col("cv"), col("qn"), col("cn")))
          .as("chosen_s4"))
    val wChosen = Window.partitionBy(col("query_id"))
      .orderBy(col("chosen_s4").desc, col("pos_id"))
    val chosen = posScored
      .withColumn("__rn", row_number().over(wChosen))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("pos_id").as("chosen_id"),
        col("chosen_s4"))
    val neg = negatives.select(col("query_id"),
      col("neighbor_id").as("rejected_id"),
      s4(col("sim")).as("rejected_s4"))
    val wPair = Window.partitionBy(col("query_id"))
      .orderBy(col("rejected_s4").desc, col("rejected_id"))
    chosen.join(neg, Seq("query_id"))
      .filter(col("chosen_s4") - col("rejected_s4") >= minGap10k)
      .withColumn("pair_rank", row_number().over(wPair).cast("long"))
      .filter(col("pair_rank") <= pairsPerPrompt)
      .select(col("query_id").as("prompt_id"), col("chosen_id"),
        col("rejected_id"), col("pair_rank"),
        (col("chosen_s4") / 10000.0).as("chosen_sim"),
        (col("rejected_s4") / 10000.0).as("rejected_sim"))
  }
}
