package graft.kernel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bitemporal upsert kernel — the Spark-first re-expression of the
  * reference's `RowState` save pattern (ref: core/.../RowState.java:186-199
  * and design note core/dev/design_choices.md "State Wrapper"), the single
  * generic operator behind ~15 of the reference's 20 upsert controllers
  * (SURVEY.md §2.4 O1/O2/O3).
  *
  * Semantics per natural key:
  *   - updates fold in (validFrom, tieBreaker) order — canonical,
  *     arrival-order-independent (the reference's permutation-test property:
  *     its newer-only guard F7 makes arrival order converge to this);
  *   - F6 diff-or-skip: a version identical to its predecessor is a no-op
  *     and produces no new version / no audit row;
  *   - live state = last surviving version per key;
  *   - audit = every superseded version, with validUntil stamped from the
  *     superseding version's validFrom (ref: informdb/AuditCore.java:32-35).
  *
  * Batch formulation: one hash-partition shuffle on the key, two window
  * passes over the SAME partitioning+ordering (Spark reuses the sort), no
  * driver-side loops — scales linearly with keys at any data size.
  */
object BitemporalKernel {

  /** @param live    current version per key (one row per key)
    * @param audit   superseded versions with valid_until_us stamped;
    *                consecutive identical-payload versions are coalesced
    *                into one interval (F6: a no-op update creates no audit
    *                churn and does not bump validFrom)
    * @param history all retained versions (pass back as `state` next
    *                batch). Coalescing is OUTPUT-only: an absorbed version
    *                must stay in history, because a later out-of-order
    *                arrival can land between it and its twin and make it
    *                significant again — dropping it would break
    *                permutation convergence.
    */
  final case class KernelResult(live: DataFrame, audit: DataFrame,
                                history: DataFrame)

  /** Fold a batch of updates into (empty or existing) state.
    *
    * Two state-feeding modes, both with order-independent LIVE results:
    *  - `state` = previous `KernelResult.history`: the emitted audit is
    *    the CANONICAL history — identical for any batch split / arrival
    *    order (the mode the permutation suite checks; at scale, compact
    *    closed versions out once they exceed the lateness horizon you
    *    care to repair);
    *  - `state` = live rows only: matches the reference's runtime
    *    behavior — an update older than the live version cannot
    *    retro-insert into history (its F7 newer-only guard,
    *    RowState.java:77-79) and audit becomes arrival-order-dependent,
    *    exactly as the reference's audit tables are.
    *
    * @param state       current rows. Must contain keyCols,
    *                    validFromUsCol, tieCol, payloadCols.
    * @param updates     update rows, same columns.
    * @param keyCols     natural key (surrogate-free: stable across replays).
    * @param validFromUsCol event time, epoch µs.
    * @param tieCol      deterministic tie-breaker (e.g. source message id).
    * @param payloadCols mutable payload columns (F6 diff is over these).
    */
  def applyBatch(
      state: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      validFromUsCol: String,
      tieCol: String,
      payloadCols: Seq[String]): KernelResult = {

    val cols = keyCols ++ Seq(validFromUsCol, tieCol) ++ payloadCols
    val all = state.selectExpr(cols: _*).unionByName(updates.selectExpr(cols: _*))

    val byKey = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(validFromUsCol), col(tieCol))

    // W2: at-least-once delivery — an exact replay of a message (same key,
    // validFrom, tie) is a no-op (ref Technical_overview_of_EMAP.md:189-196).
    // `tie` must uniquely identify the source message. Replays are adjacent
    // in the (validFrom, tie) sort, so a lag-filter dedups them inside the
    // SAME window pass as the F6/lead steps below — the whole kernel is
    // ONE hash exchange + ONE sort (a dropDuplicates here planned as two
    // extra exchanges + a SortAggregate).
    val msgId = struct(col(validFromUsCol), col(tieCol))
    val history = all
      .withColumn("__prev_id", lag(msgId, 1).over(byKey))
      .filter(col("__prev_id").isNull || !(msgId <=> col("__prev_id")))
      .drop("__prev_id")

    val payload = struct(payloadCols.map(col): _*)
    // F6 (output-side): coalesce runs of identical consecutive payloads —
    // keep the FIRST of each run (a no-op update does not bump validFrom;
    // ref RowState.java:155-162).
    val kept = history
      .withColumn("__prev_payload", lag(payload, 1).over(byKey))
      .filter(col("__prev_payload").isNull ||
        !(payload <=> col("__prev_payload")))
      .drop("__prev_payload")

    // Same partitioning & ordering → no extra shuffle for the second pass.
    val withUntil = kept
      .withColumn("valid_until_us", lead(col(validFromUsCol), 1).over(byKey))

    KernelResult(
      live = withUntil.filter(col("valid_until_us").isNull).drop("valid_until_us"),
      audit = withUntil.filter(col("valid_until_us").isNotNull),
      history = history)
  }

  /** O3: delete-if-newer with audit (ref: core/.../PersonController.java:347-366).
    * Deletes (with tombstone into audit) live rows whose key appears in
    * `deletes` with a strictly newer validFrom.
    */
  def deleteIfNewer(
      live: DataFrame,
      deletes: DataFrame,
      keyCols: Seq[String],
      validFromUsCol: String): KernelResult = {
    val dk = deletes
      .groupBy(keyCols.map(col): _*)
      .agg(max(col(validFromUsCol)).as("__del_vf"))
    val joined = live.join(dk, keyCols, "left")
    val isDeleted = col("__del_vf").isNotNull && col("__del_vf") > col(validFromUsCol)
    val remaining = joined.filter(!isDeleted).drop("__del_vf")
    KernelResult(
      live = remaining,
      audit = joined.filter(isDeleted)
        .withColumn("valid_until_us", col("__del_vf")).drop("__del_vf"),
      history = remaining)
  }
}
