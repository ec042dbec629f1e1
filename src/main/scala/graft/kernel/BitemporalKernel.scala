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
  /** @param materialize hook applied to the two shared intermediates
    *   (deduped message log; stamped versions). The returned
    *   live/audit/history all branch off them; a caller running several
    *   actions over the result MAY pass a persist here — but measure
    *   first: the two window passes share one exchange+sort, so
    *   recomputing the fold per action from cheap inputs (cached batch +
    *   columnar state) usually beats materializing two state-sized
    *   caches (StarPipeline measured pinning as a 55% regression and
    *   passes identity). Default is identity (pure, no cache handles
    *   leak).
    */
  def applyBatch(
      state: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      validFromUsCol: String,
      tieCol: String,
      payloadCols: Seq[String],
      materialize: DataFrame => DataFrame = identity): KernelResult = {
    val (history, withUntil) =
      foldVersions(state, updates, keyCols, validFromUsCol, tieCol,
        payloadCols, materialize)
    KernelResult(
      live = withUntil.filter(col("valid_until_us").isNull).drop("valid_until_us"),
      audit = withUntil.filter(col("valid_until_us").isNotNull),
      history = history)
  }

  /** Shared valid-time fold: returns (deduped message log, kept versions
    * with valid_until_us stamped), each passed through `materialize`.
    */
  private def foldVersions(
      state: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      validFromUsCol: String,
      tieCol: String,
      payloadCols: Seq[String],
      materialize: DataFrame => DataFrame = identity): (DataFrame, DataFrame) = {

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
    val history = materialize(all
      .withColumn("__prev_id", lag(msgId, 1).over(byKey))
      .filter(col("__prev_id").isNull || !(msgId <=> col("__prev_id")))
      .drop("__prev_id"))

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
    val withUntil = materialize(kept
      .withColumn("valid_until_us", lead(col(validFromUsCol), 1).over(byKey)))

    (history, withUntil)
  }

  // =================================================================
  // Stored-time axis — the second half of "bitemporal"
  // =================================================================

  /** Bitemporal state carried between batches.
    *
    * @param messages deduped raw message log (the valid-time fold input;
    *                 same role as [[KernelResult.history]]).
    * @param table    bitemporal version records: keyCols, validFromUs,
    *                 tie, payload, `valid_until_us`, `stored_from_us`,
    *                 `stored_until_us`. A record with null stored_until is
    *                 part of the current belief; stored-closed records are
    *                 IMMUTABLE — late arrivals rewrite valid-time history
    *                 but only ever append/close stored-time records, which
    *                 is what makes time-travel reproducible
    *                 (ref: informdb/AuditCore.java:32-35, 83-86;
    *                 TemporalCore.java:29-32).
    */
  final case class BitemporalState(messages: DataFrame, table: DataFrame)

  /** Empty bitemporal state with a schema derived from `updates`. */
  def emptyBitemporal(
      updates: DataFrame,
      keyCols: Seq[String],
      validFromUsCol: String,
      tieCol: String,
      payloadCols: Seq[String]): BitemporalState = {
    val msgCols = keyCols ++ Seq(validFromUsCol, tieCol) ++ payloadCols
    val empty = updates.selectExpr(msgCols: _*).limit(0)
    BitemporalState(
      messages = empty,
      table = empty
        .withColumn("valid_until_us", lit(null).cast("long"))
        .withColumn("stored_from_us", lit(null).cast("long"))
        .withColumn("stored_until_us", lit(null).cast("long")))
  }

  /** Fold one micro-batch of updates into bitemporal state (O2 with BOTH
    * audit axes — the reference's full `RowState` + `@AuditTable` pattern:
    * superseded rows get validUntil AND storedUntil stamped,
    * ref informdb/AuditCore.java:32-35).
    *
    * Semantics: re-derive the canonical valid-time history from the full
    * message log (order-independent, permutation-convergent), then diff it
    * against the open (stored_until IS NULL) records:
    *   - identical records (same key, validFrom, tie, payload, validUntil)
    *     keep their original stored_from — an update that doesn't change a
    *     version causes no stored churn (F6 on the stored axis);
    *   - records that disappeared or changed are closed with
    *     stored_until = the batch's stored stamp for that key;
    *   - new/changed records open with stored_from = that stamp.
    *
    * Stored-time granularity is the batch: all of a key's changes within
    * one batch share one stamp, `max(storedFromUs)` over the key's updates
    * (the reference, processing serially, stamps per message — call this
    * once per distinct storedFrom for that granularity; the fold is
    * associative so the result agrees).
    *
    * Scale: cost is O(history of touched keys) when the caller pre-buckets
    * state by key (see streaming.StarPipeline's bucketed fold) — keys
    * without updates are diff-identity and produce no churn, so folding
    * only buckets containing batch keys is exact.
    *
    * Time-travel over the result: [[graft.functions.GraftFunctions.validAsOfBitemporal]]
    * — `stored_from <= S < stored_until AND valid_from <= t < valid_until`
    * answers "state as the database knew it at S, effective at t"
    * (ref informdb/AuditCore.java:83-86).
    */
  def applyBitemporal(
      prev: BitemporalState,
      updates: DataFrame,
      keyCols: Seq[String],
      validFromUsCol: String,
      tieCol: String,
      storedFromUsCol: String,
      payloadCols: Seq[String],
      materialize: DataFrame => DataFrame = identity): BitemporalState = {

    val (newMessages, newVersions) = foldVersions(
      prev.messages, updates, keyCols, validFromUsCol, tieCol, payloadCols,
      materialize)

    // One stored stamp per touched key (batch granularity — see scaladoc).
    val stamps = updates
      .groupBy(keyCols.map(col): _*)
      .agg(max(col(storedFromUsCol)).as("__stamp"))

    val closed = prev.table.filter(col("stored_until_us").isNotNull)
    val open = prev.table.filter(col("stored_until_us").isNull)
      .drop("stored_until_us")

    // Diff open records against the re-derived versions on the version
    // identity (key, validFrom, tie); payload/validUntil compared
    // null-safely. Full outer join: left-only = disappeared (absorbed or
    // superseded shape), right-only = newly created, both = unchanged or
    // content-changed.
    val idCols = keyCols :+ validFromUsCol :+ tieCol
    val oldSide = open.select(
      idCols.map(col) ++
        payloadCols.map(c => col(c).as(s"__old_$c")) ++
        Seq(col("valid_until_us").as("__old_vu"),
          col("stored_from_us").as("__old_sf"),
          lit(true).as("__in_old")): _*)
    val newSide = newVersions.withColumn("__in_new", lit(true))

    val diff = newSide.join(oldSide, idCols, "full_outer")
      .join(stamps, keyCols, "left")

    val samePayload = struct(payloadCols.map(col): _*) <=>
      struct(payloadCols.map(c => col(s"__old_$c")): _*)
    val unchanged = col("__in_new").isNotNull && col("__in_old").isNotNull &&
      samePayload && (col("valid_until_us") <=> col("__old_vu"))

    val outCols = keyCols ++ Seq(validFromUsCol, tieCol) ++ payloadCols
    val keepUnchanged = diff.filter(unchanged)
      .select(outCols.map(col) ++ Seq(col("valid_until_us"),
        col("__old_sf").as("stored_from_us"),
        lit(null).cast("long").as("stored_until_us")): _*)
    val closeOld = diff.filter(col("__in_old").isNotNull && !unchanged)
      .select(keyCols.map(col) ++ Seq(col(validFromUsCol), col(tieCol)) ++
        payloadCols.map(c => col(s"__old_$c").as(c)) ++
        Seq(col("__old_vu").as("valid_until_us"),
          col("__old_sf").as("stored_from_us"),
          col("__stamp").as("stored_until_us")): _*)
    val openNew = diff.filter(col("__in_new").isNotNull && !unchanged)
      .select(outCols.map(col) ++ Seq(col("valid_until_us"),
        col("__stamp").as("stored_from_us"),
        lit(null).cast("long").as("stored_until_us")): _*)

    // Bound the output partition count. The 3 diff branches are narrow
    // over `open` (the batch side broadcasts), so each carries the
    // previous table's partitions — without this coalesce the union
    // compounds 3× per fold (exponential partition growth: measured
    // 1→4→13→40→121… and a 120k-task stage by fold 10). coalesce is
    // narrow (closed records don't move); at scale the caller's bucketed
    // fold keeps per-bucket sizes bounded.
    val nParts = math.max(1, updates.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt)
    BitemporalState(
      messages = newMessages,
      table = closed.unionByName(keepUnchanged)
        .unionByName(closeOld).unionByName(openNew).coalesce(nParts))
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
