package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S3/S4: the dead-letter channel — the Spark analog of the reference's
  * manual ack/nack-no-requeue consume loop (core/.../emapstar/App.java:75-118:
  * ack on success, nack without requeue on processing error, with the
  * failure recorded in the per-message effect log,
  * core/.../repos/IdsEffectLogging.java:24-41).
  *
  * In a micro-batch engine the queue is the batch boundary, so "nack" is
  * not a broker call but a routing decision: every message either enters
  * the fold (clean channel) or lands in a dead-letter table carrying the
  * rejection reason and its original payload for later replay/inspection.
  *
  * Rules are ordered `(reason, predicate)` pairs; the FIRST matching rule
  * wins (mirroring the serial guard chain a controller runs before
  * processing — F9 empty-field guards, unroutable-type skips). Both
  * channels are plain filters over the same input, so Catalyst plans one
  * scan with two codegen'd predicate branches — no shuffle, no UDF, and
  * at 100 TB the dead-letter side is the rare branch of a narrow map.
  */
object DeadLetter {

  /** clean = rows matching no rule; dead = rows tagged with the first
    * matching rule's reason in a `reason` column.
    */
  final case class Routed(clean: DataFrame, dead: DataFrame)

  def route(df: DataFrame, rules: Seq[(String, Column)]): Routed = {
    require(rules.nonEmpty, "dead-letter routing needs at least one rule")
    require(!df.columns.contains("reason"),
      "input already has a 'reason' column")
    // First-match-wins: when() chains short-circuit in codegen, so a
    // clean row evaluates every predicate once and a dead row stops at
    // its first hit — same cost shape as the reference's guard chain.
    val reason = coalesce(rules.map { case (r, c) => when(c, lit(r)) }: _*)
    val tagged = df.withColumn("reason", reason)
    Routed(
      clean = tagged.filter(col("reason").isNull).drop("reason"),
      dead = tagged.filter(col("reason").isNotNull))
  }

  /** The standard guard chain for parsed ADT wire messages (columns from
    * [[graft.sources.Hl7Wire.parseAdt]]):
    *
    *  - `unroutable`     — no parseable MSH ⇒ no message type at all
    *                       (the reference's parse exception ⇒ nack path);
    *  - `unhandled_type` — MSH-9 routed to no factory
    *                       (hl7-reader skips types it has no builder for,
    *                       IdsOperations.java:413-477 default branch);
    *  - `missing_mrn`    — F9 guard: identity operators need an MRN
    *                       (PersonController empty-identifier skip);
    *  - `missing_valid_from` — no event/recorded time ⇒ the newer-only
    *                       guards (F7) cannot order the message.
    */
  def adtRules: Seq[(String, Column)] = Seq(
    "unroutable" -> col("msgType").isNull,
    "unhandled_type" -> col("msgType").startsWith("Unhandled:"),
    "missing_mrn" -> col("mrn").isNull,
    "missing_valid_from" -> col("validFromUs").isNull)
}
