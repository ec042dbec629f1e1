package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O12 with the reference's full claim semantics (ref:
  * core/.../LocationController.java:257-327). A state-change message
  * carries the CLAIMED previous state ("was X, now Y"); the reference:
  *
  *  - rejects the message with IncompatibleDatabaseState when the claim
  *    contradicts the stored current state (:306-317) — the message goes
  *    to the dead-letter channel and the database is unchanged;
  *  - materializes a claimed-but-absent previous state (:276-283): the
  *    first message for a key that claims a previous state backward-
  *    extends history with an inferred row for the claim, open-started
  *    (validFrom unknown → null) and closed at the message's time.
  *
  * Batch shape: acceptance of message i depends on the state left by the
  * last ACCEPTED message before it — a per-key sequential fold, which no
  * single window pass expresses (a rejected message must not shift the
  * comparison state for its successors). So: ONE shuffle on the key
  * (groupByKey) and a linear in-memory scan per key via flatMapGroups.
  * Per-key state chains are admin-event-scale (department changes), so
  * per-key memory is bounded; the operator distributes across keys like
  * any aggregation. The generic window re-derivation (Temporal
  * .scd2History) remains the right tool when messages carry no claims.
  */
object DeptStates {

  /** Input columns: key, tsUs, msgId, state, claimedPrev (nullable).
    * Output: key, validFromUs (null = unknown start of a materialized
    * claim), msgId, state, inferred, error (null = accepted).
    */
  def derive(messages: DataFrame): DataFrame = {
    import messages.sparkSession.implicits._
    val ds = messages
      .select(col("key").cast("string"), col("tsUs").cast("long"),
        col("msgId").cast("long"), col("state").cast("string"),
        col("claimedPrev").cast("string"))
      .as[(String, Long, Long, String, Option[String])]
    ds.groupByKey(_._1).flatMapGroups { (k, it) =>
      val sorted = it.toSeq.sortBy(m => (m._2, m._3))
      var cur: Option[String] = None
      val out = Seq.newBuilder[(String, Option[Long], Long, String, Boolean, Option[String])]
      for ((_, ts, id, st, claimed) <- sorted) {
        claimed match {
          case Some(c) if cur.exists(_ != c) =>
            out += ((k, Some(ts), id, st, false, Some(
              s"IncompatibleDatabaseState: claimed previous '$c' " +
                s"but stored '${cur.get}'")))
          case Some(c) if cur.isEmpty =>
            // backward-extend: materialize the claimed previous state
            out += ((k, None, id, c, true, None))
            out += ((k, Some(ts), id, st, false, None))
            cur = Some(st)
          case _ =>
            out += ((k, Some(ts), id, st, false, None))
            cur = Some(st)
        }
      }
      out.result().iterator
    }.toDF("key", "validFromUs", "msgId", "state", "inferred", "error")
  }

  /** Accepted SCD-2 history: intervals closed by the successor's
    * validFrom; the materialized claim (null validFrom) sorts first and
    * is closed by the message that claimed it.
    */
  def history(messages: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("validFromUs").asc_nulls_first, col("msgId"))
    derive(messages).filter(col("error").isNull)
      .withColumn("validUntilUs", lead(col("validFromUs"), 1).over(w))
      .drop("error")
  }

  /** The dead-letter channel: contradicted messages with their reason. */
  def errors(messages: DataFrame): DataFrame =
    derive(messages).filter(col("error").isNotNull)
      .select("key", "validFromUs", "msgId", "state", "error")
}
