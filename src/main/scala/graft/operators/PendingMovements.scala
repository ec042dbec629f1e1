package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O13: pending-transfer lifecycle (SURVEY.md §2.4; ref:
  * core/.../PendingAdtController.java:69-145): a PendingTransfer opens a
  * PlannedMovement; a CancelPendingTransfer closes the most recent
  * matching (visit, location) pending request within the event-time
  * window.
  *
  * Batch formulation: union-tag both message kinds, one window pass per
  * (visit, location) carries the last pending id forward; each cancel
  * binds to that id; pendings then left-join their earliest bound cancel.
  * Same single-shuffle shape as the as-of join — no pairwise explosion.
  */
object PendingMovements {

  /** @param pendings (pendingId, visitId, location, tsUs)
    * @param cancels  (cancelId, visitId, location, tsUs)
    * @return (pendingId, visitId, location, requestTsUs,
    *         cancelledTsUs nullable)
    */
  def derive(pendings: DataFrame, cancels: DataFrame,
             matchWindowUs: Long): DataFrame = {
    val p = pendings.select(col("visitId"), col("location"),
      col("tsUs"), col("pendingId"), lit(1).as("__side"))
    val c = cancels.select(col("visitId"), col("location"),
      col("tsUs"), lit(null).cast("long").as("pendingId"),
      lit(2).as("__side"))
    val w = Window.partitionBy(col("visitId"), col("location"))
      .orderBy(col("tsUs"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tagged = p.unionByName(c)
      .withColumn("__open_pending",
        last(when(col("__side") === 1, struct(col("pendingId").as("id"),
          col("tsUs").as("reqTs"))), ignoreNulls = true).over(w))

    // each cancel binds to the most recent pending within the window
    val bound = tagged.filter(col("__side") === 2 &&
        col("__open_pending").isNotNull &&
        col("tsUs") - col("__open_pending.reqTs") <= matchWindowUs)
      .groupBy(col("__open_pending.id").as("pendingId"))
      .agg(min(col("tsUs")).as("cancelledTsUs"))

    pendings
      .join(bound, Seq("pendingId"), "left")
      .select(col("pendingId"), col("visitId"), col("location"),
        col("tsUs").as("requestTsUs"), col("cancelledTsUs"))
  }
}
