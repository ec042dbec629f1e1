package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.kernel.BitemporalKernel

/** O16: lab order / sample / result / isolate-sensitivity upserts over
  * the 3-level nested interchange message (SURVEY.md §2.4; message shape
  * FIXTURES.md §2 — ref: emap-interchange interchange/lab/LabOrderMsg.java:29-78,
  * controllers core/.../LabOrderController.java:114-303,
  * LabResultController.java:57-222).
  *
  * Every level is one instance of the bitemporal kernel with its own
  * natural key and event-time column — the reference's chained
  * controllers become explode + applyBatch per level:
  *   sample   key=(labSpecimenNumber)                validFrom=collection
  *   order    key=(battery, labSpecimenNumber)       validFrom=statusChange
  *   result   key=(order key, testCode)              validFrom=resultTime
  *   sensitivity key=(result key, isolateCode, agent) validFrom=resultTime
  *
  * Nested arrays are exploded ONCE, then each level aggregates
  * independently — the input scan is shared, levels are independent
  * shuffles on their own keys (each broadcastable/AQE-planable).
  */
object Labs {

  final case class LabStar(samples: DataFrame, orders: DataFrame,
                           results: DataFrame, sensitivities: DataFrame)

  /** Expected input columns (nested):
    * epicOrderNumber, labSpecimenNumber, battery, mrn, visitNumber,
    * collectionTimeUs, statusChangeTimeUs, sourceMessageId,
    * results: array<struct<testCode, mimeType, numericValue, stringValue,
    *   units, resultTimeUs, isolateCode, sensitivities: array<struct<
    *   agent, value, resultTimeUs>>>>
    */
  def deriveStar(msgs: DataFrame): LabStar = {
    def fold(updates: DataFrame, key: Seq[String], vf: String,
             payload: Seq[String]) =
      BitemporalKernel.applyBatch(updates.limit(0), updates, key, vf,
        "sourceMessageId", payload).live

    val samples = fold(
      msgs.select(col("labSpecimenNumber"), col("collectionTimeUs"),
        col("sourceMessageId"), col("mrn"), col("visitNumber")),
      Seq("labSpecimenNumber"), "collectionTimeUs",
      Seq("mrn", "visitNumber"))

    val orders = fold(
      msgs.select(col("battery"), col("labSpecimenNumber"),
        col("statusChangeTimeUs"), col("sourceMessageId"),
        col("epicOrderNumber"), col("mrn"), col("visitNumber")),
      Seq("battery", "labSpecimenNumber"), "statusChangeTimeUs",
      Seq("epicOrderNumber", "mrn", "visitNumber"))

    // Binary (e.g. PDF) result values ride along as a first-class binary
    // payload column (ref LabResultController.java:131 valueAsBytes);
    // optional in the message schema so text-only feeds need not carry it.
    val hasBytes = msgs.schema("results").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("byteValue")
    val byteValue =
      if (hasBytes) col("r.byteValue") else lit(null).cast("binary")

    val resultRows = msgs
      .select(col("battery"), col("labSpecimenNumber"),
        col("sourceMessageId"), explode(col("results")).as("r"))
      .select(col("battery"), col("labSpecimenNumber"),
        col("sourceMessageId"), col("r.testCode").as("testCode"),
        col("r.mimeType").as("mimeType"),
        col("r.numericValue").as("numericValue"),
        col("r.stringValue").as("stringValue"),
        byteValue.as("byteValue"),
        col("r.units").as("units"),
        col("r.resultTimeUs").as("resultTimeUs"),
        col("r.isolateCode").as("isolateCode"),
        col("r.sensitivities").as("sensitivities"))

    // J7: result upsert key = (order, test definition); mime-typed value
    // dispatch is carried in the payload columns (NUMERIC vs TEXT vs
    // binary; X11 byte equality holds because Spark compares BinaryType
    // by content in `<=>`, so a re-sent identical PDF is an F6 no-op).
    val results = fold(
      resultRows.drop("sensitivities"),
      Seq("battery", "labSpecimenNumber", "testCode"), "resultTimeUs",
      Seq("mimeType", "numericValue", "stringValue", "byteValue", "units",
        "isolateCode"))

    val sensRows = resultRows
      .filter(col("isolateCode").isNotNull)
      .select(col("battery"), col("labSpecimenNumber"), col("testCode"),
        col("isolateCode"), col("sourceMessageId"),
        explode(col("sensitivities")).as("sx"))
      .select(col("battery"), col("labSpecimenNumber"), col("testCode"),
        col("isolateCode"), col("sourceMessageId"),
        col("sx.agent").as("agent"), col("sx.value").as("value"),
        col("sx.resultTimeUs").as("resultTimeUs"))

    val sensitivities = fold(sensRows,
      Seq("battery", "labSpecimenNumber", "testCode", "isolateCode",
        "agent"),
      "resultTimeUs", Seq("value"))

    LabStar(samples, orders, results, sensitivities)
  }

  /** ORR^O02 order cancel: delete order (and its results) only if the
    * cancel is newer (O3; ref LabOrderController delete path).
    * `cancels` columns: battery, labSpecimenNumber, cancelTimeUs.
    */
  def applyCancels(star: LabStar, cancels: DataFrame): LabStar = {
    val c = cancels.select(col("battery"), col("labSpecimenNumber"),
      col("cancelTimeUs"))
    def del(df: DataFrame, vf: String) =
      BitemporalKernel.deleteIfNewer(df,
        c.withColumnRenamed("cancelTimeUs", vf),
        Seq("battery", "labSpecimenNumber"), vf).live
    star.copy(
      orders = del(star.orders, "statusChangeTimeUs"),
      results = del(star.results, "resultTimeUs"),
      sensitivities = del(star.sensitivities, "resultTimeUs"))
  }
}
