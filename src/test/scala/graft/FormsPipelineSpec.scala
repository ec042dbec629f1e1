package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.FormsPipeline

/** O19: the Forms (SDE) vertical — persisted folds, placeholder dims,
  * filing-date-only no-ops, the F3 flag, and out-of-order convergence.
  */
case class FormsAnswerMsg(questionId: String, filedTimeUs: Long,
    msgId: Long, context: String, stringValue: String,
    numericValue: java.lang.Double, booleanValue: java.lang.Boolean,
    dateValue: String, datetimeValueUs: java.lang.Long)
case class FormsMsg(formInstanceId: String, formId: String, mrn: String,
    visitNumber: String, firstFiledTimeUs: Long, msgId: Long,
    answers: Seq[FormsAnswerMsg])

class FormsPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private def cfgAt(enabled: Boolean = true) = FormsPipeline.Config(
    java.nio.file.Files.createTempDirectory("forms_state").toString,
    nBuckets = 4, enabled = enabled)

  private def answer(q: String, filed: Long, msg: Long, s: String = null,
                     n: java.lang.Double = null): (String, Long, Long,
      String, String, java.lang.Double, java.lang.Boolean, String,
      java.lang.Long) =
    (q, filed, msg, null, s, n, null, null, null)

  private def formsDf(rows: (String, String, String, String, Long, Long,
      Seq[(String, Long, Long, String, String, java.lang.Double,
        java.lang.Boolean, String, java.lang.Long)])*): DataFrame =
    rows.toSeq
      .toDF("formInstanceId", "formId", "mrn", "visitNumber",
        "firstFiledTimeUs", "msgId", "answers0")
      .withColumn("answers", expr(
        """transform(answers0, a -> named_struct(
          |'questionId', a._1, 'filedTimeUs', a._2, 'msgId', a._3,
          |'context', a._4, 'stringValue', a._5, 'numericValue', a._6,
          |'booleanValue', a._7, 'dateValue', a._8,
          |'datetimeValueUs', a._9))""".stripMargin))
      .drop("answers0")

  private val meta1 = Seq(("2056", 500L, 100L, "ICU admission", "ICU form"))
    .toDF("formId", "validFromUs", "msgId", "name", "patientFriendlyName")
  private val qMeta1 = Seq(
    ("Q1", 500L, 101L, "Ventilated?", "vent", "is the patient ventilated"))
    .toDF("questionId", "validFromUs", "msgId", "name", "abbrevName",
      "description")

  test("answers fold, metadata enriches placeholders in any order") {
    val batch = formsDf(
      ("F1", "2056", "M1", "V1", 1000L, 1L, Seq(
        answer("Q1", 1000L, 1L, s = "yes"),
        answer("Q2", 1000L, 2L, n = 4.5))))

    // order A: answers first, metadata later
    val a = cfgAt()
    FormsPipeline.foldBatch(1L, a, forms = Some(batch))
    val phDefs = FormsPipeline.definitions(spark, a).get
    assert(phDefs.filter(col("placeholder")).count() == 1)
    val phQs = FormsPipeline.questions(spark, a).get
    assert(phQs.filter(col("placeholder")).count() == 2)
    FormsPipeline.foldBatch(2L, a, formMeta = Some(meta1),
      qMeta = Some(qMeta1))

    // order B: metadata first, answers later
    val b = cfgAt()
    FormsPipeline.foldBatch(1L, b, formMeta = Some(meta1),
      qMeta = Some(qMeta1))
    FormsPipeline.foldBatch(2L, b, forms = Some(batch))

    // both orders converge: definition enriched, Q2 still a placeholder
    for (c <- Seq(a, b)) {
      val defs = FormsPipeline.definitions(spark, c).get
        .select("formId", "name", "placeholder")
        .as[(String, String, Boolean)].collect().toSet
      assert(defs == Set(("2056", "ICU admission", false)))
      val qs = FormsPipeline.questions(spark, c).get
        .select("questionId", "name", "placeholder")
        .as[(String, String, Boolean)].collect().toSet
      assert(qs == Set(("Q1", "Ventilated?", false),
        ("Q2", null, true)))
      val ans = FormsPipeline.answers(spark, c).get
        .select("questionId", "stringValue", "numericValue", "formName",
          "questionName")
        .as[(String, String, Option[Double], String, String)]
        .collect().toSet
      assert(ans == Set(
        ("Q1", "yes", None, "ICU admission", "Ventilated?"),
        ("Q2", null, Some(4.5), "ICU admission", null)))
    }
  }

  test("answer update folds newest-wins; filing-date-only change is " +
      "a no-op (no new version)") {
    val c = cfgAt()
    FormsPipeline.foldBatch(1L, c, forms = Some(formsDf(
      ("F1", "2056", "M1", "V1", 1000L, 1L,
        Seq(answer("Q1", 1000L, 1L, s = "yes"))))))
    // value change at a newer filed time → new live version
    FormsPipeline.foldBatch(2L, c, forms = Some(formsDf(
      ("F1", "2056", "M1", "V1", 1000L, 2L,
        Seq(answer("Q1", 2000L, 2L, s = "no"))))))
    // filing-date-only bump (same value) → F6 coalesces, nothing changes
    FormsPipeline.foldBatch(3L, c, forms = Some(formsDf(
      ("F1", "2056", "M1", "V1", 1000L, 3L,
        Seq(answer("Q1", 3000L, 3L, s = "no"))))))

    val live = FormsPipeline.answers(spark, c).get
      .select("questionId", "stringValue", "filedTimeUs")
      .as[(String, String, Long)].collect().toSeq
    assert(live == Seq(("Q1", "no", 2000L)))
  }

  test("streaming: form instances fold per micro-batch, state survives " +
      "a query restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val c = cfgAt()
    val ckpt = java.nio.file.Files.createTempDirectory("forms_ckpt").toString
    val input = MemoryStream[FormsMsg](spark)
    val q = FormsPipeline.start(input.toDS().toDF(), c, ckpt,
      Trigger.AvailableNow())
    input.addData(FormsMsg("F1", "2056", "M1", "V1", 1000L, 1L,
      Seq(FormsAnswerMsg("Q1", 1000L, 1L, null, "yes", null, null, null,
        null))))
    q.processAllAvailable(); q.stop()

    val q2 = FormsPipeline.start(input.toDS().toDF(), c, ckpt,
      Trigger.AvailableNow())
    input.addData(FormsMsg("F1", "2056", "M1", "V1", 1000L, 2L,
      Seq(FormsAnswerMsg("Q1", 2000L, 2L, null, "no", null, null, null,
        null))))
    q2.processAllAvailable(); q2.stop()

    val live = FormsPipeline.answers(spark, c).get
      .select("questionId", "stringValue", "filedTimeUs")
      .as[(String, String, Long)].collect().toSeq
    assert(live == Seq(("Q1", "no", 2000L)))
  }

  test("F3 disabled: foldBatch is a no-op") {
    val c = cfgAt(enabled = false)
    FormsPipeline.foldBatch(1L, c, forms = Some(formsDf(
      ("F1", "2056", "M1", "V1", 1000L, 1L,
        Seq(answer("Q1", 1000L, 1L, s = "yes"))))),
      formMeta = Some(meta1), qMeta = Some(qMeta1))
    assert(FormsPipeline.answers(spark, c).isEmpty)
    assert(FormsPipeline.definitions(spark, c).isEmpty)
  }
}
