package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.operators.{DeptStates, EntityUpserts, Labs}
import graft.sources.FixtureSource

import java.io.File
import scala.util.Random

/** Per-family permutation suites over the fixture corpus — the
  * reference's OrderPermutationBase pattern: every family's end state
  * must converge for ANY batch split / arrival order, and the fixtures
  * are consumed under the monitored-file guarantee.
  */
class FixturePermutationSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpusRoot = new File(getClass.getResource("/fixtures").toURI)

  // ---- schemas (code-defined contracts, never inferred) --------------
  private val flowSchema = StructType(Seq(
    StructField("visitId", StringType), StructField("observationTypeId", LongType),
    StructField("observationTimeUs", LongType), StructField("updatedTimeUs", LongType),
    StructField("msgId", LongType), StructField("valueType", StringType),
    StructField("numericValue", DoubleType), StructField("stringValue", StringType),
    StructField("dateValue", StringType), StructField("unit", StringType),
    StructField("comment", StringType)))
  private val condSchema = StructType(Seq(
    StructField("mrn", StringType), StructField("conditionTypeId", LongType),
    StructField("internalId", LongType), StructField("updatedTimeUs", LongType),
    StructField("msgId", LongType), StructField("status", StringType),
    StructField("severity", StringType), StructField("onsetDate", StringType),
    StructField("comment", StringType)))
  private val consultSchema = StructType(Seq(
    StructField("internalId", LongType), StructField("statusChangeTimeUs", LongType),
    StructField("msgId", LongType), StructField("consultTypeId", LongType),
    StructField("visitId", StringType), StructField("closed", BooleanType),
    StructField("cancelled", BooleanType), StructField("comments", StringType)))
  private val formDefSchema = StructType(Seq(
    StructField("internalId", LongType), StructField("validFromUs", LongType),
    StructField("msgId", LongType), StructField("name", StringType),
    StructField("patientFriendlyName", StringType)))
  private val formAnswerSchema = StructType(Seq(
    StructField("formId", LongType), StructField("questionHash", LongType),
    StructField("updatedTimeUs", LongType), StructField("msgId", LongType),
    StructField("valueText", StringType), StructField("valueNumeric", DoubleType)))
  private val deptSchema = StructType(Seq(
    StructField("key", StringType), StructField("tsUs", LongType),
    StructField("msgId", LongType), StructField("state", StringType),
    StructField("claimedPrev", StringType)))
  private val sensSchema = StructType(Seq(
    StructField("agent", StringType), StructField("value", StringType),
    StructField("resultTimeUs", LongType)))
  private val resSchema = StructType(Seq(
    StructField("testCode", StringType), StructField("mimeType", StringType),
    StructField("numericValue", DoubleType), StructField("stringValue", StringType),
    StructField("units", StringType), StructField("resultTimeUs", LongType),
    StructField("isolateCode", StringType),
    StructField("sensitivities", ArrayType(sensSchema))))
  private val labSchema = StructType(Seq(
    StructField("epicOrderNumber", StringType),
    StructField("labSpecimenNumber", StringType),
    StructField("battery", StringType), StructField("mrn", StringType),
    StructField("visitNumber", StringType),
    StructField("collectionTimeUs", LongType),
    StructField("statusChangeTimeUs", LongType),
    StructField("sourceMessageId", LongType),
    StructField("results", ArrayType(resSchema))))

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Registry-entity convergence: any shuffle + batch split of the
    * fixture messages folds to the bulk result.
    */
  private def converge(entity: String, msgs: DataFrame, trials: Int = 3): Unit = {
    val rows = msgs.collect().toSeq
    val ref = canon(EntityUpserts.upsert(entity, msgs.limit(0), msgs).live)
    assert(ref.nonEmpty)
    val rnd = new Random(11)
    for (_ <- 1 to trials) {
      val shuffled = rnd.shuffle(rows)
      val n = 1 + rnd.nextInt(3)
      val batches = shuffled.grouped(math.max(1, shuffled.size / n)).toSeq
      var history = msgs.limit(0)
      var live = msgs.limit(0)
      for (b <- batches) {
        val bdf = spark.createDataFrame(
          spark.sparkContext.parallelize(b, 1), msgs.schema)
        val r = EntityUpserts.upsert(entity, history, bdf)
        history = r.history.localCheckpoint()
        live = r.live
      }
      assert(canon(live) == ref, s"$entity diverged under permutation")
    }
  }

  test("flowsheet fixture family converges for every order (O14)") {
    val fx = new FixtureSource(corpusRoot)
    val msgs = fx.loadDir(spark, "Flowsheets", flowSchema)
    converge("visit_observation", msgs)
    // end-state: the corrected temperature wins
    val t = EntityUpserts.upsert("visit_observation", msgs.limit(0), msgs)
      .live.filter($"visitId" === "v1" && $"observationTypeId" === 7 &&
        $"observationTimeUs" === 1000000L)
      .select("numericValue").as[Double].head()
    assert(t == 37.2)
  }

  test("patient-condition fixture family converges (O17)") {
    val fx = new FixtureSource(corpusRoot)
    val msgs = fx.loadDir(spark, "PatientConditions", condSchema)
    converge("patient_condition", msgs)
    val st = EntityUpserts.upsert("patient_condition", msgs.limit(0), msgs)
      .live.filter($"internalId" === 100L).select("status").as[String].head()
    assert(st == "RESOLVED")
  }

  test("consult-request fixture family converges (O20)") {
    val fx = new FixtureSource(corpusRoot)
    val msgs = fx.loadDir(spark, "ConsultRequests", consultSchema)
    converge("consultation_request", msgs)
    val closed = EntityUpserts.upsert("consultation_request", msgs.limit(0),
      msgs).live.filter($"internalId" === 500L)
      .select("closed").as[Boolean].head()
    assert(closed)
  }

  test("form fixture family converges: definitions + answers (O19)") {
    val fx = new FixtureSource(corpusRoot)
    val defs = fx.load(spark, "Forms/definitions.json", formDefSchema)
    converge("form_definition", defs)
    val answers = fx.load(spark, "Forms/form_answers.json", formAnswerSchema)
    converge("form_answer", answers)
    val v = EntityUpserts.upsert("form_answer", answers.limit(0), answers)
      .live.filter($"questionHash" === 1L).select("valueText").as[String].head()
    assert(v == "no")
  }

  test("dept-state claims fixture family: O12 semantics over the corpus") {
    val fx = new FixtureSource(corpusRoot)
    val msgs = fx.loadDir(spark, "DeptStates", deptSchema)
    // EGA msg 3 claims UNKNOWN against stored CLOSED → rejected;
    // ICU's first message claims CLOSED → materialized backward-extension
    val errs = DeptStates.errors(msgs).collect()
    assert(errs.length == 1 && errs.head.getAs[Long]("msgId") == 3L)
    val hist = DeptStates.history(msgs)
    assert(hist.filter($"key" === "ICU" && $"inferred").count() == 1)
    assert(hist.filter($"key" === "EGA").count() == 2) // OPEN, CLOSED
  }

  test("lab fixture family: winpath incremental orders end state (O16)") {
    val fx = new FixtureSource(corpusRoot)
    val msgs = fx.loadDir(spark, "LabOrders/winpath", labSchema)
    // row order within the message set must not matter (canonical fold)
    val a = Labs.deriveStar(msgs)
    val b = Labs.deriveStar(msgs.orderBy($"sourceMessageId".desc))
    assert(canon(a.results) == canon(b.results))
    val res = a.results.select("testCode", "numericValue", "resultTimeUs")
      .as[(String, Option[Double], Long)].collect().toSet
    assert(res == Set(("ALP", Some(105.0), 3000L),
      ("ALB", Some(48.0), 3000L), ("CULT", None, 2500L)))
    val amox = a.sensitivities.filter($"agent" === "AMOX")
      .select("value").as[String].head()
    assert(amox == "S")
  }
}
