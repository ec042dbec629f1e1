package graft

import org.apache.spark.sql.DataFrame
import graft.operators.DeptStates

/** O12 claim semantics ported from the reference's department-state
  * cases (LocationController.java:257-327): contradiction → error
  * channel, claimed-but-absent previous → backward-extended
  * materialization, arrival-order invariance.
  */
class DeptStatesSpec extends SparkSpecBase {
  import spark.implicits._

  private def df(ms: Seq[(String, Long, Long, String, Option[String])]): DataFrame =
    ms.toDF("key", "tsUs", "msgId", "state", "claimedPrev")

  private def hist(d: DataFrame): Seq[(String, Option[Long], String, Boolean, Option[Long])] =
    DeptStates.history(d).orderBy($"key", $"validFromUs".asc_nulls_first)
      .select("key", "validFromUs", "state", "inferred", "validUntilUs")
      .as[(String, Option[Long], String, Boolean, Option[Long])].collect().toSeq

  test("clean claim chain closes intervals, no errors") {
    val d = df(Seq(("d1", 1000L, 1L, "A", None),
      ("d1", 2000L, 2L, "B", Some("A")), ("d1", 3000L, 3L, "C", Some("B"))))
    assert(hist(d) == Seq(
      ("d1", Some(1000L), "A", false, Some(2000L)),
      ("d1", Some(2000L), "B", false, Some(3000L)),
      ("d1", Some(3000L), "C", false, None)))
    assert(DeptStates.errors(d).count() == 0)
  }

  test("contradicted claim → IncompatibleDatabaseState; state unchanged for successors") {
    val d = df(Seq(("d1", 1000L, 1L, "A", None),
      ("d1", 2000L, 2L, "C", Some("B")), // claims B, stored is A → reject
      ("d1", 3000L, 3L, "B", Some("A")))) // compares against A (not C!)
    val errs = DeptStates.errors(d).collect()
    assert(errs.length == 1 && errs.head.getAs[Long]("msgId") == 2L)
    assert(errs.head.getAs[String]("error")
      .startsWith("IncompatibleDatabaseState"))
    assert(hist(d) == Seq(
      ("d1", Some(1000L), "A", false, Some(3000L)),
      ("d1", Some(3000L), "B", false, None)))
  }

  test("claimed-but-absent previous is materialized, backward-extended") {
    val d = df(Seq(("d1", 5000L, 1L, "B", Some("A"))))
    assert(hist(d) == Seq(
      ("d1", None, "A", true, Some(5000L)), // open start, closed by the claimer
      ("d1", Some(5000L), "B", false, None)))
    assert(DeptStates.errors(d).count() == 0)
  }

  test("arrival order does not change the outcome") {
    val msgs = Seq(("d1", 1000L, 1L, "A", None),
      ("d1", 2000L, 2L, "B", Some("A")), ("d1", 3000L, 3L, "C", Some("B")),
      ("d2", 1000L, 4L, "X", Some("W")))
    val ref = hist(df(msgs))
    val refErr = DeptStates.errors(df(msgs)).count()
    for (p <- new scala.util.Random(5).shuffle(msgs.permutations.take(6).toSeq))
      assert(hist(df(p)) == ref && DeptStates.errors(df(p)).count() == refErr)
  }
}
