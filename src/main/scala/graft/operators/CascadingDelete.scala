package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.kernel.BitemporalKernel
import graft.kernel.BitemporalKernel.KernelResult

/** O11: cascading person/visit delete (SURVEY.md §2.4; ref:
  * core/.../AdtProcessor.java:117-130, DeletionController.java:49-67).
  *
  * A DeletePersonInformation message removes (with audit) every row
  * derived from that person that is OLDER than the message: demographics
  * keyed by mrn, then every per-visit child table (lab orders, consults,
  * forms, location visits) keyed by visitId — one delete-if-newer kernel
  * application per table, all driven by a single broadcastable key join.
  */
object CascadingDelete {

  final case class Cascade(demographics: KernelResult,
                           visits: KernelResult,
                           children: Map[String, KernelResult])

  /** @param deletes      (mrn, delTimeUs)
    * @param demographics person table, has mrn + validFromUsCol
    * @param visits       visit table, has mrn, visitId + validFromUsCol
    * @param children     name → per-visit table (visitId + validFromUsCol)
    */
  def person(deletes: DataFrame, demographics: DataFrame, visits: DataFrame,
             children: Map[String, DataFrame],
             validFromUsCol: String = "validFromUs"): Cascade = {
    val del = broadcast(deletes.select(col("mrn"), col("delTimeUs")))

    val demo = BitemporalKernel.deleteIfNewer(demographics,
      del.withColumnRenamed("delTimeUs", validFromUsCol),
      Seq("mrn"), validFromUsCol)

    val vis = BitemporalKernel.deleteIfNewer(visits,
      del.withColumnRenamed("delTimeUs", validFromUsCol),
      Seq("mrn"), validFromUsCol)

    // children cascade ONLY from visits that were actually deleted (a
    // visit newer than the delete survives — F7 — and keeps its children)
    val visitDel = vis.audit
      .select(col("visitId"), col("valid_until_us").as(validFromUsCol))
    val kids = children.map { case (name, table) =>
      name -> BitemporalKernel.deleteIfNewer(table, visitDel,
        Seq("visitId"), validFromUsCol)
    }
    Cascade(demo, vis, kids)
  }
}
