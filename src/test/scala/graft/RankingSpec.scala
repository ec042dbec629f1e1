package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Ranking

/** Distributed global row numbering == the single-partition window
  * rank, at any input partitioning.
  */
class RankingSpec extends SparkSpecBase {

  test("globalRowNumber equals the unpartitioned-window row_number " +
      "and never single-tasks the sort") {
    val df = spark.range(0, 1000)
      .select(col("id"),
        pmod(col("id") * 37 + 11, lit(101)).as("score"))
      .repartition(13) // scatter the input
    val viaWindow = df.withColumn("rk", row_number().over(
        Window.orderBy(col("score").desc, col("id"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val viaGlobal = Ranking.globalRowNumber(df,
        Seq(col("score").desc, col("id")), "rk")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(viaGlobal == viaWindow && viaGlobal.size == 1000)
  }
}
