package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed GLOBAL row numbering — the scalable replacement for
  * `row_number().over(Window.orderBy(...))`, which moves every row
  * through ONE task (Spark even warns "No Partition Defined"; at an
  * index of 10⁹ rows that single sort is the job).
  *
  * Shape: one range-partitioned total sort (`orderBy` — the same
  * exchange a global window would need anyway) followed by
  * `zipWithIndex`, which assigns contiguous index ranges per partition
  * from one lightweight per-partition count job — no second shuffle,
  * no single-task sort. Output order is the total sort order, so ranks
  * are deterministic for a deterministic sort key (make the key
  * total — include an id tie-break).
  *
  * The one RDD seam in the text stack, deliberately: global
  * enumeration is exactly the operation the DataFrame API can only
  * express through a single-partition window.
  */
object Ranking {

  /** Append `rankCol` = 1-based global rank under `sortCols`. */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
                      rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }
}
