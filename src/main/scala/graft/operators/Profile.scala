package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling ("ANALYZE" for a lakehouse table): per-column row
  * count, null count, binary-order min/max, and an APPROXIMATE
  * distinct count — the stats a 100 TB pipeline consults before
  * choosing join strategies, bucketing columns, or skew salts.
  *
  * Values are profiled as strings (one casting convention across
  * types, replayable in any engine); distinct counts come from the
  * deterministic KMV sketch ([[Sketches.kmvDistinct]]) — an exact
  * COUNT(DISTINCT) per column is precisely the full-shuffle this
  * avoids at scale, while nulls/min/max pre-reduce map-side to one
  * row per column.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              kmvK: Int = 64): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val stream = cols.map(c =>
        df.select(lit(c).as("column"), col(c).cast("string").as("v")))
      .reduce(_ unionByName _)
    val base = stream.groupBy("column")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
    val distincts = Sketches.kmvDistinct(
        stream.filter(col("v").isNotNull), "column", "v", kmvK)
      .select(col("grp").as("column"), col("est_distinct"))
    base.join(distincts, Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_null"),
        col("min_v"), col("max_v"),
        coalesce(col("est_distinct"), lit(0L)).as("est_distinct"))
  }
}
