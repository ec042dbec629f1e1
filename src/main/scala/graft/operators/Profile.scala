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

  /** Exact rank-based per-group quantiles: for each q, the value at
    * 1-based rank max(1, ceil(q·n)) under ascending value order —
    * the "nearest-rank" definition, exact integers all the way, so
    * (unlike interpolating percentile_cont in IEEE arithmetic) the
    * replay is engine-portable. One window shuffle on the group key;
    * ranks and counts share it. Output: (group, q10k, quantile value)
    * with q given in parts-per-10000.
    */
  def groupQuantiles(df: DataFrame, groupCol: String, valCol: String,
                     q10k: Seq[Long]): DataFrame = {
    require(q10k.nonEmpty && q10k.forall(q => q > 0 && q <= 10000),
      "quantiles are parts-per-10000 in (0, 10000]")
    // nulls are excluded BEFORE ranking: a null is not a quantile
    // value, and Spark's asc-nulls-first default would both return
    // null "values" and shift real values' ranks (an engine whose sort
    // puts nulls last — e.g. the SQL oracle — would then diverge);
    // ranks and n are over the non-null multiset
    //
    // row_number's rank ASSIGNMENT among equal values is arbitrary,
    // but the VALUE at any rank is determined by the multiset alone —
    // which is all the output exposes, so no tie-break column needed
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("v"))
    val ranked = df.select(col(groupCol).as("grp"), col(valCol).as("v"))
      .filter(col("v").isNotNull)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))))
    // ONE ranked pass for ANY number of quantiles: each ranked row
    // tests its rank against the m requested targets (a narrow
    // codegen'd explode+filter) instead of re-running the sort+window
    // once per quantile — at a 100 TB fact the window cost is paid
    // once, not m times. Exact integer ceil division:
    // ceil(n·q / 10⁴) without IEEE.
    ranked
      .select(col("grp"), col("v"),
        explode(typedLit(q10k.sorted)).as("q10k"),
        col("rn"), col("n"))
      .filter(col("rn") ===
        greatest(lit(1L), expr("(n * q10k + 9999L) div 10000L")))
      .select(col("grp"), col("q10k"), col("v").as("value"))
  }

  /** Fold one ingest batch's per-group value histogram into a
    * PERSISTED index: one (group, value, count) row per distinct
    * value the batch contributes — counts add across layers, so the
    * merged histogram is the union's exact value-frequency table and
    * [[groupQuantilesFromIndex]] recovers the one-shot
    * [[groupQuantiles]] EXACTLY (q132 against q120's verbatim
    * oracle). Exact quantiles under continuous ingest: O(batch)
    * folds, at-rest state bounded by distinct (group, value) pairs —
    * for discrete measures (lengths, counts, scores in fixed-point)
    * that is tiny regardless of corpus size, and repeated quantile
    * queries read the histogram, never the fact table. Nulls are
    * excluded, as in the one-shot path.
    */
  def histAppend(df: DataFrame, groupCol: String, valCol: String,
                 indexDir: String, batchId: Long): Unit =
    df.select(col(groupCol).as("grp"), col(valCol).as("v"))
      .filter(col("v").isNotNull)
      .groupBy("grp", "v").agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")

  /** Nearest-rank quantiles from the merged histogram: per group, the
    * value v covers ranks (cum − cnt, cum] of the ascending value
    * order, so the q-quantile is the v whose range contains
    * max(1, ceil(n·q/10⁴)) — one cumulative window over
    * histogram-sized rows (vs corpus-sized in the one-shot path),
    * every comparison exact-integer.
    */
  def groupQuantilesFromIndex(spark: org.apache.spark.sql.SparkSession,
                              indexDir: String,
                              q10k: Seq[Long]): DataFrame = {
    require(q10k.nonEmpty && q10k.forall(q => q > 0 && q <= 10000),
      "quantiles are parts-per-10000 in (0, 10000]")
    val grpW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"))
    val cumW = grpW.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    spark.read.parquet(indexDir)
      .groupBy("grp", "v").agg(sum("cnt").as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(grpW))
      .select(col("grp"), col("v"), col("cnt"), col("cum"), col("n"),
        explode(typedLit(q10k.sorted)).as("q10k"))
      .withColumn("target",
        greatest(lit(1L), expr("(n * q10k + 9999L) div 10000L")))
      .filter(col("cum") >= col("target") &&
        col("cum") - col("cnt") < col("target"))
      .select(col("grp"), col("q10k"), col("v").as("value"))
  }

  def profile(df: DataFrame, cols: Seq[String],
              kmvK: Int = 64): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val stream = colStream(df, cols)
    val base = stream.groupBy("column")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
    val distincts = Sketches.kmvDistinct(
        stream.filter(col("v").isNotNull), "column", "v", kmvK)
      .select(col("grp").as("column"), col("est_distinct"))
    assemble(base, distincts)
  }

  private def colStream(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map(c =>
        df.select(lit(c).as("column"), col(c).cast("string").as("v")))
      .reduce(_ unionByName _)

  private def assemble(base: DataFrame, distincts: DataFrame): DataFrame =
    base.join(distincts, Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_null"),
        col("min_v"), col("max_v"),
        coalesce(col("est_distinct"), lit(0L)).as("est_distinct"))

  // ------------------------------------------------ persisted profile index

  /** Fold one ingest batch's per-column stats into a PERSISTED profile
    * index: a `stats/` layer (one pre-reduced row per column: counts,
    * nulls, binary min/max) and a `kmv/` layer (the batch's k-minimum
    * distinct-value hashes per column). Every component obeys a merge
    * law — counts add, min/max compose, KMV minima min-union — so
    * [[profileFromIndex]] over the folded layers equals the one-shot
    * [[profile]] of the union EXACTLY (q128 proves it against q118's
    * verbatim oracle). This is "ANALYZE under continuous ingest":
    * per-fold cost is O(batch), the at-rest index is bounded by
    * layers × (columns + columns·k) rows, and the 100 TB table is
    * never rescanned to refresh its stats.
    */
  def profileAppend(batch: DataFrame, cols: Seq[String], kmvK: Int,
                    indexDir: String, batchId: Long): Unit = {
    require(cols.nonEmpty, "profile needs at least one column")
    val stream = colStream(batch, cols)
    stream.groupBy("column")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      .write.mode("overwrite").parquet(s"$indexDir/stats/batch=$batchId")
    Sketches.kmvMinima(stream.filter(col("v").isNotNull),
        "column", "v", kmvK)
      .write.mode("overwrite").parquet(s"$indexDir/kmv/batch=$batchId")
  }

  /** The merged table profile from the at-rest index: layer stats
    * re-aggregate (sum/sum/min/max — a string's global binary min is
    * the min of per-batch mins), layer minima re-rank through the
    * shared KMV estimate path.
    */
  def profileFromIndex(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String, kmvK: Int): DataFrame = {
    val base = spark.read.parquet(s"$indexDir/stats")
      .groupBy("column")
      .agg(sum("n_rows").as("n_rows"), sum("n_null").as("n_null"),
        min("min_v").as("min_v"), max("max_v").as("max_v"))
    val distincts = Sketches.kmvEstimate(
        spark.read.parquet(s"$indexDir/kmv").select(
          col("grp"), col("h")), kmvK)
      .select(col("grp").as("column"), col("est_distinct"))
    assemble(base, distincts)
  }
}
