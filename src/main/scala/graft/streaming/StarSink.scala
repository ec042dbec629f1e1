package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernel.BitemporalKernel

import java.sql.{Connection, DriverManager}
import java.util.Properties

/** S8's production seam: where a folded micro-batch LANDS. The kernel
  * fold (probe touched buckets → read only their state → one-exchange
  * window fold) is sink-agnostic; what varies between a lakehouse and
  * the reference's RDBMS star (core/.../informdb via JPA, batched
  * writes on a 2-connection pool) is purely the state's storage and
  * the atomic-swap primitive. This trait pins that boundary:
  *
  *  - [[ManifestStarSink]] — the engine's native parquet+manifest
  *    store ([[StarPipeline.foldBatch]]): bucket-granular rewrite,
  *    atomicity via one `_CURRENT` pointer rename. Single-writer;
  *    swap in Delta/Iceberg for multi-writer.
  *  - [[JdbcStarSink]] — the RDBMS path the reference ships
  *    (Emap-Core's postgres star): same kernel, state read back over
  *    JDBC with bucket predicates pushed down (one JDBC partition per
  *    touched bucket), results staged via Spark's parallel JDBC
  *    writer, then swapped in with ONE driver-side transaction of
  *    set-based MERGE / anti-join DELETE statements — the transaction
  *    commit plays the role of the manifest pointer rename, so
  *    readers never see a torn fold across history/live/audit.
  *
  * Both sinks fold the SAME batch to the SAME state (asserted in
  * `PipelineSpec`), so the choice is an ops decision, not a semantics
  * one.
  */
trait StarSink {
  /** Fold one micro-batch into persisted state (S8/W1/W2 contract:
    * incremental in touched keys, idempotent on replay, atomic swap).
    */
  def fold(batch: DataFrame, batchId: Long, cfg: StarPipeline.Config): Unit

  /** Read a state table ("history" | "live" | "audit") as of the last
    * committed fold; None before the first fold.
    */
  def read(spark: SparkSession, cfg: StarPipeline.Config,
           table: String): Option[DataFrame]
}

/** The parquet+manifest store — delegates to [[StarPipeline]]. */
object ManifestStarSink extends StarSink {
  def fold(batch: DataFrame, batchId: Long, cfg: StarPipeline.Config): Unit =
    StarPipeline.foldBatch(batch, batchId, cfg)
  def read(spark: SparkSession, cfg: StarPipeline.Config,
           table: String): Option[DataFrame] =
    StarPipeline.readState(spark, cfg, table)
}

/** JDBC MERGE sink: maintains the star in an RDBMS (the reference's
  * deployment shape). Smoke-tested against embedded Derby (the one
  * JDBC engine on Spark's own classpath); the SQL is ANSI
  * MERGE/EXISTS, portable to postgres 15+.
  *
  * Data path per fold — no driver-side row loop anywhere:
  *   1. probe the batch's touched buckets (≤ nBuckets small longs);
  *   2. `spark.read.jdbc` the touched buckets of HISTORY, one
  *      predicate per bucket → one parallel JDBC partition each, the
  *      bucket filter pushed down to the DB's index;
  *   3. kernel fold (identical to the manifest path);
  *   4. stage history/live/audit touched-bucket rows to `*_STAGE`
  *      tables via Spark's parallel JDBC writer (executors write);
  *   5. ONE driver transaction: per table an anti-join DELETE (rows
  *      of touched buckets absent from the new fold — covers run
  *      coalescing and emptied buckets) + a MERGE upsert from stage,
  *      then the progress mark — committed together, so a crash
  *      leaves either the old fold or the new one, never a mix, and
  *      the progress row makes replays exact no-ops (the kernel
  *      makes them no-ops anyway; the mark just skips the work).
  *
  * Scale notes: stage writes and state reads are executor-parallel;
  * the driver runs O(tables) set-based statements per batch. The DB
  * needs an index on (__bucket) and the MERGE keys, which is the
  * same physical design the reference's JPA schema declares. String
  * columns are forced to VARCHAR (Spark's Derby dialect would pick
  * CLOB, which Derby refuses to compare in MERGE ... ON).
  *
  * @param url  JDBC url (e.g. `jdbc:derby:/path/db;create=true`).
  * @param star table-name prefix for this star, e.g. "conditions" →
  *             CONDITIONS_HISTORY / _LIVE / _AUDIT (+ _STAGE twins).
  */
final class JdbcStarSink(url: String, star: String,
                         driver: String =
                           "org.apache.derby.jdbc.EmbeddedDriver")
    extends StarSink {

  private val Tables = Seq("history", "live", "audit")
  private def target(t: String) = s"${star.toUpperCase}_${t.toUpperCase}"
  private def stage(t: String) = target(t) + "_STAGE"
  private val progressTable = s"${star.toUpperCase}_PROGRESS"

  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", driver)
    p
  }

  private def q(id: String) = "\"" + id + "\""

  private def withConn[A](f: Connection => A): A = {
    Class.forName(driver)
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def tableExists(c: Connection, name: String): Boolean = {
    val rs = c.getMetaData.getTables(null, null, name, null)
    try rs.next() finally rs.close()
  }

  /** Null-safe key equality between stage alias `s` and the target
    * table (referenced by name — Derby's DELETE has no alias).
    */
  private def keyEq(t: String, keys: Seq[String]): String =
    keys.map(k =>
      s"""(S.${q(k)} = $t.${q(k)} OR (S.${q(k)} IS NULL AND $t.${q(k)} IS NULL))""")
      .mkString(" AND ")

  def fold(batch0: DataFrame, batchId: Long,
           cfg: StarPipeline.Config): Unit = {
    val spark = batch0.sparkSession
    // replay of an already-committed batch: exact no-op (W2)
    val done = withConn { c =>
      tableExists(c, progressTable) && {
        val rs = c.createStatement().executeQuery(
          s"""SELECT MAX("batch_id") FROM $progressTable""")
        try rs.next() && rs.getLong(1) >= batchId && !rs.wasNull()
        finally rs.close()
      }
    }
    if (done) return

    val batch = batch0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bucket = pmod(xxhash64(cfg.keyCols.map(col): _*),
        lit(cfg.nBuckets))
      val touched = batch.select(bucket.as("__bucket")).distinct()
        .collect().map(_.getLong(0)).sorted
      if (touched.isEmpty) return

      // touched-bucket history, one pushed-down predicate per bucket
      val history = if (!withConn(tableExists(_, target("history"))))
        batch.limit(0)
      else spark.read.jdbc(url, target("history"),
          touched.map(k => s"""${q("__bucket")} = $k"""), props)
        .drop("__bucket")

      val r = BitemporalKernel.applyBatch(history, batch, cfg.keyCols,
        cfg.validFromUsCol, cfg.tieCol, cfg.payloadCols)

      val outputs = Map(
        "history" -> r.history, "live" -> r.live, "audit" -> r.audit)
      // force comparable VARCHARs for every string column (incl. keys)
      def varcharHints(df: DataFrame): String =
        df.schema.fields.collect {
          case f if f.dataType == org.apache.spark.sql.types.StringType =>
            s"`${f.name}` VARCHAR(1024)"
        }.mkString(", ")

      val staged = outputs.map { case (t, df0) =>
        val df = df0.withColumn("__bucket", bucket)
        df.write.mode("overwrite")
          .option("createTableColumnTypes", varcharHints(df))
          .jdbc(url, stage(t), props)
        t -> df.columns.toSeq
      }

      withConn { c =>
        c.setAutoCommit(false)
        val st = c.createStatement()
        val inList = touched.mkString(", ")
        staged.foreach { case (t, cols) =>
          val tgt = target(t)
          if (!tableExists(c, tgt))
            st.executeUpdate(
              s"CREATE TABLE $tgt AS SELECT * FROM ${stage(t)} WITH NO DATA")
          // MERGE identity per table: live is one row per key; history
          // and audit are one row per version (key, validFrom, tie)
          val keys =
            if (t == "live") cfg.keyCols
            else cfg.keyCols ++ Seq(cfg.validFromUsCol, cfg.tieCol)
          st.executeUpdate(
            s"""DELETE FROM $tgt WHERE ${q("__bucket")} IN ($inList)
               |AND NOT EXISTS (SELECT 1 FROM ${stage(t)} S
               |  WHERE ${keyEq(tgt, keys)})""".stripMargin)
          val setCols = cols.filterNot(keys.contains)
          st.executeUpdate(
            s"""MERGE INTO $tgt T USING ${stage(t)} S
               |ON ${keyEq("T", keys)}
               |WHEN MATCHED THEN UPDATE SET
               |  ${setCols.map(p => s"${q(p)} = S.${q(p)}").mkString(", ")}
               |WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")})
               |  VALUES (${cols.map(p => s"S.${q(p)}").mkString(", ")})"""
              .stripMargin)
        }
        if (!tableExists(c, progressTable))
          st.executeUpdate(
            s"""CREATE TABLE $progressTable ("batch_id" BIGINT)""")
        st.executeUpdate(
          s"""INSERT INTO $progressTable ("batch_id") VALUES ($batchId)""")
        c.commit()
      }
    } finally batch.unpersist(false)
  }

  def read(spark: SparkSession, cfg: StarPipeline.Config,
           table: String): Option[DataFrame] =
    if (!withConn(tableExists(_, target(table)))) None
    else Some(spark.read.jdbc(url, target(table), props).drop("__bucket"))
}
