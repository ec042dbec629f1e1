package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.kernel.BitemporalKernel

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** S8/W1: the streaming star-maintenance pipeline — every micro-batch of
  * messages is folded into the persisted bitemporal state via the kernel
  * (SURVEY.md §7 design stance: "the star tables ARE the state"; no
  * watermark can bound star state because lateness is unbounded, ref
  * Technical_overview_of_EMAP.md:180).
  *
  * foreachBatch = the reference's per-message ACID transaction at
  * micro-batch granularity.
  *
  * State layout — incremental by key bucket, atomic by manifest:
  *
  *   stateDir/_CURRENT              → name of the live manifest file
  *   stateDir/manifest-v<N>         → lines `table \t bucket \t relPath`
  *   stateDir/data/<table>/v<N>/__bucket=<k>/  (parquet files)
  *
  * History is hash-partitioned into `nBuckets` buckets on the key. A
  * micro-batch reads ONLY the buckets its keys hash into, folds them with
  * the kernel, and writes ONLY those buckets back; the new manifest
  * carries every untouched bucket's entry forward verbatim (same files —
  * zero I/O, not even a copy). Fold cost is therefore O(state of touched
  * buckets), not O(total state): size nBuckets so a bucket's history fits
  * an executor, and per-batch cost tracks batch key-spread instead of
  * table size — the property that keeps the write path alive at 100×.
  *
  * One manifest covers history/live/audit together, and readers resolve
  * every table through the single `_CURRENT` pointer (one atomic rename),
  * so a crash between table writes can never expose mixed versions —
  * a reader joining live+audit always sees one consistent fold.
  * (Single-writer parquet-swap; swap in Delta/Iceberg MERGE for
  * multi-writer production.)
  */
object StarPipeline {

  /** @param storedFromUsCol batch column holding the stored-time stamp
    *   (epoch µs, e.g. ingestion time) — consumed by the BITEMPORAL fold
    *   ([[foldBatchBitemporal]]); the valid-time-only [[foldBatch]]
    *   ignores it.
    */
  final case class Config(stateDir: String, keyCols: Seq[String],
                          validFromUsCol: String, tieCol: String,
                          payloadCols: Seq[String], nBuckets: Int = 64,
                          storedFromUsCol: String = "storedFromUs")

  private val Tables = Seq("history", "live", "audit")

  private def bucketOf(cfg: Config): Column =
    pmod(xxhash64(cfg.keyCols.map(col): _*), lit(cfg.nBuckets))

  /** manifest: table → (bucket id → path relative to stateDir). */
  private def readManifest(cfg: Config): Map[String, Map[String, String]] = {
    val cur = Paths.get(cfg.stateDir, "_CURRENT")
    if (!Files.exists(cur)) return Map.empty
    val name = new String(Files.readAllBytes(cur)).trim
    val lines = new String(Files.readAllBytes(Paths.get(cfg.stateDir, name)))
      .split("\n").filter(_.nonEmpty)
    lines.map(_.split("\t")).collect { case Array(t, b, p) => (t, b, p) }
      .groupBy(_._1)
      .map { case (t, rows) => t -> rows.map(r => r._2 -> r._3).toMap }
  }

  private def writeManifest(cfg: Config,
                            man: Map[String, Map[String, String]],
                            batchId: Long): Unit = {
    val name = s"manifest-v$batchId"
    val body = (for {
      (t, buckets) <- man.toSeq.sortBy(_._1)
      (b, p) <- buckets.toSeq.sortBy(_._1)
    } yield s"$t\t$b\t$p").mkString("\n")
    Files.createDirectories(Paths.get(cfg.stateDir))
    Files.write(Paths.get(cfg.stateDir, name), body.getBytes)
    val tmp = Paths.get(cfg.stateDir, "_CURRENT.tmp")
    Files.write(tmp, name.getBytes)
    Files.move(tmp, Paths.get(cfg.stateDir, "_CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Bucket ids present under `stateDir/dir` — ONE directory listing per
    * written version dir, instead of a `Files.exists` probe per bucket
    * (object-store-friendly: N round-trips → 1 LIST per write).
    */
  private def bucketsIn(stateDir: String, dir: String): Set[Long] = {
    val p = Paths.get(stateDir, dir)
    if (!Files.isDirectory(p)) return Set.empty
    val s = Files.list(p)
    try s.iterator().asScala.map(_.getFileName.toString)
      .collect { case n if n.startsWith("__bucket=") =>
        n.stripPrefix("__bucket=").toLong }
      .toSet
    finally s.close()
  }

  /** Read a table as of the current manifest (all buckets unioned). */
  def readState(spark: SparkSession, cfg: Config, table: String): Option[DataFrame] =
    readManifest(cfg).get(table).filter(_.nonEmpty).map { buckets =>
      spark.read.parquet(
        buckets.values.toSeq.sorted.map(p => s"${cfg.stateDir}/$p"): _*)
    }

  /** Fold one micro-batch into the persisted state. Idempotent on replay
    * (W2): re-folding the same batch produces the same history because
    * the kernel dedups on (key, validFrom, tie), and the rewrite targets
    * the same version directories.
    *
    * Horizon safety: a batch row with validFrom below the compaction
    * horizon automatically un-compacts its bucket — that bucket's cold
    * history folds back into the hot tier (and its cold manifest entries
    * drop), so folding without an explicit [[lateSplit]] can never
    * diverge from full-replay history (F6 coalescing always compares
    * against the true predecessor). Fast-path batches pay nothing: the
    * late-bucket probe rides the same touched-bucket aggregate.
    */
  def foldBatch(batch0: DataFrame, batchId: Long, cfg: Config): Unit = {
    val spark = batch0.sparkSession
    val man = readManifest(cfg)

    // The batch feeds FOUR actions (bucket probe + three table writes);
    // its lineage is often an expression-heavy parse — evaluate it once.
    // The kernel's state-sized intermediates are deliberately NOT pinned:
    // the three table writes recompute the fold from the pinned batch +
    // columnar state read, and the two window passes share one
    // exchange+sort, so 3× recompute beats materializing two
    // touched-state-sized caches (measured: pinning them regressed the
    // incremental-fold bench 55%, BENCH_r04→r05 w3).
    val batch = batch0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {

    // Which buckets does this batch touch (≤ nBuckets small longs), and
    // which of them carry pre-horizon arrivals (those need their cold
    // tier folded back in)?
    val lateFlag = compactionHorizon(cfg) match {
      case Some(h) => max(when(col(cfg.validFromUsCol) < h, 1).otherwise(0))
      case None    => max(lit(0))
    }
    val probe = batch.groupBy(bucketOf(cfg).as("__bucket"))
      .agg(lateFlag.as("__late")).collect()
    val touched = probe.map(_.getLong(0)).sorted
    if (touched.isEmpty) return
    val lateBuckets =
      probe.filter(_.getInt(1) == 1).map(_.getLong(0).toString).toSet

    // a cold manifest key is "<bucket>-<compactBatchId>"
    def coldKeysOf(tbl: String) =
      man.getOrElse(s"$tbl.cold", Map.empty)
        .filter { case (k, _) => lateBuckets.contains(k.split("-")(0)) }

    // Read ONLY the touched buckets' history — hot, plus cold for the
    // buckets a late arrival un-compacts.
    val histPaths = (touched
      .flatMap(k => man.getOrElse("history", Map.empty).get(k.toString)) ++
      coldKeysOf("history").values)
      .map(p => s"${cfg.stateDir}/$p")
    val history =
      if (histPaths.isEmpty) batch.limit(0)
      else spark.read.parquet(histPaths: _*)

    val r = BitemporalKernel.applyBatch(history, batch, cfg.keyCols,
      cfg.validFromUsCol, cfg.tieCol, cfg.payloadCols)

    val newMan = Tables.foldLeft(man) { (m, tbl) =>
      val df = tbl match {
        case "history" => r.history
        case "live"    => r.live
        case "audit"   => r.audit
      }
      val vDir = s"data/$tbl/v$batchId"
      df.withColumn("__bucket", bucketOf(cfg))
        .write.mode("overwrite").partitionBy("__bucket")
        .parquet(s"${cfg.stateDir}/$vDir")
      // A touched bucket with no output rows gets no directory — its
      // manifest entry is dropped (the bucket is now empty for `tbl`).
      val present = bucketsIn(cfg.stateDir, vDir)
      val updated = touched.foldLeft(m.getOrElse(tbl, Map.empty)) { (tm, k) =>
        if (present.contains(k)) tm.updated(k.toString, s"$vDir/__bucket=$k")
        else tm - k.toString
      }
      // un-compacted buckets' cold rows are folded into hot now
      val mm = m.updated(tbl, updated)
      if (lateBuckets.isEmpty) mm
      else mm.updated(s"$tbl.cold",
        m.getOrElse(s"$tbl.cold", Map.empty) -- coldKeysOf(tbl).keys)
    }
    writeManifest(cfg, newMan, batchId)
    } finally batch.unpersist(false)
  }

  // =================================================================
  // Bitemporal mode — the stored-time axis, persisted (O2 both axes)
  // =================================================================

  private val BtTables = Seq("bt_messages", "bt_table")

  /** Fold one micro-batch into persisted BITEMPORAL state — the
    * stored-axis twin of [[foldBatch]], persisting
    * [[BitemporalKernel.BitemporalState]] (deduped message log + version
    * records stamped `stored_from_us`/`stored_until_us`) through the same
    * bucketed manifest layout. This is what makes the reference's
    * headline reproducibility — "state as the DB knew it at stored time
    * S" (ref informdb/AuditCore.java:32-35,83-86;
    * TemporalCore.java:29-32) — answerable from the PERSISTED star,
    * surviving a process restart: every batch closes superseded records
    * with the batch's stored stamp (`cfg.storedFromUsCol`, e.g.
    * ingestion time) and opens replacements, records once stored-closed
    * are immutable forever.
    *
    * Scale shape matches [[foldBatch]]: only the buckets the batch's
    * keys hash into are read and rewritten; untouched buckets carry
    * forward by manifest reference with zero I/O. Late arrivals below
    * the compaction horizon auto-un-compact their buckets, exactly as in
    * [[foldBatch]]. Idempotent on replay: the kernel's message dedup +
    * the stored-diff's F6 (an update that changes nothing causes no
    * stored churn) make a re-folded batch a no-op.
    */
  def foldBatchBitemporal(batch0: DataFrame, batchId: Long,
                          cfg: Config): Unit = {
    val spark = batch0.sparkSession
    val man = readManifest(cfg)

    // probe + stamps + two table writes all read the batch — once. The
    // kernel's state-sized intermediates are NOT pinned (same measured
    // trade-off as foldBatch: 2× recompute from the pinned batch beats
    // materializing touched-state-sized caches).
    val batch = batch0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {

    val lateFlag = compactionHorizon(cfg) match {
      case Some(h) => max(when(col(cfg.validFromUsCol) < h, 1).otherwise(0))
      case None    => max(lit(0))
    }
    val probe = batch.groupBy(bucketOf(cfg).as("__bucket"))
      .agg(lateFlag.as("__late")).collect()
    val touched = probe.map(_.getLong(0)).sorted
    if (touched.isEmpty) return
    val lateBuckets =
      probe.filter(_.getInt(1) == 1).map(_.getLong(0).toString).toSet

    def coldKeysOf(tbl: String) =
      man.getOrElse(s"$tbl.cold", Map.empty)
        .filter { case (k, _) => lateBuckets.contains(k.split("-")(0)) }
    def readTouched(tbl: String): Option[DataFrame] = {
      val paths = (touched
        .flatMap(k => man.getOrElse(tbl, Map.empty).get(k.toString)) ++
        coldKeysOf(tbl).values).map(p => s"${cfg.stateDir}/$p")
      if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
    }

    val empty = BitemporalKernel.emptyBitemporal(batch, cfg.keyCols,
      cfg.validFromUsCol, cfg.tieCol, cfg.payloadCols)
    val prev = BitemporalKernel.BitemporalState(
      messages = readTouched("bt_messages").getOrElse(empty.messages),
      table = readTouched("bt_table").getOrElse(empty.table))

    val r = BitemporalKernel.applyBitemporal(prev, batch, cfg.keyCols,
      cfg.validFromUsCol, cfg.tieCol, cfg.storedFromUsCol, cfg.payloadCols)

    val newMan = BtTables.foldLeft(man) { (m, tbl) =>
      val df = if (tbl == "bt_messages") r.messages else r.table
      val vDir = s"data/$tbl/v$batchId"
      df.withColumn("__bucket", bucketOf(cfg))
        .write.mode("overwrite").partitionBy("__bucket")
        .parquet(s"${cfg.stateDir}/$vDir")
      val present = bucketsIn(cfg.stateDir, vDir)
      val updated = touched.foldLeft(m.getOrElse(tbl, Map.empty)) { (tm, k) =>
        if (present.contains(k)) tm.updated(k.toString, s"$vDir/__bucket=$k")
        else tm - k.toString
      }
      val mm = m.updated(tbl, updated)
      if (lateBuckets.isEmpty) mm
      else mm.updated(s"$tbl.cold",
        m.getOrElse(s"$tbl.cold", Map.empty) -- coldKeysOf(tbl).keys)
    }
    writeManifest(cfg, newMan, batchId)
    } finally batch.unpersist(false)
  }

  /** The complete bitemporal version table (hot ∪ cold) — query it with
    * [[graft.functions.GraftFunctions.validAsOfBitemporal]] /
    * `storedAsOf` for both-axes time travel over the persisted star.
    */
  def readBitemporal(spark: SparkSession, cfg: Config): Option[DataFrame] =
    readFull(spark, cfg, "bt_table")

  /** Path-only read of a bitemporal state dir (reads resolve purely
    * through the manifest; no key/time configuration is needed).
    */
  def readBitemporal(spark: SparkSession, stateDir: String): Option[DataFrame] =
    readBitemporal(spark, Config(stateDir, Nil, "", "", Nil))

  /** Compaction for the bitemporal state at valid-time horizon
    * `horizonUs` — keeps the per-fold read bounded as stored history
    * accumulates. Three row classes archive to the `.cold` tier:
    *
    *   - stored-closed records (`stored_until_us` NOT NULL): immutable
    *     forever, safe to archive unconditionally;
    *   - open records wholly before the per-key boundary version u* =
    *     the key's last version starting before the horizon: an arrival
    *     with validFrom ≥ horizon can never change their payload,
    *     validUntil, or existence, so the stored diff never touches
    *     them;
    *   - messages strictly before u* in (validFrom, tie) order: the hot
    *     tail then re-derives versions from u* on, and u* is a true
    *     version boundary, so payload coalescing (F6) is unchanged.
    *
    * Arrivals BELOW the horizon auto-un-compact their buckets inside
    * [[foldBatchBitemporal]] (hot ∪ cold fold, cold entries dropped) —
    * correctness never depends on the caller splitting the batch.
    */
  def compactBitemporal(spark: SparkSession, cfg: Config, horizonUs: Long,
                        batchId: Long): Unit = {
    val man = readManifest(cfg)
    if (!man.contains("bt_table")) return
    val tbl = readState(spark, cfg, "bt_table").get
    val msgs = readState(spark, cfg, "bt_messages").get

    // per-key boundary version u*: max (validFrom, tie) over OPEN
    // records starting before the horizon
    val vfTie = struct(col(cfg.validFromUsCol), col(cfg.tieCol))
    val bounds = tbl.filter(col("stored_until_us").isNull &&
        col(cfg.validFromUsCol) < horizonUs)
      .groupBy(cfg.keyCols.map(col): _*)
      .agg(max(vfTie).as("__u"))

    def split(df: DataFrame, isCold: Column): (DataFrame, DataFrame) = {
      val flagged = df.join(bounds, cfg.keyCols, "left")
        .withColumn("__cold", coalesce(isCold, lit(false)))
      (flagged.filter(!col("__cold")).drop("__cold", "__u"),
        flagged.filter(col("__cold")).drop("__cold", "__u"))
    }
    val beforeBoundary = col("__u").isNotNull && vfTie < col("__u")
    val (tblHot, tblCold) = split(tbl,
      col("stored_until_us").isNotNull ||
        (col("stored_until_us").isNull && beforeBoundary))
    val (msgHot, msgCold) = split(msgs, beforeBoundary)

    val newMan = Seq(
      ("bt_table", tblHot, tblCold),
      ("bt_messages", msgHot, msgCold)).foldLeft(man) {
      case (m, (t, hot, coldDf)) =>
        val hotDir = s"data/$t/v$batchId"
        hot.withColumn("__bucket", bucketOf(cfg))
          .write.mode("overwrite").partitionBy("__bucket")
          .parquet(s"${cfg.stateDir}/$hotDir")
        val coldDir = s"data/$t.cold/v$batchId"
        coldDf.withColumn("__bucket", bucketOf(cfg))
          .write.mode("overwrite").partitionBy("__bucket")
          .parquet(s"${cfg.stateDir}/$coldDir")
        def entries(dir: String, suffix: String) =
          bucketsIn(cfg.stateDir, dir)
            .map(k => s"$k$suffix" -> s"$dir/__bucket=$k").toMap
        m.updated(t, entries(hotDir, ""))
          .updated(s"$t.cold",
            m.getOrElse(s"$t.cold", Map.empty) ++
              entries(coldDir, s"-$batchId"))
    }
    val hTmp = Paths.get(cfg.stateDir, "_HORIZON.tmp")
    Files.write(hTmp, horizonUs.toString.getBytes)
    Files.move(hTmp, Paths.get(cfg.stateDir, "_HORIZON"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    writeManifest(cfg, newMan, batchId)
  }

  /** W6/S9 compaction — the maintenance lever that keeps the per-fold
    * read cost bounded as history accumulates: versions closed before
    * `horizonUs` move from the hot buckets to an append-only cold
    * archive (`<table>.cold` manifest entries, never rewritten by later
    * folds or compactions), and only the hot tail stays in the buckets
    * [[foldBatch]] reads. Correctness contract: after compacting at H,
    * arrivals with validFrom >= H fold identically to the uncompacted
    * state (cold rows of a key all sort strictly before any such
    * arrival, so the kernel's re-derivation over the hot tail is
    * unchanged); arrivals BEFORE H must be split out with [[lateSplit]]
    * and handled on a slow path over [[readFull]]. The horizon persists
    * in `_HORIZON` under one manifest swap with the data move.
    *
    * Cost: one pass over the hot state + the newly-cold rows — the
    * scheduled-job analog of Delta OPTIMIZE; existing cold files are
    * carried by reference (zero I/O), so repeated compactions stay
    * O(hot), not O(archive).
    */
  def compact(spark: SparkSession, cfg: Config, horizonUs: Long,
              batchId: Long): Unit = {
    val man = readManifest(cfg)
    val newMan = Seq("history", "audit").foldLeft(man) { (m, tbl) =>
      readState(spark, cfg, tbl) match {
        case None => m
        case Some(state) =>
          // history carries no stamped until (folds re-derive it) — a
          // version is closed iff its successor's validFrom is known and
          // before the horizon, the same lead() the kernel stamps with;
          // audit rows carry valid_until_us directly.
          val closed = tbl match {
            case "history" =>
              val byKey = org.apache.spark.sql.expressions.Window
                .partitionBy(cfg.keyCols.map(col): _*)
                .orderBy(col(cfg.validFromUsCol), col(cfg.tieCol))
              lead(col(cfg.validFromUsCol), 1).over(byKey) < horizonUs
            case _ => col("valid_until_us") < horizonUs
          }
          val flagged = state.withColumn("__cold", coalesce(closed, lit(false)))
          val hotDir = s"data/$tbl/v$batchId"
          flagged.filter(!col("__cold")).drop("__cold")
            .withColumn("__bucket", bucketOf(cfg))
            .write.mode("overwrite").partitionBy("__bucket")
            .parquet(s"${cfg.stateDir}/$hotDir")
          val coldDir = s"data/$tbl.cold/v$batchId"
          flagged.filter(col("__cold")).drop("__cold")
            .withColumn("__bucket", bucketOf(cfg))
            .write.mode("overwrite").partitionBy("__bucket")
            .parquet(s"${cfg.stateDir}/$coldDir")
          def entries(dir: String, suffix: String) =
            bucketsIn(cfg.stateDir, dir)
              .map(k => s"$k$suffix" -> s"$dir/__bucket=$k").toMap
          m.updated(tbl, entries(hotDir, ""))
            .updated(s"$tbl.cold",
              m.getOrElse(s"$tbl.cold", Map.empty) ++
                entries(coldDir, s"-$batchId"))
      }
    }
    // Horizon FIRST (tmp + atomic move), then the manifest swap: a crash
    // between the two leaves the horizon advanced over an un-compacted
    // manifest, which is safe — foldBatch's late-bucket probe finds no
    // cold entries and reads the still-complete hot tier. The reverse
    // order would let pre-horizon arrivals fold over hot-only state.
    val hTmp = Paths.get(cfg.stateDir, "_HORIZON.tmp")
    Files.write(hTmp, horizonUs.toString.getBytes)
    Files.move(hTmp, Paths.get(cfg.stateDir, "_HORIZON"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    writeManifest(cfg, newMan, batchId)
  }

  /** The compaction horizon currently in force, if any. */
  def compactionHorizon(cfg: Config): Option[Long] = {
    val p = Paths.get(cfg.stateDir, "_HORIZON")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p)).trim.toLong)
    else None
  }

  /** Split a batch against the compaction horizon: `ok` folds on the
    * fast path; `late` (validFrom < horizon) needs the slow path over
    * [[readFull]] — or a dead-letter rule built from
    * [[compactionHorizon]].
    */
  def lateSplit(batch: DataFrame, cfg: Config): (DataFrame, DataFrame) =
    compactionHorizon(cfg) match {
      case None => (batch, batch.limit(0))
      case Some(h) =>
        (batch.filter(col(cfg.validFromUsCol) >= h),
          batch.filter(col(cfg.validFromUsCol) < h))
    }

  /** Hot ∪ cold — the complete table, for readers and late repair. */
  def readFull(spark: SparkSession, cfg: Config, table: String): Option[DataFrame] =
    (readState(spark, cfg, table), readState(spark, cfg, s"$table.cold")) match {
      case (Some(h), Some(c)) => Some(h.unionByName(c))
      case (h, c) => h.orElse(c)
    }

  /** The slow path for [[lateSplit]]'s late channel: arrivals older than
    * the compaction horizon fold over hot ∪ cold of ONLY the buckets
    * their keys hash into — those buckets un-compact (their cold rows
    * fold back into the hot tier and their cold manifest entries drop),
    * every other bucket's hot and cold entries carry forward untouched.
    * Cost is O(archive ∩ touched buckets), paid only on the rare repair;
    * the next [[compact]] re-tiers the repaired buckets. Correctness is
    * the kernel's: with the key's FULL history present, a late arrival
    * folds exactly as it would have in arrival order.
    */
  def repairLate(late: DataFrame, batchId: Long, cfg: Config): Unit =
    foldBatch(late, batchId, cfg)

  /** Start the maintenance query over a message stream. */
  def start(messages: DataFrame, cfg: Config,
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    messages.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, cfg))
      .start()

  /** Start the maintenance query with S3/S4 ack/nack semantics: each
    * micro-batch is routed through [[DeadLetter.route]] first; rejects
    * land under `deadDir/batch=<id>` (overwrite per batch ⇒ idempotent
    * on replay, like the fold itself), and only the clean channel —
    * projected to kernel message columns by `toMessages` — enters the
    * fold. The nack is a persisted row, never a dropped message.
    */
  def startWithDeadLetter(parsed: DataFrame,
                          rules: Seq[(String, Column)],
                          toMessages: DataFrame => DataFrame,
                          cfg: Config, deadDir: String,
                          checkpointDir: String,
                          trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    parsed.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val r = DeadLetter.route(batch, rules)
        r.dead.write.mode("overwrite").parquet(s"$deadDir/batch=$batchId")
        foldBatch(toMessages(r.clean), batchId, cfg)
      }
      .start()
}
