package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared IO discipline for the persisted-state pillars (LSH text state,
  * IVF vector state, stats sketches, term-bucketed postings).
  *
  * Two hazards every state reader/appender shares:
  *
  *  1. **Catch-all reads flip failures into "no state yet".** Wrapping a
  *     state read in `Try(...).toOption` treats a transient FS error, a
  *     corrupt footer, or a compaction's rename window exactly like a
  *     fresh directory — the caller then silently re-enters first-batch
  *     mode (retraining centroids, accepting a whole batch undeduped,
  *     rebuilding reps from one batch), permanently corrupting the state.
  *     Only the engine's PATH_NOT_FOUND condition means "doesn't exist";
  *     everything else must propagate so an at-least-once orchestrator
  *     retries the batch. [[readIfExists]] encodes that.
  *
  *  2. **Compaction-crash remnants look like fresh or partial dirs.** The
  *     backup-swap rename ([[Dedup.compactStateTables]]) can crash between
  *     its two renames, leaving `<table>__compact_bak` present and the
  *     live table stale or missing. An append that doesn't look for the
  *     backup happily writes over the wreckage (or retrains from scratch).
  *     [[checkNoCompactRemnants]] fails fast with the recovery step
  *     instead, and is called by every pillar's append entry point.
  */
private[graft] object StateIO {

  /** Read a parquet state table, distinguishing "not created yet" (None)
    * from every other failure (rethrown). PATH_NOT_FOUND is the only
    * condition that means absence; rethrowing the rest is what keeps an
    * at-least-once replay loop safe — the micro-batch crashes and
    * retries instead of silently degrading to first-batch behavior. */
  def readIfExists(spark: SparkSession, path: String): Option[DataFrame] =
    try Some(spark.read.parquet(path))
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" => None
    }

  /** Fail-fast guard against compaction-crash remnants, shared by every
    * state pillar's append path: a `<table>__compact_bak` directory means
    * a previous [[Dedup.compactStateTables]] crashed between its two
    * renames — the live table may be stale, partial, or missing, and an
    * append over that silently corrupts the state (e.g. a missing
    * `centroids` table would retrain k-means and invalidate every
    * existing cell assignment). Restore the backup first. */
  def checkNoCompactRemnants(
      spark: SparkSession, dir: String, tables: Seq[String]): Unit = {
    val hconf = spark.sessionState.newHadoopConf()
    tables.foreach { t =>
      val bak = new org.apache.hadoop.fs.Path(dir, s"${t}__compact_bak")
      val fs = bak.getFileSystem(hconf)
      require(!fs.exists(bak),
        s"found $bak — a compaction crashed mid-swap; restore it over " +
          s"$dir/$t (verify contents first) before appending")
    }
  }

  /** True iff the path exists on its filesystem (a raw FS probe — no
    * parquet read, so an empty or mid-write dir still counts). */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Replace a state table's CONTENT atomically-per-table with the
    * backup-swap rename discipline ([[Dedup.compactStateTables]] uses the
    * identical sequence for layout-only rewrites; this is the shared
    * primitive for rewrites that CHANGE rows — e.g.
    * [[Similarity.reclusterIvfState]] swapping in retrained centroids and
    * reassigned cells): write `df` to `<table>__compact_tmp`, move the
    * live table to `<table>__compact_bak`, move tmp in, drop the backup.
    * A crash between the two renames leaves the `__compact_bak` dir that
    * every pillar's append/compact entry point fails fast on
    * ([[checkNoCompactRemnants]]), with the backup intact for recovery.
    * `df` must NOT read lazily from the table being replaced —
    * materialize it first ([[Dedup.materialize]]). */
  private[ext] def swapInTable(
      spark: SparkSession, dir: String, table: String,
      df: DataFrame, partitionCols: Seq[String] = Nil): Unit = {
    val hconf = spark.sessionState.newHadoopConf()
    val path = new org.apache.hadoop.fs.Path(dir, table)
    val fs = path.getFileSystem(hconf)
    val tmp = new org.apache.hadoop.fs.Path(dir, s"${table}__compact_tmp")
    val bak = new org.apache.hadoop.fs.Path(dir, s"${table}__compact_bak")
    fs.delete(tmp, true); fs.delete(bak, true)
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    require(fs.rename(path, bak), s"swapInTable: cannot move $path aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(bak, path) // restore the live table before failing
      throw new IllegalStateException(s"swapInTable: cannot swap in $tmp")
    }
    fs.delete(bak, true)
  }
}
