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
    checkNoSwapInProgress(spark, dir)
  }

  /** Name of the commit-marker file a [[swapInTables]] publishes between
    * staging and applying. While it exists the state dir may mix old and
    * new table fits — every reader and every append/compact entry point
    * fails fast on it until [[recoverSwap]] rolls the swap forward. */
  private[graft] val SwapCommitMarker = "_swap_commit"

  /** Thrown by [[swapInTables]]' fault-injection hook (`crashAfterApplied`)
    * — a DETERMINISTIC stand-in for a process crash mid-swap, so the
    * crash-recovery contract is gateable (the x127 gate and the StateIO
    * specs catch exactly this type and then run [[recoverSwap]]). */
  private[graft] final class InjectedCrash(applied: Int)
    extends RuntimeException(
      s"fault injection: simulated crash after $applied applied table swap(s)")

  /** Fail fast if a multi-table swap committed but did not finish
    * applying ([[swapInTables]] crashed after publishing its marker).
    * Shared by [[checkNoCompactRemnants]] (all append/delete/compact
    * entry points) and the state READ paths: between the marker and the
    * last rename the dir can pair NEW tables with OLD ones (e.g.
    * reclustered centroids over cells assigned under the old geometry —
    * cid values silently refer to different clusters), so nothing may
    * read until the roll-forward completes. */
  def checkNoSwapInProgress(spark: SparkSession, dir: String): Unit = {
    val marker = new org.apache.hadoop.fs.Path(dir, SwapCommitMarker)
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(marker),
      s"found $marker — a multi-table swap (recluster) committed but did " +
        "not finish applying; run StateIO.recoverSwap (or the pillar's " +
        "recover entry point, e.g. Similarity.recoverIvfState) to roll it " +
        "forward before touching the state")
  }

  /** Restrict a state table to an AS-OF bound on its tag column — the
    * shared cut behind every pillar's snapshot (time-travel) read: the
    * tagged `batch_id=N` / `delete_id=N` partitions each append and
    * delete lands in for replay idempotency double as a full version
    * history, so "the state after (append B, delete D)" is a pure
    * `tag <= bound` filter on partition columns (pruned at the scan,
    * never a rebuild). Fails fast on untagged states: rows with no tag
    * carry no version identity, and silently reading them "as of"
    * anything would pin them to an arbitrary version. */
  private[ext] def asOfCut(
      df: DataFrame, tagCol: String, bound: Long,
      dir: String, table: String): DataFrame = {
    require(df.columns.contains(tagCol),
      s"as-of reads need a TAGGED state: $dir/$table has no $tagCol " +
        "partition column (untagged appends/deletes carry no version " +
        "identity) — rebuild with tagged appends/deletes to snapshot")
    df.filter(org.apache.spark.sql.functions.col(tagCol) <= bound)
  }

  /** True iff the path exists on its filesystem (a raw FS probe — no
    * parquet read, so an empty or mid-write dir still counts). */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Replace the CONTENT of one or more state tables under a SINGLE
    * commit point — the shared primitive for rewrites that CHANGE rows
    * and must move together (e.g. [[Similarity.reclusterIvfState]]
    * swapping retrained `centroids` with cells reassigned under them: a
    * state that pairs one new table with one old table is silently
    * wrong — cid values refer to different clusters — and per-table
    * atomicity cannot prevent that pairing).
    *
    * Protocol, in three phases:
    *
    *  1. **Stage.** Every table's new content is written to
    *     `<table>__compact_tmp`. No live table is touched, so the staged
    *     frames may read lazily from the very tables they replace, and a
    *     crash anywhere here leaves the OLD fit fully intact (stale tmp
    *     dirs are pre-commit garbage, deleted by the next swap's stage).
    *  2. **Commit.** The `_swap_commit` marker file (listing the tables)
    *     is published by ONE atomic rename — this is the commit point.
    *     A crash before it: full old fit. After it: the new fit is
    *     durable in the tmp dirs and recovery rolls FORWARD.
    *  3. **Apply.** Each table is renamed in (live → `__compact_bak`,
    *     tmp → live, drop bak — [[applyStagedTable]], idempotent for
    *     every intermediate crash state), then the marker is removed.
    *     Until the marker is gone, every read/append/compact entry
    *     point fails fast ([[checkNoSwapInProgress]]) and
    *     [[recoverSwap]] re-runs phase 3 to completion.
    *
    * Pre-existing `<table>__compact_bak` dirs are NEVER deleted here —
    * a bak is the recovery artifact of a crashed compaction, so this
    * fails fast instead (remnant handling stays in
    * [[checkNoCompactRemnants]] / [[recoverSwap]], one place).
    *
    * `crashAfterApplied` is a fault-injection hook for the crash-safety
    * gates ONLY (negative = off): ≥ 0 throws [[InjectedCrash]] after
    * applying that many tables — 0 crashes right after the commit
    * marker, 1 reproduces exactly the window where the first table
    * swapped and the second did not. */
  private[graft] def swapInTables(
      spark: SparkSession, dir: String,
      tables: Seq[(String, DataFrame, Seq[String])],
      crashAfterApplied: Int = -1): Unit = {
    require(tables.nonEmpty, "swapInTables: no tables to swap")
    val hconf = spark.sessionState.newHadoopConf()
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(hconf)
    def p(name: String) = new org.apache.hadoop.fs.Path(dir, name)
    checkNoSwapInProgress(spark, dir)
    tables.foreach { case (t, _, _) =>
      require(!fs.exists(p(s"${t}__compact_bak")),
        s"found $dir/${t}__compact_bak — a compaction or swap crashed " +
          s"mid-rename; restore/verify it over $dir/$t first " +
          "(swapInTables never deletes a backup)")
      require(fs.exists(p(t)),
        s"swapInTables: live table $dir/$t does not exist")
    }
    // phase 1: stage
    tables.foreach { case (t, df, partitionCols) =>
      val tmp = p(s"${t}__compact_tmp")
      fs.delete(tmp, true)
      val w = df.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(tmp.toString)
    }
    // phase 2: commit — publish the marker with one atomic rename
    val markerTmp = p(SwapCommitMarker + "__tmp")
    fs.delete(markerTmp, true)
    val out = fs.create(markerTmp, true)
    try out.write(tables.map(_._1).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(markerTmp, p(SwapCommitMarker)),
      s"swapInTables: cannot publish commit marker in $dir")
    // phase 3: apply + clear the marker
    var applied = 0
    tables.foreach { case (t, _, _) =>
      if (applied == crashAfterApplied) throw new InjectedCrash(applied)
      applyStagedTable(fs, dir, t)
      applied += 1
    }
    if (crashAfterApplied == tables.size) throw new InjectedCrash(applied)
    fs.delete(p(SwapCommitMarker), false)
  }

  /** Single-table convenience over [[swapInTables]] — same commit-marker
    * protocol, same fail-fast on pre-existing backups. */
  private[ext] def swapInTable(
      spark: SparkSession, dir: String, table: String,
      df: DataFrame, partitionCols: Seq[String] = Nil): Unit =
    swapInTables(spark, dir, Seq((table, df, partitionCols)))

  /** Roll ONE staged table forward — idempotent across every crash state
    * phase 3 can leave:
    *  - tmp + live (not started): move live aside, move tmp in, drop bak;
    *  - tmp + bak, no live (crashed between the two renames): move tmp
    *    in, drop bak;
    *  - live + bak, no tmp (crashed before the bak drop): drop bak;
    *  - live only (done): no-op. */
  private def applyStagedTable(
      fs: org.apache.hadoop.fs.FileSystem, dir: String, table: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(dir, table)
    val tmp = new org.apache.hadoop.fs.Path(dir, s"${table}__compact_tmp")
    val bak = new org.apache.hadoop.fs.Path(dir, s"${table}__compact_bak")
    if (fs.exists(tmp)) {
      if (fs.exists(live)) {
        require(!fs.exists(bak),
          s"applyStagedTable: $bak and $live both exist alongside $tmp — " +
            "not a state this protocol produces; repair by hand")
        require(fs.rename(live, bak),
          s"applyStagedTable: cannot move $live aside")
      }
      require(fs.rename(tmp, live), s"applyStagedTable: cannot move $tmp in")
    }
    require(fs.exists(live),
      s"applyStagedTable: $live missing with no staged replacement — " +
        "the state dir is corrupt; restore from backup")
    if (fs.exists(bak)) fs.delete(bak, true)
  }

  /** Complete a [[swapInTables]] that crashed after its commit point:
    * re-apply every table listed in the `_swap_commit` marker (each step
    * idempotent — [[applyStagedTable]]), then clear the marker. Returns
    * true iff a crashed swap was found and rolled forward; false = no
    * marker, nothing to do (safe to call blindly). The result is always
    * the FULL new fit — a commit marker means every table's new content
    * was durably staged before the crash. */
  private[graft] def recoverSwap(spark: SparkSession, dir: String): Boolean = {
    val hconf = spark.sessionState.newHadoopConf()
    val marker = new org.apache.hadoop.fs.Path(dir, SwapCommitMarker)
    val fs = marker.getFileSystem(hconf)
    if (!fs.exists(marker)) return false
    val in = fs.open(marker)
    val names =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      finally in.close()
    require(names.nonEmpty,
      s"recoverSwap: empty commit marker at $marker — repair by hand")
    names.foreach(applyStagedTable(fs, dir, _))
    fs.delete(marker, false)
    true
  }
}
