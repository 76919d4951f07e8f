package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest-version compaction — the upsert/changelog collapse every
  * accumulating 100 TB table needs: an append-only event/CDC stream becomes
  * the "current state per key" view (the batch equivalent of a keyed
  * changelog materialization; SCD type-1 resolution).
  *
  * The naive plan is `row_number() OVER (PARTITION BY key ORDER BY version
  * DESC)` + `WHERE rn = 1` — a full sort of every key's history through the
  * window operator. This operator instead aggregates `max(struct(version…,
  * payload…))`: struct ordering compares field by field, so the max IS the
  * argmax by the version columns — and unlike a window it PARTIAL-
  * AGGREGATES map-side: each task pre-collapses its partition to one row
  * per key before the shuffle, so the exchange carries |keys| rows, not
  * |history| (the same min(struct) trick the k-means assignment uses,
  * [[Similarity]]). A hot key — one entity with millions of updates — folds
  * to one row per map task instead of serializing through one window task.
  */
object Compaction {

  /** Current-state view: the row with the lexicographically greatest
    * `versionCols` per `keyCols` group. `versionCols` MUST be unique per
    * key (append a unique id as the last version column — otherwise the
    * remaining payload fields silently join the comparison).
    *
    * Output columns: keyCols ++ versionCols ++ remaining, original order
    * within each group. */
  def latestByKey(
      df: DataFrame, keyCols: Seq[String], versionCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && versionCols.nonEmpty,
      "latestByKey needs key and version columns")
    val payload = df.columns.filterNot((keyCols ++ versionCols).contains).toSeq
    val packed = struct((versionCols ++ payload).map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max(packed).as("graft_m"))
      .select((keyCols.map(col) ++
        (versionCols ++ payload).map(c => col(s"graft_m.`$c`").as(c))): _*)
  }

  /** Corpus snapshot diff — classify every document id as added / removed
    * / changed / unchanged between two corpus versions: the audit view a
    * refresh pipeline publishes ("this crawl added 2M docs, silently
    * rewrote 40k") before anyone retrains on the new snapshot.
    *
    * Shape: each side collapses map-side to (id, 60-bit content hash) —
    * 8 bytes per doc through the exchange, never text — then ONE
    * full-outer hash equi-join on the id key and a map-side CASE. Both
    * sides shuffle-partition on the same id key, so at 100 TB this is two
    * scans + one co-partitioned join, no residue. */
  def snapshotDiff(
      before: DataFrame, after: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val b = before.select(col(idCol),
      PortableHash.md5Long(col(textCol)).as("graft_hb"))
    val a = after.select(col(idCol),
      PortableHash.md5Long(col(textCol)).as("graft_ha"))
    b.join(a, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("graft_hb").isNull, "added")
          .when(col("graft_ha").isNull, "removed")
          .when(col("graft_ha") === col("graft_hb"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
