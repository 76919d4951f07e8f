package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match each point (key, ts) to every interval
  * (key, start, end) with `start <= ts < end`.
  *
  * Spark plans the naive `l.key = r.key AND ts >= start AND ts < end` as an
  * equi-join followed by a post-filter — correct, but every (key) pair
  * materializes before the range predicate prunes, which explodes on hot
  * keys; with no equality key at all it degenerates to a
  * broadcast-nested-loop. The scale path is the classic BINNED range join
  * (DuckDB/Trino implement the same idea natively as IEJoin/range
  * partitioning): quantize time into fixed-width bins, explode each
  * interval across the bins it overlaps, and hash-join on (key, bin) —
  * the cross product never materializes, and each (point, interval) match
  * is produced EXACTLY once (in the point's own bin), so no dedup pass is
  * needed.
  *
  * Choosing `binWidth` ≈ the typical interval length keeps the explode
  * factor ≤ 2 rows per interval while the join stays selective; a hot
  * (key, bin) cell is an AQE skew-join split or a salting candidate, same
  * as any equi-join.
  *
  * Timestamps are LONGS here (epoch micros — caller converts with
  * `unix_micros`): bin arithmetic stays exact integer division, portable to
  * any engine for oracle checking.
  */
object RangeJoin {

  /** Inner point-in-interval join.
    *
    * @param points    rows with `keyCols` + `tsCol` (+ payload)
    * @param intervals rows with `keyCols` + `startCol`/`endCol` (+ payload);
    *                  non-key column names must not collide with `points`
    * @param binWidth  bin width in the ts unit; must be > 0. Intervals are
    *                  exploded across ceil(len/binWidth)+1 bins.
    * @return matched rows: keyCols ++ points payload ++ intervals payload,
    *         one row per (point, interval) containment pair
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
      tsCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val collisions = (points.columns.toSet -- keyCols) intersect
      (intervals.columns.toSet -- keyCols)
    require(collisions.isEmpty, s"non-key columns collide: $collisions")

    // end is exclusive: the last overlapped bin is the one holding end-1
    val i = intervals.withColumn("graft_bin",
      explode(sequence(
        expr(s"$startCol div $binWidth"), expr(s"($endCol - 1) div $binWidth"))))
    val p = points.withColumn("graft_bin", expr(s"$tsCol div $binWidth"))
    p.join(i, keyCols :+ "graft_bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("graft_bin")
  }
}
