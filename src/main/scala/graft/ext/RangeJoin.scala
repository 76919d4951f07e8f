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

  /** Interval-preserving (left-outer on `intervals`) point-in-interval
    * join: every interval row survives, with the point payload null when no
    * point falls inside it — so zero-match intervals can't be silently
    * dropped by callers aggregating per interval (`count(pointCol)` then
    * counts matches with 0 for empty intervals, no join-back needed).
    *
    * Binned-join mechanics can't express this directly (an interval
    * matched in none of its bins appears in no joined row), so the shape
    * is: inner binned join, then one hash equi-join of `intervals` against
    * the matches on the caller-named unique interval identity
    * `intervalIdCols` — still no nested loop, and the second join is on
    * the same key family so AQE handles any skew like any equi-join.
    *
    * @param intervalIdCols columns that uniquely identify an interval row
    *                       (e.g. its primary key); duplicated ids would
    *                       cross-multiply matches
    */
  def pointInIntervalLeft(
      points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
      tsCol: String, startCol: String, endCol: String,
      binWidth: Long, intervalIdCols: Seq[String]): DataFrame = {
    require(intervalIdCols.nonEmpty, "intervalIdCols must name the interval identity")
    val missing = intervalIdCols.filterNot(intervals.columns.contains)
    require(missing.isEmpty, s"intervalIdCols not in intervals: $missing")
    val pointPayload =
      points.columns.filterNot(keyCols.contains).filterNot(intervalIdCols.contains)
    val inner = pointInInterval(
      points, intervals, keyCols, tsCol, startCol, endCol, binWidth)
    intervals.join(
      inner.select((intervalIdCols ++ pointPayload).map(col): _*),
      intervalIdCols, "left")
  }
}
