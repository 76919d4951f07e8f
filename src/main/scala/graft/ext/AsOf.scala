package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the LATEST right row of the
  * same key whose timestamp is <= the left row's timestamp (backward join,
  * inclusive — the same contract as DuckDB's `ASOF JOIN ... ON r.ts <= l.ts`
  * and pandas `merge_asof(direction="backward")`).
  *
  * Spark has no native as-of operator, and the naive formulation — an
  * inequality theta-join (`l.key = r.key AND r.ts <= l.ts`) plus a per-pair
  * max — degenerates to a broadcast-nested-loop with O(|l|·|r|) work per
  * key. This implementation is the standard big-data reformulation:
  *
  *   1. tag both sides and union them (right payload packed into ONE struct
  *      so all matched columns provably come from the SAME right row),
  *   2. ONE hash shuffle on the key, sort within partitions by
  *      (ts, side) — right-before-left at equal ts makes the join inclusive,
  *   3. running `last(payload, ignoreNulls)` over the ordered window fills
  *      each left row with the most recent right payload,
  *   4. keep left rows, unpack the struct.
  *
  * Cost at scale: a single exchange of |l|+|r| rows on a (typically
  * high-cardinality) key — the same price as one equi-join shuffle; no
  * nested loop, no skewed low-cardinality window. Ordering ties among RIGHT
  * rows with identical (key, ts) are broken arbitrarily; pass a unique
  * right timestamp per key (or a composite ts) for fully deterministic
  * output.
  *
  * The reference has no temporal operator (nothing in etl_pipeline.py joins
  * at all); this is north-star scope for event-log enrichment at 100 TB.
  */
object AsOf {

  /** Left-outer backward as-of join.
    *
    * @param left     probe side; all its columns survive
    * @param right    build side, pre-selected to `keyCols` + `rightTs` +
    *                 payload columns; payload columns must not collide with
    *                 `left` column names
    * @param keyCols  equality keys present on both sides
    * @param leftTs   left timestamp column (any orderable type shared with
    *                 `rightTs` — timestamp, long micros, date)
    * @param rightTs  right timestamp column
    * @return left.* + right payload columns (null when no right row at or
    *         before the left timestamp exists for the key)
    */
  def joinBackward(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.filterNot(keyCols.contains).filterNot(_ == rightTs)
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    val collisions = payloadCols.toSet intersect left.columns.toSet
    require(collisions.isEmpty, s"right payload collides with left columns: $collisions")

    val r = right.select(
      (keyCols.map(col) :+ col(rightTs).as("graft_ts") :+
        struct(payloadCols.map(col): _*).as("graft_payload") :+
        lit(0).as("graft_side")): _*)
    val l = left
      .withColumn("graft_ts", col(leftTs))
      .withColumn("graft_side", lit(1))

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("graft_ts"), col("graft_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("graft_match", last(col("graft_payload"), ignoreNulls = true).over(w))
      .filter(col("graft_side") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(p => col(s"graft_match.$p").as(p)): _*)
  }
}
