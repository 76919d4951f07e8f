package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the nearest right row of the
  * same key in the requested direction —
  *
  *   - `backward` (default): LATEST right row with `r.ts <= l.ts` — the
  *     contract of DuckDB's `ASOF JOIN ... ON r.ts <= l.ts` and pandas
  *     `merge_asof(direction="backward")`,
  *   - `forward`: EARLIEST right row with `r.ts >= l.ts`,
  *   - `nearest`: whichever of the two has the smaller absolute time
  *     delta; ties go to the backward match (a tie means both exist).
  *
  * An optional `tolerance` nulls out matches farther than the given bound
  * from the left timestamp (inclusive), mirroring pandas' `tolerance=`.
  *
  * Spark has no native as-of operator, and the naive formulation — an
  * inequality theta-join (`l.key = r.key AND r.ts <= l.ts`) plus a per-pair
  * max — degenerates to a broadcast-nested-loop with O(|l|·|r|) work per
  * key. This implementation is the standard big-data reformulation:
  *
  *   1. tag both sides and union them (right payload packed into ONE struct
  *      so all matched columns provably come from the SAME right row; the
  *      right timestamp rides along inside the struct for the nearest /
  *      tolerance arithmetic),
  *   2. ONE hash shuffle on the key, sort within partitions by ts,
  *   3. running `last(payload, ignoreNulls)` over the RANGE frame ending at
  *      the current row yields the backward match (range frames include
  *      equal-ts peers, which makes the bound inclusive without a side
  *      tiebreak column); `first(...)` over the mirrored frame starting at
  *      the current row yields the forward match — both frames share the
  *      same exchange AND the same sort,
  *   4. keep left rows, apply direction/tolerance, unpack the struct.
  *
  * Cost at scale: a single exchange of |l|+|r| rows on a (typically
  * high-cardinality) key — the same price as one equi-join shuffle; no
  * nested loop, no skewed low-cardinality window. Ordering ties among RIGHT
  * rows with identical (key, ts) are broken arbitrarily; pass a unique
  * right timestamp per key (or a composite ts) for fully deterministic
  * output.
  *
  * Skew: a single hot key serializes its window partition — inherent to
  * per-key ordered semantics (every as-of implementation sorts the key's
  * timeline somewhere). Mitigations when one key dominates: split the hot
  * key's timeline into coarse time slices, run the join per slice with the
  * previous slice's last right row carried in as a seed row, and union —
  * the same union+window machinery applies per slice. AsOfRangeSpec pins
  * correctness under a 50%-hot-key distribution.
  *
  * The reference has no temporal operator (nothing in etl_pipeline.py joins
  * at all); this is north-star scope for event-log enrichment at 100 TB.
  */
object AsOf {

  /** Internal struct field carrying the matched right row's timestamp. */
  private val MTS = "graft_mts"

  /** As-of join, all directions.
    *
    * @param left      probe side; all its columns survive
    * @param right     build side, pre-selected to `keyCols` + `rightTs` +
    *                  payload columns; payload columns must not collide
    *                  with `left` column names
    * @param keyCols   equality keys present on both sides
    * @param leftTs    left timestamp column (any orderable type shared with
    *                  `rightTs` — timestamp, long micros, date)
    * @param rightTs   right timestamp column
    * @param direction `backward` | `forward` | `nearest`
    * @param tolerance max |l.ts − r.ts| for a match to count, inclusive —
    *                  an interval literal for timestamp columns (e.g.
    *                  `expr("INTERVAL 1 HOUR")`), a number for numeric ts
    * @return left.* + right payload columns (null when no right row exists
    *         in-direction / in-tolerance for the key)
    */
  def join(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      direction: String = "backward",
      tolerance: Option[Column] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    val payloadCols = right.columns.filterNot(keyCols.contains).filterNot(_ == rightTs)
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    require(!payloadCols.contains(MTS), s"'$MTS' is a reserved column name")
    val collisions = payloadCols.toSet intersect left.columns.toSet
    require(collisions.isEmpty, s"right payload collides with left columns: $collisions")

    val r = right.select(
      (keyCols.map(col) :+ col(rightTs).as("graft_ts") :+
        struct((col(rightTs).as(MTS) +: payloadCols.map(col)): _*)
          .as("graft_payload") :+
        lit(0).as("graft_side")): _*)
    val l = left
      .withColumn("graft_ts", col(leftTs))
      .withColumn("graft_side", lit(1))

    // One partitioning + one sort serves both directions: RANGE frames
    // treat equal-ts rows as peers, so the current (left) row's frame
    // includes same-timestamp right rows — inclusive bounds for free.
    val byKey = Window.partitionBy(keyCols.map(col): _*).orderBy(col("graft_ts"))
    val wBack = byKey.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = byKey.rangeBetween(Window.currentRow, Window.unboundedFollowing)
    val back = last(col("graft_payload"), ignoreNulls = true).over(wBack)
    val fwd = first(col("graft_payload"), ignoreNulls = true).over(wFwd)

    val ts = col("graft_ts")
    def mts(m: Column): Column = m.getField(MTS)
    val matched = direction match {
      case "backward" => back
      case "forward" => fwd
      case "nearest" =>
        // least absolute delta; both deltas are non-negative by
        // construction, so (ts − back.ts) vs (fwd.ts − ts) compares them
        // without abs() — which also works for timestamp arithmetic,
        // where subtraction yields a comparable day-time interval
        when(fwd.isNull, back).when(back.isNull, fwd)
          .when(ts - mts(back) <= mts(fwd) - ts, back)
          .otherwise(fwd)
    }
    // |ts − mts| <= tol without abs(): both one-sided bounds together.
    // For backward matches mts <= ts makes the second bound trivial (and
    // vice versa), so one predicate serves every direction. Filtering the
    // chosen match equals filtering candidates first: nearest picks the
    // minimum delta, so if it exceeds tol the other candidate does too.
    val inTol = tolerance.fold(matched) { tol =>
      when(ts <= mts(matched) + tol && mts(matched) <= ts + tol, matched)
    }

    l.unionByName(r, allowMissingColumns = true)
      .withColumn("graft_match", inTol)
      .filter(col("graft_side") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(p => col(s"graft_match.$p").as(p)): _*)
  }

  /** Left-outer backward as-of join (the original entry point; kept as the
    * common-case shorthand for [[join]] with `direction = "backward"`). */
  def joinBackward(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String): DataFrame =
    join(left, right, keyCols, leftTs, rightTs, "backward")
}
