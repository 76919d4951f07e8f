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
  * timeline somewhere). Mitigation (`numSlices > 1`): each key's timeline
  * is cut into `numSlices` contiguous time slices and the window partitions
  * on (key, slice), so a dominant key spreads over `numSlices` tasks. A
  * slice alone cannot see matches in neighboring slices, so SEED rows are
  * unioned in per (key, slice): the latest right row of all EARLIER slices
  * (for backward/nearest) and the earliest right row of all LATER slices
  * (for forward/nearest) — by construction exactly the rows a window
  * crossing the slice boundary could have matched, so the salted result is
  * identical to the unsalted one (AsOfRangeSpec pins this byte-for-byte
  * under a 50%-hot-key distribution, all directions + tolerance). Slice
  * boundaries come from per-key min/max over a broadcast bounds frame —
  * use slicing in the hot-KEY regime (few dominant keys), where that frame
  * is tiny; high-cardinality well-distributed keys need no salting.
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
    * @param numSlices hot-key mitigation: > 1 partitions each key's
    *                  timeline into this many time slices with seed rows
    *                  carried across slice boundaries (identical result,
    *                  `numSlices`× the parallelism per key); 1 = off
    * @return left.* + right payload columns (null when no right row exists
    *         in-direction / in-tolerance for the key)
    */
  def join(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      direction: String = "backward",
      tolerance: Option[Column] = None,
      numSlices: Int = 1): DataFrame = {
    require(numSlices >= 1, "numSlices must be >= 1")
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

    val u0 = l.unionByName(r, allowMissingColumns = true)
    val (u, partCols) =
      if (numSlices <= 1) (u0, keyCols.map(col))
      else (salted(u0, keyCols, direction, numSlices),
        keyCols.map(col) :+ col("graft_slice"))

    // One partitioning + one sort serves both directions: RANGE frames
    // treat equal-ts rows as peers, so the current (left) row's frame
    // includes same-timestamp right rows — inclusive bounds for free.
    val byKey = Window.partitionBy(partCols: _*).orderBy(col("graft_ts"))
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

    u.withColumn("graft_match", inTol)
      .filter(col("graft_side") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(p => col(s"graft_match.$p").as(p)): _*)
  }

  /** Hot-key time-slice salting over the tagged union frame (see class
    * doc): assigns `graft_slice` from per-key min/max time bounds and
    * unions in the boundary-crossing seed rows the sliced windows need.
    * Identical output to the unsalted path, `numSlices`× the per-key
    * parallelism; one broadcast of the (tiny) per-key bounds, one window
    * over keys×slices rows for the seeds — the big frame still shuffles
    * exactly once, in the caller's (key, slice) window. */
  private def salted(
      u0: DataFrame, keyCols: Seq[String],
      direction: String, numSlices: Int): DataFrame = {
    import org.apache.spark.sql.types.{DateType, TimestampType}
    // monotone NUMERIC image of the ts, for slice arithmetic only: slice
    // boundaries need not be exact, only order-consistent — equal ts must
    // land in the same slice and later ts never in an earlier slice
    val tsNum = u0.schema("graft_ts").dataType match {
      case TimestampType => unix_micros(col("graft_ts")).cast("double")
      case DateType => unix_date(col("graft_ts")).cast("double")
      case _ => col("graft_ts").cast("double")
    }
    val bounds = u0
      .select(keyCols.map(col) :+ tsNum.as("graft_tsnum"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(min("graft_tsnum").as("graft_mn"), max("graft_tsnum").as("graft_mx"))
    val sliced = u0
      .join(broadcast(bounds), keyCols)
      .withColumn("graft_slice",
        when(col("graft_mx") === col("graft_mn"), lit(0))
          .otherwise(least(
            floor((tsNum - col("graft_mn")) * numSlices /
              (col("graft_mx") - col("graft_mn"))),
            lit(numSlices - 1))).cast("int"))
      .drop("graft_mn", "graft_mx")

    // seed rows: per (key, slice), the latest right row of all EARLIER
    // slices and/or the earliest right row of all LATER slices — the only
    // rows an unsliced window could match across this slice's boundary.
    // The spine covers every (key, slice) PRESENT in the data (slices with
    // only left rows still need seeds); all frames here are keys×slices
    // cardinality — trivial next to the data.
    val spine = sliced
      .select(keyCols.map(col) :+ col("graft_slice"): _*).distinct()
    val rPerSlice = sliced.filter(col("graft_side") === 0)
      .groupBy(keyCols.map(col) :+ col("graft_slice"): _*)
      .agg(max_by(col("graft_payload"), col("graft_ts")).as("graft_lastp"),
        min_by(col("graft_payload"), col("graft_ts")).as("graft_firstp"))
    val bySlice = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("graft_slice"))
    val wPrev = bySlice.rowsBetween(Window.unboundedPreceding, -1)
    val wNext = bySlice.rowsBetween(1, Window.unboundedFollowing)
    val seedsBase = spine.join(rPerSlice, keyCols :+ "graft_slice", "left")
    def seedRows(seed: Column): DataFrame =
      seedsBase.withColumn("graft_seed", seed)
        .filter(col("graft_seed").isNotNull)
        .select(keyCols.map(col) :+
          col("graft_seed").getField(MTS).as("graft_ts") :+
          col("graft_seed").as("graft_payload") :+
          lit(0).as("graft_side") :+ col("graft_slice"): _*)
    val prev = seedRows(last(col("graft_lastp"), ignoreNulls = true).over(wPrev))
    val next = seedRows(first(col("graft_firstp"), ignoreNulls = true).over(wNext))
    val seeds = direction match {
      case "backward" => prev
      case "forward" => next
      case "nearest" => prev.unionByName(next)
    }
    sliced.unionByName(seeds, allowMissingColumns = true)
  }

  /** Left-outer backward as-of join (the original entry point; kept as the
    * common-case shorthand for [[join]] with `direction = "backward"`). */
  def joinBackward(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String): DataFrame =
    join(left, right, keyCols, leftTs, rightTs, "backward")
}
