package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering (Z-order / Morton curves) —
  * the write-side operator that makes 100 TB scans cheap to READ.
  *
  * Parquet prunes row groups by per-column min/max. A table sorted by one
  * column prunes perfectly on that column and not at all on any other; a
  * table range-partitioned + sorted by the MORTON INTERLEAVE of k columns
  * keeps every partition's bounding box small in ALL k dimensions at once,
  * so selective filters on any clustered column skip most files (the
  * technique behind Delta/Iceberg OPTIMIZE ZORDER; Morton 1966).
  *
  * The reference rewrites its whole output on every run with no layout
  * control; at scale, clustering the write is the difference between a
  * filter reading 100 TB and reading 100 GB.
  *
  * [[mortonCode]] is a pure column expression — mask, shift, OR; fully
  * codegen'd, no UDF — so the cluster write is one `repartitionByRange`
  * (parallel sampled range sort) + `sortWithinPartitions`, both on the
  * single interleaved long. Nothing here collects to the driver.
  */
object Layout {

  /** Morton (bit-interleaved) code of `cols`, `bits` low bits each —
    * column j contributes its bit i at output position i·k + j. Inputs are
    * masked to `bits` bits (callers with signed/wide domains should
    * pre-scale into [0, 2^bits)). k·bits must fit a positive long. */
  def mortonCode(cols: Seq[Column], bits: Int = 16): Column = {
    val k = cols.size
    require(k >= 2, "mortonCode interleaves at least 2 columns")
    require(k * bits <= 63, s"$k cols × $bits bits exceeds a positive long")
    cols.zipWithIndex.map { case (c, j) =>
      val x = c.cast("long").bitwiseAND(lit((1L << bits) - 1))
      (0 until bits).map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), i * k + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` for a multi-dimension-prunable write: append the morton
    * code of `cols`, range-partition on it into `numPartitions` output
    * files, sort within each. Downstream `.write.parquet` then carries
    * tight min/max on EVERY clustered column in every file. */
  def cluster(
      df: DataFrame, cols: Seq[String], numPartitions: Int,
      bits: Int = 16, codeCol: String = "zcode"): DataFrame =
    df.withColumn(codeCol, mortonCode(cols.map(col), bits))
      .repartitionByRange(numPartitions, col(codeCol))
      .sortWithinPartitions(col(codeCol))

  /** Per-partition bounding-box report for a clustered frame: (partition,
    * rows, min/max of each of `cols`) — the read-side pruning a layout
    * buys, measurable. Driver result is numPartitions × k rows (tiny). */
  def boundingBoxes(clustered: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    clustered
      .withColumn("graft_pid", spark_partition_id())
      .groupBy(col("graft_pid"))
      .agg(count(lit(1)).as("rows"), aggs: _*)
  }

  /** Quadtree cover of the 2-D box [xmin,xmax]×[ymin,ymax] as morton-code
    * intervals: every point inside the box has a zcode inside some emitted
    * range (never the reverse — callers re-apply the exact box filter).
    * Driver-side recursion over quad cells: a cell fully inside the box
    * emits its contiguous code range (a morton cell IS a code interval —
    * the property that makes Z-order prunable), a partly-overlapping cell
    * splits into 4, and once `maxRanges` is hit the remaining partial
    * cells emit their covering range instead of splitting (coarser = more
    * false positives, never false negatives). Adjacent ranges merge.
    *
    * This is the READ side of [[cluster]]: `zcode BETWEEN lo AND hi`
    * predicates hit parquet's zcode min/max (and a range-partitioned
    * layout's file boundaries), so a selective 2-D box touches the few
    * files whose code ranges intersect — instead of every file, which is
    * what the same box predicate over an unclustered layout reads. */
  def zRangesForBox(
      xmin: Long, xmax: Long, ymin: Long, ymax: Long,
      bits: Int = 16, maxRanges: Int = 64): Seq[(Long, Long)] = {
    require(xmin <= xmax && ymin <= ymax, "empty box")
    val full = (1L << (2 * bits)) - 1
    val ranges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var budget = maxRanges
    // cell = morton prefix `code` covering a square of side 2^level
    def visit(code: Long, level: Int, cx: Long, cy: Long): Unit = {
      val side = 1L << level
      val (x0, x1, y0, y1) = (cx, cx + side - 1, cy, cy + side - 1)
      if (x1 < xmin || x0 > xmax || y1 < ymin || y0 > ymax) return
      val lo = code << (2 * level)
      val hi = lo + (1L << (2 * level)) - 1
      val contained = x0 >= xmin && x1 <= xmax && y0 >= ymin && y1 <= ymax
      if (contained || level == 0 || budget <= 1) {
        ranges += ((lo, hi))
        budget -= 1
      } else {
        val h = side >> 1
        visit(code << 2, level - 1, cx, cy)              // (0,0) quadrant
        visit((code << 2) | 1, level - 1, cx + h, cy)    // x bit → pos 0
        visit((code << 2) | 2, level - 1, cx, cy + h)    // y bit → pos 1
        visit((code << 2) | 3, level - 1, cx + h, cy + h)
      }
    }
    visit(0L, bits, 0L, 0L)
    require(ranges.nonEmpty && ranges.head._1 >= 0 && ranges.last._2 <= full)
    // emitted in ascending code order by construction; merge adjacency
    ranges.foldLeft(List.empty[(Long, Long)]) {
      case ((alo, ahi) :: rest, (lo, hi)) if lo == ahi + 1 => (alo, hi) :: rest
      case (acc, r) => r :: acc
    }.reverse
  }

  /** Exact 2-D box query THROUGH the z-ranges: the range predicates prune
    * on the clustered code, the residual box filter restores exactness.
    * Identical rows to the plain box filter on any input (spec-pinned). */
  def boxQuery(
      clustered: DataFrame, xCol: String, yCol: String,
      xmin: Long, xmax: Long, ymin: Long, ymax: Long,
      bits: Int = 16, codeCol: String = "zcode",
      maxRanges: Int = 64): DataFrame = {
    // the box must sit inside the morton domain: beyond 2^bits the codes
    // come from MASKED coordinates, so an out-of-domain box would pass the
    // range predicates for the wrong points and silently DROP its own
    // (false negatives) — refuse loudly instead
    val side = 1L << bits
    require(xmin >= 0 && ymin >= 0 && xmax < side && ymax < side,
      s"box [$xmin,$xmax]×[$ymin,$ymax] exceeds the $bits-bit morton " +
        s"domain [0, $side) — cluster with more bits or pre-scale the data")
    val zpred = zRangesForBox(xmin, xmax, ymin, ymax, bits, maxRanges)
      .map { case (lo, hi) => col(codeCol).between(lo, hi) }
      .reduce(_ || _)
    clustered.filter(zpred)
      .filter(col(xCol).between(xmin, xmax) && col(yCol).between(ymin, ymax))
  }
}
