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
}
