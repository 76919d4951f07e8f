package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Layout-pruning evidence main: proves the z-order WRITE buys read-side
  * file skipping, with numbers (SCALE.md).
  *
  * x61 gates that the quadtree zcode-range cover returns exactly the box's
  * rows; this main measures what the layout SAVES: it writes the same
  * lineitem projection twice — round-robin (the layout a naive writer
  * produces) and [[graft.ext.Layout.cluster]]ed — then, from each output
  * file's actual per-column min/max (the same statistics parquet stores in
  * its footers and Spark's scan consults for pushdown pruning), counts how
  * many files a min/max-pruning reader MUST touch for the x57/x61 box
  * query, under both read strategies:
  *
  *   - `raw` pushdown: the plain box predicate on (l_partkey, l_suppkey);
  *   - `zcover` pushdown: the quadtree zcode-range cover [[graft.ext
  *     .Layout.boxQuery]] pushes on the single zcode column.
  *
  * One pass per layout computes every file's stats (groupBy
  * input_file_name — no per-file job storm); the verdict is file counts,
  * not timings, so the evidence is environment-noise-free and scales
  * predictably: the clustered box cover touches O(box perimeter) files
  * regardless of corpus size, the round-robin layout touches ALL of them.
  *
  * Usage: graft.ZOrderEvidence <sfDir> [numFiles]  (prints one JSON line)
  */
object ZOrderEvidence {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = Tables.configure(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (xmin, xmax, ymin, ymax) = (100L, 900L, 10L, 60L) // the x61 box
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val base = s"/tmp/graft_zorder_evidence"

    val unclustered = li.repartition(numFiles)
    val clustered = ext.Layout.cluster(li, Seq("l_partkey", "l_suppkey"),
      numPartitions = numFiles)
    unclustered.write.mode("overwrite").parquet(s"$base/unclustered")
    clustered.write.mode("overwrite").parquet(s"$base/clustered")

    val zranges = ext.Layout.zRangesForBox(xmin, xmax, ymin, ymax,
      bits = 16, maxRanges = 64)

    def audit(dir: String, hasZ: Boolean): (Long, Long, Long) = {
      val zcodeStats =
        if (hasZ) Seq(min(col("zcode")).as("zlo"), max(col("zcode")).as("zhi"))
        else Seq(
          min(ext.Layout.mortonCode(Seq(col("l_partkey"), col("l_suppkey")),
            bits = 16)).as("zlo"),
          max(ext.Layout.mortonCode(Seq(col("l_partkey"), col("l_suppkey")),
            bits = 16)).as("zhi"))
      val aggCols = Seq(
        min(col("l_partkey")).as("plo"), max(col("l_partkey")).as("phi"),
        min(col("l_suppkey")).as("slo"), max(col("l_suppkey")).as("shi")) ++
        zcodeStats
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(aggCols.head, aggCols.tail: _*)
        .collect()
      val total = stats.length.toLong
      val rawMust = stats.count(r =>
        r.getAs[Long]("plo") <= xmax && r.getAs[Long]("phi") >= xmin &&
          r.getAs[Long]("slo") <= ymax && r.getAs[Long]("shi") >= ymin).toLong
      val zMust = stats.count { r =>
        val (zlo, zhi) = (r.getAs[Long]("zlo"), r.getAs[Long]("zhi"))
        zranges.exists { case (lo, hi) => lo <= zhi && hi >= zlo }
      }.toLong
      (total, rawMust, zMust)
    }

    val (ut, ur, uz) = audit(s"$base/unclustered", hasZ = false)
    val (ct, cr, cz) = audit(s"$base/clustered", hasZ = true)
    val rows = li.count()
    val boxRows = li.filter(col("l_partkey").between(xmin, xmax) &&
      col("l_suppkey").between(ymin, ymax)).count()
    println(s"""{"metric":"zorder_file_pruning","sf":"$sfDir","rows":$rows,"box_rows":$boxRows,"files_per_layout":$numFiles,"zranges":${zranges.length},"unclustered":{"files":$ut,"must_read_raw_pushdown":$ur,"must_read_zcover":$uz},"clustered":{"files":$ct,"must_read_raw_pushdown":$cr,"must_read_zcover":$cz}}""")
    spark.stop()
  }
}
