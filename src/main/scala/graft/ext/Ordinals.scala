package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{broadcast, col, count, lit, percentile_approx}
import org.apache.spark.sql.types.LongType

/** Skew-free per-key ordinal assignment.
  *
  * `row_number() OVER (PARTITION BY key ORDER BY ...)` funnels n/k rows
  * through a single task per key value — fatal when the key has a handful of
  * values (event types, record kinds) and n is 100 TB-scale. This operator
  * produces the identical ordinal with the two-phase zipWithIndex pattern
  * (same as the chunked-pipeline ordinal reconstruction,
  * [[graft.etl.Pipeline.processChunkedFile]]):
  *
  *   1. range-partition + sort by the global order columns (parallel sort);
  *   2. job 1: count rows per (partition, key) — k × numPartitions entries
  *      to the driver;
  *   3. prefix-sum offsets per key in partition order (driver, tiny);
  *   4. job 2: re-walk each partition assigning offset + local running index.
  *
  * Both jobs MUST run over the one materialized RDD: Dataset actions re-plan
  * per action and `repartitionByRange` re-samples its boundaries on each
  * planning, so two Dataset actions could see different partitionings and
  * the offsets would land on the wrong rows. A single `.rdd` pins one
  * physical plan; the second job reuses the first's shuffle output.
  */
object Ordinals {

  /** Driver-side offset-map size above which [[perKeyOrdinal]] logs a
    * warning: the map holds one entry per (partition, key) pair, so its size
    * is O(|keys| × numPartitions). The operator stays correct at any
    * cardinality, but a high-cardinality key belongs in a plain
    * `row_number() OVER (PARTITION BY key …)` window (no skew there — many
    * keys spread across tasks); this operator exists for the LOW-cardinality
    * case where a window would funnel n/k rows through one task. */
  val offsetWarnThreshold: Int = 1000000

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Append `outCol` = 0-based ordinal of the row within its `keyCol` group,
    * ordered by `orderCols` globally.
    *
    * Intended for LOW-cardinality keys (event types, record kinds): the
    * driver materializes an offsets map of |keys| × numPartitions entries
    * (step 2-3 above), so driver memory bounds the usable key cardinality —
    * ~1 M entries is a few tens of MB. Above [[offsetWarnThreshold]] entries
    * a warning is logged; for genuinely high-cardinality keys use an
    * ordinary window, which does not skew there. */
  def perKeyOrdinal(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      outCol: String = "ordinal"): DataFrame = {
    val spark = df.sparkSession
    val keyIdx = df.schema.fieldIndex(keyCol)

    val sortedRdd = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .rdd

    val perPartCounts: Array[(Int, Map[Any, Long])] =
      sortedRdd.mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.Map.empty[Any, Long].withDefaultValue(0L)
        it.foreach(r => m(r.get(keyIdx)) += 1L)
        Iterator.single((pid, m.toMap))
      }.collect()

    val offsets: Map[(Int, Any), Long] = {
      val running = scala.collection.mutable.Map.empty[Any, Long].withDefaultValue(0L)
      perPartCounts.sortBy(_._1).flatMap { case (pid, counts) =>
        counts.map { case (k, n) =>
          val start = running(k)
          running(k) = start + n
          (pid, k) -> start
        }
      }.toMap
    }
    if (offsets.size > offsetWarnThreshold)
      log.warn(s"perKeyOrdinal offsets map has ${offsets.size} (partition, key) " +
        s"entries — key '$keyCol' looks high-cardinality; a plain window " +
        "(PARTITION BY key) does not skew at high cardinality and avoids " +
        "this driver-side map")
    val offsetsB = spark.sparkContext.broadcast(offsets)

    val outRdd = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      val local = scala.collection.mutable.Map.empty[Any, Long].withDefaultValue(0L)
      it.map { r =>
        val k = r.get(keyIdx)
        // both jobs must observe the identical physical partitioning (that is
        // why they share one pinned RDD). If a (pid, key) pair appears here
        // that the count job never saw, that invariant broke — fail loudly
        // instead of silently assigning offset 0 (wrong ordinals).
        val base = offsetsB.value.getOrElse((pid, k),
          throw new IllegalStateException(
            s"perKeyOrdinal: no offset for partition $pid, key '$k' — the " +
              "count job and the assignment job observed different " +
              "partitionings (partitioning drift on the shared RDD)"))
        val ord = base + local(k)
        local(k) += 1L
        Row.fromSeq(r.toSeq :+ ord)
      }
    }
    spark.createDataFrame(outRdd, df.schema.add(outCol, LongType, nullable = false))
  }

  /** LOSSLESS approximate pre-prune for per-key top-k (ascending by
    * `scoreCol`): drops rows that provably cannot be among their key's k
    * smallest, so the sort feeding [[perKeyOrdinal]] (or any exact top-k
    * pass) sees ~p·n rows per large group instead of n — at 100 TB the
    * range-sort is the dominant cost and this removes ≥ 99% of its input.
    *
    * Safety argument (why the exact result cannot change): per key we take
    * the approx_percentile sketch value at constant fraction `p` with
    * accuracy `accuracy`, whose true rank r is guaranteed within n/accuracy
    * of p·n, so r ≥ p·n − n/accuracy. The filter keeps every row with
    * score <= that value — all ranks ≤ r plus ties. Whenever
    * n ≥ k / (p − 1/accuracy) (i.e. p·n − n/accuracy ≥ k), at least the
    * true top-k survive; SMALLER groups skip the filter entirely via the
    * per-key count, so no group can ever under-keep. The percentile
    * fraction must be a literal, which is why the group-size guard (rather
    * than a per-group fraction) carries the guarantee.
    *
    * One tiny aggregate (|keys| rows, broadcast back) + one map-side
    * filter; no extra shuffle of the big frame. */
  def approxTopKPrune(
      df: DataFrame,
      keyCol: String,
      scoreCol: String,
      k: Int,
      p: Double = 0.001,
      accuracy: Int = 10000): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(p > 1.0 / accuracy && p < 1.0,
      s"need 1/accuracy < p < 1 for a rank guarantee, got p=$p accuracy=$accuracy")
    val minN = math.ceil(k / (p - 1.0 / accuracy)).toLong
    val thresholds = df.groupBy(col(keyCol)).agg(
      percentile_approx(col(scoreCol), lit(p), lit(accuracy)).as("graft_thr"),
      count(lit(1)).as("graft_n"))
    df.join(broadcast(thresholds), Seq(keyCol))
      .filter(col("graft_n") < minN || col(scoreCol) <= col("graft_thr"))
      .drop("graft_thr", "graft_n")
  }
}
