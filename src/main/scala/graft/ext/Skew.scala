package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: two-phase salted groupBy.
  *
  * A plain `groupBy(key)` over a low-cardinality / skewed key funnels every
  * row of a hot key through ONE reducer task — the classic 100 TB
  * bottleneck (5 event types × billions of rows = 5 busy tasks, the rest of
  * the cluster idle). Salting shards each key into `saltBuckets` partial
  * groups aggregated in parallel, then combines the partials with a second,
  * tiny aggregation. Results are identical to the plain groupBy for
  * decomposable aggregates (sum/count/min/max).
  *
  * Note: Spark's map-side partial aggregation already handles much of this
  * for simple aggregates; explicit salting matters when partials can't
  * combine map-side (e.g. after an expensive upstream join, collect_list,
  * or with extreme per-key row counts). The declared query q22 pins the
  * equivalence against a plain-GROUP BY oracle.
  */
object Skew {

  /** count + sum aggregation by `key` with salting. Returns
    * (key, cnt, total) — bit-equal to the unsalted result for sum-of-double
    * ONLY after rounding (partial sums reorder additions), so round
    * downstream as the declared-query corpus does anyway. */
  def saltedCountSum(
      df: DataFrame, key: Column, value: Column, saltBuckets: Int = 16): DataFrame = {
    val salted = df.select(
      key.as("k"), value.as("v"),
      (abs(hash(monotonically_increasing_id())) % saltBuckets).as("salt"))
    val partial = salted
      .groupBy(col("k"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
    partial
      .groupBy(col("k"))
      .agg(sum(col("pc")).as("cnt"), sum(col("ps")).as("total"))
  }
}
