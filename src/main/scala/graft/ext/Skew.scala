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

  /** Key-skew audit — the "look before you join" report: the `k` heaviest
    * values of a prospective join/groupBy key, each with its row count,
    * corpus share, and heavy-to-mean ratio (n · n_keys / total — how many
    * times an average key's load this key carries). Ratio ≫ 1 on rank 1 is
    * the signal to reach for salting ([[saltedCountSum]]), AQE skew join,
    * or the time-slice AsOf path BEFORE the 100 TB run stalls on one task.
    *
    * Shape: one map-combined count per key; the global stats collapse to
    * ONE row (broadcast back); the top-k runs the lossless sketch
    * pre-prune + skew-free ordinal — no full sort of the key dictionary,
    * no single-task window. Float math is two pinned divisions per output
    * row, rounded. Returns (key, n, rank, share, ratio), rank 1..k. */
  def keySkewAudit(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val stats = counts.agg(sum(col("n")).as("graft_total"),
      count(lit(1)).as("graft_keys"))
    val pruned = Ordinals.approxTopKPrune(
      counts.withColumn("graft_neg", -col("n").cast("double"))
        .withColumn("graft_g", lit(0)),
      "graft_g", "graft_neg", k)
    Ordinals.perKeyOrdinal(pruned, "graft_g", Seq("graft_neg", "key"))
      .filter(col("ordinal") < k)
      .crossJoin(broadcast(stats))
      .select(col("key"), col("n"), (col("ordinal") + 1L).as("rank"),
        round(col("n").cast("double") / col("graft_total"), 6).as("share"),
        round(col("n").cast("double") * col("graft_keys") /
          col("graft_total"), 4).as("ratio"))
  }

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
