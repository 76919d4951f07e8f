package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data mixing.
  *
  * `df.stat.sampleBy` draws per-row randoms: membership changes across
  * re-runs, retried tasks, and engines — useless for a dataset recipe that
  * must be auditable and re-buildable. Here membership is a PURE FUNCTION
  * of the row id: keep a row iff `md5_60bit(id) mod B < rate(stratum)·B`.
  * Any engine that can compute md5 reproduces the exact sample (the x20
  * oracle does, in DuckDB); changing the rate only grows/shrinks the kept
  * set monotonically (a 10% sample is a subset of a 20% sample), which is
  * what you want when scaling a data mix up or down.
  *
  * Map-side filter, codegen'd, zero shuffle — scan-speed at any size.
  */
object Sampling {

  /** Per-stratum deterministic sample: `rates` maps stratum value → keep
    * fraction in [0, 1]; strata absent from the map use `defaultRate`.
    *
    * The bucket threshold is pre-rounded to an INTEGER on the driver
    * (`math.round(rate * buckets)`): comparing against the raw double
    * product would shift the boundary for non-representable rates
    * (0.1 * 10000 = 1000.0000000000001 admits one extra bucket), making the
    * effective rate off by 1/buckets from the stated fraction. */
  def stratified(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      buckets: Int = 10000): DataFrame = {
    val bucket = hashBucket(col(idCol), buckets)
    val thresholdExpr = rates.foldLeft(lit(math.round(defaultRate * buckets)): Column) {
      case (acc, (k, v)) =>
        when(col(stratumCol) === k, lit(math.round(v * buckets))).otherwise(acc)
    }
    df.filter(bucket < thresholdExpr)
  }

  /** Uniform deterministic sample at `rate` (integer threshold — see
    * [[stratified]]). */
  def uniform(df: DataFrame, idCol: String, rate: Double, buckets: Int = 10000): DataFrame =
    df.filter(hashBucket(col(idCol), buckets) < lit(math.round(rate * buckets)))

  /** Portable hash bucket in [0, buckets): DuckDB computes the identical
    * value as `CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 15))
    * AS BIGINT) % buckets` (the 60-bit hash is non-negative, so % == pmod).
    */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(PortableHash.md5Long(id.cast("string")), lit(buckets.toLong))

  /** Deterministic train/validation/test (or any n-way) split assignment:
    * the split label is a pure function of the row id, so every engine,
    * every re-run, and every retried task agrees on the assignment, and
    * growing one fraction only moves rows across adjacent splits.
    *
    * `splits` maps label → fraction; fractions must sum to ≤ 1 (a
    * remainder falls into `defaultLabel`). Thresholds are cumulative
    * integer bucket bounds (driver-rounded, see [[stratified]]).
    * Map-side `when` chain, codegen'd, zero shuffle — scan-speed.
    */
  def splitAssign(
      df: DataFrame, idCol: String,
      splits: Seq[(String, Double)],
      defaultLabel: String = "rest",
      buckets: Int = 10000): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    val total = splits.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"split fractions sum to $total > 1")
    val bucket = hashBucket(col(idCol), buckets)
    // round the CUMULATIVE fraction, not each increment: summing per-split
    // rounded values drifts (3× 1/3 at 10000 buckets → 3333+3333+3333 =
    // 9999, silently sending bucket 9999 to defaultLabel even though the
    // fractions sum to 1); the cumulative round pins the last bound to
    // round(1.0 · buckets) = buckets exactly
    val bounds = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.map(c => math.round(c * buckets))
    val assign = splits.zip(bounds).foldRight(lit(defaultLabel): Column) {
      case (((label, _), bound), acc) =>
        when(bucket < lit(bound), lit(label)).otherwise(acc)
    }
    df.withColumn("split", assign)
  }
}
