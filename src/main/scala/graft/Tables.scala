package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver testdata (TESTDATA.md).
  *
  * Each scale-factor directory holds one parquet file per table. Filters and
  * column projections applied downstream reach the parquet scan via Catalyst
  * pushdown (verified with `.explain("formatted")` — `PushedFilters` /
  * `ReadSchema` in the scan node), so reading "the whole table" here is free:
  * only referenced columns and matching row groups are actually read.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session-build-time configs every graft entrypoint applies via
    * [[configure]]. `nanosAsLong` lives here (not as a per-load
    * `spark.conf.set`) so concurrent queries never race on session conf:
    * events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; we read it as raw int64 nanos and convert below. */
  val sessionConfs: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true") ++
      // cluster-durable materialization for the dedup chain (see
      // graft.ext.Dedup.checkpointDirKey): settable from the contract
      // mains (Verify/Bench) without a code change
      sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR").filter(_.nonEmpty)
        .map(d => graft.ext.Dedup.checkpointDirKey -> d)

  def configure(b: SparkSession.Builder): SparkSession.Builder =
    sessionConfs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // `div`, NOT `/`: slash is DOUBLE division, and epoch nanos (~1.7e18)
    // exceed a double's 53-bit mantissa — the rounded quotient lands ±1 µs
    // off DuckDB's exact truncation on ~10% of rows. Integer division
    // truncates exactly like epoch_us(TIMESTAMP_NS).
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
