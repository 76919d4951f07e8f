package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-budget bins (training
  * batches of ~budget tokens) deterministically, at scan speed.
  *
  * The assignment is offset-based: within a shard, documents are laid out
  * in `orderCol` order and `bin = exclusive-prefix-sum(size) div budget` —
  * i.e. a document starts in the bin where the running token stream has
  * reached it. A bin can overflow by at most one document's tail (the
  * standard streaming-packing approximation); exact first-fit packing is
  * inherently sequential and cannot run data-parallel.
  *
  * Skew: packing partitions by (`shardCols`*, shard) where `shard` is a
  * portable hash of the id into `numShards` buckets — so a low-cardinality
  * shard column (e.g. language) never funnels a whole corpus stratum
  * through one window task. Real pipelines pack per worker shard anyway;
  * determinism comes from the hash, not the physical partitioning.
  * Raise `numShards` with the cluster (it bounds parallelism).
  *
  * Everything before the per-shard window is map-side; the window
  * partitions on (shardCols, shard) — cardinality numShards × strata.
  */
object Packing {

  /** Sliding context windows over each document's token stream — the
    * long-document chunking stage of training-data prep (a doc longer
    * than the model context becomes overlapping windows; stride < window
    * preserves cross-boundary context).
    *
    * Pure map-side generate: tokenize once, explode a
    * `sequence(0, n_windows−1)` of window ordinals, slice per ordinal —
    * codegen'd, zero shuffle, output size = Σ ceil(nᵢ/stride) rows. The
    * window count is integer arithmetic ((n + stride − 1) div stride), so
    * every engine agrees on the exact chunking. Docs with zero tokens
    * yield no windows; the final window may be shorter than `window`.
    *
    * @return (idCol, window_id, start_token, win_tokens, window_text) */
  def chunkWindows(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "need 1 <= stride <= window")
    val toks = filter(Dedup.tokens(col(textCol)), _ =!= "")
    val n = size(toks).cast("long")
    docs
      .select(col(idCol), toks.as("graft_toks"), n.as("graft_n"))
      .filter(col("graft_n") > 0)
      .select(col(idCol), col("graft_toks"), col("graft_n"),
        // integer `div`, not double `/` + cast (the packBins lesson: the
        // double path diverges from integer division past 2^53)
        explode(sequence(lit(0L),
          expr(s"(graft_n + ${stride - 1}) div $stride") - lit(1L)))
          .as("window_id"))
      .select(col(idCol), col("window_id"),
        (col("window_id") * stride).as("start_token"),
        least(lit(window.toLong), col("graft_n") - col("window_id") * stride)
          .as("win_tokens"),
        concat_ws(" ", slice(col("graft_toks"),
          (col("window_id") * stride + 1).cast("int"), lit(window)))
          .as("window_text"))
  }

  /** Bin assignment per document.
    * @param sizeCol  token/size column (non-negative integer)
    * @param budget   bin capacity in the same unit
    * @return input columns + shard + bin (both 0-based)
    */
  def packBins(
      docs: DataFrame, idCol: String, sizeCol: String,
      shardCols: Seq[String], orderCol: String,
      budget: Long, numShards: Int = 16): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numShards > 0, "numShards must be positive")
    val sharded = docs.withColumn("shard",
      Sampling.hashBucket(col(idCol), numShards))
    val w = Window
      .partitionBy((shardCols.map(col) :+ col("shard")): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // `div` (SQL integral divide), NOT double `/` + cast: the double path
    // loses integer precision once the running token sum passes 2^53 —
    // plausible for a shard of a 100 TB corpus — and then disagrees with
    // any integer-division consumer (the x31 DuckDB oracle uses `//`)
    sharded
      .withColumn("graft_cum",
        coalesce(sum(col(sizeCol)).over(w), lit(0L)).cast("long"))
      .withColumn("bin", expr(s"graft_cum div ${budget}L"))
      .drop("graft_cum")
  }

  /** Packing-efficiency report over a [[packBins]] output: per group, the
    * bin count, packed token mass, and the mean/min/max per-bin fill
    * against `budget` — the utilization check run after packing ("how
    * much context-window capacity does this sharding waste"). A fill
    * above 1.0 is a bin whose last document overflowed the budget (the
    * greedy cumulative assignment closes a bin only after it fills);
    * chronically low min_fill means too many shards for the group's
    * volume. Two stacked aggregations, both map-side combined; output is
    * |groups| rows, intermediate is |bins|. */
  def binEfficiency(
      binned: DataFrame, groupCols: Seq[String], sizeCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val perBin = binned
      .groupBy((groupCols.map(col) :+ col("shard") :+ col("bin")): _*)
      .agg(sum(col(sizeCol)).as("graft_used"))
    perBin.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_bins"),
        sum(col("graft_used")).as("used_tokens"),
        min(col("graft_used")).as("graft_min"),
        max(col("graft_used")).as("graft_max"))
      .select((groupCols.map(col) ++ Seq(
        col("n_bins"), col("used_tokens"),
        // ratio of integer TOTALS (not avg of per-bin ratios), rounded
        // with floor(x*10^4 + 0.5): the inputs are exact integers so the
        // quotient double is bit-identical on any engine, and the floor
        // spelling rounds the DOUBLE itself — Spark's round() re-reads
        // the shortest decimal (0.25525 -> 0.2553) while C-family
        // round() sees the binary value (-> 0.2552); floor agrees
        // everywhere (the x74 quantization lesson)
        Dedup.round4(col("used_tokens").cast("double") /
          (col("n_bins") * lit(budget))).as("mean_fill"),
        Dedup.round4(col("graft_min").cast("double") / budget).as("min_fill"),
        Dedup.round4(col("graft_max").cast("double") / budget).as("max_fill"))): _*)
  }

  /** Assemble the packed training sequences: one row per bin with the
    * documents' text joined in `orderCol` order.
    *
    * `collect_list` carries NO ordering guarantee under a shuffle, so the
    * deterministic assembly is `sort_array(collect_list(struct(order,
    * text)))` — structs sort by their leading field — then a transform +
    * concat. One aggregation on the (shardCols, shard, bin) key; the
    * packed text is assembled exactly once, map-combined like any agg.
    *
    * @return shardCols + shard + bin + n_docs + tok_sum + packed_text
    */
  def assembleBins(
      docs: DataFrame, idCol: String, textCol: String, sizeCol: String,
      shardCols: Seq[String], orderCol: String,
      budget: Long, numShards: Int = 16, sep: String = " "): DataFrame = {
    val binned = packBins(docs, idCol, sizeCol, shardCols, orderCol,
      budget, numShards)
    val keys = (shardCols :+ "shard" :+ "bin").map(col)
    binned.groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).as("tok_sum"),
        concat_ws(sep, transform(
          sort_array(collect_list(struct(col(orderCol), col(textCol)))),
          s => s.getField(textCol))).as("packed_text"))
  }
}
