package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of exact dedup ([[graft.ext.Dedup.exact]]): emit only the
  * FIRST arrival of each content fingerprint; duplicates arriving later are
  * dropped.
  *
  * State design for scale: `dropDuplicatesWithinWatermark` keeps one state
  * entry per distinct fingerprint seen within the watermark horizon and
  * evicts entries once the watermark passes them — so state is
  * O(distinct docs per horizon), not O(stream length). A duplicate that
  * arrives later than the horizon after its original would re-emit; pick
  * the horizon to cover the pipeline's reorder window (for training-data
  * ingestion that is the batch-landing skew, typically minutes).
  *
  * The fingerprint is md5 of the content — the same portable fingerprint
  * the batch operator groups on, so a replayed stream emits exactly the
  * batch `exact` representatives (pinned by StreamingSpec).
  */
object DedupStream {

  /** @param docs     streaming DataFrame with an event-time column
    * @param tsCol    event-time column (timestamp type)
    * @param textCol  content column to fingerprint
    * @param horizon  watermark delay, e.g. "10 minutes" */
  def firstArrivals(
      docs: DataFrame,
      tsCol: String,
      textCol: String,
      horizon: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming NEAR-dup suppression keyed by SimHash: a document whose
    * 32-bit simhash equals an earlier arrival's within the horizon is
    * dropped. Token-reorder/whitespace variants collide on the signature
    * (that is SimHash's point), so this catches a class of near-dups exact
    * fingerprinting misses, at the same O(distinct signatures per horizon)
    * state — the streaming twin of grouping by
    * [[graft.ext.Dedup.simhashColumn]]. Hamming-close-but-unequal
    * signatures still pass; full near-dup clustering stays a batch job
    * (lshPairs + components). */
  def simhashFirstArrivals(
      docs: DataFrame,
      tsCol: String,
      textCol: String,
      horizon: String = "10 minutes"): DataFrame =
    docs
      .withColumn("simhash", graft.ext.Dedup.simhashColumn(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("simhash")
}
