package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.{Dedup, StateIO}

/** Streaming MEDIA ingest against a persisted fingerprint state — the
  * modality twin of [[DedupStream.nearDupIngestFromState]] (texts) and
  * [[AnnStream.vectorDedupIngest]] (vectors), closing the dedup-at-ingest
  * loop for binary payloads: each micro-batch is fingerprinted by the
  * caller-supplied `fingerprinter` (image dHash via
  * [[graft.ext.Multimodal.perceptualHashBatch]], audio prints via
  * [[graft.ext.Multimodal.audioFingerprintBatch]] — anything producing
  * (id, ok, sig)), checked against the accepted corpus
  * ([[Dedup.incrementalHammingPairsFromState]] — a partition-pruned read
  * of only the buckets the batch's band words hash to, never a corpus
  * re-band), rejected arrivals are written to an audit pairs table, and
  * survivors append to the state ([[Dedup.appendFpState]] — banded once
  * ever, tagged partition).
  *
  * Within a batch, byte-identical FINGERPRINTS collapse to the min id;
  * within-batch NEAR-dups are deliberately left to the next stage (the
  * corpus check is the near-dup authority — the same contract as the
  * text and vector ingests). Payloads whose fingerprint refuses
  * (`ok = false`: undecodable image, non-PCM16 audio, truncated
  * container) are neither checked nor appended — audit them upstream on
  * the fingerprinter's `ok` column.
  *
  * Replay safety (foreachBatch is at-least-once): pair reads exclude the
  * batch's own `batch_id=N` partitions (`excludeTag`), and both the
  * pairs and state appends are tagged partition OVERWRITES — a replayed
  * batch recomputes the same accepted set and lands it in place. */
object MediaStream {

  def fingerprintDedupIngest(
      batches: DataFrame,
      fingerprinter: DataFrame => DataFrame,
      stateDir: String,
      pairsDir: String,
      idCol: String,
      sigCol: String,
      checkpointDir: String,
      maxHamming: Int = 3,
      buckets: Int = 256): StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fps = fingerprinter(batch).filter(col("ok"))
          .select(col(idCol), col(sigCol))
        val w = Window.partitionBy(sigCol).orderBy(col(idCol))
        val collapsed = fps.withColumn("graft_rn", row_number().over(w))
          .filter(col("graft_rn") === 1).drop("graft_rn")
        // gate on the bands table: PATH_NOT_FOUND-only counts as "no
        // state yet" — any other read failure must CRASH the micro-batch
        // so replay retries it (skipping the check would append the
        // batch whole, permanently accepting cross-batch duplicates)
        val stateExists = StateIO
          .readTableIfExists(spark, stateDir, "bands")
          .exists(_.head(1).nonEmpty)
        val accepted =
          if (!stateExists) collapsed
          else {
            Dedup.incrementalHammingPairsFromState(spark, stateDir,
                collapsed, idCol, sigCol, maxHamming,
                excludeTag = Some(batchId))
              .write.mode("overwrite")
              .parquet(s"$pairsDir/batch_id=$batchId")
            collapsed.join(
              spark.read.parquet(s"$pairsDir/batch_id=$batchId")
                .select(col("new_id").as(idCol)).distinct(),
              Seq(idCol), "left_anti")
          }
        Dedup.appendFpState(accepted, stateDir, idCol, sigCol,
          batchTag = Some(batchId), buckets = buckets)
        ()
      }
      .start()

  /** Streaming MEDIA METADATA ingest — the extraction twin of
    * [[fingerprintDedupIngest]], completing the modality story for a
    * crawl pipeline: the dedup ingest decides WHICH payloads survive,
    * this one lands WHAT they are. Each micro-batch runs the
    * header-only type dispatcher ([[graft.ext.Multimodal.mediaMeta]]:
    * png/jpeg/gif/bmp/wav/mp4/mp3/gvid; unrecognized = `bin`) and
    * appends one typed [[graft.ext.Multimodal.MediaTypeMeta]] row per
    * payload into `metaDir`'s `batch_id=N` partition.
    *
    * Replay safety (foreachBatch is at-least-once): the rows are a PURE
    * function of the payload bytes, and each batch lands as a tagged
    * partition OVERWRITE — a replayed batch recomputes identical rows
    * in place, never duplicates. Sample bytes are never read (headers
    * only), so per-batch cost is the parse map plus one columnar
    * write; the table reads back with `spark.read.parquet(metaDir)`
    * partition-pruned by `batch_id` for per-ingest audits. */
  def metadataIngest(
      batches: DataFrame,
      metaDir: String,
      idCol: String,
      payloadCol: String,
      checkpointDir: String): StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ext.Multimodal.mediaMetaBatch(batch, idCol, payloadCol)
          .toDF()
          .write.mode("overwrite")
          .parquet(s"$metaDir/batch_id=$batchId")
        ()
      }
      .start()
}
