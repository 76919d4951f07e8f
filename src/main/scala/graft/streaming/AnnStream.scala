package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Similarity

/** Streaming EMBEDDING ingest against a persisted IVF index — the
  * vector-space twin of [[DedupStream.nearDupIngestFromState]], closing
  * the same loop for semantic dedup: each micro-batch of vectors is
  * checked against the accepted corpus ([[Similarity.nearDupPairsFromState]]
  * — probed cells only, never an exhaustive scan), rejected arrivals are
  * written to an audit pairs table, and survivors append to the state
  * ([[Similarity.appendIvfState]] — assigned once ever, tagged partition).
  * Per-batch cost is O(batch · nProbe/k · corpus-cell) probe work plus one
  * broadcast-argmin assignment pass; the corpus is never re-scored.
  *
  * The first batch trains the index centroids (and is accepted whole,
  * deduplicated within itself); every later batch probes the frozen
  * geometry. Within a batch, byte-identical vectors collapse to the min
  * id (the same exact-first discipline as the text ingest — within-batch
  * NEAR-dups are deliberately left to the next stage, matching
  * [[DedupStream.nearDupIngest]]'s contract where the corpus check is the
  * near-dup authority).
  *
  * Replay safety (foreachBatch is at-least-once): pair reads exclude the
  * batch's own `batch_id=N` cells (`excludeTag`), and both the pairs and
  * state appends are tagged partition OVERWRITES — a replayed batch
  * recomputes the same accepted set and lands it in place. Exactly-once
  * output from at-least-once execution, no transactional sink.
  *
  * Recall posture: a true near-dup hiding in an un-probed cell is missed
  * (every IVF accept gate's hazard) — raise `nProbe` to tighten, or run a
  * periodic offline [[Similarity.semanticDedup]] sweep as the authority. */
object AnnStream {

  def vectorDedupIngest(
      batches: DataFrame,
      stateDir: String,
      pairsDir: String,
      idCol: String,
      vecCol: String,
      checkpointDir: String,
      threshold: Double = 0.9,
      k: Int = 8,
      iters: Int = 2,
      nProbe: Int = 2): StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // within-batch exact collapse: byte-identical vectors keep min id
        // (deterministic serialization via to_json of the array)
        val w = Window.partitionBy("graft_fp").orderBy(col(idCol))
        val collapsed = batch.select(col(idCol), col(vecCol))
          .withColumn("graft_fp", md5(to_json(struct(col(vecCol)))))
          .withColumn("graft_rn", row_number().over(w))
          .filter(col("graft_rn") === 1).drop("graft_rn", "graft_fp")
        // gate on CELLS, not centroids: a crash between the centroid and
        // cell writes leaves a trained-but-empty index — treat as first
        // batch (appendIvfState will reuse the frozen centroids). Only
        // PATH_NOT_FOUND counts as "no state yet": any other read failure
        // must CRASH the micro-batch so replay retries it — skipping the
        // near-dup gate would append the batch whole, permanently
        // accepting cross-batch duplicates into the IVF state.
        val stateExists = graft.ext.StateIO
          .readTableIfExists(spark, stateDir, "cells")
          .exists(_.head(1).nonEmpty)
        val accepted =
          if (!stateExists) collapsed
          else {
            Similarity.nearDupPairsFromState(spark, stateDir, collapsed,
                threshold, nProbe, idCol, vecCol, excludeTag = Some(batchId))
              .write.mode("overwrite")
              .parquet(s"$pairsDir/batch_id=$batchId")
            collapsed.join(
              spark.read.parquet(s"$pairsDir/batch_id=$batchId")
                .select(col("new_id").as(idCol)).distinct(),
              Seq(idCol), "left_anti")
          }
        Similarity.appendIvfState(accepted, stateDir, k, iters,
          idCol, vecCol, batchTag = Some(batchId))
        ()
      }
      .start()
}
