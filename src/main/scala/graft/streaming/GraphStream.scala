package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.{Similarity, StateIO}

/** Streaming kNN-GRAPH maintenance — closes the stream posture for the
  * graph family the way [[AnnStream]] does for the IVF pillar it rides
  * on: each micro-batch of vectors appends to the persisted IVF state
  * ([[Similarity.appendIvfState]] — tagged partition, assigned once
  * ever) and then catches the MAINTAINED graph up
  * ([[Similarity.knnGraphDeltaFromState]] — the batch's vectors probe
  * their cells, and only existing owners whose top-k can actually
  * change re-rank; per-batch cost ∝ batch·occupancy, never the corpus).
  * Downstream consumers (mutual-NN mining, semantic clustering, graph
  * features) read a graph that is CURRENT after every micro-batch with
  * zero rebuild work ([[Similarity.readKnnGraphState]]).
  *
  * The first non-empty batch trains the IVF centroids and builds the
  * graph whole ([[Similarity.buildKnnGraphState]] — the deliberate
  * one-time pass); every later batch is a delta against the frozen
  * geometry.
  *
  * Replay safety (foreachBatch is at-least-once): the IVF append is a
  * tagged partition overwrite; the graph build is idempotent whole; the
  * delta re-derives every set from the IVF state and the batch tag
  * (never from what a crashed run half-wrote), re-runs legally at the
  * watermark, and gates readers behind `_graph_pending` until the
  * re-run completes — so a crash anywhere inside the micro-batch
  * replays to the same state. Stream batch ids are contiguous from 0,
  * which is exactly the in-order tag sequence the delta's
  * no-skipped-batches refusal wants (tags are `batchId + 1`, keeping
  * tag 0 free as "before any batch" for as-of reads).
  *
  * DELETES increment in-stream: a tombstone landing between
  * micro-batches is retracted by [[Similarity.knnGraphDeleteDeltaFromState]]
  * (edge retraction at neighborhood cost) before the next batch delta
  * applies — a no-op when the delete head has not moved — so delete
  * traffic never forces the full rebuild onto the ingest path. */
object GraphStream {

  def graphMaintainIngest(
      batches: DataFrame,
      ivfDir: String,
      graphDir: String,
      idCol: String,
      vecCol: String,
      checkpointDir: String,
      k: Int = 8,
      iters: Int = 2,
      trainSample: Int = 0,
      graphK: Int = 3,
      nProbe: Int = 2): StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val tag = batchId + 1
        Similarity.appendIvfState(batch, ivfDir, k, iters, idCol, vecCol,
          batchTag = Some(tag), trainSample = trainSample)
        // an all-empty prefix of micro-batches appends nothing (the IVF
        // state refuses to train on emptiness) — keep waiting for data
        if (StateIO.pathExists(spark, s"$ivfDir/cells")) {
          // graph exists ⇔ its meta file does: a crash mid-BUILD leaves
          // the pending marker but no meta, and the re-run must re-build
          // (the delta would refuse on the missing watermark anyway)
          if (!StateIO.pathExists(spark, s"$graphDir/_graph_meta"))
            Similarity.buildKnnGraphState(spark, ivfDir, graphDir,
              k = graphK, nProbe = nProbe)
          else {
            // retract any tombstones that landed since the last batch
            // (no-op when the delete head is current), then apply the
            // batch — the delta refuses on drift otherwise
            Similarity.knnGraphDeleteDeltaFromState(spark, ivfDir, graphDir)
            Similarity.knnGraphDeltaFromState(spark, ivfDir, graphDir, tag)
          }
        }
        ()
      }
      .start()
}
