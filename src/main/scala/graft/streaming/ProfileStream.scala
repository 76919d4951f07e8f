package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Profile

/** Streaming maintenance of the ACCOUNTING pillar: each micro-batch
  * folds into the persisted stats state
  * ([[Profile.appendStatsState]]) as its own tagged `batch_id=N`
  * partition — the per-source corpus report
  * ([[Profile.statsReport]]) is then a fold over |batches| narrow
  * rows with zero corpus re-scans, and an at-least-once replay of a
  * micro-batch overwrites its own partition instead of
  * double-counting. Per-batch cost is one aggregation over the batch
  * (the sketches pre-combine map-side). With [[DedupStream]],
  * [[AnnStream]], [[IndexStream]] and [[BpeStream]] this closes the
  * loop: every state pillar is stream-ingestible. */
object ProfileStream {

  def statsIngest(
      batches: DataFrame,
      stateDir: String,
      textCol: String,
      grpCol: String,
      checkpointDir: String): StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Profile.appendStatsState(batch, stateDir, textCol, grpCol,
          Some(batchId))
        ()
      }
      .start()
}
