package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Bpe

/** Streaming maintenance of the TOKENIZER pillar: the first non-empty
  * micro-batch trains and FREEZES the merge list
  * ([[Bpe.appendTokenizerState]] — the IVF-centroid posture: counts
  * must stay one unit; retrain = rebuild), every later batch encodes
  * incrementally map-side O(batch) into its own tagged `batch_id=N`
  * partition. Budget/mix/sample queries then read the narrow
  * (id, bpe_tokens) sidecar with zero retraining and zero corpus
  * re-encodes, and an at-least-once replay of a micro-batch
  * overwrites its own partition (micro-batch ids are the tags — the
  * [[IndexStream]]/[[AnnStream]] convention, stable across restarts
  * because the checkpoint replays the same ids). */
object BpeStream {

  def tokenizerIngest(
      batches: DataFrame,
      stateDir: String,
      idCol: String,
      textCol: String,
      numMerges: Int,
      checkpointDir: String): StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Bpe.appendTokenizerState(batch, stateDir, idCol, textCol,
          numMerges, batchTag = Some(batchId))
        ()
      }
      .start()
}
