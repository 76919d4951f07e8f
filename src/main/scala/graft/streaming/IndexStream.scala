package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Index

/** Streaming search-index maintenance: each micro-batch lands in the
  * persisted postings state ([[Index.appendPostingsState]]) as its own
  * tagged `batch_id=N` partition set — BM25 / term lookup over the whole
  * history is then a partition-pruned parquet read
  * ([[Index.bm25TopKFromState]]) with zero re-tokenization, and an
  * at-least-once replay of a batch overwrites its own partitions instead
  * of double-counting df / totals (the postings state's tagged mode is
  * the only crash-safe one — see [[Index.appendPostingsState]]).
  * Per-batch cost is one tokenize + tf aggregation over the batch. The
  * streaming twin of the corpus ingests in [[DedupStream]] /
  * [[AnnStream]], closing the loop for the fourth state pillar. */
object IndexStream {

  def postingsIngest(
      batches: DataFrame,
      stateDir: String,
      idCol: String,
      textCol: String,
      checkpointDir: String,
      buckets: Int = 64): StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Index.appendPostingsState(batch, stateDir, idCol, textCol, buckets,
          batchTag = Some(batchId))
        ()
      }
      .start()
}
