package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CROSS-PILLAR corpus-state audit.
  *
  * A production corpus is maintained in SEVERAL state pillars at once —
  * the same document lands in the LSH text state (near-dup gate), the
  * postings state (retrieval), and the tokenizer state (budget/mix
  * accounting) — and curation deletes must land in ALL of them. Nothing
  * couples those writes: an orchestrator that crashes between
  * per-pillar deletes, skips a pillar on retry, or simply never wires a
  * new pillar into the delete path leaves the states DISAGREEING about
  * which documents exist. Every pillar then keeps answering it own
  * queries correctly *for its own corpus*, so the divergence is
  * invisible until budgets are computed over documents retrieval
  * already dropped (or vice versa) — the exact class of silent
  * pipeline failure an audit exists to catch.
  *
  * [[crossPillarConsistency]] compares the pillars' LIVE id sets and
  * returns one row per document SOME pillar disagrees on — empty result
  * = consistent states. Each pillar's live set is its own read-side
  * definition (sidecar/members minus tombstones — the same derivation
  * its queries use), so the audit sees exactly what the queries see.
  *
  * Scale shape: live-id frames are narrow (one long column) and the
  * comparison is a full-outer hash join chain on id — shuffles
  * |corpus|-row single-column relations only, no texts, vectors, or
  * postings move. Output is bounded by the divergence, not the corpus.
  */
object StateAudit {

  private def minusTombstones(
      spark: SparkSession, dir: String, df: DataFrame): DataFrame =
    StateIO.readIfExists(spark, s"$dir/tombstones") match {
      case Some(tb) => df.join(tb.select(col("id")), Seq("id"), "left_anti")
      case None => df
    }

  /** Live doc ids of an LSH text state ([[Dedup.appendLshState]]):
    * every accepted member id minus tombstones — membership, not rep
    * survival (a doc whose GROUP lost its rep to deletes is still
    * live itself). */
  def lshLiveIds(spark: SparkSession, dir: String): DataFrame = {
    StateIO.checkNoSwapInProgress(spark, dir)
    minusTombstones(spark, dir,
      spark.read.parquet(s"$dir/members").select(col("id")))
  }

  /** Live doc ids of a postings state ([[Index.appendPostingsState]]):
    * the (id, dl) docs sidecar minus tombstones. The sidecar keeps
    * tombstoned rows through compaction (delete-replay corrections
    * re-derive from them), so the anti-join — the read-side liveness
    * rule — is applied here exactly as the delete path applies it. */
  def postingsLiveIds(spark: SparkSession, dir: String): DataFrame = {
    StateIO.checkNoSwapInProgress(spark, dir)
    minusTombstones(spark, dir,
      spark.read.parquet(s"$dir/docs").select(col("id")))
  }

  /** Live doc ids of a tokenizer state ([[Bpe.appendTokenizerState]]):
    * the (id, bpe_tokens) sidecar minus tombstones —
    * [[Bpe.readDocTokens]]'s liveness rule, ids only. */
  def tokenizerLiveIds(spark: SparkSession, dir: String): DataFrame = {
    StateIO.checkNoSwapInProgress(spark, dir)
    minusTombstones(spark, dir,
      spark.read.parquet(s"$dir/doc_tokens").select(col("id")))
  }

  /** Compare ≥ 2 pillars' live id sets: one row per id where the
    * pillars DISAGREE — (id, in_<pillar1>, in_<pillar2>, ...) with a
    * boolean per pillar — ordered by id; an empty frame means the
    * states agree document-for-document. Pillar names become column
    * suffixes, so keep them identifier-shaped. Ids present in NO pillar
    * cannot appear (the join is over the union of the live sets);
    * "delete slice X was applied to pillars A and C but never B"
    * surfaces as the X∖(earlier deletes) rows flagged
    * (false, true, false)-shaped — the partial-pipeline-failure
    * signature. */
  def crossPillarConsistency(
      pillars: Seq[(String, DataFrame)]): DataFrame = {
    require(pillars.size >= 2,
      s"cross-pillar consistency needs at least two pillars, got " +
        s"${pillars.size}")
    require(pillars.map(_._1).distinct.size == pillars.size,
      "pillar names must be unique (they become output columns)")
    val flagged = pillars.map { case (name, ids) =>
      name -> ids.select(col("id")).distinct()
        .withColumn(s"in_$name", lit(true))
    }
    val joined = flagged.map(_._2).reduce(
      (a, b) => a.join(b, Seq("id"), "full_outer"))
    val flags = pillars.map { case (name, _) =>
      coalesce(col(s"in_$name"), lit(false)).as(s"in_$name")
    }
    val agree = pillars.map(p => coalesce(col(s"in_${p._1}"), lit(false)))
      .reduce((a, b) => a && b) // join domain = the union ⇒ all-true = agreement
    joined.filter(!agree)
      .select((col("id") +: flags): _*)
      .orderBy("id")
  }
}
