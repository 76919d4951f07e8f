package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted index construction + conjunctive term search — the retrieval
  * backbone of a corpus-scale text pipeline (filtering, search-based
  * curation, contamination forensics all sit on top of term→docs lookup).
  *
  * The reference has no retrieval layer; this extends the SURVEY north-star
  * set (text analysis over the `documents` table) with the classic
  * IR primitive, built Spark-first:
  *
  *   - the (doc, term) posting relation is `explode(array_distinct(split))`
  *     → `groupBy(term)` — high-cardinality shuffle key, map-side partial
  *     aggregation, no driver participation;
  *   - posting lists are sorted per term (`sort_array(collect_list)`), so
  *     downstream intersection can merge, and the output is deterministic;
  *   - at 100 TB the hazard is the HOT term: a stopword's posting list is
  *     a billion doc ids in ONE aggregation buffer. [[shardedIndex]] is the
  *     scale path — postings split into bounded (term, shard) rows keyed by
  *     `doc_id % shards`, so no single task ever materializes a hot term's
  *     full list; a reader unions shards lazily (they stay sorted within a
  *     shard, shard ids order the merge). The unsharded [[invertedIndex]]
  *     is for bounded vocabularies / df-capped slices where one row per
  *     term is the convenient shape.
  *
  * Search ([[searchAll]]) is conjunctive (AND of all query terms): filter
  * the posting relation to the query terms (at scale: the persisted index
  * bucketed by term turns this into a partition-pruned lookup, not a scan),
  * then `groupBy(doc)` counting distinct matched terms == nTerms. This is
  * the standard small-intersection plan: work is proportional to the
  * posting lists of the QUERY terms only, never the corpus.
  */
object Index {

  private def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(Dedup.distinctTokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")

  /** term → (df, comma-joined sorted posting list). Postings serialize as
    * a string (numeric sort first, then stringify) so the artifact is
    * engine-portable and hash-stable. `minDf`/`maxDf` bound the emitted
    * vocabulary (df caps are also how real indexes drop stopwords). */
  def invertedIndex(
      docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 1L, maxDf: Long = Long.MaxValue): DataFrame =
    postings(docs, idCol, textCol)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        array_join(
          transform(sort_array(collect_list(col(idCol))), _.cast("string")),
          ",").as("postings"))
      .filter(col("df").between(minDf, maxDf))

  /** Scale path: posting lists sharded by `id % shards` into bounded rows.
    * A hot term occupies `shards` aggregation buffers instead of one; the
    * per-shard df column sums to the term's true df. */
  def shardedIndex(
      docs: DataFrame, idCol: String, textCol: String, shards: Int): DataFrame =
    postings(docs, idCol, textCol)
      .withColumn("shard", pmod(col(idCol), lit(shards)).cast("int"))
      .groupBy(col("term"), col("shard"))
      .agg(count(lit(1)).as("df"),
        array_join(
          transform(sort_array(collect_list(col(idCol))), _.cast("string")),
          ",").as("postings"))

  /** Docs containing ALL `terms` (conjunctive search), with the matched
    * term count as evidence. Output: (idCol, n_matched) — callers join back
    * to the corpus for payload columns. */
  def searchAll(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "searchAll needs at least one term")
    postings(docs, idCol, textCol)
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched")) // pairs are distinct per doc
      .filter(col("n_matched") === terms.length)
  }
}
