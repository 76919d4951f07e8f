package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.ext.{AsOf, Behavior, Bpe, Compaction, Curate, Dedup, Index, Layout, Packing, Profile, RangeJoin, Sampling, Similarity, Skew, StateAudit, TextAnalysis}

/** SQL table-valued-function surface for the north-star whole-plan
  * operators (as-of join, range join, LSH dedup pairs) — SURVEY §2.9's
  * "SQL exposure" follow-through, alongside the scalar/generator functions
  * ([[ExtractBlocks]], [[MinHashSig]], …).
  *
  * These operators are whole-plan transforms (shuffle + window / banded
  * join shapes), not scalar expressions, so the scalar function registry
  * cannot carry them. Spark's analyzer resolves `FROM f(...)` through the
  * session [[org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry]]
  * (the mechanism behind the built-in `range(...)`), whose builders map
  * argument expressions to a LOGICAL PLAN. Each builder here parses its
  * literal arguments, looks up the named input views in the session
  * catalog, runs the SAME DataFrame implementation the Scala API uses, and
  * returns that Dataset's logical plan — SQL and DataFrame callers execute
  * byte-identical plans and cannot drift apart.
  *
  * {{{
  * SELECT * FROM asof_join('purchases', 'views', 'user_id', 'ts', 'ts')
  * SELECT * FROM range_join('views', 'purch', 'user_id', 'us',
  *                          'start_us', 'end_us', 3600000000, 'event_id')
  * SELECT * FROM dedup_pairs('documents', 'doc_id', 'text', 0.5)
  * SELECT * FROM decontaminate('documents', 'eval_suite', 'doc_id', 'text', 13)
  * SELECT * FROM semantic_dedup('embeddings', 0.95)
  * SELECT * FROM token_budget('scored_docs', 'doc_id', 'n_words', 'quality_score', 1000000)
  * SELECT * FROM contamination_score('documents', 'eval_suite', 'doc_id', 'text', 13)
  * SELECT * FROM dup_ngram_coverage('documents', 'doc_id', 'text', 5)
  * SELECT * FROM bm25_topk('documents', 'doc_id', 'text', 'dup,vector', 10)
  * SELECT * FROM unigram_nll('documents', 'doc_id', 'text')
  * SELECT * FROM latest_by_key('events', 'user_id', 'ts,event_id')
  * SELECT * FROM zorder_cluster('lineitem', 'l_partkey,l_suppkey', 32)
  * SELECT * FROM funnel('events', 'user_id', 'ts', 'event_type', 'view,click,purchase')
  * SELECT * FROM retention('events', 'user_id', 'ts')
  * SELECT * FROM rate_anomaly('events', 'ts', 24, 3.0)
  * SELECT * FROM weighted_sample('documents', 'doc_id', 'n_chars', 'lang', 20)
  * SELECT * FROM chunk_windows('documents', 'doc_id', 'text', 100, 50)
  * SELECT * FROM sketch_distinct('documents', 'source', 'text')
  * SELECT * FROM source_overlap('documents', 'text', 'source', 13)
  * SELECT * FROM transitions('events', 'user_id', 'ts', 'event_id', 'event_type')
  * SELECT * FROM bpe_pairs('documents', 'text', 30)
  * SELECT * FROM quantize_int8('embeddings')
  * SELECT * FROM promote_json('events', 'props', 'k BIGINT')
  * SELECT * FROM snapshot_diff('corpus_v1', 'corpus_v2', 'doc_id', 'text')
  * SELECT * FROM skew_audit('lineitem', 'l_partkey', 10)
  * SELECT * FROM degree_histogram('dup_pairs_view', 'id_a', 'id_b')
  * SELECT * FROM cluster_sizes('component_view', 'rep')
  * SELECT * FROM containment_pairs('documents', 'doc_id', 'text', 0.8)
  * SELECT * FROM exact_median('documents', 'source', 'n_chars')
  * SELECT * FROM exact_quartiles('documents', 'lang', 'n_chars')
  * SELECT * FROM recall_at_k('ann_result_view', 'brute_truth_view')
  * SELECT * FROM embedding_profile('embeddings', 'label')
  * SELECT * FROM contam_attribution('corpus', 'eval_suite', 'doc_id', 'text', 'source', 13)
  * SELECT * FROM pair_group_matrix('dup_pairs', 'id_a', 'id_b', 'jaccard', 'documents', 'doc_id', 'source')
  * SELECT * FROM bpe_train('documents', 'text', 8)
  * SELECT * FROM vocab_coverage('documents', 'text', 'source', 32000)
  * SELECT * FROM effective_tokens('documents', 'text', 'source')
  * SELECT * FROM phrase_search('documents', 'doc_id', 'text', 'key agg')
  * SELECT * FROM dup_transitivity('dup_pairs_view', 'id_a', 'id_b')
  * SELECT * FROM lang_confusion('documents', 'lang', 'text')
  * SELECT * FROM dup_spans('documents', 'doc_id', 'text', 10)
  * SELECT * FROM temperature_mix('documents', 'text', 'source', 0.5)
  * SELECT * FROM hard_negatives('embeddings', 'probe_view', 'vec_id', 'embedding', 5, 0.15, 0.35)
  * SELECT * FROM ann_from_state('/indexes/corpus_ivf', 'probe_view', 'vec_id', 'embedding', 10, 2)
  * SELECT * FROM ann_state_pairs('/indexes/corpus_ivf', 'batch_view', 'vec_id', 'embedding', 0.9, 2)
  * SELECT * FROM substring_dedup('documents', 'doc_id', 'text', 10)
  * SELECT * FROM stats_report('/state/corpus_stats')
  * SELECT * FROM bm25_from_state('/state/postings', 'doc_id', 'spark shuffle', 10)
  * }}}
  *
  * Arguments must be foldable literals (view/column names as strings,
  * thresholds as numbers) — the builder runs at analysis time, before any
  * row exists; non-literal arguments raise the standard
  * `NON_FOLDABLE_ARGUMENT` AnalysisException via [[Registration]].
  * Multi-column parameters (join keys, interval ids) are comma-separated
  * inside one string literal.
  *
  * The reference has no SQL surface at all (insert-only SQLite,
  * etl_pipeline.py:352-380); this is north-star scope so analysts can
  * reach the scale operators from pure SQL.
  */
object TableFunctions {

  /** Register all graft table functions on `spark`'s session; idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.tableFunctionRegistry
    reg.createOrReplaceTempFunction(
      "asof_join", exprs => asofJoin(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "range_join", exprs => rangeJoin(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "dedup_pairs", exprs => dedupPairs(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "decontaminate", exprs => decontaminate(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "curate", exprs => curate(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "curate_full", exprs => curateFull(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "search_all", exprs => searchAll(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "inverted_index", exprs => invertedIndex(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "semantic_dedup", exprs => semanticDedup(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "token_budget", exprs => tokenBudget(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "contamination_score", exprs => contaminationScore(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "dup_ngram_coverage", exprs => dupNgramCoverage(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "bm25_topk", exprs => bm25TopK(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "unigram_nll", exprs => unigramNll(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "latest_by_key", exprs => latestByKey(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "zorder_cluster", exprs => zorderCluster(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "funnel", exprs => funnel(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "retention", exprs => retention(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "rate_anomaly", exprs => rateAnomaly(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "weighted_sample", exprs => weightedSample(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "chunk_windows", exprs => chunkWindows(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "sketch_distinct", exprs => sketchDistinct(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "source_report", exprs => sourceReport(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "top_duplicates", exprs => topDuplicates(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "source_overlap", exprs => sourceOverlap(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "transitions", exprs => transitions(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "bpe_pairs", exprs => bpePairs(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "quantize_int8", exprs => quantizeInt8(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "promote_json", exprs => promoteJson(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "snapshot_diff", exprs => snapshotDiff(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "recall_at_k", exprs => recallAtK(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "skew_audit", exprs => skewAudit(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "degree_histogram", exprs => degreeHistogramTvf(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "cluster_sizes", exprs => clusterSizesTvf(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "containment_pairs", exprs => containmentPairsTvf(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "exact_median", exprs => exactMedianTvf(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "exact_quartiles", exprs => exactQuartilesTvf(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "embedding_profile", exprs => embeddingProfile(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "contam_attribution", exprs => contamAttribution(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "pair_group_matrix", exprs => pairGroupMatrix(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "bpe_train", exprs => bpeTrain(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "vocab_coverage", exprs => vocabCoverage(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "effective_tokens", exprs => effectiveTokens(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "phrase_search", exprs => phraseSearch(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "dup_transitivity", exprs => dupTransitivity(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "lang_confusion", exprs => langConfusion(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "dup_spans", exprs => dupSpans(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "temperature_mix", exprs => temperatureMix(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "hard_negatives", exprs => hardNegatives(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "ann_from_state", exprs => annFromState(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "knn_graph", exprs => knnGraph(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "mutual_nn", exprs => mutualNn(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "semantic_clusters", exprs => semanticClusters(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "export_shards", exprs => exportShards(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "hamming_pairs", exprs => hammingPairs(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "image_phash", exprs => imagePhash(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "wav_meta", exprs => wavMeta(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "audio_stats", exprs => audioStats(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "audio_fp", exprs => audioFp(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "audio_frames", exprs => audioFrames(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "video_frame_hashes", exprs => videoFrameHashes(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "video_neardup", exprs => videoNeardup(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "fp_state_pairs", exprs => fpStatePairs(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "fp_clusters", exprs => fpClusters(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "media_meta", exprs => mediaMeta(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "mp4_meta", exprs => mp4Meta(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "mp3_meta", exprs => mp3Meta(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "page_rank", exprs => pageRank(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "page_rank_state", exprs => pageRankState(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "semantic_decontam", exprs => semanticDecontam(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "knn_graph_state", exprs => knnGraphState(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "ann_state_pairs", exprs => annStatePairs(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "substring_dedup", exprs => substringDedup(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "stats_report", exprs => statsReport(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "bm25_from_state", exprs => bm25FromState(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "temperature_sample", exprs => temperatureSample(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "split_leakage", exprs => splitLeakage(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "threshold_sweep", exprs => thresholdSweep(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "ivf_state_audit", exprs => ivfStateAudit(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "substring_fixpoint", exprs => substringFixpoint(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "trained_scorer", exprs => trainedScorer(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "budget_from_state", exprs => budgetFromState(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "mix_from_state", exprs => mixFromState(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "tokenizer_merges", exprs => tokenizerMerges(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "sample_from_state", exprs => sampleFromState(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "bm25_asof", exprs => bm25Asof(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "hybrid_from_state", exprs => hybridFromState(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "state_consistency", exprs => stateConsistency(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "state_consistency_asof",
      exprs => stateConsistencyAsof(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "state_health", exprs => stateHealth(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "ivf_asof", exprs => ivfAsof(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "stats_asof", exprs => statsAsof(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "budget_asof", exprs => budgetAsof(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "state_diff", exprs => stateDiff(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "mmr_from_state", exprs => mmrFromState(spark, exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "capped_mix", exprs => cappedMix(spark, exprs), "built-in")
  }

  /** `state_diff('dir', 'pillar', batch1, delete1, batch2, delete2)` →
    * [[StateAudit.snapshotDiff]] between two versions of one pillar's
    * live-id set ('lsh' | 'postings' | 'tokenizer'): one row per
    * document live in exactly one version — "what did last night's
    * pipeline do?" over the tagged partition history. */
  private def stateDiff(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "state_diff"
    requireArity(f, exprs, min = 6, max = 6)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val pillar = args.name("pillar")
    val b1 = args.long("batch1"); val d1 = args.long("delete1")
    val b2 = args.long("batch2"); val d2 = args.long("delete2")
    def ids(b: Long, d: Long) = pillar match {
      case "lsh" => StateAudit.lshLiveIdsAsOf(spark, dir, b, d)
      case "postings" => StateAudit.postingsLiveIdsAsOf(spark, dir, b, d)
      case "tokenizer" => StateAudit.tokenizerLiveIdsAsOf(spark, dir, b, d)
      case other => throw new IllegalArgumentException(
        s"$f: unknown pillar '$other' (expected lsh | postings | tokenizer)")
    }
    plan(StateAudit.snapshotDiff(ids(b1, d1), ids(b2, d2)))
  }

  /** `mmr_from_state('dir', query_table, 'id', 'vec', k, lambda,
    * cand_k, n_probe)` → [[Similarity.mmrTopKFromState]]:
    * diversity-penalized top-k over the probed IVF candidates. */
  private def mmrFromState(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "mmr_from_state"
    requireArity(f, exprs, min = 8, max = 8)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val queries = args.table(spark, "query_table")
    val id = args.name("id")
    val vec = args.name("vec")
    val k = args.int("k")
    val lambda = args.double("lambda")
    val candK = args.int("cand_k")
    val nProbe = args.int("n_probe")
    plan(Similarity.mmrTopKFromState(spark, dir, queries, k, lambda,
      candK, nProbe, idCol = id, vecCol = vec))
  }

  /** `capped_mix(docs_table, 'text', 'grp', max_up_milli[, alpha])` →
    * [[Sampling.cappedTemperatureMix]]: temperature shares under a
    * per-source up-weight cap, water-filled to fixpoint in exact ppm
    * units. */
  private def cappedMix(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "capped_mix"
    requireArity(f, exprs, min = 4, max = 5)
    val args = new Args(f, exprs)
    val docs = args.table(spark, "docs_table")
    val text = args.name("text")
    val grp = args.name("grp")
    val maxUpMilli = args.long("max_up_milli")
    val alpha = if (args.exhausted) 0.5 else args.double("alpha")
    plan(Sampling.cappedTemperatureMix(docs, text, grp, maxUpMilli, alpha))
  }

  /** `ivf_asof('dir', query_table, 'id', 'vec', k, n_probe, asof_batch,
    * asof_delete)` → [[Similarity.ivfTopKFromStateAsOf]]: probed
    * retrieval as the IVF state stood after the given append/delete
    * tags ([[graft.ext.Index.bm25TopKFromStateAsOf]]'s contract on the
    * vector pillar). */
  private def ivfAsof(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "ivf_asof"
    requireArity(f, exprs, min = 8, max = 8)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val queries = args.table(spark, "query_table")
    val id = args.name("id")
    val vec = args.name("vec")
    val k = args.int("k")
    val nProbe = args.int("n_probe")
    val asofBatch = args.long("asof_batch")
    val asofDelete = args.long("asof_delete")
    plan(Similarity.ivfTopKFromStateAsOf(spark, dir, queries, k,
      asOfBatch = asofBatch, asOfDelete = asofDelete, nProbe = nProbe,
      idCol = id, vecCol = vec))
  }

  /** `stats_asof('dir', asof_batch, asof_delete)` →
    * [[Profile.statsReportAsOf]]: the per-source composition report as
    * the stats state stood after the given append/delete tags. */
  private def statsAsof(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "stats_asof"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val asofBatch = args.long("asof_batch")
    val asofDelete = args.long("asof_delete")
    plan(Profile.statsReportAsOf(spark, dir, asofBatch, asofDelete))
  }

  /** `budget_asof('dir', quality_table, 'id', 'quality', budget,
    * asof_batch, asof_delete)` → [[Bpe.tokenBudgetFromStateAsOf]]: the
    * budget cut as the tokenizer state stood after the given tags. */
  private def budgetAsof(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "budget_asof"
    requireArity(f, exprs, min = 7, max = 7)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val quality = args.table(spark, "quality_table")
    val id = args.name("id")
    val q = args.name("quality")
    val budget = args.long("budget")
    val asofBatch = args.long("asof_batch")
    val asofDelete = args.long("asof_delete")
    plan(Bpe.tokenBudgetFromStateAsOf(spark, dir, quality, id, q, budget,
      asOfBatch = asofBatch, asOfDelete = asofDelete))
  }

  /** `bm25_asof('dir', 'id', 'terms', k, asof_batch, asof_delete)` →
    * [[Index.bm25TopKFromStateAsOf]]: the BM25 answer as the postings
    * state stood after append tag `asof_batch` and delete tag
    * `asof_delete` — snapshot reads over the tagged partition history,
    * partition-pruned like the current-state read. */
  private def bm25Asof(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "bm25_asof"
    requireArity(f, exprs, min = 6, max = 6)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val id = args.name("id")
    val terms = args.name("terms").split("\\s+").toSeq.filter(_.nonEmpty)
    val k = args.int("k")
    val asofBatch = args.long("asof_batch")
    val asofDelete = args.long("asof_delete")
    plan(Index.bm25TopKFromStateAsOf(spark, dir, terms, k,
      asOfBatch = asofBatch, asOfDelete = asofDelete, idCol = id))
  }

  /** `hybrid_from_state('postings_dir', 'ivf_dir', 'id', 'terms',
    * query_table, k)` → [[Index.hybridTopKFromState]]: lexical +
    * vector retrieval fused by RRF, both legs answered from persisted
    * state (query_table holds the single query vector as
    * (vec_id, embedding)). */
  private def hybridFromState(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "hybrid_from_state"
    requireArity(f, exprs, min = 6, max = 6)
    val args = new Args(f, exprs)
    val postingsDir = args.name("postings_dir")
    val ivfDir = args.name("ivf_dir")
    val id = args.name("id")
    val terms = args.name("terms").split("\\s+").toSeq.filter(_.nonEmpty)
    val queries = args.table(spark, "query_table")
    val k = args.int("k")
    plan(Index.hybridTopKFromState(spark, postingsDir, ivfDir, terms,
      queries, k, idCol = id))
  }

  /** `state_consistency('lsh_dir', 'postings_dir', 'tokenizer_dir')` →
    * [[StateAudit.crossPillarConsistency]] over the three doc-id
    * pillars: one row per document the pillars disagree on (empty =
    * consistent) — the partial-pipeline-failure audit. */
  private def stateConsistency(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "state_consistency"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    val lshDir = args.name("lsh_dir")
    val postingsDir = args.name("postings_dir")
    val tokenizerDir = args.name("tokenizer_dir")
    plan(StateAudit.crossPillarConsistency(Seq(
      "lsh" -> StateAudit.lshLiveIds(spark, lshDir),
      "postings" -> StateAudit.postingsLiveIds(spark, postingsDir),
      "tokenizer" -> StateAudit.tokenizerLiveIds(spark, tokenizerDir))))
  }

  /** `state_consistency_asof('lsh_dir', 'postings_dir', 'tokenizer_dir',
    * asof_batch, asof_delete)` → [[StateAudit.crossPillarConsistency]]
    * over each pillar's AS-OF live ids — "were the pillars consistent
    * as of (append B, delete D)?", the forensic question an
    * orchestrator crash actually raises. Same partition-pruned cut the
    * pillar as-of reads use; zero rows = the pillars agreed at that
    * version. Sub-floor bounds on a truncated history refuse. */
  private def stateConsistencyAsof(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "state_consistency_asof"
    requireArity(f, exprs, min = 5, max = 5)
    val args = new Args(f, exprs)
    val lshDir = args.name("lsh_dir")
    val postingsDir = args.name("postings_dir")
    val tokenizerDir = args.name("tokenizer_dir")
    val b = args.long("asof_batch")
    val d = args.long("asof_delete")
    plan(StateAudit.crossPillarConsistency(Seq(
      "lsh" -> StateAudit.lshLiveIdsAsOf(spark, lshDir, b, d),
      "postings" -> StateAudit.postingsLiveIdsAsOf(spark, postingsDir, b, d),
      "tokenizer" ->
        StateAudit.tokenizerLiveIdsAsOf(spark, tokenizerDir, b, d))))
  }

  /** `state_health('dir', 'tables_csv'[, max_versions,
    * max_files_per_leaf])` → [[StateAudit.healthReport]]: per-table
    * file/byte/version counts of a state dir plus the GC signal
    * ('truncate' | 'compact' | 'ok') — the when-to-maintain report an
    * operator of the tagged-history store needs. Driver-side listing,
    * no data read. */
  private def stateHealth(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "state_health"
    requireArity(f, exprs, min = 2, max = 4)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val tables = args.name("tables_csv").split(",")
      .map(_.trim).filter(_.nonEmpty).toSeq
    val maxVersions = if (args.exhausted) 64 else args.int("max_versions")
    val maxFiles = if (args.exhausted) 4 else args.int("max_files_per_leaf")
    plan(StateAudit.healthReport(spark, dir, tables, maxVersions, maxFiles))
  }

  /** `sample_from_state('dir', groups_table, 'id', 'group', total_tokens[,
    * alpha])` → [[graft.ext.Bpe.temperatureSampleFromState]]: the full
    * mix-assembly fill in tokenizer units from persisted encoded
    * counts — zero corpus passes. */
  private def sampleFromState(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "sample_from_state"
    requireArity(f, exprs, min = 5, max = 6)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val groups = args.table(spark, "groups_table")
    val id = args.name("id")
    val grp = args.name("group")
    val total = args.long("total_tokens")
    val alpha = if (args.exhausted) 0.5 else args.double("alpha")
    plan(graft.ext.Bpe.temperatureSampleFromState(spark, dir, groups, id,
      grp, total, alpha))
  }

  /** `budget_from_state('dir', quality_table, 'id', 'quality', budget[,
    * granularity])` → [[graft.ext.Bpe.tokenBudgetFromState]]: the
    * take-the-best-N-tokens selection answered from the persisted
    * tokenizer state's (id, bpe_tokens) sidecar — no retraining, no
    * corpus re-encode. */
  private def budgetFromState(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "budget_from_state"
    requireArity(f, exprs, min = 5, max = 6)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val quality = args.table(spark, "quality_table")
    val id = args.name("id")
    val q = args.name("quality")
    val budget = args.long("budget")
    val gran = if (args.exhausted) 100 else args.int("granularity")
    plan(graft.ext.Bpe.tokenBudgetFromState(spark, dir, quality, id, q,
      budget, gran))
  }

  /** `mix_from_state('dir', groups_table, 'id', 'group'[, alpha])` →
    * [[graft.ext.Bpe.temperatureMixFromState]]: temperature-flattened
    * mixture shares in TOKENIZER units from the persisted encoded
    * counts. */
  private def mixFromState(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "mix_from_state"
    requireArity(f, exprs, min = 4, max = 5)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val groups = args.table(spark, "groups_table")
    val id = args.name("id")
    val grp = args.name("group")
    val alpha = if (args.exhausted) 0.5 else args.double("alpha")
    plan(graft.ext.Bpe.temperatureMixFromState(spark, dir, groups, id, grp,
      alpha))
  }

  /** `tokenizer_merges('dir')` → the frozen merge table of a persisted
    * tokenizer state, in training order — the read surface for auditing
    * which vocabulary a corpus's counts are denominated in. */
  private def tokenizerMerges(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "tokenizer_merges"
    requireArity(f, exprs, min = 1, max = 1)
    val args = new Args(f, exprs)
    plan(spark.read.parquet(s"${args.name("dir")}/merges")
      .orderBy(org.apache.spark.sql.functions.col("step")))
  }

  /** `ivf_state_audit('dir', 'probes', 'id', 'vec', top_k, n_probe[,
    * recall_floor, occupancy_ceil])` → [[Similarity.ivfStateAudit]]: the
    * drift audit over a persisted IVF state — recall-from-state gate +
    * per-cell occupancy skew. */
  private def ivfStateAudit(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "ivf_state_audit"
    requireArity(f, exprs, min = 6, max = 8)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val probes = args.table(spark, "probes")
    val id = args.name("id")
    val vec = args.name("vec")
    val topK = args.int("top_k")
    val nProbe = args.int("n_probe")
    val floor = if (args.exhausted) 0.8 else args.double("recall_floor")
    val ceil = if (args.exhausted) 4.0 else args.double("occupancy_ceil")
    plan(Similarity.ivfStateAudit(spark, dir, probes, topK, nProbe,
      floor, ceil, id, vec))
  }

  /** `substring_fixpoint(table, id, text[, min_len, max_iter])` →
    * [[Dedup.removeSpansToFixpoint]]: substring excision iterated with
    * first-occurrence protection until no pass removes a token. */
  private def substringFixpoint(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "substring_fixpoint"
    requireArity(f, exprs, min = 3, max = 5)
    val args = new Args(f, exprs)
    val tbl = args.table(spark, "table")
    val id = args.name("id")
    val text = args.name("text")
    val minLen = if (args.exhausted) 10 else args.int("min_len")
    val maxIter = if (args.exhausted) 10 else args.int("max_iter")
    plan(Dedup.removeSpansToFixpoint(tbl, id, text, minLen, maxIter))
  }

  /** `trained_scorer(train_table, score_table, id, text, label[, epochs])`
    * → [[TextAnalysis.trainQualityScorer]] + [[TextAnalysis.scoreWithWeights]]:
    * fit the averaged perceptron on the (bounded) labeled table, score
    * every row of the second table with the learned weights. */
  private def trainedScorer(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "trained_scorer"
    requireArity(f, exprs, min = 5, max = 6)
    val args = new Args(f, exprs)
    val train = args.table(spark, "train_table")
    val score = args.table(spark, "score_table")
    val id = args.name("id")
    val text = args.name("text")
    val label = args.name("label")
    val epochs = if (args.exhausted) 2 else args.int("epochs")
    val sw = TextAnalysis.trainQualityScorer(train, id, text, label, epochs)
    plan(score.select(
      (org.apache.spark.sql.functions.col(id) +:
        TextAnalysis.scoreWithWeights(
          org.apache.spark.sql.functions.col(text), sw)): _*))
  }

  /** `threshold_sweep(table, id, text)` → [[Dedup.thresholdSweep]]:
    * pairs/docs surfaced per dedup threshold from one banded pass. */
  private def thresholdSweep(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "threshold_sweep"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    plan(Dedup.thresholdSweep(args.table(spark, "table"),
      args.name("id"), args.name("text")))
  }

  /** `split_leakage(pairs, assign, id[, split])` →
    * [[Sampling.splitLeakageAudit]]: near-dup pairs per (split, split)
    * cell — the eval-integrity audit. */
  private def splitLeakage(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "split_leakage"
    requireArity(f, exprs, min = 3, max = 4)
    val args = new Args(f, exprs)
    val pairs = args.table(spark, "pairs")
    val assign = args.table(spark, "assign")
    val id = args.name("id")
    val splitCol = if (args.exhausted) "split" else args.name("split")
    plan(Sampling.splitLeakageAudit(pairs, assign, id, splitCol))
  }

  /** `temperature_sample(table, id, text, group, total_tokens[, alpha])` →
    * [[Sampling.temperatureSample]]: fill per-source token budgets from
    * alpha-flattened shares in deterministic hash order. */
  private def temperatureSample(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "temperature_sample"
    requireArity(f, exprs, min = 5, max = 6)
    val args = new Args(f, exprs)
    val tbl = args.table(spark, "table")
    val id = args.name("id")
    val text = args.name("text")
    val grp = args.name("group")
    val total = args.long("total_tokens")
    val alpha = if (args.exhausted) 0.5 else args.double("alpha")
    plan(Sampling.temperatureSample(tbl, id, text, grp, total, alpha))
  }

  /** `bm25_from_state('dir', 'id', 'w1 w2 ...', k)` →
    * [[Index.bm25TopKFromState]]: BM25 top-k from a persisted postings
    * state (term-bucket partition-pruned read). */
  private def bm25FromState(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "bm25_from_state"
    requireArity(f, exprs, min = 4, max = 4)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val id = args.name("id")
    val terms = args.name("terms").split("\\s+").toSeq.filter(_.nonEmpty)
    val k = args.int("k")
    plan(Index.bm25TopKFromState(spark, dir, terms, k, idCol = id))
  }

  /** `stats_report('dir')` → [[Profile.statsReport]]: fold a persisted
    * corpus-stats state into the per-source composition report. */
  private def statsReport(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "stats_report"
    requireArity(f, exprs, min = 1, max = 1)
    val args = new Args(f, exprs)
    plan(Profile.statsReport(spark, args.name("dir")))
  }

  /** `substring_dedup(table, id, text[, min_len])` →
    * [[Dedup.removeSpans]] over `duplicateSpans(keepFirst = true)`: the
    * cleaned corpus with non-first copies of repeated regions excised. */
  private def substringDedup(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "substring_dedup"
    requireArity(f, exprs, min = 3, max = 4)
    val args = new Args(f, exprs)
    val tbl = args.table(spark, "table")
    val id = args.name("id")
    val text = args.name("text")
    val minLen = if (args.exhausted) 10 else args.int("min_len")
    plan(Dedup.removeSpans(tbl, id, text,
      Dedup.duplicateSpans(tbl, id, text, minLen, keepFirst = true)))
  }

  /** `ann_state_pairs('dir', batch, id, vec, threshold[, nprobe])` →
    * [[Similarity.nearDupPairsFromState]]: incremental embedding
    * near-dup pairs against a persisted IVF index. */
  private def annStatePairs(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "ann_state_pairs"
    requireArity(f, exprs, min = 5, max = 6)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val batch = args.table(spark, "batch")
    val id = args.name("id")
    val vec = args.name("vec")
    val threshold = args.double("threshold")
    val nProbe = if (args.exhausted) 2 else args.int("nprobe")
    plan(Similarity.nearDupPairsFromState(
      spark, dir, batch, threshold, nProbe, id, vec))
  }

  /** `dup_spans(table, id, text, minLen)` → [[Dedup.duplicateSpans]]:
    * maximal duplicated-substring token spans (Lee et al. span dedup). */
  private def dupSpans(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "dup_spans"
    requireArity(f, exprs, min = 3, max = 4)
    val args = new Args(f, exprs)
    val tbl = args.table(spark, "table")
    val id = args.name("id")
    val text = args.name("text")
    val minLen = if (args.exhausted) 10 else args.int("min_len")
    plan(Dedup.duplicateSpans(tbl, id, text, minLen))
  }

  /** `temperature_mix(table, text, group[, alpha])` →
    * [[Sampling.temperatureMix]]: alpha-scaled source sampling weights. */
  private def temperatureMix(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "temperature_mix"
    requireArity(f, exprs, min = 3, max = 4)
    val args = new Args(f, exprs)
    val tbl = args.table(spark, "table")
    val text = args.name("text")
    val grp = args.name("group")
    val alpha = if (args.exhausted) 0.5 else args.double("alpha")
    plan(Sampling.temperatureMix(tbl, text, grp, alpha))
  }

  /** `hard_negatives(corpus, queries, id, vec, k[, floor, dup_ceil])` →
    * [[Similarity.hardNegatives]]: banded non-duplicate nearest
    * neighbors for contrastive training. */
  private def hardNegatives(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "hard_negatives"
    requireArity(f, exprs, min = 5, max = 7)
    val args = new Args(f, exprs)
    val corpus = args.table(spark, "corpus")
    val queries = args.table(spark, "queries")
    val id = args.name("id")
    val vec = args.name("vec")
    val k = args.int("k")
    val floor = if (args.exhausted) 0.15 else args.double("floor")
    val ceil = if (args.exhausted) 0.35 else args.double("dup_ceil")
    plan(Similarity.hardNegatives(corpus, queries, k, floor, ceil, id, vec))
  }

  /** `ann_from_state('dir', queries, id, vec, topk[, nprobe])` →
    * [[Similarity.ivfTopKFromState]]: probe a persisted IVF index. */
  private def annFromState(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "ann_from_state"
    requireArity(f, exprs, min = 5, max = 6)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val queries = args.table(spark, "queries")
    val id = args.name("id")
    val vec = args.name("vec")
    val topK = args.int("topk")
    val nProbe = if (args.exhausted) 2 else args.int("nprobe")
    plan(Similarity.ivfTopKFromState(spark, dir, queries, topK, nProbe, id, vec))
  }

  /** `knn_graph('dir', k[, nprobe])` →
    * [[Similarity.knnGraphFromState]]: every live vector's top-k
    * neighbors from a persisted IVF index. */
  private def knnGraph(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "knn_graph"
    requireArity(f, exprs, min = 2, max = 3)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val k = args.int("k")
    val nProbe = if (args.exhausted) 2 else args.int("nprobe")
    plan(Similarity.knnGraphFromState(spark, dir, k, nProbe))
  }

  /** `mutual_nn('dir', k, min_cos[, nprobe])` →
    * [[Similarity.mutualNnPairsFromState]]: symmetric thresholded
    * kNN-graph edges — the semantic-dedup candidate relation. */
  private def mutualNn(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "mutual_nn"
    requireArity(f, exprs, min = 3, max = 4)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val k = args.int("k")
    val minCos = args.double("min_cos")
    val nProbe = if (args.exhausted) 2 else args.int("nprobe")
    plan(Similarity.mutualNnPairsFromState(spark, dir, k, minCos, nProbe))
  }

  /** `semantic_clusters('dir', k, min_cos[, nprobe])` →
    * [[Similarity.semanticClustersFromState]]: mutual-kNN components —
    * every live vector labeled with its cluster exemplar. */
  private def semanticClusters(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "semantic_clusters"
    requireArity(f, exprs, min = 3, max = 4)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val k = args.int("k")
    val minCos = args.double("min_cos")
    val nProbe = if (args.exhausted) 2 else args.int("nprobe")
    plan(Similarity.semanticClustersFromState(spark, dir, k, minCos, nProbe))
  }

  /** `export_shards('dir', quality, id, q, budget, bin_budget[, shards])`
    * → [[graft.ext.Bpe.exportShardsFromState]]: quality-budgeted,
    * sharded, bin-packed training-set assignment from tokenizer state. */
  private def exportShards(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "export_shards"
    requireArity(f, exprs, min = 6, max = 7)
    val args = new Args(f, exprs)
    val dir = args.name("dir")
    val quality = args.table(spark, "quality")
    val id = args.name("id")
    val q = args.name("q")
    val budget = args.long("budget")
    val binBudget = args.long("bin_budget")
    val shards = if (args.exhausted) 16 else args.int("shards")
    plan(graft.ext.Bpe.exportShardsFromState(spark, dir, quality, id, q,
      budget, binBudget, shards))
  }

  /** `hamming_pairs(table, id, sig[, max_hamming])` →
    * [[Dedup.hammingPairs64]]: banded near-dup pairs over any
    * precomputed 64-bit fingerprint column (complete for distance
    * ≤ 3). */
  private def hammingPairs(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "hamming_pairs"
    requireArity(f, exprs, min = 3, max = 4)
    val args = new Args(f, exprs)
    val table = args.table(spark, "table")
    val id = args.name("id")
    val sig = args.name("sig")
    val maxHamming = if (args.exhausted) 3 else args.int("max_hamming")
    plan(Dedup.hammingPairs64(table, id, sig, maxHamming))
  }

  /** `image_phash(table, id, payload)` →
    * [[graft.ext.Multimodal.perceptualHashBatch]]: (doc_id, ok, phash)
    * — the 64-bit perceptual dHash per binary image payload. */
  private def imagePhash(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "image_phash"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    val table = args.table(spark, "table")
    val id = args.name("id")
    val payload = args.name("payload")
    plan(graft.ext.Multimodal.perceptualHashBatch(table, id, payload).toDF())
  }

  /** `wav_meta(table, id, payload)` →
    * [[graft.ext.Multimodal.wavMetaBatch]]: RIFF/WAVE header metadata
    * per binary payload — chunk walk only, sample bytes untouched. */
  private def wavMeta(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "wav_meta"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    val table = args.table(spark, "table")
    val id = args.name("id")
    val payload = args.name("payload")
    plan(graft.ext.Multimodal.wavMetaBatch(table, id, payload).toDF())
  }

  /** `audio_stats(table, id, payload)` →
    * [[graft.ext.Multimodal.audioStatsBatch]]: metadata plus exact
    * PCM16 loudness mass / peak per payload. */
  private def audioStats(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "audio_stats"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    val table = args.table(spark, "table")
    val id = args.name("id")
    val payload = args.name("payload")
    plan(graft.ext.Multimodal.audioStatsBatch(table, id, payload).toDF())
  }

  /** `audio_fp(table, id, payload)` →
    * [[graft.ext.Multimodal.audioFingerprintBatch]]: (doc_id, ok, afp)
    * — the 64-bit energy-gradient fingerprint; pair with
    * `hamming_pairs`. */
  private def audioFp(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "audio_fp"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    val table = args.table(spark, "table")
    val id = args.name("id")
    val payload = args.name("payload")
    plan(graft.ext.Multimodal.audioFingerprintBatch(table, id, payload).toDF())
  }

  /** `audio_frames(table, id, payload, n)` →
    * [[graft.ext.Multimodal.sampleAudioFrames]]: n evenly spaced PCM16
    * channel-0 frame samples per payload. */
  private def audioFrames(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "audio_frames"
    requireArity(f, exprs, min = 4, max = 4)
    val args = new Args(f, exprs)
    val table = args.table(spark, "table")
    val id = args.name("id")
    val payload = args.name("payload")
    val n = args.int("n")
    plan(graft.ext.Multimodal.sampleAudioFrames(table, n, id, payload).toDF())
  }

  /** `video_frame_hashes(table, id, payload[, every_k])` →
    * [[graft.ext.Multimodal.videoFrameHashes]]: every k-th GVID frame
    * perceptual-hashed (dHash64 of the decoded frame image). */
  private def videoFrameHashes(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "video_frame_hashes"
    requireArity(f, exprs, min = 3, max = 4)
    val args = new Args(f, exprs)
    val table = args.table(spark, "table")
    val id = args.name("id")
    val payload = args.name("payload")
    val everyK = if (args.exhausted) 1 else args.int("every_k")
    plan(graft.ext.Multimodal.videoFrameHashes(table, everyK, id, payload).toDF())
  }

  /** `video_neardup(hashes_table, id, hash, min_shared[, max_frame_df])`
    * → [[graft.ext.Multimodal.videoNearDupPairs]]: videos sharing ≥
    * min_shared distinct sampled-frame hashes; the optional df cap
    * drops corpus-wide hot frames (stopword posture) before the join. */
  private def videoNeardup(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "video_neardup"
    requireArity(f, exprs, min = 4, max = 5)
    val args = new Args(f, exprs)
    val table = args.table(spark, "table")
    val id = args.name("id")
    val hash = args.name("hash")
    val minShared = args.int("min_shared")
    val maxFrameDf =
      if (args.exhausted) Int.MaxValue else args.int("max_frame_df")
    plan(graft.ext.Multimodal.videoNearDupPairs(table, minShared, id, hash,
      maxFrameDf))
  }

  /** `mp4_meta(table, id, payload)` →
    * [[graft.ext.Multimodal.mp4MetaBatch]]: ISO BMFF header metadata
    * (brand, tracks, duration, fixed-point dims, codec fourcc) per
    * binary payload — box walk only, sample data untouched. */
  private def mp4Meta(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "mp4_meta"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    val table = args.table(spark, "table")
    val id = args.name("id")
    val payload = args.name("payload")
    plan(graft.ext.Multimodal.mp4MetaBatch(table, id, payload).toDF())
  }

  /** `fp_state_pairs('stateDir', batch_table, id, sig[, max_hamming])` →
    * [[Dedup.incrementalHammingPairsFromState]]: the batch's live
    * near-dup pairs against a persisted fingerprint state
    * (bucket-pruned read). */
  private def fpStatePairs(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "fp_state_pairs"
    requireArity(f, exprs, min = 4, max = 5)
    val args = new Args(f, exprs)
    val dir = args.name("state_dir")
    val table = args.table(spark, "batch_table")
    val id = args.name("id")
    val sig = args.name("sig")
    val maxHamming = if (args.exhausted) 3 else args.int("max_hamming")
    plan(Dedup.incrementalHammingPairsFromState(spark, dir, table, id, sig,
      maxHamming))
  }

  /** `media_meta(table, id, payload)` →
    * [[graft.ext.Multimodal.mediaMetaBatch]]: magic-byte dispatch to the
    * right header parser — one typed-metadata row for ANY payload. */
  private def mediaMeta(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "media_meta"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    val table = args.table(spark, "table")
    val id = args.name("id")
    val payload = args.name("payload")
    plan(graft.ext.Multimodal.mediaMetaBatch(table, id, payload).toDF())
  }

  /** `fp_clusters(table, id, sig[, max_hamming])` →
    * [[Dedup.fingerprintClusters]]: near-dup clusters over any 64-bit
    * fingerprint column — (id, rep, cluster_size). */
  private def fpClusters(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "fp_clusters"
    requireArity(f, exprs, min = 3, max = 4)
    val args = new Args(f, exprs)
    val table = args.table(spark, "table")
    val id = args.name("id")
    val sig = args.name("sig")
    val maxHamming = if (args.exhausted) 3 else args.int("max_hamming")
    plan(Dedup.fingerprintClusters(table, id, sig, maxHamming))
  }

  /** `knn_graph_state('graphDir')` →
    * [[Similarity.readKnnGraphState]]: the MAINTAINED kNN graph — a
    * pure columnar read of the incrementally-updated edges. */
  private def knnGraphState(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "knn_graph_state"
    requireArity(f, exprs, min = 1, max = 1)
    val args = new Args(f, exprs)
    plan(Similarity.readKnnGraphState(spark, args.name("graph_dir")))
  }

  /** `page_rank('ivfDir', k, iters[, damping[, seeds, id, weight]])` →
    * [[Similarity.pageRankFromState]]: PageRank-style quality
    * propagation over the kNN graph of a persisted IVF state — with a
    * seed table, personalized (teleport ∝ seed weight). */
  private def pageRank(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "page_rank"
    requireArityIn(f, exprs, allowed = Seq(3, 4, 7)) // seed triple all-or-nothing
    val args = new Args(f, exprs)
    val dir = args.name("ivf_dir")
    val k = args.int("k")
    val iters = args.int("iters")
    val damping = if (args.exhausted) 0.85 else args.double("damping")
    val teleport =
      if (args.exhausted) None
      else {
        val seeds = args.table(spark, "seeds")
        val id = args.name("id")
        val weight = args.name("weight")
        Some(seeds.select(org.apache.spark.sql.functions.col(id).as("vid"),
          org.apache.spark.sql.functions.col(weight).as("tp")))
      }
    plan(Similarity.pageRankFromState(spark, dir, k, iters, damping,
      teleport = teleport))
  }

  /** `semantic_decontam('ivfDir', eval_table, eval_id, vec, min_cos[,
    * n_probe])` → [[Similarity.semanticContaminated]]: the drop-list of
    * corpus vectors an eval suite semantically contaminates (cos ≥
    * min_cos through the probed IVF state), with closest-eval
    * attribution. */
  private def semanticDecontam(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "semantic_decontam"
    requireArity(f, exprs, min = 5, max = 6)
    val args = new Args(f, exprs)
    val dir = args.name("ivf_dir")
    val evalSet = args.table(spark, "eval_table")
    val evalId = args.name("eval_id")
    val vec = args.name("vec")
    val minCos = args.double("min_cos")
    val nProbe = if (args.exhausted) 2 else args.int("n_probe")
    plan(Similarity.semanticContaminated(spark, dir, evalSet, minCos,
      nProbe, vecCol = vec, evalIdCol = evalId))
  }

  /** `page_rank_state('graphDir', iters[, damping[, seeds, id, weight]])`
    * → [[Similarity.pageRankFromGraphState]]: PageRank over the
    * PERSISTED (delta-maintained) kNN-graph state — no per-call graph
    * rebuild. */
  private def pageRankState(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "page_rank_state"
    requireArityIn(f, exprs, allowed = Seq(2, 3, 6)) // seed triple all-or-nothing
    val args = new Args(f, exprs)
    val dir = args.name("graph_dir")
    val iters = args.int("iters")
    val damping = if (args.exhausted) 0.85 else args.double("damping")
    val teleport =
      if (args.exhausted) None
      else {
        val seeds = args.table(spark, "seeds")
        val id = args.name("id")
        val weight = args.name("weight")
        Some(seeds.select(org.apache.spark.sql.functions.col(id).as("vid"),
          org.apache.spark.sql.functions.col(weight).as("tp")))
      }
    plan(Similarity.pageRankFromGraphState(spark, dir, iters, damping,
      teleport = teleport))
  }

  /** `mp3_meta(table, id, payload)` →
    * [[graft.ext.Multimodal.mp3MetaBatch]]: MPEG Layer III header
    * metadata (version, bitrate, sample rate, channels, CBR frame
    * count/duration) per binary payload — ID3v2 skipped by its
    * syncsafe size, sample bytes never read. */
  private def mp3Meta(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "mp3_meta"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    val table = args.table(spark, "table")
    val id = args.name("id")
    val payload = args.name("payload")
    plan(graft.ext.Multimodal.mp3MetaBatch(table, id, payload).toDF())
  }

  /** `lang_confusion(table, lang, text)` →
    * [[TextAnalysis.langConfusion]]: declared-vs-predicted matrix. */
  private def langConfusion(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "lang_confusion"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    plan(TextAnalysis.langConfusion(args.table(spark, "table"),
      args.name("lang"), args.name("text")))
  }

  /** `phrase_search(table, id, text, 'w1 w2 ...')` →
    * [[Index.phraseSearch]]: exact adjacent-phrase retrieval. */
  private def phraseSearch(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "phrase_search"
    requireArity(f, exprs, min = 4, max = 4)
    val args = new Args(f, exprs)
    val tbl = args.table(spark, "table")
    val id = args.name("id")
    val text = args.name("text")
    val phrase = args.name("phrase").split("\\s+").toSeq.filter(_.nonEmpty)
    plan(Index.phraseSearch(tbl, id, text, phrase))
  }

  /** `dup_transitivity(pairs_table, a, b)` → [[Dedup.transitivityAudit]]:
    * edges/wedges/triangles/clustering coefficient of a pair graph. */
  private def dupTransitivity(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "dup_transitivity"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    plan(Dedup.transitivityAudit(args.table(spark, "pairs"),
      args.name("a"), args.name("b")))
  }

  /** `effective_tokens(table, text, group)` → [[Dedup.effectiveTokens]]:
    * per-group claimed vs post-exact-dedup token mass. */
  private def effectiveTokens(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "effective_tokens"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    plan(Dedup.effectiveTokens(args.table(spark, "table"),
      args.name("text"), args.name("group")))
  }

  /** `embedding_profile(table, group [, id [, vec]])` →
    * [[Similarity.groupProfile]]: per-group centroid/dispersion health. */
  private def embeddingProfile(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "embedding_profile"
    requireArity(f, exprs, min = 2, max = 4)
    val args = new Args(f, exprs)
    val tbl = args.table(spark, "table")
    val grp = args.name("group")
    val id = if (args.exhausted) "vec_id" else args.name("id")
    val vec = if (args.exhausted) "embedding" else args.name("vec")
    plan(Similarity.groupProfile(tbl, grp, id, vec))
  }

  /** `contam_attribution(corpus, eval, id, text, source [, n])` →
    * [[Dedup.contaminationAttribution]]: per-eval-doc burn report. */
  private def contamAttribution(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "contam_attribution"
    requireArity(f, exprs, min = 5, max = 6)
    val args = new Args(f, exprs)
    val corpus = args.table(spark, "corpus")
    val eval = args.table(spark, "eval")
    val id = args.name("id")
    val text = args.name("text")
    val src = args.name("source")
    val n = if (args.exhausted) 13 else args.int("n")
    plan(Dedup.contaminationAttribution(corpus, eval, id, text, src, n))
  }

  /** `pair_group_matrix(pairs, a, b, val, docs, id, group)` →
    * [[Dedup.pairGroupMatrix]]: cross-group flow matrix of a pair set. */
  private def pairGroupMatrix(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "pair_group_matrix"
    requireArity(f, exprs, min = 7, max = 7)
    val args = new Args(f, exprs)
    val pairs = args.table(spark, "pairs")
    val a = args.name("a")
    val b = args.name("b")
    val v = args.name("val")
    val docs = args.table(spark, "docs")
    plan(Dedup.pairGroupMatrix(pairs, a, b, v, docs,
      args.name("id"), args.name("group")))
  }

  /** `bpe_train(table, text, n_merges)` → [[Bpe.trainMerges]]. */
  private def bpeTrain(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "bpe_train"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    plan(Bpe.trainMerges(args.table(spark, "table"), args.name("text"),
      args.int("n_merges")))
  }

  /** `vocab_coverage(table, text, group, vocab_size)` →
    * [[TextAnalysis.vocabCoverage]]: per-group OOV-rate report. */
  private def vocabCoverage(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "vocab_coverage"
    requireArity(f, exprs, min = 4, max = 4)
    val args = new Args(f, exprs)
    plan(TextAnalysis.vocabCoverage(args.table(spark, "table"),
      args.name("text"), args.name("group"), args.int("vocab_size")))
  }

  /** `asof_join(left, right, keys, left_ts, right_ts [, direction
    * [, num_slices]])` → [[AsOf.join]] (no tolerance — interval literals
    * don't survive the literal-argument contract; use the Scala API for
    * tolerance joins). */
  private def asofJoin(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "asof_join"
    requireArity(f, exprs, min = 5, max = 7)
    val args = new Args(f, exprs)
    val left = args.table(spark, "left")
    val right = args.table(spark, "right")
    val keys = args.names("keys")
    val leftTs = args.name("left_ts")
    val rightTs = args.name("right_ts")
    val direction = if (args.exhausted) "backward" else args.name("direction")
    val numSlices = if (args.exhausted) 1 else args.int("num_slices")
    plan(AsOf.join(left, right, keys, leftTs, rightTs, direction,
      tolerance = None, numSlices = numSlices))
  }

  /** `range_join(points, intervals, keys, ts, start, end, bin_width
    * [, interval_ids])` → [[RangeJoin.pointInInterval]]; with the optional
    * `interval_ids` (comma-separated unique interval identity), the
    * interval-preserving left variant [[RangeJoin.pointInIntervalLeft]]. */
  private def rangeJoin(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "range_join"
    requireArity(f, exprs, min = 7, max = 8)
    val args = new Args(f, exprs)
    val points = args.table(spark, "points")
    val intervals = args.table(spark, "intervals")
    val keys = args.names("keys")
    val ts = args.name("ts")
    val start = args.name("start")
    val end = args.name("end")
    val binWidth = args.long("bin_width")
    plan(
      if (args.exhausted)
        RangeJoin.pointInInterval(
          points, intervals, keys, ts, start, end, binWidth)
      else
        RangeJoin.pointInIntervalLeft(
          points, intervals, keys, ts, start, end, binWidth,
          intervalIdCols = args.names("interval_ids")))
  }

  /** `dedup_pairs(table, id, text [, threshold [, num_perms
    * [, rows_per_band [, shingle_size]]]])` → [[Dedup.lshPairs]] (verified
    * MinHash+LSH near-duplicate pairs). */
  private def dedupPairs(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "dedup_pairs"
    requireArity(f, exprs, min = 3, max = 7)
    val args = new Args(f, exprs)
    val docs = args.table(spark, "table")
    val id = args.name("id")
    val text = args.name("text")
    val threshold = if (args.exhausted) 0.5 else args.double("threshold")
    val numPerms = if (args.exhausted) 16 else args.int("num_perms")
    val rowsPerBand = if (args.exhausted) 4 else args.int("rows_per_band")
    val shingleSize = if (args.exhausted) 3 else args.int("shingle_size")
    plan(Dedup.lshPairs(docs, id, text,
      numPerms = numPerms, rowsPerBand = rowsPerBand,
      threshold = threshold, shingleSize = shingleSize))
  }

  /** `decontaminate(corpus, eval, id, text [, n])` →
    * [[Dedup.contaminatedDocs]]: corpus docs sharing any word n-gram with
    * the eval table, with their distinct-offending-gram counts
    * (broadcast/shuffle path auto-selected from the eval gram count). */
  private def decontaminate(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "decontaminate"
    requireArity(f, exprs, min = 4, max = 5)
    val args = new Args(f, exprs)
    val corpus = args.table(spark, "corpus")
    val evalDocs = args.table(spark, "eval")
    val id = args.name("id")
    val text = args.name("text")
    val n = if (args.exhausted) 3 else args.int("n")
    plan(Dedup.contaminatedDocs(corpus, evalDocs, id, text, n = n))
  }

  /** `curate(corpus, eval, id, text [, lang [, min_score [, n]]])` →
    * [[Curate.curate]]: the composed curation pipeline (lang filter +
    * quality floor → exact dedup → eval-set decontamination) from pure
    * SQL. */
  private def curate(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "curate"
    requireArity(f, exprs, min = 4, max = 7)
    val args = new Args(f, exprs)
    val corpus = args.table(spark, "corpus")
    val evalDocs = args.table(spark, "eval")
    val id = args.name("id")
    val text = args.name("text")
    val lang = if (args.exhausted) "en" else args.name("lang")
    val minScore = if (args.exhausted) 0.6 else args.double("min_score")
    val n = if (args.exhausted) 13 else args.int("n")
    plan(Curate.curate(corpus, evalDocs, id, text, lang, minScore, n))
  }

  /** `curate_full(corpus, eval, 'id', 'text', 'ivf_dir', eval_vecs[,
    * min_cos])` → [[Curate.curateFull]]: the curation plan with all
    * three decontamination rails composed — exact 13-gram, Bloom
    * 10-gram, and semantic over the persisted IVF state at `ivf_dir`
    * (eval_vecs carries (eval_id, embedding)). */
  private def curateFull(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "curate_full"
    requireArity(f, exprs, min = 6, max = 7)
    val args = new Args(f, exprs)
    val corpus = args.table(spark, "corpus")
    val evalDocs = args.table(spark, "eval")
    val id = args.name("id")
    val text = args.name("text")
    val ivfDir = args.name("ivf_dir")
    val evalVecs = args.table(spark, "eval_vecs")
    val minCos = if (args.exhausted) 0.95 else args.double("min_cos")
    plan(Curate.curateFull(spark, corpus, evalDocs, ivfDir, evalVecs,
      id, text, minCos = minCos))
  }

  /** `search_all(table, id, text, terms)` → [[Index.searchAll]]:
    * conjunctive term search; `terms` is one comma-separated string
    * literal. */
  private def searchAll(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "search_all"
    requireArity(f, exprs, min = 4, max = 4)
    val args = new Args(f, exprs)
    val docs = args.table(spark, "table")
    val id = args.name("id")
    val text = args.name("text")
    val terms = args.names("terms")
    plan(Index.searchAll(docs, id, text, terms))
  }

  /** `inverted_index(table, id, text [, min_df [, max_df]])` →
    * [[Index.invertedIndex]]: term → (df, sorted comma-joined postings). */
  private def invertedIndex(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "inverted_index"
    requireArity(f, exprs, min = 3, max = 5)
    val args = new Args(f, exprs)
    val docs = args.table(spark, "table")
    val id = args.name("id")
    val text = args.name("text")
    val minDf = if (args.exhausted) 1L else args.long("min_df")
    val maxDf = if (args.exhausted) Long.MaxValue else args.long("max_df")
    plan(Index.invertedIndex(docs, id, text, minDf, maxDf))
  }

  /** `semantic_dedup(table, threshold [, k [, iters [, id [, vec]]]])` →
    * [[Similarity.semanticDedup]]: SemDeDup survivors (id, cell). An
    * explicit `k` is honored exactly; omitted (or 0) auto-scales the cell
    * count from the corpus size. */
  private def semanticDedup(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "semantic_dedup"
    requireArity(f, exprs, min = 2, max = 6)
    val args = new Args(f, exprs)
    val corpus = args.table(spark, "table")
    val threshold = args.double("threshold")
    val k = if (args.exhausted) 0 else args.int("k")
    val iters = if (args.exhausted) 2 else args.int("iters")
    val id = if (args.exhausted) "vec_id" else args.name("id")
    val vec = if (args.exhausted) "embedding" else args.name("vec")
    plan(Similarity.semanticDedup(corpus, threshold, k, iters, id, vec))
  }

  /** `token_budget(table, id, token_col, quality_col, budget)` →
    * [[Sampling.tokenBudget]]: quality-ranked selection within a token
    * budget, with the exact running total. */
  private def tokenBudget(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "token_budget"
    requireArity(f, exprs, min = 5, max = 5)
    val args = new Args(f, exprs)
    val docs = args.table(spark, "table")
    val id = args.name("id")
    val tokenCol = args.name("token_col")
    val qualityCol = args.name("quality_col")
    val budget = args.long("budget")
    plan(Sampling.tokenBudget(docs, id, tokenCol, qualityCol, budget))
  }

  /** `contamination_score(corpus, eval, id, text [, n])` →
    * [[Dedup.contaminationScore]]: per-doc fraction of distinct n-grams
    * hit by the eval set. */
  private def contaminationScore(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "contamination_score"
    requireArity(f, exprs, min = 4, max = 5)
    val args = new Args(f, exprs)
    val corpus = args.table(spark, "corpus")
    val evalDocs = args.table(spark, "eval")
    val id = args.name("id")
    val text = args.name("text")
    val n = if (args.exhausted) 13 else args.int("n")
    plan(Dedup.contaminationScore(corpus, evalDocs, id, text, n))
  }

  /** `dup_ngram_coverage(table, id, text [, n])` →
    * [[TextAnalysis.dupNgramCoverage]]: cross-document duplicate-n-gram
    * instance fraction per document. */
  private def dupNgramCoverage(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "dup_ngram_coverage"
    requireArity(f, exprs, min = 3, max = 4)
    val args = new Args(f, exprs)
    val docs = args.table(spark, "table")
    val id = args.name("id")
    val text = args.name("text")
    val n = if (args.exhausted) 5 else args.int("n")
    plan(TextAnalysis.dupNgramCoverage(docs, id, text, n))
  }

  /** `bm25_topk(table, id, text, terms, k)` → [[Index.bm25TopK]]: global
    * top-k Okapi BM25 ranking; `terms` is one comma-separated string
    * literal. */
  private def bm25TopK(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "bm25_topk"
    requireArity(f, exprs, min = 5, max = 5)
    val args = new Args(f, exprs)
    val docs = args.table(spark, "table")
    val id = args.name("id")
    val text = args.name("text")
    val terms = args.names("terms")
    val k = args.int("k")
    plan(Index.bm25TopK(docs, id, text, terms, k))
  }

  /** `unigram_nll(table, id, text)` → [[TextAnalysis.unigramNll]]: the
    * corpus-trained unigram-LM mean negative log-prob per document. */
  private def unigramNll(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "unigram_nll"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    val docs = args.table(spark, "table")
    val id = args.name("id")
    val text = args.name("text")
    plan(TextAnalysis.unigramNll(docs, id, text))
  }

  /** `latest_by_key(table, keys, versions)` → [[Compaction.latestByKey]]:
    * current-state upsert view; `keys`/`versions` are comma-separated
    * column lists. */
  private def latestByKey(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "latest_by_key"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    val df = args.table(spark, "table")
    val keys = args.names("keys")
    val versions = args.names("versions")
    plan(Compaction.latestByKey(df, keys, versions))
  }

  /** `zorder_cluster(table, cols, partitions [, bits])` →
    * [[Layout.cluster]]: morton-code range clustering for a
    * multi-dimension-prunable write. */
  private def zorderCluster(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "zorder_cluster"
    requireArity(f, exprs, min = 3, max = 4)
    val args = new Args(f, exprs)
    val df = args.table(spark, "table")
    val cols = args.names("cols")
    val partitions = args.int("partitions")
    val bits = if (args.exhausted) 16 else args.int("bits")
    plan(Layout.cluster(df, cols, partitions, bits))
  }

  /** `funnel(table, user, ts, type, steps)` → [[Behavior.funnel]]: ordered
    * earliest-completion funnel; `steps` is one comma-separated string. */
  private def funnel(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "funnel"
    requireArity(f, exprs, min = 5, max = 5)
    val args = new Args(f, exprs)
    val events = args.table(spark, "table")
    val user = args.name("user")
    val ts = args.name("ts")
    val typ = args.name("type")
    val steps = args.names("steps")
    plan(Behavior.funnel(events, user, ts, typ, steps))
  }

  /** `retention(table, user, ts)` → [[Behavior.retention]]. */
  private def retention(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "retention"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    plan(Behavior.retention(args.table(spark, "table"),
      args.name("user"), args.name("ts")))
  }

  /** `rate_anomaly(table, ts [, trailing [, min_z]])` →
    * [[Behavior.rateAnomalies]]. */
  private def rateAnomaly(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "rate_anomaly"
    requireArity(f, exprs, min = 2, max = 4)
    val args = new Args(f, exprs)
    val events = args.table(spark, "table")
    val ts = args.name("ts")
    val trailing = if (args.exhausted) 24 else args.int("trailing")
    val minZ = if (args.exhausted) 3.0 else args.double("min_z")
    plan(Behavior.rateAnomalies(events, ts, trailing, minZ))
  }

  /** `weighted_sample(table, id, weight, group, k)` →
    * [[Sampling.weightedSample]]. */
  private def weightedSample(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "weighted_sample"
    requireArity(f, exprs, min = 5, max = 5)
    val args = new Args(f, exprs)
    plan(Sampling.weightedSample(args.table(spark, "table"), args.name("id"),
      args.name("weight"), args.name("group"), args.int("k")))
  }

  /** `chunk_windows(table, id, text, window, stride)` →
    * [[Packing.chunkWindows]]. */
  private def chunkWindows(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "chunk_windows"
    requireArity(f, exprs, min = 5, max = 5)
    val args = new Args(f, exprs)
    plan(Packing.chunkWindows(args.table(spark, "table"), args.name("id"),
      args.name("text"), args.int("window"), args.int("stride")))
  }

  /** `sketch_distinct(table, group, value [, rsd])` →
    * [[Profile.sketchDistinct]]. */
  private def sketchDistinct(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "sketch_distinct"
    requireArity(f, exprs, min = 3, max = 4)
    val args = new Args(f, exprs)
    val df = args.table(spark, "table")
    val group = args.name("group")
    val value = args.name("value")
    val rsd = if (args.exhausted) 0.05 else args.double("rsd")
    plan(Profile.sketchDistinct(df, group, value, rsd))
  }

  /** `source_report(corpus, eval, id, text, group [, n])` →
    * [[Profile.sourceReport]]: the per-source corpus health dashboard. */
  private def sourceReport(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "source_report"
    requireArity(f, exprs, min = 5, max = 6)
    val args = new Args(f, exprs)
    val corpus = args.table(spark, "corpus")
    val evalDocs = args.table(spark, "eval")
    val id = args.name("id")
    val text = args.name("text")
    val group = args.name("group")
    val n = if (args.exhausted) 13 else args.int("n")
    plan(Profile.sourceReport(corpus, evalDocs, id, text, group, n))
  }

  /** `top_duplicates(table, id, text, group, k)` →
    * [[Profile.topDuplicates]]: per-group most-copied texts. */
  private def topDuplicates(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "top_duplicates"
    requireArity(f, exprs, min = 5, max = 5)
    val args = new Args(f, exprs)
    plan(Profile.topDuplicates(args.table(spark, "table"), args.name("id"),
      args.name("text"), args.name("group"), args.int("k")))
  }

  /** `source_overlap(table, text, group [, n])` → [[Profile.sourceOverlap]]:
    * distinct shared n-grams per source pair (mirror detection). */
  private def sourceOverlap(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "source_overlap"
    requireArity(f, exprs, min = 3, max = 4)
    val args = new Args(f, exprs)
    val docs = args.table(spark, "table")
    val text = args.name("text")
    val group = args.name("group")
    val n = if (args.exhausted) 13 else args.int("n")
    plan(Profile.sourceOverlap(docs, text, group, n))
  }

  /** `transitions(events, user, ts, id, type)` → [[Behavior.transitions]]:
    * the per-user consecutive event-type pair counts (Markov view). */
  private def transitions(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "transitions"
    requireArity(f, exprs, min = 5, max = 5)
    val args = new Args(f, exprs)
    plan(Behavior.transitions(args.table(spark, "events"), args.name("user"),
      args.name("ts"), args.name("id"), args.name("type")))
  }

  /** `bpe_pairs(table, text, k)` → [[TextAnalysis.pairMergeCounts]]:
    * the k most frequent adjacent token pairs (BPE merge candidates). */
  private def bpePairs(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "bpe_pairs"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    plan(TextAnalysis.pairMergeCounts(args.table(spark, "table"),
      args.name("text"), args.int("k")))
  }

  /** `quantize_int8(table [, id [, vec]])` → [[Similarity.quantizeInt8]]:
    * FAISS-SQ8-style scalar codes for the embedding column. */
  private def quantizeInt8(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "quantize_int8"
    requireArity(f, exprs, min = 1, max = 3)
    val args = new Args(f, exprs)
    val vectors = args.table(spark, "table")
    val id = if (args.exhausted) "vec_id" else args.name("id")
    val vec = if (args.exhausted) "embedding" else args.name("vec")
    plan(Similarity.quantizeInt8(vectors, id, vec))
  }

  /** `promote_json(table, col, 'field TYPE, ...')` →
    * [[graft.ext.JsonCols.promote]] with the schema given as a DDL string
    * (the literal-friendly schema encoding SQL callers can write). */
  private def promoteJson(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "promote_json"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    val df = args.table(spark, "table")
    val jsonCol = args.name("col")
    val ddl = args.name("schema")
    plan(graft.ext.JsonCols.promote(df, jsonCol,
      org.apache.spark.sql.types.StructType.fromDDL(ddl)))
  }

  /** `snapshot_diff(before, after, id, text)` →
    * [[Compaction.snapshotDiff]]: added/removed/changed/unchanged audit
    * between two corpus snapshots. */
  private def snapshotDiff(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "snapshot_diff"
    requireArity(f, exprs, min = 4, max = 4)
    val args = new Args(f, exprs)
    plan(Compaction.snapshotDiff(args.table(spark, "before"),
      args.table(spark, "after"), args.name("id"), args.name("text")))
  }

  /** `recall_at_k(ann_table, truth_table)` → [[Similarity.recallAtK]]:
    * per-query recall of an ANN result against its exact ground truth —
    * both tables are (query_id, neighbor_id) result sets. */
  private def recallAtK(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "recall_at_k"
    requireArity(f, exprs, min = 2, max = 2)
    val args = new Args(f, exprs)
    plan(Similarity.recallAtK(args.table(spark, "ann"),
      args.table(spark, "truth")))
  }

  /** `skew_audit(table, key, k)` → [[Skew.keySkewAudit]]: the k heaviest
    * join-key values with share and heavy-to-mean ratio. */
  private def skewAudit(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "skew_audit"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    plan(Skew.keySkewAudit(args.table(spark, "table"), args.name("key"),
      args.int("k")))
  }

  /** `degree_histogram(pairs, a, b)` → [[Dedup.degreeHistogram]]. */
  private def degreeHistogramTvf(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "degree_histogram"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    plan(Dedup.degreeHistogram(args.table(spark, "pairs"), args.name("a"),
      args.name("b")))
  }

  /** `cluster_sizes(assignments, rep)` → [[Dedup.clusterSizeHistogram]]. */
  private def clusterSizesTvf(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "cluster_sizes"
    requireArity(f, exprs, min = 2, max = 2)
    val args = new Args(f, exprs)
    plan(Dedup.clusterSizeHistogram(args.table(spark, "assignments"),
      args.name("rep")))
  }

  /** `containment_pairs(table, id, text, threshold [, n])` →
    * [[Dedup.containmentPairs]]: directional quote/inclusion detection. */
  private def containmentPairsTvf(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "containment_pairs"
    requireArity(f, exprs, min = 4, max = 5)
    val args = new Args(f, exprs)
    val docs = args.table(spark, "table")
    val id = args.name("id")
    val text = args.name("text")
    val threshold = args.double("threshold")
    val n = if (args.exhausted) 3 else args.int("n")
    plan(Dedup.containmentPairs(docs, id, text, threshold, n))
  }

  /** `exact_median(table, group, value)` →
    * [[Profile.exactIntegralMedian]]: exact lower median via the
    * value-histogram path. */
  private def exactMedianTvf(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "exact_median"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    plan(Profile.exactIntegralMedian(args.table(spark, "table"),
      args.name("group"), args.name("value")))
  }

  /** `exact_quartiles(table, group, value)` →
    * [[Profile.exactIntegralQuartiles]]: exact p25/p50/p75/max report. */
  private def exactQuartilesTvf(spark: SparkSession, exprs: Seq[Expression]): LogicalPlan = {
    val f = "exact_quartiles"
    requireArity(f, exprs, min = 3, max = 3)
    val args = new Args(f, exprs)
    plan(Profile.exactIntegralQuartiles(args.table(spark, "table"),
      args.name("group"), args.name("value")))
  }

  /** The Dataset's UNANALYZED logical plan: the outer query's analyzer
    * resolves it in the same pass as the enclosing statement, so attribute
    * ids stay consistent even when one TVF appears twice in a query. */
  private def plan(df: DataFrame): LogicalPlan = df.queryExecution.logical

  /** Exact allowed arities — for signatures whose optional tail is an
    * all-or-nothing group (e.g. a seed (table, id, weight) triple): a
    * min/max range would admit a PARTIAL group and then throw a raw
    * IndexOutOfBounds from the argument reader instead of a named
    * arity error. */
  private def requireArityIn(
      f: String, exprs: Seq[Expression], allowed: Seq[Int]): Unit =
    if (!allowed.contains(exprs.size))
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map(
          "functionName" -> s"`$f`",
          "expectedNum" -> allowed.mkString(" or "),
          "actualNum" -> exprs.size.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  private def requireArity(
      f: String, exprs: Seq[Expression], min: Int, max: Int): Unit =
    if (exprs.size < min || exprs.size > max)
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map(
          "functionName" -> s"`$f`",
          "expectedNum" -> s"between $min and $max",
          "actualNum" -> exprs.size.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** Sequential literal-argument reader over a TVF's expression list. */
  private final class Args(f: String, exprs: Seq[Expression]) {
    private var i = 0
    private def next(): Expression = { val e = exprs(i); i += 1; e }
    def exhausted: Boolean = i >= exprs.size
    /** A catalog table / temp view named by a string-literal argument. */
    def table(spark: SparkSession, p: String): DataFrame =
      spark.table(name(p))
    /** One identifier (view or column name) from a string literal. */
    def name(p: String): String = Registration.literalString(f, p, next())
    /** Comma-separated identifiers from one string literal. */
    def names(p: String): Seq[String] =
      Registration.literalString(f, p, next()).split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
    def int(p: String): Int = Registration.literalInt(f, p, next())
    def long(p: String): Long = Registration.literalLong(f, p, next())
    def double(p: String): Double = Registration.literalDouble(f, p, next())
  }
}
