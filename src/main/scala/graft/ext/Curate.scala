package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the composed pipeline a real
  * LLM-data job runs, assembled from this library's own operators:
  *
  *   1. annotate: language-ID + quality scoring ([[TextAnalysis]]) —
  *      pure map-side column arithmetic, scan-speed, codegen'd;
  *   2. filter: keep the target language above a quality floor — evaluated
  *      in the same scan (Catalyst collapses the projection+filter), so
  *      rejected documents never reach a shuffle;
  *   3. exact dedup: min-id representative per distinct content
  *      ([[Dedup.exact]]) — one hash shuffle keyed by content fingerprint;
  *   4. decontaminate: drop any document sharing a word n-gram with the
  *      held-out eval set ([[Dedup.contaminatedDocs]], GPT-3-style n=13) —
  *      broadcast semi-join for normal eval sets, hashed shuffle fallback
  *      for oversized ones, then an anti-join back to the survivors.
  *
  * Operator ORDER is the scale design: the cheap map-side filters run
  * first so the shuffle-bearing stages (dedup, decontamination) see only
  * the surviving fraction of the corpus; at 100 TB with a ~30% keep rate
  * that is a 3× cut on every byte shuffled downstream. The output is the
  * curated corpus with provenance columns (predicted language, quality
  * score, token count) so downstream packing/splitting can consume it
  * without re-scanning text.
  */
object Curate {

  /** Curated corpus: docs in `lang` with quality ≥ `minScore`, exact-deduped
    * (min-id representative), with no word-`contamN`-gram overlap with
    * `evalDocs`. Returns (idCol, lang_pred, quality_score, tokens) ordered
    * by nothing — callers order/partition for their sink.
    */
  def curate(
      docs: DataFrame, evalDocs: DataFrame, idCol: String, textCol: String,
      lang: String = "en", minScore: Double = 0.6,
      contamN: Int = 13): DataFrame = {
    val t = col(textCol)
    val annotated = docs.select(
        (Seq(col(idCol), t) ++
          TextAnalysis.langScores(t) ++ TextAnalysis.qualityColumns(t)): _*)
      .withColumn("lang_pred", TextAnalysis.predictedLang)
    val kept = annotated
      .filter(col("lang_pred") === lang && col("quality_score") >= minScore)
    // deduped feeds BOTH the contamination n-gram scan and the final
    // anti-join; without materialization the scan→annotate→filter→dedup
    // chain (including its shuffle) runs twice — materialize() truncates
    // lineage (reliable checkpoint when graft.checkpointDir is set)
    val deduped = Dedup.materialize(Dedup.exact(kept, idCol, textCol))
    val contaminated =
      Dedup.contaminatedDocs(deduped, evalDocs, idCol, textCol, contamN)
    deduped
      .join(contaminated.select(col(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol), col("lang_pred"), col("quality_score"),
        col("n_words").as("tokens"))
  }

  /** [[curate]] with ALL THREE decontamination rails composed — the
    * full-decontam curation plan a frontier-model data job runs:
    *
    *   - the exact word-`contamN`-gram rail ([[Dedup.contaminatedDocs]],
    *     GPT-3-style n = 13) — verbatim eval leakage;
    *   - the Bloom-prefiltered `bloomN`-gram rail
    *     ([[Dedup.contaminatedDocsBloom]], default n = 10 — a second,
    *     stricter gram width whose drop set is NOT a subset of the
    *     first) — the memory-bounded shape for eval suites too large to
    *     broadcast as a gram set;
    *   - the SEMANTIC rail ([[Similarity.semanticContaminated]]) —
    *     paraphrased leakage no n-gram scan can see, answered from the
    *     persisted IVF state at `ivfDir` (probed-cell reads only).
    *
    * Scale shape: the RAW corpus is scanned once (annotate → filter →
    * exact dedup, all pushed before any shuffle-bearing stage, exactly
    * [[curate]]); both gram rails then run over the MATERIALIZED
    * surviving fraction, and the semantic rail never touches corpus
    * text at all — it rides the ANN state the pipeline already
    * maintains, probing only the eval vectors' cells. The three drop
    * lists are slim id sets unioned into ONE anti-join, so composing
    * the rails costs two gram passes over survivors plus a state probe
    * — never three corpus scans.
    *
    * `evalVecs` carries `(eval_id, embedding)` in its own id namespace
    * (re-key eval ids out of the corpus range — an eval item that IS a
    * corpus vector must flag it; that is the leak). Output schema =
    * [[curate]]'s (idCol, lang_pred, quality_score, tokens). */
  def curateFull(
      spark: SparkSession, docs: DataFrame, evalDocs: DataFrame,
      ivfDir: String, evalVecs: DataFrame, idCol: String, textCol: String,
      lang: String = "en", minScore: Double = 0.6,
      contamN: Int = 13, bloomN: Int = 10,
      minCos: Double = 0.95, nProbe: Int = 2): DataFrame = {
    val t = col(textCol)
    val annotated = docs.select(
        (Seq(col(idCol), t) ++
          TextAnalysis.langScores(t) ++ TextAnalysis.qualityColumns(t)): _*)
      .withColumn("lang_pred", TextAnalysis.predictedLang)
    val kept = annotated
      .filter(col("lang_pred") === lang && col("quality_score") >= minScore)
    val deduped = Dedup.materialize(Dedup.exact(kept, idCol, textCol))
    val ngramDrops =
      Dedup.contaminatedDocs(deduped, evalDocs, idCol, textCol, contamN)
        .select(col(idCol))
    val bloomDrops =
      Dedup.contaminatedDocsBloom(deduped, evalDocs, idCol, textCol, bloomN)
        .select(col(idCol))
    val semanticDrops =
      Similarity.semanticContaminated(spark, ivfDir, evalVecs, minCos,
          nProbe)
        .select(col("vec_id").as(idCol))
    val drops = ngramDrops.unionByName(bloomDrops)
      .unionByName(semanticDrops).distinct()
    deduped
      .join(drops, Seq(idCol), "left_anti")
      .select(col(idCol), col("lang_pred"), col("quality_score"),
        col("n_words").as("tokens"))
  }

  /** Quality-aware exemplar selection: per near-dup CLUSTER, keep the
    * HIGHEST-quality member (ties → lowest id) instead of the arbitrary
    * min-id rep plain dedup keeps — when a page exists as a clean copy
    * and a boilerplate-wrapped copy, collapse should keep the clean one.
    *
    * Shape: [[Dedup.lshComponents]] labels the clusters; the selection is
    * ONE `max(struct(quality, −id))` aggregate — struct ordering makes the
    * max the argmax, and it PARTIAL-aggregates map-side (the [[Compaction]]
    * trick), so the exchange carries one candidate per (task, cluster),
    * never the membership. Returns (rep, keep_id, quality_score,
    * n_members) — filter n_members ≥ 2 for the collapse-only view. */
  def keepBest(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val comp = Dedup.lshComponents(docs, idCol, textCol)
      .select(col("id").as(idCol), col("label"))
    val q = docs.select(col(idCol),
      TextAnalysis.qualityColumns(col(textCol)).last)
    q.join(comp, Seq(idCol), "left")
      .select(coalesce(col("label"), col(idCol)).as("rep"), col(idCol),
        col("quality_score"))
      .groupBy(col("rep"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("quality_score").as("q"),
          (-col(idCol)).as("negid"))).as("graft_m"))
      .select(col("rep"), (-col("graft_m.negid")).as("keep_id"),
        col("graft_m.q").as("quality_score"), col("n_members"))
  }
}
