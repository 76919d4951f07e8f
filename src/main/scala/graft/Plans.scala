package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Writes PLANS.md: formatted physical plans of representative declared
  * queries, with the scale property each plan is expected to exhibit.
  * Regenerate after plan-affecting changes:
  * `sbt "runMain graft.Plans"` (PlanSpec asserts the key properties in CI).
  */
object Plans {

  private case class Entry(name: String, note: String,
      df: (SparkSession, String) => DataFrame)

  /** Capture explain("formatted") output as a string (shared with PlanSpec
    * so the PLANS.md evidence and the CI assertions read identical text). */
  def capturePlan(df: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Tables.configure(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val entries = Seq(
      Entry("q01_filter_project",
        "Both predicates appear in PushedFilters and ReadSchema carries only " +
          "the 3 projected columns — the scan never reads the other 8.",
        queries.Relational.q01),
      Entry("q03_global_count",
        "No Window node: total_items is a driver-side count stamped as a " +
          "literal, so no single-partition shuffle exists at any scale.",
        queries.Relational.q03),
      Entry("q14_join_agg",
        "nation joins as BroadcastHashJoin (dimension broadcast); the " +
          "aggregation runs partial (map-side) then final after one shuffle.",
        queries.Relational.q14),
      Entry("q15_multi_join",
        "nation/region broadcast; the lineitem⋈orders⋈customer chain is " +
          "key-partitioned with AQE free to convert to broadcast at runtime.",
        queries.Relational.q15),
      Entry("x06_ann_brute",
        "The query batch is broadcast (BroadcastNestedLoopJoin); the corpus " +
          "is scored map-side and only the per-query top-k shuffles.",
        queries.Extensions.x06),
      Entry("x11_fingerprint",
        "rolling_hash is a native expression inside a `* Project` codegen " +
          "stage — no UDF serialization, no codegen fence.",
        queries.Extensions.x11),
      Entry("q04_partition_ordinal",
        "No Window node: the per-type ordinal comes from the two-phase " +
          "range-sort + offset pass (Ordinals.perKeyOrdinal), so a ~5-value " +
          "key never funnels n/5 rows through one task.",
        queries.Relational.q04),
      Entry("x17_dedup_lsh",
        "minhash_sig appears ONCE per join side: all 16 signature values " +
          "come from one native single-pass expression; candidates come " +
          "from the (band, bucket) equi-join — never an O(n²) comparison; " +
          "shingle_jaccard verifies candidates natively.",
        queries.Extensions.x17),
      Entry("x03_dedup_simhash",
        "simhash_sig is a native single-pass expression in a codegen'd " +
          "Project over the full corpus — no per-bit interpreted aggregates, " +
          "no subset bound.",
        queries.Extensions.x03),
      Entry("x25_asof_join",
        "One hash exchange on user_id + a running-fill Window over the " +
          "unioned sides — never the O(n²) inequality join Spark plans for " +
          "the naive formulation.",
        queries.Extensions.x25),
      Entry("x28_asof_nearest",
        "Both directions (backward last + forward first) are RANGE frames " +
          "over the SAME exchange and sort; nearest picks least-delta and " +
          "the ±30 min tolerance nulls in the same Project — no second " +
          "shuffle, no join.",
        queries.Extensions.x28),
      Entry("x26_range_join",
        "The binned interval join is a hash equi-join on (user, hour-bin) " +
          "with an exact residual filter; the left variant restores " +
          "zero-match intervals with one more equi-join on the interval id.",
        queries.Extensions.x26),
      Entry("x21_top_quality",
        "The range sort feeding the per-key ordinal reads the PRE-PRUNED " +
          "frame: a broadcast per-lang approx_percentile threshold with a " +
          "group-size guard drops rows that provably cannot reach top-3 " +
          "(Ordinals.approxTopKPrune — lossless by the sketch's rank " +
          "bound). Measured on the sf1 replica (ScaleUp ×10): 50,000 " +
          "documents → 450 sort-input rows (111× reduction; per-lang " +
          "survivors de=100 en=240 es=80 fr=20 zh=10, every group ≥ k=3).",
        queries.Extensions.x21),
      Entry("x41_inverted_index",
        "explode → groupBy(term) with map-side partial aggregation on a " +
          "high-cardinality key; postings sort inside the aggregation " +
          "buffer. The hot-term hazard (a stopword's postings in ONE " +
          "buffer) is handled by Index.shardedIndex — (term, id % shards) " +
          "rows bound every buffer; ExtSpec pins shard-union == unsharded.",
        queries.Extensions.x41),
      Entry("x43_curate",
        "The curation composition: lang-ID + quality scoring collapse " +
          "into the scan's Project (map-side, codegen'd), so the dedup " +
          "exchange and the decontamination semi-join see only the " +
          "surviving fraction. The deduped frame is materialized once — " +
          "it feeds both the n-gram scan and the final anti-join, and " +
          "without lineage truncation the dedup shuffle would run twice.",
        queries.Extensions.x43),
      Entry("x44_ann_kmeans",
        "Every centroid-side join is a broadcast of k (or queries×nProbe) " +
          "rows — the corpus is never shuffled for assignment; argmin " +
          "windows partition by vector id (as fine-grained as the data); " +
          "the probed-cell scoring join is a BroadcastHashJoin on cid. " +
          "No SortMergeJoin, no cartesian anywhere.",
        queries.Extensions.x44),
      Entry("x46_ann_pq",
        "PQ at scale: training + encoding touch the corpus only through " +
          "(vid, sub)-windowed broadcast assigns; ADC scoring joins the " +
          "codes to each query's broadcast m×k distance table on " +
          "(sub, cid) and partial-aggregates the per-candidate sum — the " +
          "raw vectors never reach the scoring join.",
        queries.Extensions.x46),
      Entry("x47_ann_ivfpq",
        "IVF-PQ: probed-cell membership restricts candidates (broadcast " +
          "probe join), then the candidate⋈codes join is SHUFFLE-HASH " +
          "(hash build, no sort) and the m×k query table is broadcast — " +
          "the query path touches cell ids and codes only, never raw " +
          "vectors; no SortMergeJoin, no cartesian.",
        queries.Extensions.x47),
      Entry("x48_semantic_dedup",
        "SemDeDup: the within-cell pair join is a hash equi-join on the " +
          "k-means cell id (never a cartesian) — pair work is Σ|cell|², " +
          "bounded by the clustering; survivors leave via LeftAnti.",
        queries.Extensions.x48),
      Entry("x49_token_budget",
        "Two-phase distributed prefix sum: the only globally-ordered " +
          "window runs over the ~100 per-bucket totals (broadcast back); " +
          "the per-document running sum is PARTITIONED BY the quality " +
          "bucket — no data-sized single-partition window.",
        queries.Extensions.x49),
      Entry("x51_clf_score",
        "Model-based quality scoring at scan speed: the hashed-feature " +
          "linear scorer is ONE map-side Project on the parquet scan — " +
          "the only exchange in the plan is the final ORDER BY.",
        queries.Extensions.x51),
      Entry("x52_dup_ngram",
        "Duplicate-n-gram coverage in one linear lineage: explode → " +
          "(doc, gram) partial+final aggregate → gram-partitioned count " +
          "window → per-doc rollup; the gram explosion runs exactly once.",
        queries.Extensions.x52),
      Entry("x53_bm25",
        "BM25: the token explode is filtered to the QUERY terms before the " +
          "tf exchange (posting-list-sized shuffle, never the corpus token " +
          "stream); df (≤ |query| rows) joins back as a broadcast; N/Σdl " +
          "are driver literals. The visible plan root is the skew-free " +
          "ordinal's pinned RDD (global ranking without an unpartitioned " +
          "window) — zero Window nodes.",
        queries.Extensions.x53),
      Entry("x55_unigram_lm",
        "Unigram-LM scoring: vocabulary counts partial-aggregate map-side " +
          "and join back (broadcast while the vocab fits; AQE re-plans " +
          "when it does not); the corpus token total is a driver literal; " +
          "the per-doc fold is an ObjectHashAggregate over pinned-order " +
          "structs — no Window, no cartesian.",
        queries.Extensions.x55),
      Entry("x57_zorder",
        "Z-order codes: the morton interleave is pure mask/shift/OR inside " +
          "the scan's codegen'd Project — zero joins, zero aggregates, " +
          "zero windows; the only exchange is the declared ORDER BY " +
          "(Layout.cluster replaces it with repartitionByRange at write " +
          "time).",
        queries.Extensions.x57),
      Entry("x58_latest_by_key",
        "Latest-by-key compaction: max(struct) partial-aggregates BEFORE " +
          "its exchange (SortAggregate partial → shuffle |keys| rows → " +
          "final) — the shuffle carries one row per (task, key), never the " +
          "history, and no Window funnels a hot key through one task.",
        queries.Extensions.x58),
      Entry("x61_zorder_read",
        "The z-order read path: the quadtree cover turns the 2-D box into " +
          "OR'd `zcode BETWEEN` predicates + the exact residual — all " +
          "inside the scan-side Filter, which is what parquet min/max " +
          "pruning and the range-partitioned layout answer per file. No " +
          "join, no aggregate; one plan-visible exchange (the declared " +
          "ORDER BY).",
        queries.Extensions.x61),
      Entry("x62_funnel",
        "Ordered funnel: one filtered user-keyed aggregate per step, each " +
          "joined to the shrinking frontier on the user key — event-type " +
          "filters reach the scan, every exchange is high-cardinality, and " +
          "no per-user history window exists anywhere.",
        queries.Extensions.x62),
      Entry("x70_source_report",
        "Corpus health report: the base profile is one map-combined " +
          "aggregate per source; the contamination side reuses the " +
          "decontamination semi-join and joins back per-source counts — " +
          "every fraction is a single division over integer aggregates, " +
          "no cartesian, no window.",
        queries.Extensions.x70),
      Entry("x103_dup_spans",
        "Substring-dedup spans: the occurrence count groups by the gram's " +
          "16-byte md5 (the shuffle carries fingerprints + integer " +
          "positions, never gram text); hits re-join on the fingerprint " +
          "equi-key and the island merge is a Window PARTITIONED BY doc — " +
          "keyed, never global.",
        queries.Extensions.x103),
      Entry("x106_ann_from_state",
        "ANN from persisted IVF state: the cells scan is a narrow " +
          "columnar read of precomputed assignments, probes broadcast " +
          "(BroadcastHashJoin on cid), and only the per-query top-k " +
          "window shuffles — zero training or corpus-assignment work at " +
          "query time.",
        queries.Extensions.x106),
      Entry("x108_substring_dedup",
        "Retain-one-copy excision: spans aggregate to one small array " +
          "per affected doc, ONE keyed left join attaches them (clean " +
          "docs pass through), and the token filter is a map-side " +
          "higher-order function — texts never shuffle.",
        queries.Extensions.x108))

    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of representative declared queries\n\n")
    sb.append(s"Generated by `graft.Plans` on $sfDir. PlanSpec pins the key\n")
    sb.append("properties; this file is the human-readable evidence.\n")
    entries.foreach { e =>
      sb.append(s"\n## ${e.name}\n\n${e.note}\n\n```\n")
      sb.append(capturePlan(e.df(spark, sfDir)))
      sb.append("```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"[plans] wrote PLANS.md (${entries.size} plans)")
    spark.stop()
  }
}
