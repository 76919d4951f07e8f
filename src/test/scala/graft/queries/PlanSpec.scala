package graft.queries

import graft.SparkSpec

/** Plan-hygiene tests: the physical plans must keep the properties the
  * 100 TB design depends on — filter/projection pushdown to the parquet
  * scan, broadcast joins for dimension tables, no accidental cartesian
  * products, whole-stage codegen on the hot paths. Asserting on
  * explain("formatted") output pins these against regressions. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    graft.Plans.capturePlan(df)

  test("q01: both predicates and the 3-column projection reach the parquet scan") {
    val p = plan(Relational.q01(spark, sf))
    assert(p.contains("PushedFilters"))
    assert(p.contains("l_quantity"), "quantity filter not pushed")
    assert(p.contains("l_returnflag"), "returnflag filter not pushed")
    // scan must NOT read all 11 lineitem columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_extendedprice"),
      s"projection not pruned at scan: $readSchema")
  }

  test("q15: dimension tables join via broadcast, no cartesian product") {
    val p = plan(Relational.q15(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "no broadcast join in q15 plan")
    assert(!p.contains("CartesianProduct"), "cartesian product in q15 plan")
  }

  test("q14: nation joins as broadcast") {
    val p = plan(Relational.q14(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("x11: RollingHash participates in whole-stage codegen") {
    val df = Extensions.x11(spark, sf)
    val p = plan(df)
    // the project containing rolling_hash must sit inside a codegen stage:
    // formatted explain marks codegen'd operators with "* Op" + [codegen id]
    assert(p.contains("codegen id"), "no codegen stage at all")
    val projectLine = p.linesIterator.find(_.matches(""".*\*.*Project.*""")).getOrElse("")
    assert(projectLine.nonEmpty, s"project with rolling_hash not codegen'd:\n$p")
  }

  test("x06: query side is broadcast; corpus is never shuffled for scoring") {
    val p = plan(Extensions.x06(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"ANN scoring join is not broadcast-based:\n$p")
  }

  test("q03: global count uses no unpartitioned window") {
    val p = plan(Relational.q03(spark, sf))
    assert(!p.contains("Window"), "q03 should stamp count via lit, not a window")
  }

  test("x17: the minhash signature is computed once per row per join side") {
    val p = plan(Extensions.x17(spark, sf))
    val n = "minhash_sig".r.findAllIn(p).size
    // self-join → the scan subtree appears twice; within each side the
    // signature expression must appear exactly once (no CollapseProject
    // duplication re-introducing per-band recomputation)
    assert(n <= 2, s"minhash_sig appears $n times in the physical plan:\n$p")
  }

  test("x25: as-of join plans as ONE key shuffle + window, not an inequality join") {
    val p = plan(Extensions.x25(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"as-of join degenerated to a nested loop:\n$p")
    assert(p.contains("Window"), "as-of join lost its running-fill window")
  }

  test("x26: range join is a hash equi-join on (key, bin), never a nested loop") {
    val p = plan(Extensions.x26(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$p")
    assert(p.contains("HashJoin"), s"range join is not a hash equi-join:\n$p")
  }

  test("x27/x28: forward and nearest as-of keep the single-shuffle window plan") {
    Seq(Extensions.x27(spark, sf), Extensions.x28(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"as-of join degenerated to a nested loop:\n$p")
      assert(p.contains("Window"), "as-of join lost its running-fill window")
      // both directions must come from ONE exchange over the union — the
      // two window frames share partitioning AND ordering
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges <= 1,
        s"as-of union should shuffle once, saw $exchanges hash exchanges:\n$p")
    }
  }

  test("q04/q05: per-kind ordinal uses no low-cardinality window partition") {
    // event_type has ~5 values — a Window.partitionBy(event_type) would
    // funnel n/5 rows through single tasks at scale; the two-phase ordinal
    // (Ordinals.perKeyOrdinal) must keep the plan window-free
    Seq(Relational.q04(spark, sf), Relational.q05(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("Window"),
        s"ordinal query plan contains a Window node:\n$p")
    }
  }

  test("x42: conjunctive search is agg-over-filtered-postings, no cartesian") {
    val p = plan(Extensions.x42(spark, sf))
    assert(!p.contains("CartesianProduct"), s"search plan has a cartesian:\n$p")
    assert(p.contains("HashAggregate"), "search lost its posting aggregation")
  }

  test("x43: decontamination is a broadcast semi-join; survivors anti-join") {
    val p = plan(Extensions.x43(spark, sf))
    assert(p.contains("LeftSemi"), s"no semi-join in curate plan:\n$p")
    assert(p.contains("LeftAnti"), s"no anti-join in curate plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"curate plan has a cartesian:\n$p")
  }

  test("x46: PQ codes join the query table broadcast; no raw-vector scoring join") {
    val p = plan(Extensions.x46(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"ADC join is not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"PQ corpus got sort-merge-joined:\n$p")
    assert(!p.contains("CartesianProduct"), s"PQ plan has a cartesian:\n$p")
  }

  test("x47: IVF-PQ keeps every corpus-side join broadcast, no cartesian") {
    val p = plan(Extensions.x47(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"IVF-PQ joins not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"IVF-PQ corpus sort-merge-joined:\n$p")
    assert(!p.contains("CartesianProduct"), s"IVF-PQ plan has a cartesian:\n$p")
  }

  test("x44: centroid/probe sides broadcast; corpus never sort-merge-joined") {
    val p = plan(Extensions.x44(spark, sf))
    // centroid frame (k rows) rides BroadcastNestedLoopJoin; the probe
    // join on cid must be a broadcast hash join with the corpus streamed
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"kmeans plan has no broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"kmeans corpus side got sort-merge-joined:\n$p")
    assert(!p.contains("CartesianProduct"), s"kmeans plan has a cartesian:\n$p")
  }

  test("x48: within-cell pair join is an equi-join on cid, no cartesian") {
    val p = plan(Extensions.x48(spark, sf))
    assert(!p.contains("CartesianProduct"),
      s"semantic-dedup pair join degenerated to a cartesian:\n$p")
    assert(p.contains("LeftAnti"), s"survivor anti-join missing:\n$p")
  }

  test("x49: no unpartitioned window over document rows") {
    // the only global-ordered window must run over the ~100 bucket-total
    // rows; the per-document running sum is PARTITIONED BY bucket. The
    // formatted plan shows each window's partition spec — assert every
    // data-sized window carries a partition key.
    val p = plan(Extensions.x49(spark, sf))
    val windowLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty, "expected window operators in x49")
    // the per-doc cumulative window is partitioned by the quality bucket
    assert(p.contains("graft_qb"),
      s"per-doc running sum lost its bucket partitioning:\n$p")
  }

  test("x51: classifier scoring is map-side; only the ORDER BY shuffles") {
    val p = plan(Extensions.x51(spark, sf))
    // the scorer (aggregate HOF — CodegenFallback by design, the md5 per
    // token dominates either way) must ride the scan's Project: the only
    // exchange is the final sort's range partitioning
    assert("rangepartitioning".r.findAllIn(p).size == 1, s"no sort exchange:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"classifier query hash-shuffles before the sort:\n$p")
  }

  test("x53/x55: retrieval + LM scoring rank without any corpus-sized window") {
    val p53 = plan(Extensions.x53(spark, sf))
    // small-k ranking is TakeOrderedAndProject (per-task k-row heaps, one
    // k-row merge — no corpus-wide sort or range exchange); the rank
    // window that follows runs over those k rows only, so the guard is:
    // the top-k cut must appear BELOW any window, never a window over
    // corpus rows
    assert(p53.contains("TakeOrderedAndProject"),
      s"x53 must rank via a top-k cut, not a corpus-wide sort/window:\n$p53")
    assert(!p53.contains("CartesianProduct"))
    val p55 = plan(Extensions.x55(spark, sf))
    assert(!p55.contains("Window"), "x55 per-doc fold must be an aggregate")
    assert(!p55.contains("CartesianProduct"))
  }

  test("x57: morton codes are a pure map-side Project, no join/agg/window") {
    val p = plan(Extensions.x57(spark, sf))
    // the interleave must be shift/mask/OR inside the scan-side Project
    // (codegen ids are hidden under the unexecuted AQE wrapper, so assert
    // the expression shape instead)
    assert(p.contains("shiftleft"), "morton interleave missing from Project")
    assert(!p.contains("Window") && !p.contains("Join") &&
      !p.contains("Aggregate"), s"x57 plan grew non-map operators:\n$p")
  }

  test("x58: compaction partial-aggregates before its exchange, no window") {
    val p = plan(Extensions.x58(spark, sf))
    assert(!p.contains("Window"), "latestByKey must not plan a window")
    // partial + final aggregate pair around the key exchange
    val aggs = "SortAggregate|HashAggregate".r.findAllIn(p).size
    assert(aggs >= 2, s"expected partial+final aggregates:\n$p")
  }

  test("x64/x65: sampling ranks via the skew-free ordinal, zero windows") {
    assert(!plan(Extensions.x64(spark, sf)).contains("Window"))
    assert(!plan(Extensions.x65(spark, sf)).contains("Window"))
  }

  test("x66/x69: chunking and normalization stay map-side (no join/window)") {
    val p66 = plan(Extensions.x66(spark, sf))
    assert(!p66.contains("Window") && !p66.contains("Join"), s"x66:\n$p66")
    assert(p66.contains("Generate"), "x66 lost its explode generate")
    val p69 = plan(Extensions.x69(spark, sf))
    assert(!p69.contains("Window") && !p69.contains("Join") &&
      !p69.contains("Aggregate"), s"x69 grew non-map operators:\n$p69")
  }

  test("x70: the health report joins contamination as broadcast/hash, no cartesian") {
    val p = plan(Extensions.x70(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"x70:\n$p")
  }

  test("x52: the gram explosion runs exactly once (window d.f., no self-join)") {
    val p = plan(Extensions.x52(spark, sf))
    // formatted explain prints each node once in the tree and once in the
    // detail section → a single Generate appears exactly twice
    assert("Generate".r.findAllIn(p).size == 2,
      s"gram explosion duplicated in the plan:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("x75: ONE corpus scan, no join — set-expansion shape, not self-join") {
    val p = plan(Extensions.x75(spark, sf))
    // formatted explain prints each node once in the tree, once in details
    assert("Scan parquet".r.findAllIn(p).size <= 2,
      s"x75 scans the corpus more than once:\n$p")
    assert(!p.contains("Join"), s"x75 must not self-join:\n$p")
  }

  test("x79: containment blocks on an equi-join — the all-pairs id≠id join is gone") {
    val p = plan(Extensions.x79(spark, sf))
    // the pre-round-9 plan was a.join(b, a.id =!= b.id && ...) — an
    // inequality-only condition Spark can only execute as a nested-loop /
    // cartesian. Prefix filtering turns blocking into a hash equi-join on
    // the shingle-hash column; nothing nested-loop-shaped may remain.
    assert(!p.contains("CartesianProduct"),
      s"containment blocking degenerated to a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"containment blocking degenerated to a nested loop:\n$p")
    assert(p.contains("HashJoin"), s"containment blocking is not a hash join:\n$p")
  }

  test("x76: the lead window is partitioned by the user key") {
    val p = plan(Extensions.x76(spark, sf))
    assert(p.contains("windowspecdefinition(user_id"),
      s"x76 window lost its user partitioning:\n$p")
  }

  test("x90: embedding profile is one explode + hash aggregates, no join/window") {
    val p = plan(Extensions.x90(spark, sf))
    assert(!p.contains("Join"), s"x90 grew a join:\n$p")
    assert(!p.contains("Window"), s"x90 grew a window:\n$p")
    // one generate (posexplode), partial-aggregated before any exchange
    assert(p.linesIterator.count(_.contains("Generate")) <= 2,
      s"x90 explodes more than once:\n$p")
    assert(p.contains("partial_"), s"x90 lost map-side partial aggregation:\n$p")
  }

  test("x91: eval rep grams broadcast against the corpus rep explode") {
    // the rep-level hit derivation (pre-checkpoint — the checkpoint in
    // the full operator truncates the visible lineage)
    import org.apache.spark.sql.functions.{col, md5, min}
    val docs = graft.Tables(spark, sf, "documents")
    val cReps = docs.filter(col("doc_id") % 37 =!= 0)
      .groupBy(md5(col("text")).as("cfp")).agg(min(col("text")).as("ctext"))
    val eReps = docs.filter(col("doc_id") % 37 === 0)
      .groupBy(md5(col("text")).as("efp")).agg(min(col("text")).as("etext"))
    val hp = plan(graft.ext.Dedup.contaminationRepHits(cReps, eReps, 13))
    assert(hp.contains("BroadcastHashJoin"),
      s"x91 contamination hit join is not broadcast:\n$hp")
    // the full operator's downstream joins stay equi
    val p = plan(Extensions.x91(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"x91 degenerated to a non-equi join:\n$p")
  }

  test("x92: the matrix aggregates the pair relation; no cartesian anywhere") {
    val p = plan(Extensions.x92(spark, sf))
    assert(!p.contains("CartesianProduct"), s"x92 grew a cartesian:\n$p")
    assert(p.contains("HashJoin"), s"x92 source lookup is not a hash join:\n$p")
  }

  test("x94: vocab membership probes via broadcast; only group totals shuffle") {
    val p = plan(Extensions.x94(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"x94 vocab membership is not a broadcast probe:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"x94 vocabulary top-k fell back to a global sort:\n$p")
  }

  test("x97/x98: gram/posting work is equi-join shaped, no cartesian, no window") {
    val p97 = plan(Extensions.x97(spark, sf))
    assert(!p97.contains("CartesianProduct") && !p97.contains("Window"),
      s"x97 grew a cartesian/window:\n$p97")
    val p98 = plan(Extensions.x98(spark, sf))
    assert(!p98.contains("CartesianProduct") &&
      !p98.contains("BroadcastNestedLoopJoin"),
      s"x98 phrase intersection degenerated:\n$p98")
    // each phrase term's postings are filtered BEFORE the join: the plan
    // must push the term equality into the scan-side filters
    assert(p98.contains("key") && p98.contains("agg"),
      s"x98 lost its term pre-filters:\n$p98")
  }

  test("x95/x96: report aggregates partial-combine; no join, no cartesian") {
    val p95 = plan(Extensions.x95(spark, sf))
    assert(!p95.contains("CartesianProduct") && !p95.contains("SortMergeJoin"),
      s"x95 grew a join:\n$p95")
    val p96 = plan(Extensions.x96(spark, sf))
    assert(!p96.contains("Join"), s"x96 grew a join:\n$p96")
    assert(p96.contains("partial_"), s"x96 lost map-side partial agg:\n$p96")
  }

  test("x103: dup-gram hits join on fingerprints; the span window is doc-keyed") {
    val p = plan(Extensions.x103(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"x103 span detection degenerated to a non-equi join:\n$p")
    // island merge must be the per-doc keyed window, never an
    // unpartitioned global sort-window
    val winLine = p.linesIterator.filter(_.contains("Window"))
      .mkString("\n")
    assert(!winLine.contains("partitionBy=[]"),
      s"x103 window lost its doc partitioning:\n$winLine")
  }

  test("x104: group totals broadcast back; no window, no cartesian blowup") {
    val p = plan(Extensions.x104(spark, sf))
    assert(!p.contains("Window"), s"x104 grew a window:\n$p")
    // the 1-row totals attach via a broadcast join (a 1-row cross join is
    // broadcast-nested-loop by construction — bounded, not quadratic)
    assert(p.contains("Broadcast"), s"x104 totals are not broadcast:\n$p")
  }

  test("x105: probe batch is broadcast; corpus never shuffles for scoring") {
    val p = plan(Extensions.x105(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"x105 scoring join is not broadcast-based:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"x105 shuffled the corpus for scoring:\n$p")
  }

  test("x108: excision is one keyed spans join + map-side HOF, no cartesian") {
    val p = plan(Extensions.x108(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"x108 excision degenerated to a non-equi join:\n$p")
  }

  test("ivfTopKFromState: probes broadcast against the cells scan") {
    val emb = graft.Tables(spark, sf, "embeddings")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_plan_ivf").toFile.getAbsolutePath
    graft.ext.Similarity.appendIvfState(emb, dir, k = 4, iters = 1)
    val p = plan(graft.ext.Similarity.ivfTopKFromState(
      spark, dir, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 3),
      topK = 3, nProbe = 2))
    assert(p.contains("BroadcastHashJoin"),
      s"state probe join is not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"state probe grew a cartesian:\n$p")
  }

  test("tokenBudgetFromState: the read path pays no training and no re-encode") {
    // the whole point of the tokenizer pillar (x121): a budget query over
    // a built state must scan ONLY the narrow (id, bpe_tokens) sidecar +
    // the caller's quality frame — if the plan ever scans the documents
    // table or folds merge lambdas, the read path regressed to x117's
    // retrain-per-call shape
    val docs = graft.Tables(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 100)
      .select("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_plan_tok").toFile.getAbsolutePath + "/s"
    graft.ext.Bpe.appendTokenizerState(docs, dir, "doc_id", "text",
      numMerges = 3, batchTag = Some(1L))
    // the caller's quality frame is deliberately corpus-free (a range) so
    // a "documents.parquet" scan in the plan can ONLY mean the budget
    // read path itself touched the corpus text
    val quality = spark.range(0, 100).select(
      org.apache.spark.sql.functions.col("id").as("doc_id"),
      (org.apache.spark.sql.functions.col("id") % 7).cast("double")
        .as("quality_score"))
    val p = plan(graft.ext.Bpe.tokenBudgetFromState(spark, dir, quality,
      "doc_id", "quality_score", budget = 4000L))
    assert(!p.contains("documents.parquet"),
      s"budget-from-state scans the corpus text:\n$p")
    assert(!p.toLowerCase.contains("lambdafunction"),
      s"budget-from-state folds merge lambdas (re-encode in the read path):\n$p")
    assert(p.contains("doc_tokens"),
      s"budget-from-state does not read the persisted sidecar:\n$p")
  }

  test("x112: the corpus is shingled and signed exactly once") {
    // the materialized pair relation feeds BOTH the audit joins and the
    // cluster-rep split (leakageFreeSplitFromPairs) — so the final plan
    // must contain ZERO signature stages: the only minhash pass lives
    // inside the already-materialized pairs frame. A second occurrence
    // means leakageFreeSplit regressed to re-signing the corpus.
    val p = plan(Extensions.x112(spark, sf))
    val n = "minhash_sig".r.findAllIn(p).size
    assert(n == 0,
      s"x112 re-signs the corpus ($n minhash_sig stages in the plan):\n$p")
    val m = "shingle".r.findAllIn(p).size
    assert(m == 0,
      s"x112 re-shingles the corpus ($m shingle stages in the plan):\n$p")
  }
}
