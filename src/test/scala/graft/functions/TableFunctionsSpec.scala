package graft.functions

import org.apache.spark.sql.{AnalysisException, DataFrame, Row}

import graft.SparkSpec
import graft.ext.{AsOf, Dedup, RangeJoin}

/** SQL TVF surface ([[TableFunctions]]): every table function must return
  * byte-identical rows to the Scala DataFrame API it wraps — the builders
  * literally reuse the DataFrame implementations, and these cases pin that
  * the plumbing (literal parsing, view lookup, logical-plan splice) does
  * not perturb the result. */
class TableFunctionsSpec extends SparkSpec {

  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[Row] = {
    val cols = df.columns.sorted.map(org.apache.spark.sql.functions.col)
    df.select(cols.toIndexedSeq: _*).collect()
      .toSeq.sortBy(_.toString)
  }

  private def assertSame(sql: DataFrame, api: DataFrame): Unit = {
    assert(sql.columns.sorted.toSeq == api.columns.sorted.toSeq)
    assert(sortedRows(sql) == sortedRows(api))
  }

  private lazy val registered: Unit = TableFunctions.register(spark)

  private def ready(): Unit = registered

  test("asof_join TVF == AsOf.join, backward default and explicit forward") {
    ready()
    val left = Seq((1L, "u", 100L), (2L, "u", 50L), (3L, "u", 10L),
      (4L, "v", 100L)).toDF("id", "k", "ts")
    val right = Seq(("u", 50L, "r50"), ("u", 90L, "r90"), ("u", 200L, "r200"),
      ("v", 70L, "s70")).toDF("k", "rts", "tag")
    left.createOrReplaceTempView("tvf_l")
    right.createOrReplaceTempView("tvf_r")

    assertSame(
      spark.sql("SELECT * FROM asof_join('tvf_l', 'tvf_r', 'k', 'ts', 'rts')"),
      AsOf.join(left, right, Seq("k"), "ts", "rts"))
    assertSame(
      spark.sql(
        "SELECT * FROM asof_join('tvf_l', 'tvf_r', 'k', 'ts', 'rts', 'forward')"),
      AsOf.join(left, right, Seq("k"), "ts", "rts", "forward"))
  }

  test("asof_join TVF: comma-separated multi-column keys and num_slices") {
    ready()
    val left = Seq((1L, "u", "a", 100L), (2L, "u", "b", 100L))
      .toDF("id", "k1", "k2", "ts")
    val right = Seq(("u", "a", 90L, "ra"), ("u", "b", 60L, "rb"))
      .toDF("k1", "k2", "rts", "tag")
    left.createOrReplaceTempView("tvf_ml")
    right.createOrReplaceTempView("tvf_mr")

    val sql = spark.sql(
      """SELECT * FROM asof_join(
        |  'tvf_ml', 'tvf_mr', 'k1, k2', 'ts', 'rts', 'backward', 2)""".stripMargin)
    assertSame(sql,
      AsOf.join(left, right, Seq("k1", "k2"), "ts", "rts", numSlices = 2))
    assert(sql.select("id", "tag").as[(Long, String)].collect().toMap ==
      Map(1L -> "ra", 2L -> "rb"))
  }

  test("range_join TVF == pointInInterval; interval_ids arg == left variant") {
    ready()
    val points = Seq(("u", 15L, "p15"), ("u", 40L, "p40"), ("v", 15L, "q15"))
      .toDF("k", "ts", "ptag")
    val intervals = Seq(("u", 10L, 20L, "i10"), ("u", 100L, 110L, "i100"),
      ("v", 0L, 50L, "j0")).toDF("k", "lo", "hi", "itag")
    points.createOrReplaceTempView("tvf_p")
    intervals.createOrReplaceTempView("tvf_i")

    assertSame(
      spark.sql(
        "SELECT * FROM range_join('tvf_p', 'tvf_i', 'k', 'ts', 'lo', 'hi', 16)"),
      RangeJoin.pointInInterval(
        points, intervals, Seq("k"), "ts", "lo", "hi", 16L))
    val leftSql = spark.sql(
      """SELECT * FROM range_join(
        |  'tvf_p', 'tvf_i', 'k', 'ts', 'lo', 'hi', 16, 'itag')""".stripMargin)
    assertSame(leftSql,
      RangeJoin.pointInIntervalLeft(
        points, intervals, Seq("k"), "ts", "lo", "hi", 16L, Seq("itag")))
    // the zero-match interval i100 must survive with a null point payload
    assert(leftSql.filter($"itag" === "i100" && $"ptag".isNull).count() == 1)
  }

  test("dedup_pairs TVF == Dedup.lshPairs") {
    ready()
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base), (2L, base), // exact dups
      (3L, base + " tail"),   // near dup
      (4L, "completely different words in this distant document body")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("tvf_docs")

    assertSame(
      spark.sql("SELECT * FROM dedup_pairs('tvf_docs', 'doc_id', 'text', 0.5)"),
      Dedup.lshPairs(docs, "doc_id", "text", threshold = 0.5))
  }

  test("decontaminate TVF == Dedup.contaminatedDocs") {
    ready()
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally clean words nothing shared here"),
      (3L, "beta gamma delta overlapping fragment text")).toDF("doc_id", "text")
    val evalSet = Seq((100L, "beta gamma delta")).toDF("doc_id", "text")
    corpus.createOrReplaceTempView("tvf_corpus")
    evalSet.createOrReplaceTempView("tvf_eval")

    val sql = spark.sql(
      "SELECT * FROM decontaminate('tvf_corpus', 'tvf_eval', 'doc_id', 'text', 3)")
    assertSame(sql,
      graft.ext.Dedup.contaminatedDocs(corpus, evalSet, "doc_id", "text", n = 3))
    assert(sql.as[(Long, Long)].collect().toMap == Map(1L -> 1L, 3L -> 1L))
  }

  test("curate / search_all / inverted_index TVFs == their Scala APIs") {
    ready()
    val good = ("the and of to in is it that " * 13).trim + " unique"
    val docs = Seq(
      (5L, good), (9L, good), (6L, good.replace("unique", "other")),
      (7L, "el los que y un por con para"), (8L, "tiny")).toDF("doc_id", "text")
    val evalSet = Seq((100L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("tvf_cdocs")
    evalSet.createOrReplaceTempView("tvf_ceval")

    assertSame(
      spark.sql("""SELECT * FROM curate(
        |  'tvf_cdocs', 'tvf_ceval', 'doc_id', 'text', 'en', 0.6, 13)""".stripMargin),
      graft.ext.Curate.curate(docs, evalSet, "doc_id", "text", "en", 0.6, 13))
    assertSame(
      spark.sql(
        "SELECT * FROM search_all('tvf_cdocs', 'doc_id', 'text', 'the, unique')"),
      graft.ext.Index.searchAll(docs, "doc_id", "text", Seq("the", "unique")))
    assertSame(
      spark.sql(
        "SELECT * FROM inverted_index('tvf_cdocs', 'doc_id', 'text', 2)"),
      graft.ext.Index.invertedIndex(docs, "doc_id", "text", minDf = 2L))
  }

  test("page_rank / page_rank_state: a PARTIAL seed triple is a named " +
      "arity error, not an index crash") {
    ready()
    // 5 and 6 args to page_rank (seed triple incomplete) must name the
    // allowed arities; same for 4 and 5 args to page_rank_state
    Seq(
      "SELECT * FROM page_rank('d', 3, 4, 0.85, 'tbl')",
      "SELECT * FROM page_rank('d', 3, 4, 0.85, 'tbl', 'vid')",
      "SELECT * FROM page_rank_state('d', 4, 0.85, 'tbl')",
      "SELECT * FROM page_rank_state('d', 4, 0.85, 'tbl', 'vid')"
    ).foreach { q =>
      val e = intercept[AnalysisException](spark.sql(q).collect())
      assert(e.getMessage.contains("page_rank"), s"$q -> ${e.getMessage}")
      assert(!e.getMessage.contains("IndexOutOfBounds"), e.getMessage)
    }
  }

  test("curate_full TVF == Curate.curateFull (three-rail decontamination)") {
    ready()
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tvf_cf").toFile.getAbsolutePath + "/ivf"
    graft.ext.Similarity.appendIvfState(emb, dir, k = 4, iters = 2,
      batchTag = Some(1L))
    val evalDocs = docs.filter($"doc_id" % 37 === 0)
    val evalVecs = emb.filter($"vec_id" % 37 === 0)
      .select(($"vec_id" + 5000).as("eval_id"), $"embedding")
    docs.createOrReplaceTempView("tvf_cf_docs")
    evalDocs.createOrReplaceTempView("tvf_cf_eval")
    evalVecs.createOrReplaceTempView("tvf_cf_evecs")
    assertSame(
      spark.sql(s"""SELECT * FROM curate_full('tvf_cf_docs',
        |  'tvf_cf_eval', 'doc_id', 'text', '$dir', 'tvf_cf_evecs',
        |  0.95)""".stripMargin),
      graft.ext.Curate.curateFull(spark, docs, evalDocs, dir, evalVecs,
        "doc_id", "text"))
  }

  test("semantic_dedup / token_budget / contamination_score / dup_ngram_coverage TVFs == Scala APIs") {
    ready()
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    emb.createOrReplaceTempView("tvf_emb")
    assertSame(
      spark.sql("SELECT * FROM semantic_dedup('tvf_emb', 0.15)"),
      graft.ext.Similarity.semanticDedup(emb, 0.15))

    val scored = Seq((1L, 100L, 0.9), (2L, 200L, 0.8), (3L, 300L, 0.7),
      (4L, 400L, 0.6)).toDF("doc_id", "toks", "q")
    scored.createOrReplaceTempView("tvf_scored")
    assertSame(
      spark.sql(
        "SELECT * FROM token_budget('tvf_scored', 'doc_id', 'toks', 'q', 350)"),
      graft.ext.Sampling.tokenBudget(scored, "doc_id", "toks", "q", 350L))

    val docs = Seq((1L, "a b c d e f"), (2L, "p q r s t u"))
      .toDF("doc_id", "text")
    val evalSet = Seq((9L, "a b c d zz")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("tvf_sdocs")
    evalSet.createOrReplaceTempView("tvf_seval")
    assertSame(
      spark.sql("""SELECT * FROM contamination_score(
        |  'tvf_sdocs', 'tvf_seval', 'doc_id', 'text', 3)""".stripMargin),
      graft.ext.Dedup.contaminationScore(docs, evalSet, "doc_id", "text", 3))
    assertSame(
      spark.sql(
        "SELECT * FROM dup_ngram_coverage('tvf_sdocs', 'doc_id', 'text', 3)"),
      graft.ext.TextAnalysis.dupNgramCoverage(docs, "doc_id", "text", 3))
  }

  test("bm25_topk / unigram_nll / latest_by_key / zorder_cluster TVFs == Scala APIs") {
    ready()
    val docs = Seq((1L, "spark spark shuffle join extra"), (2L, "spark join"),
      (3L, "join join join"), (4L, "none of these"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("tvf_bm")
    assertSame(
      spark.sql("SELECT * FROM bm25_topk('tvf_bm', 'doc_id', 'text', 'spark,join', 3)"),
      graft.ext.Index.bm25TopK(docs, "doc_id", "text", Seq("spark", "join"), 3))
    assertSame(
      spark.sql("SELECT * FROM unigram_nll('tvf_bm', 'doc_id', 'text')"),
      graft.ext.TextAnalysis.unigramNll(docs, "doc_id", "text"))

    val hist = Seq((1L, 10L, 100L, "old"), (1L, 20L, 101L, "new"),
      (2L, 5L, 102L, "only")).toDF("k", "ver", "id", "p")
    hist.createOrReplaceTempView("tvf_hist")
    assertSame(
      spark.sql("SELECT * FROM latest_by_key('tvf_hist', 'k', 'ver,id')"),
      graft.ext.Compaction.latestByKey(hist, Seq("k"), Seq("ver", "id")))

    val pts = Seq((3L, 1L), (0L, 0L), (7L, 7L)).toDF("x", "y")
    pts.createOrReplaceTempView("tvf_pts")
    assertSame(
      spark.sql("SELECT * FROM zorder_cluster('tvf_pts', 'x,y', 2, 5)"),
      graft.ext.Layout.cluster(pts, Seq("x", "y"), 2, 5))
  }

  test("funnel / retention / rate_anomaly / weighted_sample / chunk_windows / sketch_distinct TVFs == Scala APIs") {
    ready()
    val events = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    events.createOrReplaceTempView("tvf_ev")
    assertSame(
      spark.sql("SELECT * FROM funnel('tvf_ev', 'user_id', 'ts', 'event_type', 'view,click,purchase')"),
      graft.ext.Behavior.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase")))
    assertSame(
      spark.sql("SELECT * FROM retention('tvf_ev', 'user_id', 'ts')"),
      graft.ext.Behavior.retention(events, "user_id", "ts"))
    assertSame(
      spark.sql("SELECT * FROM rate_anomaly('tvf_ev', 'ts', 24, 2.0)"),
      graft.ext.Behavior.rateAnomalies(events, "ts", 24, 2.0))

    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    docs.createOrReplaceTempView("tvf_docs8")
    assertSame(
      spark.sql("SELECT * FROM weighted_sample('tvf_docs8', 'doc_id', 'n_chars', 'lang', 5)"),
      graft.ext.Sampling.weightedSample(docs, "doc_id", "n_chars", "lang", 5))
    assertSame(
      spark.sql("SELECT * FROM chunk_windows('tvf_docs8', 'doc_id', 'text', 50, 25)"),
      graft.ext.Packing.chunkWindows(docs, "doc_id", "text", 50, 25))
    assertSame(
      spark.sql("SELECT * FROM sketch_distinct('tvf_docs8', 'source', 'text')"),
      graft.ext.Profile.sketchDistinct(docs, "source", "text"))

    val evalSet = docs.filter(org.apache.spark.sql.functions
      .col("doc_id") % 37 === 0).select("doc_id", "text")
    evalSet.createOrReplaceTempView("tvf_eval8")
    assertSame(
      spark.sql("SELECT * FROM source_report('tvf_docs8', 'tvf_eval8', 'doc_id', 'text', 'source', 13)"),
      graft.ext.Profile.sourceReport(docs, evalSet, "doc_id", "text", "source", 13))

    val dups = Seq((1L, "g", "t1"), (2L, "g", "t1"), (3L, "g", "t2"))
      .toDF("doc_id", "src", "text")
    dups.createOrReplaceTempView("tvf_dups")
    assertSame(
      spark.sql("SELECT * FROM top_duplicates('tvf_dups', 'doc_id', 'text', 'src', 3)"),
      graft.ext.Profile.topDuplicates(dups, "doc_id", "text", "src", 3))
  }

  test("source_overlap / transitions / bpe_pairs / quantize_int8 / promote_json TVFs == Scala APIs") {
    ready()
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    docs.createOrReplaceTempView("tvf_docs9")
    assertSame(
      spark.sql("SELECT * FROM source_overlap('tvf_docs9', 'text', 'source', 13)"),
      graft.ext.Profile.sourceOverlap(docs, "text", "source", 13))
    assertSame(
      spark.sql("SELECT * FROM bpe_pairs('tvf_docs9', 'text', 10)"),
      graft.ext.TextAnalysis.pairMergeCounts(docs, "text", 10))

    val events = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    events.createOrReplaceTempView("tvf_ev9")
    assertSame(
      spark.sql("SELECT * FROM transitions('tvf_ev9', 'user_id', 'ts', 'event_id', 'event_type')"),
      graft.ext.Behavior.transitions(events, "user_id", "ts", "event_id", "event_type"))
    assertSame(
      spark.sql("SELECT * FROM promote_json('tvf_ev9', 'props', 'k BIGINT')"),
      graft.ext.JsonCols.promote(events, "props",
        new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.LongType)))

    val embs = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    embs.createOrReplaceTempView("tvf_emb9")
    assertSame(
      spark.sql("SELECT * FROM quantize_int8('tvf_emb9')"),
      graft.ext.Similarity.quantizeInt8(embs))

    val before = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val after = Seq((2L, "b2"), (3L, "c")).toDF("doc_id", "text")
    before.createOrReplaceTempView("tvf_snap_b")
    after.createOrReplaceTempView("tvf_snap_a")
    assertSame(
      spark.sql("SELECT * FROM snapshot_diff('tvf_snap_b', 'tvf_snap_a', 'doc_id', 'text')"),
      graft.ext.Compaction.snapshotDiff(before, after, "doc_id", "text"))
  }

  test("skew_audit / degree_histogram / cluster_sizes / containment_pairs / exact_median TVFs == Scala APIs") {
    ready()
    val li = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
    li.createOrReplaceTempView("tvf_li10")
    assertSame(
      spark.sql("SELECT * FROM skew_audit('tvf_li10', 'l_partkey', 5)"),
      graft.ext.Skew.keySkewAudit(li, "l_partkey", 5))

    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    pairs.createOrReplaceTempView("tvf_pairs10")
    assertSame(
      spark.sql("SELECT * FROM degree_histogram('tvf_pairs10', 'id_a', 'id_b')"),
      graft.ext.Dedup.degreeHistogram(pairs, "id_a", "id_b"))

    val assign = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "rep")
    assign.createOrReplaceTempView("tvf_assign10")
    assertSame(
      spark.sql("SELECT * FROM cluster_sizes('tvf_assign10', 'rep')"),
      graft.ext.Dedup.clusterSizeHistogram(assign, "rep"))

    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    docs.createOrReplaceTempView("tvf_docs10")
    val bounded = docs.filter(org.apache.spark.sql.functions.col("doc_id") < 60)
    bounded.createOrReplaceTempView("tvf_docs10b")
    assertSame(
      spark.sql("SELECT * FROM containment_pairs('tvf_docs10b', 'doc_id', 'text', 0.8)"),
      graft.ext.Dedup.containmentPairs(bounded, "doc_id", "text", 0.8))
    assertSame(
      spark.sql("SELECT * FROM exact_median('tvf_docs10', 'source', 'n_chars')"),
      graft.ext.Profile.exactIntegralMedian(docs, "source", "n_chars"))
    assertSame(
      spark.sql("SELECT * FROM exact_quartiles('tvf_docs10', 'lang', 'n_chars')"),
      graft.ext.Profile.exactIntegralQuartiles(docs, "lang", "n_chars"))

    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q5 = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
    val truth = graft.ext.Similarity.bruteForceTopK(emb, q5, k = 5)
      .select("query_id", "neighbor_id")
    val ann = graft.ext.Similarity.kmeansIvfTopK(emb, q5, topK = 5)
      .select("query_id", "neighbor_id")
    truth.createOrReplaceTempView("tvf_truth10")
    ann.createOrReplaceTempView("tvf_ann10")
    assertSame(
      spark.sql("SELECT * FROM recall_at_k('tvf_ann10', 'tvf_truth10')"),
      graft.ext.Similarity.recallAtK(ann, truth))
  }

  test("round-10 TVFs (embedding_profile/contam_attribution/pair_group_matrix/bpe_train/vocab_coverage) == Scala APIs") {
    ready()
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    emb.createOrReplaceTempView("tvf_emb10")
    assertSame(
      spark.sql("SELECT * FROM embedding_profile('tvf_emb10', 'label')"),
      graft.ext.Similarity.groupProfile(emb, "label"))

    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 37 =!= 0)
    val ev = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 37 === 0)
    corpus.createOrReplaceTempView("tvf_corpus10")
    ev.createOrReplaceTempView("tvf_eval10")
    assertSame(
      spark.sql("SELECT * FROM contam_attribution('tvf_corpus10', 'tvf_eval10', 'doc_id', 'text', 'source', 13)"),
      graft.ext.Dedup.contaminationAttribution(corpus, ev, "doc_id", "text", "source"))

    val pairs = graft.ext.Dedup.lshPairs(docs, "doc_id", "text")
    pairs.createOrReplaceTempView("tvf_lshpairs10")
    docs.createOrReplaceTempView("tvf_alldocs10")
    assertSame(
      spark.sql("SELECT * FROM pair_group_matrix('tvf_lshpairs10', 'id_a', 'id_b', 'jaccard', 'tvf_alldocs10', 'doc_id', 'source')"),
      graft.ext.Dedup.pairGroupMatrix(pairs, "id_a", "id_b", "jaccard",
        docs, "doc_id", "source"))

    assertSame(
      spark.sql("SELECT * FROM bpe_train('tvf_alldocs10', 'text', 2)"),
      graft.ext.Bpe.trainMerges(docs, "text", 2))

    assertSame(
      spark.sql("SELECT * FROM vocab_coverage('tvf_alldocs10', 'text', 'source', 20)"),
      graft.ext.TextAnalysis.vocabCoverage(docs, "text", "source", 20))

    assertSame(
      spark.sql("SELECT * FROM effective_tokens('tvf_alldocs10', 'text', 'source')"),
      graft.ext.Dedup.effectiveTokens(docs, "text", "source"))
  }

  test("round-11 TVFs (dup_spans/temperature_mix/hard_negatives/ann_from_state) == Scala APIs") {
    ready()
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    docs.createOrReplaceTempView("tvf_docs11")
    assertSame(
      spark.sql("SELECT * FROM dup_spans('tvf_docs11', 'doc_id', 'text', 10)"),
      graft.ext.Dedup.duplicateSpans(docs, "doc_id", "text", 10))
    assertSame(
      spark.sql("SELECT * FROM temperature_mix('tvf_docs11', 'text', 'source', 0.5)"),
      graft.ext.Sampling.temperatureMix(docs, "text", "source", 0.5))

    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q5 = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
    emb.createOrReplaceTempView("tvf_emb11")
    q5.createOrReplaceTempView("tvf_probe11")
    assertSame(
      spark.sql("SELECT * FROM hard_negatives('tvf_emb11', 'tvf_probe11', 'vec_id', 'embedding', 5, 0.15, 0.35)"),
      graft.ext.Similarity.hardNegatives(emb, q5, 5, 0.15, 0.35))

    val state = java.nio.file.Files
      .createTempDirectory("graft_tvf_ivf").toFile.getAbsolutePath
    graft.ext.Similarity.appendIvfState(emb, state, k = 8, iters = 2)
    assertSame(
      spark.sql(s"SELECT * FROM ann_from_state('$state', 'tvf_probe11', 'vec_id', 'embedding', 5, 2)"),
      graft.ext.Similarity.ivfTopKFromState(spark, state, q5, 5, 2))
    assertSame(
      spark.sql(s"SELECT * FROM ann_state_pairs('$state', 'tvf_probe11', 'vec_id', 'embedding', 0.2, 2)"),
      graft.ext.Similarity.nearDupPairsFromState(spark, state, q5, 0.2, 2))
    assertSame(
      spark.sql("SELECT * FROM substring_dedup('tvf_docs11', 'doc_id', 'text', 10)"),
      graft.ext.Dedup.removeSpans(docs, "doc_id", "text",
        graft.ext.Dedup.duplicateSpans(docs, "doc_id", "text", 10,
          keepFirst = true)))

    val stats = java.nio.file.Files
      .createTempDirectory("graft_tvf_stats").toFile.getAbsolutePath
    graft.ext.Profile.appendStatsState(docs, stats, "text", "source")
    assertSame(
      spark.sql(s"SELECT * FROM stats_report('$stats')"),
      graft.ext.Profile.statsReport(spark, stats))

    val postings = java.nio.file.Files
      .createTempDirectory("graft_tvf_postings").toFile.getAbsolutePath
    graft.ext.Index.appendPostingsState(docs, postings, "doc_id", "text")
    assertSame(
      spark.sql(s"SELECT * FROM bm25_from_state('$postings', 'doc_id', 'dup vector window', 10)"),
      graft.ext.Index.bm25TopKFromState(spark, postings,
        Seq("dup", "vector", "window"), 10, idCol = "doc_id"))

    assertSame(
      spark.sql("SELECT * FROM temperature_sample('tvf_docs11', 'doc_id', 'text', 'source', 5000)"),
      graft.ext.Sampling.temperatureSample(docs, "doc_id", "text", "source",
        5000L))

    val lshPairs = graft.ext.Dedup.lshPairs(docs, "doc_id", "text")
    val assign = graft.ext.Sampling.splitAssign(docs, "doc_id",
      Seq("train" -> 0.8, "test" -> 0.2)).select("doc_id", "split")
    lshPairs.createOrReplaceTempView("tvf_pairs11")
    assign.createOrReplaceTempView("tvf_assign11")
    assertSame(
      spark.sql("SELECT * FROM split_leakage('tvf_pairs11', 'tvf_assign11', 'doc_id')"),
      graft.ext.Sampling.splitLeakageAudit(lshPairs, assign, "doc_id"))

    assertSame(
      spark.sql("SELECT * FROM threshold_sweep('tvf_docs11', 'doc_id', 'text')"),
      graft.ext.Dedup.thresholdSweep(docs, "doc_id", "text"))
  }

  test("round-12 TVFs == their Scala APIs") {
    ready()
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    docs.createOrReplaceTempView("tvf_docs12")
    assertSame(
      spark.sql(
        "SELECT * FROM substring_fixpoint('tvf_docs12', 'doc_id', 'text')"),
      graft.ext.Dedup.removeSpansToFixpoint(docs, "doc_id", "text"))

    val labeled = docs.withColumn("label",
      org.apache.spark.sql.functions.when($"doc_id" % 2 === 0, 1L)
        .otherwise(-1L))
    labeled.createOrReplaceTempView("tvf_labeled12")
    val sw = graft.ext.TextAnalysis.trainQualityScorer(
      labeled, "doc_id", "text", "label")
    assertSame(
      spark.sql("SELECT * FROM trained_scorer('tvf_labeled12', " +
        "'tvf_docs12', 'doc_id', 'text', 'label')"),
      docs.select(($"doc_id" +: graft.ext.TextAnalysis.scoreWithWeights(
        $"text", sw)): _*))

    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tvf_ivfaudit").toFile.getAbsolutePath
    graft.ext.Similarity.appendIvfState(emb, dir, k = 4, iters = 1)
    emb.filter($"vec_id" < 5).createOrReplaceTempView("tvf_probes12")
    assertSame(
      spark.sql(s"SELECT * FROM ivf_state_audit('$dir', 'tvf_probes12', " +
        "'vec_id', 'embedding', 5, 2)"),
      graft.ext.Similarity.ivfStateAudit(spark, dir,
        emb.filter($"vec_id" < 5), 5, 2))
  }

  test("round-13 TVFs (budget_from_state/mix_from_state/tokenizer_merges) == Scala APIs") {
    ready()
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter($"doc_id" < 100).select($"doc_id", $"text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tvf_tok").toFile.getAbsolutePath + "/s"
    graft.ext.Bpe.appendTokenizerState(docs, dir, "doc_id", "text",
      numMerges = 3, batchTag = Some(1L))
    assertSame(
      spark.sql(s"SELECT * FROM tokenizer_merges('$dir')"),
      graft.ext.Bpe.trainMerges(docs, "text", 3))
    val quality = docs.select(($"doc_id" +:
      graft.ext.TextAnalysis.qualityColumns($"text")): _*)
      .select($"doc_id", $"quality_score")
    quality.createOrReplaceTempView("tvf_quality13")
    assertSame(
      spark.sql(s"SELECT * FROM budget_from_state('$dir', 'tvf_quality13', " +
        "'doc_id', 'quality_score', 4000)"),
      graft.ext.Bpe.tokenBudgetFromState(spark, dir, quality,
        "doc_id", "quality_score", 4000L))
    val groups = docs.select($"doc_id",
      ($"doc_id" % 3).cast("string").as("grp"))
    groups.createOrReplaceTempView("tvf_groups13")
    assertSame(
      spark.sql(s"SELECT * FROM mix_from_state('$dir', 'tvf_groups13', " +
        "'doc_id', 'grp')"),
      graft.ext.Bpe.temperatureMixFromState(spark, dir, groups,
        "doc_id", "grp"))
    assertSame(
      spark.sql(s"SELECT * FROM sample_from_state('$dir', 'tvf_groups13', " +
        "'doc_id', 'grp', 3000)"),
      graft.ext.Bpe.temperatureSampleFromState(spark, dir, groups,
        "doc_id", "grp", 3000L))
  }

  test("round-14 state TVFs: bm25_asof, hybrid_from_state, state_consistency") {
    ready()
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val root = java.nio.file.Files
      .createTempDirectory("graft_tvf_r14").toFile.getAbsolutePath
    val (ps, vs) = (s"$root/postings", s"$root/ivf")
    graft.ext.Index.appendPostingsState(docs.filter($"doc_id" < 100),
      ps, "doc_id", "text", batchTag = Some(1L))
    graft.ext.Index.appendPostingsState(
      docs.filter($"doc_id" >= 100 && $"doc_id" < 200),
      ps, "doc_id", "text", batchTag = Some(2L))
    graft.ext.Index.deleteFromPostingsState(spark, ps,
      docs.filter($"doc_id" % 7 === 3).select($"doc_id"), "doc_id",
      deleteTag = Some(1L))
    assertSame(
      spark.sql(s"SELECT * FROM bm25_asof('$ps', 'doc_id', " +
        "'dup vector window', 10, 1, 0)"),
      graft.ext.Index.bm25TopKFromStateAsOf(spark, ps,
        Seq("dup", "vector", "window"), 10, asOfBatch = 1L,
        asOfDelete = 0L, idCol = "doc_id"))
    graft.ext.Similarity.appendIvfState(emb.filter($"vec_id" < 200), vs,
      k = 4, iters = 1, batchTag = Some(1L))
    val q0 = emb.filter($"vec_id" === 0)
    q0.createOrReplaceTempView("tvf_q14")
    assertSame(
      spark.sql(s"SELECT * FROM hybrid_from_state('$ps', '$vs', 'doc_id', " +
        "'dup vector window', 'tvf_q14', 10)"),
      graft.ext.Index.hybridTopKFromState(spark, ps, vs,
        Seq("dup", "vector", "window"), q0, 10, idCol = "doc_id"))
    val (ls, ts) = (s"$root/lsh", s"$root/tok")
    val sub = docs.filter($"doc_id" < 100)
    graft.ext.Dedup.appendLshState(sub, "doc_id", "text", ls,
      batchTag = Some(1L))
    graft.ext.Bpe.appendTokenizerState(sub, ts, "doc_id", "text",
      numMerges = 3, batchTag = Some(1L))
    assertSame(
      spark.sql(s"SELECT * FROM state_consistency('$ls', '$ps', '$ts')"),
      graft.ext.StateAudit.crossPillarConsistency(Seq(
        "lsh" -> graft.ext.StateAudit.lshLiveIds(spark, ls),
        "postings" -> graft.ext.StateAudit.postingsLiveIds(spark, ps),
        "tokenizer" -> graft.ext.StateAudit.tokenizerLiveIds(spark, ts))))
    assertSame(
      spark.sql(s"SELECT * FROM ivf_asof('$vs', 'tvf_q14', 'vec_id', " +
        "'embedding', 5, 2, 1, 0)"),
      graft.ext.Similarity.ivfTopKFromStateAsOf(spark, vs, q0, 5,
        asOfBatch = 1L, asOfDelete = 0L, nProbe = 2))
    val docsS = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text", $"source")
    val st = s"$root/stats"
    graft.ext.Profile.appendStatsState(docsS.filter($"doc_id" < 100), st,
      "text", "source", Some(1L))
    assertSame(
      spark.sql(s"SELECT * FROM stats_asof('$st', 1, 0)"),
      graft.ext.Profile.statsReportAsOf(spark, st, 1L, 0L))
    val quality = docsS.select($"doc_id",
      ($"doc_id" % 7).cast("double").as("q"))
    quality.createOrReplaceTempView("tvf_quality14")
    assertSame(
      spark.sql(s"SELECT * FROM budget_asof('$ts', 'tvf_quality14', " +
        "'doc_id', 'q', 3000, 1, 0)"),
      graft.ext.Bpe.tokenBudgetFromStateAsOf(spark, ts, quality,
        "doc_id", "q", 3000L, asOfBatch = 1L, asOfDelete = 0L))
  }

  test("round-15 state TVFs: state_consistency_asof, state_health") {
    ready()
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_tvf_r15").toFile.getAbsolutePath
    val (ls, ps, ts) = (s"$root/lsh", s"$root/postings", s"$root/tok")
    val b1 = docs.filter($"doc_id" < 80)
    val b2 = docs.filter($"doc_id" >= 80 && $"doc_id" < 160)
    Seq(1L -> b1, 2L -> b2).foreach { case (tag, b) =>
      graft.ext.Dedup.appendLshState(b, "doc_id", "text", ls,
        batchTag = Some(tag))
      graft.ext.Index.appendPostingsState(b, ps, "doc_id", "text",
        batchTag = Some(tag))
      graft.ext.Bpe.appendTokenizerState(b, ts, "doc_id", "text",
        numMerges = 3, batchTag = Some(tag))
    }
    // a partial delete (postings only) diverges the CURRENT audit…
    graft.ext.Index.deleteFromPostingsState(spark, ps,
      docs.filter($"doc_id" % 5 === 1).select($"doc_id"), "doc_id",
      deleteTag = Some(1L))
    assert(spark.sql(
      s"SELECT * FROM state_consistency('$ls', '$ps', '$ts')").count() > 0)
    // …while the pre-delete cut audits CONSISTENT, and the TVF matches
    // the API composition exactly
    assertSame(
      spark.sql("SELECT * FROM state_consistency_asof(" +
        s"'$ls', '$ps', '$ts', 2, 0)"),
      graft.ext.StateAudit.crossPillarConsistency(Seq(
        "lsh" -> graft.ext.StateAudit.lshLiveIdsAsOf(spark, ls, 2L, 0L),
        "postings" ->
          graft.ext.StateAudit.postingsLiveIdsAsOf(spark, ps, 2L, 0L),
        "tokenizer" ->
          graft.ext.StateAudit.tokenizerLiveIdsAsOf(spark, ts, 2L, 0L))))
    assert(spark.sql("SELECT * FROM state_consistency_asof(" +
      s"'$ls', '$ps', '$ts', 2, 0)").count() == 0)
    assertSame(
      spark.sql(s"SELECT * FROM state_health('$ps', " +
        "'postings,totals,docs,tombstones', 3, 1000000)"),
      graft.ext.StateAudit.healthReport(spark, ps,
        Seq("postings", "totals", "docs", "tombstones"),
        maxVersions = 3, maxFilesPerLeafDir = 1000000))
    // 2 tagged batches <= maxVersions=3 -> every table reads 'ok'
    val advice = spark.sql(s"SELECT advice FROM state_health('$ps', " +
      "'postings,totals,docs', 3, 1000000)")
      .collect().map(_.getString(0)).toSet
    assert(advice == Set("ok"))
    // …and with maxVersions=1 the grown batch tables flag 'truncate'
    val tight = spark.sql(s"SELECT `table`, advice FROM state_health(" +
      s"'$ps', 'postings,totals,docs', 1, 1000000)")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tight == Map("postings" -> "truncate", "totals" -> "truncate",
      "docs" -> "truncate"))
  }

  test("round-15 graph TVFs: knn_graph, mutual_nn == Scala APIs") {
    ready()
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tvf_knng").toFile.getAbsolutePath + "/ivf"
    graft.ext.Similarity.appendIvfState(emb, dir, k = 4, iters = 2,
      batchTag = Some(1L))
    assertSame(
      spark.sql(s"SELECT * FROM knn_graph('$dir', 3, 2)"),
      graft.ext.Similarity.knnGraphFromState(spark, dir, 3, 2))
    assertSame(
      spark.sql(s"SELECT * FROM mutual_nn('$dir', 3, 0.2, 2)"),
      graft.ext.Similarity.mutualNnPairsFromState(spark, dir, 3, 0.2, 2))
    assertSame(
      spark.sql(s"SELECT * FROM semantic_clusters('$dir', 3, 0.2, 2)"),
      graft.ext.Similarity.semanticClustersFromState(spark, dir, 3, 0.2, 2))
  }

  test("round-16 TVFs: image_phash, hamming_pairs, knn_graph_state == Scala APIs") {
    ready()
    import graft.queries.Extensions.syntheticBlockImage
    val payloads = (0L until 60L).map(id => (id, syntheticBlockImage(id)))
      .toDF("doc_id", "payload")
    payloads.createOrReplaceTempView("tvf_imgs")
    assertSame(
      spark.sql("SELECT * FROM image_phash('tvf_imgs', 'doc_id', 'payload')"),
      graft.ext.Multimodal.perceptualHashBatch(payloads).toDF())
    val hashes = graft.ext.Multimodal.perceptualHashBatch(payloads).toDF()
      .filter($"ok").select($"doc_id", $"phash")
    hashes.createOrReplaceTempView("tvf_phash")
    assertSame(
      spark.sql("SELECT * FROM hamming_pairs('tvf_phash', 'doc_id', 'phash', 3)"),
      graft.ext.Dedup.hammingPairs64(hashes, "doc_id", "phash", 3))
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding")
    val root = java.nio.file.Files
      .createTempDirectory("graft_tvf_knngs").toFile.getAbsolutePath
    graft.ext.Similarity.appendIvfState(emb, s"$root/ivf", k = 4, iters = 2,
      batchTag = Some(1L))
    graft.ext.Similarity.buildKnnGraphState(spark, s"$root/ivf",
      s"$root/graph", k = 3, nProbe = 2)
    assertSame(
      spark.sql(s"SELECT * FROM knn_graph_state('$root/graph')"),
      graft.ext.Similarity.readKnnGraphState(spark, s"$root/graph"))
  }

  test("round-16 wave-2 TVFs: audio + video ops == Scala APIs") {
    ready()
    import graft.queries.Extensions.{syntheticWav, syntheticVideo}
    val wavs = (0L until 50L).map(id => (id, syntheticWav(id)))
      .toDF("doc_id", "payload")
    wavs.createOrReplaceTempView("tvf_wavs")
    assertSame(
      spark.sql("SELECT * FROM wav_meta('tvf_wavs', 'doc_id', 'payload')"),
      graft.ext.Multimodal.wavMetaBatch(wavs).toDF())
    assertSame(
      spark.sql("SELECT * FROM audio_stats('tvf_wavs', 'doc_id', 'payload')"),
      graft.ext.Multimodal.audioStatsBatch(wavs).toDF())
    assertSame(
      spark.sql("SELECT * FROM audio_fp('tvf_wavs', 'doc_id', 'payload')"),
      graft.ext.Multimodal.audioFingerprintBatch(wavs).toDF())
    assertSame(
      spark.sql("SELECT * FROM audio_frames('tvf_wavs', 'doc_id', 'payload', 5)"),
      graft.ext.Multimodal.sampleAudioFrames(wavs, 5).toDF())
    val vids = (0L until 40L).map(id => (id, syntheticVideo(id)))
      .toDF("doc_id", "payload")
    vids.createOrReplaceTempView("tvf_vids")
    assertSame(
      spark.sql("SELECT * FROM video_frame_hashes('tvf_vids', 'doc_id', " +
        "'payload', 2)"),
      graft.ext.Multimodal.videoFrameHashes(vids, everyK = 2).toDF())
    val fh = graft.ext.Multimodal.videoFrameHashes(vids).toDF()
      .filter($"ok").select($"doc_id", $"phash")
    fh.createOrReplaceTempView("tvf_vfh")
    assertSame(
      spark.sql("SELECT * FROM video_neardup('tvf_vfh', 'doc_id', 'phash', 5)"),
      graft.ext.Multimodal.videoNearDupPairs(fh, minShared = 5))
    val fpDir = java.nio.file.Files
      .createTempDirectory("graft_tvf_fps").toFile.getAbsolutePath + "/fp"
    val corpusFps = graft.ext.Multimodal.audioFingerprintBatch(wavs).toDF()
      .filter($"ok").select($"doc_id", $"afp")
    graft.ext.Dedup.appendFpState(corpusFps, fpDir, "doc_id", "afp",
      batchTag = Some(1L))
    val batchFps = (50L until 90L).map(id => (id, syntheticWav(id)))
      .toDF("doc_id", "payload")
    val batchSigs = graft.ext.Multimodal.audioFingerprintBatch(batchFps)
      .toDF().filter($"ok").select($"doc_id", $"afp")
    batchSigs.createOrReplaceTempView("tvf_fp_batch")
    assertSame(
      spark.sql(s"SELECT * FROM fp_state_pairs('$fpDir', 'tvf_fp_batch', " +
        "'doc_id', 'afp', 3)"),
      graft.ext.Dedup.incrementalHammingPairsFromState(spark, fpDir,
        batchSigs, "doc_id", "afp", 3))
    corpusFps.createOrReplaceTempView("tvf_fp_corpus")
    assertSame(
      spark.sql("SELECT * FROM fp_clusters('tvf_fp_corpus', 'doc_id', " +
        "'afp', 3)"),
      graft.ext.Dedup.fingerprintClusters(corpusFps, "doc_id", "afp", 3))
    val mixed = (0L until 40L).map { id =>
      (id, (id % 4) match {
        case 0 => graft.queries.Extensions.syntheticBlockImage(id)
        case 1 => syntheticWav(id)
        case 2 => syntheticVideo(id)
        case _ => s"junk $id".getBytes("UTF-8")
      })
    }.toDF("doc_id", "payload")
    mixed.createOrReplaceTempView("tvf_mixed")
    assertSame(
      spark.sql("SELECT * FROM media_meta('tvf_mixed', 'doc_id', 'payload')"),
      graft.ext.Multimodal.mediaMetaBatch(mixed).toDF())
    // the optional hot-frame cap rides through the TVF surface
    assertSame(
      spark.sql(
        "SELECT * FROM video_neardup('tvf_vfh', 'doc_id', 'phash', 5, 8)"),
      graft.ext.Multimodal.videoNearDupPairs(fh, minShared = 5,
        maxFrameDf = 8))
    val mp4s = (0L until 40L)
      .map(id => (id, graft.queries.Extensions.syntheticMp4(id)))
      .toDF("doc_id", "payload")
    mp4s.createOrReplaceTempView("tvf_mp4s")
    assertSame(
      spark.sql("SELECT * FROM mp4_meta('tvf_mp4s', 'doc_id', 'payload')"),
      graft.ext.Multimodal.mp4MetaBatch(mp4s).toDF())
  }

  test("round-14 wave-2 TVFs: state_diff, mmr_from_state, capped_mix") {
    ready()
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text", $"source")
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val root = java.nio.file.Files
      .createTempDirectory("graft_tvf_r14b").toFile.getAbsolutePath
    val ps = s"$root/postings"
    graft.ext.Index.appendPostingsState(docs.filter($"doc_id" < 100),
      ps, "doc_id", "text", batchTag = Some(1L))
    graft.ext.Index.appendPostingsState(
      docs.filter($"doc_id" >= 100 && $"doc_id" < 200),
      ps, "doc_id", "text", batchTag = Some(2L))
    graft.ext.Index.deleteFromPostingsState(spark, ps,
      docs.filter($"doc_id" % 7 === 3).select($"doc_id"), "doc_id",
      deleteTag = Some(1L))
    assertSame(
      spark.sql(s"SELECT * FROM state_diff('$ps', 'postings', 1, 0, 2, 1)"),
      graft.ext.StateAudit.snapshotDiff(
        graft.ext.StateAudit.postingsLiveIdsAsOf(spark, ps, 1L, 0L),
        graft.ext.StateAudit.postingsLiveIdsAsOf(spark, ps, 2L, 1L)))
    val vs = s"$root/ivf"
    graft.ext.Similarity.appendIvfState(emb.filter($"vec_id" < 200), vs,
      k = 4, iters = 1, batchTag = Some(1L))
    val q0 = emb.filter($"vec_id" === 0)
    q0.createOrReplaceTempView("tvf_q14b")
    assertSame(
      spark.sql(s"SELECT * FROM mmr_from_state('$vs', 'tvf_q14b', " +
        "'vec_id', 'embedding', 5, 0.7, 20, 2)"),
      graft.ext.Similarity.mmrTopKFromState(spark, vs, q0, 5, 0.7,
        candK = 20, nProbe = 2))
    docs.createOrReplaceTempView("tvf_docs14b")
    assertSame(
      spark.sql(
        "SELECT * FROM capped_mix('tvf_docs14b', 'text', 'source', 1500)"),
      graft.ext.Sampling.cappedTemperatureMix(docs, "text", "source",
        maxUpMilli = 1500L))
  }

  test("non-literal and wrong-arity arguments raise AnalysisException") {
    ready()
    Seq((1L, "a")).toDF("id", "t").createOrReplaceTempView("tvf_bad")
    // non-foldable view name
    val e1 = intercept[AnalysisException](spark.sql(
      "SELECT * FROM dedup_pairs(id, 'id', 't') ").collect())
    assert(e1.getCondition != null)
    // arity below minimum
    intercept[AnalysisException](spark.sql(
      "SELECT * FROM asof_join('tvf_bad', 'tvf_bad')").collect())
    // unknown view name surfaces as an analysis error, not a crash
    intercept[AnalysisException](spark.sql(
      "SELECT * FROM asof_join('no_such_view', 'tvf_bad', 'k', 'ts', 'ts')")
      .collect())
  }

  test("round-17 TVFs: mp3_meta, page_rank (uniform + seeded)") {
    ready()
    val mp3s = (0L until 40L).map { id =>
      (id, if (id % 5 == 4) s"junk $id".getBytes("UTF-8")
        else graft.queries.Extensions.syntheticMp3(id))
    }.toDF("doc_id", "payload")
    mp3s.createOrReplaceTempView("tvf_mp3s")
    assertSame(
      spark.sql("SELECT * FROM mp3_meta('tvf_mp3s', 'doc_id', 'payload')"),
      graft.ext.Multimodal.mp3MetaBatch(mp3s).toDF())
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .filter($"vec_id" < 120)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tvf_pr").toFile.getAbsolutePath + "/ivf"
    graft.ext.Similarity.appendIvfState(emb, dir, k = 4, iters = 2,
      batchTag = Some(1L))
    assertSame(
      spark.sql(s"SELECT * FROM page_rank('$dir', 3, 4)"),
      graft.ext.Similarity.pageRankFromState(spark, dir, k = 3, iters = 4))
    val seeds = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("vid"), ($"vec_id" % 3 + 1).cast("double").as("w"))
    seeds.createOrReplaceTempView("tvf_pr_seeds")
    assertSame(
      spark.sql(s"SELECT * FROM page_rank('$dir', 3, 4, 0.9, " +
        "'tvf_pr_seeds', 'vid', 'w')"),
      graft.ext.Similarity.pageRankFromState(spark, dir, k = 3, iters = 4,
        damping = 0.9, teleport = Some(seeds.select($"vid", $"w".as("tp")))))
    val gDir = java.nio.file.Files
      .createTempDirectory("graft_tvf_prg").toFile.getAbsolutePath + "/g"
    graft.ext.Similarity.buildKnnGraphState(spark, dir, gDir, k = 3,
      nProbe = 2)
    assertSame(
      spark.sql(s"SELECT * FROM page_rank_state('$gDir', 4)"),
      graft.ext.Similarity.pageRankFromGraphState(spark, gDir, iters = 4))
    val evalSet = emb.filter($"vec_id" < 6)
      .select(($"vec_id" + 900).as("eval_id"), $"embedding")
    evalSet.createOrReplaceTempView("tvf_eval")
    assertSame(
      spark.sql(s"SELECT * FROM semantic_decontam('$dir', 'tvf_eval', " +
        "'eval_id', 'embedding', 0.9)"),
      graft.ext.Similarity.semanticContaminated(spark, dir, evalSet,
        minCos = 0.9))
  }
}
